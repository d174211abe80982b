package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("WordNGrams expression equals the builtin-composition shingles") {
    // edge cases: empty, whitespace-only, < n tokens (uppercase to check the
    // lowercased fallback), exactly n, repeated shingles (distinct), and
    // trailing whitespace (Spark split keeps trailing empty tokens)
    val edge = Seq("", "   ", "One TWO", "a b c", "x y z x y z x y z",
      "tab\tsep\ntokens here", "trailing space ")
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).as[String].collect().toSeq
    val df = (edge ++ corpus).toDF("text")
    val bad = df.filter(
      Dedup.shingles(col("text")) =!= Dedup.shinglesHof(col("text"))).count()
    assert(bad == 0)
  }

  test("property: WordNGrams equals the composition on random strings") {
    import org.scalacheck.{Arbitrary, Gen}
    // lone surrogates don't survive the UTF-8 roundtrip (encoding artifact
    // of the test path, not the operator) — drop them, as in TextCleanSpec
    val gen = Gen.listOfN(300,
      Arbitrary.arbitrary[String].map(_.filterNot(_.isSurrogate)))
    val samples = gen.sample.get ++ Seq("a b c d", "ONE two THREE four")
    val df = samples.toDF("text")
    val bad = df.filter(
      Dedup.shingles(col("text")) =!= Dedup.shinglesHof(col("text"))).count()
    assert(bad == 0)
  }

  test("winnow near-dup finds every planted duplicate pair") {
    val dir = "/root/testdata/sf0.001"
    val ids = Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val shift = ids.max + 1L
    val pairs = Dedup.winnowNearDupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the doubled corpus plants (i, i+shift) exact-dup pairs — identical
    // text shares ALL fingerprints, so each must surface
    val planted = ids.map(i => (i, i + shift)).toSet
    assert((planted -- pairs).isEmpty,
      s"missed ${(planted -- pairs).size} planted duplicate pairs")
  }

  test("MinHashBands equals the explode→aggregate signature formulation") {
    // pins the hand-rolled hashing in MinHashBands.compute to the builtin
    // xxhash64 construction it replaces: slot i = min(xxhash64(g, i) &
    // 2^32-1) — per-slot INDEPENDENT mixes (the r15 fix for the
    // Carter-Wegman ladder's correlated-slot containment misses; see the
    // MinHashBands class doc), band hash = xxhash64(slots..., band)
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val viaExpr = docs.select(col("doc_id"),
      posexplode(graft.functions.MinHashBands(
        Dedup.shingles(col("text")), Dedup.MinhashK, Dedup.Bands))
        .as(Seq("band", "band_hash")))
    val shingleRows = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("g"))
    val sigAggs = (0 until Dedup.MinhashK)
      .map(i => min(xxhash64(col("g"), lit(i))
        .bitwiseAND(lit(0xFFFFFFFFL))).as(s"s$i"))
    val sig = shingleRows.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val bandHashes = (0 until Dedup.Bands).map { b =>
      val slots = (b * Dedup.RowsPerBand until (b + 1) * Dedup.RowsPerBand)
        .map(i => col(s"s$i"))
      xxhash64(slots :+ lit(b): _*)
    }
    val viaAgg = sig.select(col("doc_id"),
      posexplode(array(bandHashes: _*)).as(Seq("band", "band_hash")))
    assert(viaExpr.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaExpr).count() == 0)
  }

  test("band-index artifacts are scheme-stamped and stale versions fail fast") {
    // the r15 ladder→per-slot-mix switch changed every band hash: a refresh
    // against a pre-switch store finds ZERO collisions and reports no
    // near-dups with no error. The stamp turns that silence into a crash.
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text").limit(20)
    val idx = Dedup.bandIndex(docs)
    assert(idx.columns.contains("mh_scheme"))
    // current stamp passes and the guard strips the column for the join
    val ok = Dedup.requireBandScheme(idx)
    assert(!ok.columns.contains("mh_scheme"))
    // CorpusRefresh's stored bands leg carries the same stamp
    val (_, refreshBands, _) = CorpusRefresh.indexArtifactsOf(
      docs.withColumn("source", lit("s")))
    assert(!Dedup.requireBandScheme(refreshBands).columns.contains("mh_scheme"))
    // a store written under another scheme version is rejected…
    val stale = idx.withColumn("mh_scheme", lit(1))
    val eStale = intercept[IllegalArgumentException](Dedup.requireBandScheme(stale))
    assert(eStale.getMessage.contains("rebuilt"))
    // …and so is a pre-versioning store with no stamp at all
    val unstamped = idx.drop("mh_scheme")
    val eNone = intercept[IllegalArgumentException](Dedup.requireBandScheme(unstamped))
    assert(eNone.getMessage.contains("rebuild"))
  }

  test("SimHash64 equals the explode→aggregate formulation") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val viaExpr = docs.select(col("doc_id"),
      graft.functions.SimHash64(Dedup.tokens(col("text"))).as("simhash"))
    val toks = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
    val viaAgg = agg.select(col("doc_id"), fp.as("simhash"))
    assert(viaExpr.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaExpr).count() == 0)
  }

  test("clusterPairs: transitive chains collapse to one component, min id keeps") {
    // chain 1-2-3-4 (forces >1 propagation round), separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false), 4L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false)))
  }

  test("clusterPairs: distributed loop and driver union-find agree") {
    // chains + a star + an isolated pair — deep enough to need >1 round
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 31L)).toDF("a_id", "b_id")
    val driver = Dedup.clusterPairs(pairs).collect().map(_.toSeq).toSet
    val loop = Dedup.clusterPairs(pairs, collectBound = 0).collect().map(_.toSeq).toSet
    assert(driver == loop)
    assert(driver.nonEmpty)
  }

  test("shingle contract: distinct trigrams in first-occurrence order") {
    val got = Seq("the cat sat on the cat sat").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh")).as[Seq[String]].head()
    assert(got == Seq("the cat sat", "cat sat on", "sat on the", "on the cat"))
  }

  test("repeatedNgramSpans: planted cross-doc span found at exact positions; within-doc repeats don't qualify") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens
    val docs = Seq(
      (1L, s"intro words here then $shared and a tail"),
      (2L, s"$shared opens this second document with different continuation text"),
      // doc 3 repeats an 8-gram TWICE but only within itself — not cross-doc
      (3L, "zulu yankee xray whiskey victor uniform tango sierra " * 2 + "end")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("spans_fixture")
    val out = Dedup.repeatedNgramSpans(spark, "/root/testdata/sf0.001", 8)
    // run the operator over the fixture by calling the same internals
    val grams = docs.select(col("doc_id"),
      posexplode(graft.functions.WordNGrams.all(col("text"), 8)).as(Seq("pos", "g")))
    val repeated = grams.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("n_docs")).filter(col("n_docs") >= 2)
    val spans = grams.join(repeated, Seq("g"))
      .select("g", "doc_id", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(spans == Set((shared, 1L, 4), (shared, 2L, 0)),
      s"got $spans — expected exactly the planted cross-doc span (doc 3's within-doc repeat must not appear)")
    assert(out.columns.toSeq == Seq("g", "n_docs", "doc_id", "pos"))
  }

  test("crossDocSpans: planted shared paragraph recovered with exact positions and length") {
    import spark.implicits._
    // a 12-token paragraph shared verbatim by docs 1 and 2 at different
    // offsets: 12 tokens of 8-grams → 5 consecutive matches on one diagonal
    val para = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val docs = Seq(
      (1L, s"one two three $para tail words after the shared region"),
      (2L, s"$para followed by its own unrelated continuation of this document"),
      // docs 3/4 share a single 8-gram only — one match, below minRun
      (3L, "zulu yankee xray whiskey victor uniform tango sierra plus padding"),
      (4L, "prefix zulu yankee xray whiskey victor uniform tango sierra suffix")
    ).toDF("doc_id", "text")
    val spans = Dedup.crossDocSpansFrom(docs, n = 8, minRun = 2, maxDf = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSeq
    // para starts at token 3 in doc 1, token 0 in doc 2; 12 tokens → 5 grams
    assert(spans == Seq((1L, 2L, 3, 0, 5L, 12L)),
      s"got $spans — expected exactly the planted (1,2) span; the single-gram (3,4) overlap must not qualify")
  }

  test("crossDocSpans: boilerplate grams above the df cap never form spans") {
    import spark.implicits._
    val boiler = "standard legal disclaimer text repeated on every single document"
    val docs = (1L to 6L).map(i => (i, s"$boiler unique$i tail$i")).toDF("doc_id", "text")
    // cap 3 < 6 docs carrying the 8-gram ⇒ the gram is a stop-gram ⇒ no spans
    val spans = Dedup.crossDocSpansFrom(docs, n = 8, minRun = 1, maxDf = 3)
    assert(spans.count() == 0)
    // raising the cap to 20 re-admits it: the 9-token boilerplate yields 2
    // consecutive shared grams → one span per doc pair, C(6,2) = 15 spans
    val open = Dedup.crossDocSpansFrom(docs, n = 8, minRun = 1, maxDf = 20)
    assert(open.count() == 15, s"expected 15 spans, got ${open.count()}")
  }

  test("cutSpans: the losing copy of a shared paragraph is cut exactly; the keeper is untouched") {
    import spark.implicits._
    val para = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val docs = Seq(
      // doc 1's copy differs in CASE only — matching is case-insensitive,
      // but its surviving text must keep the original casing
      (1L, s"One Two three ${para.toUpperCase} tail words after the shared region"),
      (2L, s"$para followed by its own unrelated continuation of this document"),
      (3L, "Independent FILLER content with no overlap whatsoever here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.cutSpansFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 (lower id) keeps everything, ORIGINAL case intact
    assert(out(1L) == (s"One Two three ${para.toUpperCase} tail words after the shared region", 21L, 0L))
    // doc 2 loses exactly the 12 shared tokens from its front (the match
    // fired across the case difference)
    assert(out(2L) == ("followed by its own unrelated continuation of this document", 9L, 12L))
    // doc 3 untouched, case preserved
    assert(out(3L) == ("Independent FILLER content with no overlap whatsoever here at all", 10L, 0L))
  }

  test("cutSpans: a fully repeated document empties instead of vanishing; token accounting holds") {
    import spark.implicits._
    val body = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar"
    val docs = Seq((10L, body), (20L, body)).toDF("doc_id", "text")
    val out = Dedup.cutSpansFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == (body, 12L, 0L), "keeper must stay whole")
    assert(out(20L) == ("", 0L, 12L), "full duplicate must come back empty, not vanish")
    // conservation: kept + removed = the doc's token count, for every doc
    for ((_, (_, k, r)) <- out) assert(k + r == 12L)
  }

  test("corpusDedupReport: fields equal aggregates recomputed from the component operators") {
    val dir = "/root/testdata/sf0.001"
    val r = Dedup.corpusDedupReport(spark, dir).head()
    val pairs = Dedup.minhashLshPairs(spark, dir).collect()
      .map(p => (p.getLong(0), p.getLong(1)))
    val cut = Dedup.cutSpansFrom(Tables(spark, dir, "documents")).collect()
      .map(c => (c.getLong(0), c.getLong(2), c.getLong(3)))
    assert(r.getAs[Long]("n_docs") == cut.length)
    assert(r.getAs[Long]("near_dup_pairs") == pairs.length)
    assert(r.getAs[Long]("docs_in_near_dup") ==
      (pairs.map(_._1) ++ pairs.map(_._2)).distinct.length)
    assert(r.getAs[Long]("docs_cut") == cut.count(_._3 > 0))
    assert(r.getAs[Long]("tokens_removed") == cut.map(_._3).sum)
    val total = cut.map(c => c._2 + c._3).sum
    assert(r.getAs[Double]("pct_tokens_removed") ==
      BigDecimal(cut.map(_._3).sum.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("incrementalNearDup: equals the cross-batch restriction of the full pair set") {
    val dir = "/root/testdata/sf0.001"
    val inc = Dedup.incrementalNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the full brute-force pair set, restricted to pairs that cross the
    // 80/20 batch split (either orientation), re-keyed (incoming, history)
    val full = Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.flatMap { case (a, b, j) =>
      (a % 10 >= 8, b % 10 >= 8) match {
        case (true, false) => Some((a, b, j))
        case (false, true) => Some((b, a, j))
        case _             => None // same-batch pair: not this operator's job
      }
    }.toSet
    assert(inc == expected, s"got $inc\nexpected $expected")
    // purity: every pair is (incoming, history) — never history×history
    assert(inc.forall { case (i, h, _) => i % 10 >= 8 && h % 10 < 8 })
  }

  test("containment: embedded short doc pairs at cont=1 where Jaccard stays below threshold") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"filler$i word$i extra$i").mkString(" ")
    Seq((1L, short), (2L, long), (3L, "totally unrelated content here now"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.containmentPairs(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every shingle of doc 1 appears in doc 2 -> containment(1->2) = 1.0,
    // while Jaccard ~ 4/124 — the asymmetric case Jaccard cannot flag
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)), s"got ${pairs.mkString(", ")}")
    val jac = Dedup.ngramJaccardPairs(spark, tmp).collect()
    assert(jac.isEmpty, "Jaccard at 0.5 should NOT pair the embedded doc")
  }

  test("containment: deterministic on the corpus; values in (0,1], a_id < b_id") {
    val dir = "/root/testdata/sf0.01"
    val p1 = Dedup.containmentPairs(spark, dir).collect()
    val p2 = Dedup.containmentPairs(spark, dir).collect()
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
    assert(p1.nonEmpty)
    assert(p1.forall(r => r.getLong(0) < r.getLong(1)))
    assert(p1.forall(r => r.getDouble(2) >= Dedup.ContainmentTau && r.getDouble(2) <= 1.0))
  }
}
