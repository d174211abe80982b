package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class UnigramLmSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("viterbi DP equals brute enumeration of every segmentation") {
    // independent brute: enumerate ALL compositions, pick min (cost, k, path)
    def brute(w: String, cost: Map[String, Long]): Seq[String] = {
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(UnigramLm.MaxPieceLen, s.length)).flatMap { l =>
          val h = s.substring(0, l)
          if (cost.contains(h)) segs(s.substring(l)).map(h :: _) else Nil
        }
      segs(w).map { p =>
        (p.map(cost).sum, p.length, p.mkString(UnigramLm.Sep, UnigramLm.Sep, ""))
      }.minBy(identity).  _3.split(UnigramLm.Sep).filter(_.nonEmpty).toSeq
    }
    val cost = Map("a" -> 50L, "b" -> 40L, "ab" -> 75L, "ba" -> 10L,
      "aba" -> 95L, "bab" -> 96L, "abab" -> 200L)
    for (w <- Seq("abab", "ababab", "aabb", "a", "bbbb", "abba")) {
      assert(UnigramLm.viterbi(w, cost) == brute(w, cost), s"word $w")
    }
    // tie on (cost, k): "ab"+"ba" vs ... construct an exact tie and check
    // the lexicographic path break is what both paths agree on
    val tie = Map("x" -> 10L, "y" -> 10L, "xy" -> 20L, "yx" -> 20L)
    assert(UnigramLm.viterbi("xyxy", tie) == brute("xyxy", tie))
  }

  test("trainer laws: coverage, integer counts, prob normalization, vocab shape") {
    val out = UnigramLm.unigramLmVocab(spark, dir).collect()
    assert(out.nonEmpty)
    val pieces = out.map(_.getString(0))
    // every character of every word is present (the coverage rule)
    val chars = Tables(spark, dir, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("ch")).filter(col("ch") =!= "")
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces.toSet), s"missing chars: ${chars -- pieces.toSet}")
    // counts positive; probs sum to ~1; costs consistent with counts
    val total = out.map(_.getLong(1)).sum
    assert(out.forall(_.getLong(1) > 0))
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    for (r <- out)
      assert(r.getLong(2) ==
        UnigramLm.quantCost(r.getLong(1), total), r.toString)
    // EM keeps useful multis: the corpus words are few and frequent, so at
    // least one multi-char piece must survive three hard-EM rounds
    assert(pieces.exists(_.length > 1), "no multi-char piece survived EM")
  }

  test("distributed regime equals the driver regime on the same corpus") {
    val docs = Tables(spark, dir, "documents")
    val driver = UnigramLm.unigramVocabOf(spark, docs).collect().toSeq
    val dist = UnigramLm.unigramVocabOf(spark, docs, driverVocabGate = 0)
      .collect().toSeq
    assert(dist == driver)
  }

  test("segment stats: per-doc piece counts match a driver-local re-walk") {
    val out = UnigramLm.unigramSegmentStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // independent walk: retrain driver-local, segment each token, count
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wc = docs.flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }.toArray
    val model = UnigramLm.trainDriverLocal(wc, UnigramLm.EmIters)
    val total = model.values.sum
    val cost = model.map { case (p, c) => p -> UnigramLm.quantCost(c, total) }
    val want = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val pieces = toks.map(w => UnigramLm.viterbi(w, cost).length.toLong).sum
      id -> ((toks.length.toLong, pieces,
        BigDecimal(pieces.toDouble / toks.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.filter(_._2._1 > 0).toMap
    assert(out == want)
  }

  test("tie-break collation is UTF-8 byte order, not Java UTF-16 compareTo") {
    // U+FFFD (UTF-8 ef bf bd) vs U+1F600 (UTF-8 f0 9f 98 80, UTF-16
    // surrogate pair starting 0xD83D): Java compareTo sorts the surrogate
    // FIRST (0xD83D < 0xFFFD), UTF-8 binary sorts it LAST (0xf0 > 0xef) —
    // the distributed min(struct) and the DuckDB oracle both use UTF-8.
    val bmp = "�"
    val supp = new String(Character.toChars(0x1F600))
    assert(bmp.compareTo(supp) > 0, "Java order: surrogate first")
    assert(UnigramLm.utf8Lt(bmp, supp), "UTF-8 order: BMP char first")
    assert(!UnigramLm.utf8Lt(supp, bmp))
    // prefix rule: a strict prefix sorts first; equal strings sort neither
    assert(UnigramLm.utf8Lt("ab", "abc") && !UnigramLm.utf8Lt("abc", "ab"))
    assert(UnigramLm.utf8Ordering.compare("ab", "ab") == 0)
    // agreement with Spark's own UTF8String collation on the pair above
    import org.apache.spark.unsafe.types.UTF8String
    assert((UTF8String.fromString(bmp).compareTo(UTF8String.fromString(supp)) < 0)
      == UnigramLm.utf8Lt(bmp, supp))
  }

  test("serving segmentation runs in executors and both regimes agree") {
    val docs = Tables(spark, dir, "documents")
    val default = UnigramLm.segmentStatsOf(spark, docs)
    val distributed = UnigramLm.segmentStatsOf(spark, docs, driverVocabGate = 0)
    // plan pin: segmentation is a MapPartitions over the word-count
    // aggregate — never a driver-collected LocalRelation of (word, k)
    // rows (the old shape), which is what bounded the operator at the
    // driver's memory
    val plan = default.queryExecution.optimizedPlan.toString
    assert(plan.contains("MapPartitions"),
      "serving plan must segment in executors (MapPartitions node)")
    assert(!plan.contains("LocalRelation"),
      "serving plan must not materialize the vocabulary driver-side")
    // regime parity: forcing the distributed retrain + unhinted join
    // changes the layout, never the answer
    assert(distributed.collect().toSeq == default.collect().toSeq)
    // broadcast hint applies only within the gate
    def hints(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    assert(hints(distributed).isEmpty,
      "past the gate the vocabulary join must not carry a broadcast hint")
    assert(hints(default).nonEmpty,
      "within the gate the vocabulary join broadcasts")
  }

  test("distributed trainer returns an empty model for an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val model = UnigramLm.trainDistributed(spark,
      BpeTrain.wordCounts(empty), UnigramLm.EmIters)
    assert(model.collect().isEmpty)
    assert(model.columns.toSeq == Seq("piece", "c"))
  }

  test("the margin guard trips on a boundary-adjacent quantization") {
    // c/C engineered so ln(C/c)*1e6 lands essentially on x.5: ln guard must
    // throw rather than round. exp(k + 0.5/1e6) scaled to integers:
    // pick C, c with ln(C/c)*1e6 within 1e-7 of .5 via a search
    val hit = (2L to 400000L).view.map { c =>
      val x = math.log(1000000.0 / c) * 1e6
      (c, math.abs(x - math.floor(x) - 0.5))
    }.find(_._2 < 1e-7)
    hit match {
      case Some((c, _)) =>
        intercept[IllegalArgumentException] {
          UnigramLm.quantCost(c, 1000000L)
        }
      case None => // no representable boundary case in range — guard unexercisable here
        succeed
    }
  }
}
