package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

case class TestDoc(doc_id: Long, ts: Timestamp, text: String)
case class RefreshDoc(doc_id: Long, source: String, text: String)

class DocStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("streaming ingest scrubs, fingerprints, and dedups on the redacted text") {
    val input = MemoryStream[TestDoc](spark)
    input.addData(
      TestDoc(1, t(1), "the quick brown fox writes to alice@example.com daily"),
      // same content, DIFFERENT leaked email — must collapse with doc 1
      // because the fingerprint is computed on the scrubbed text
      TestDoc(2, t(2), "the quick brown fox writes to bob@corp.example.org daily"),
      TestDoc(3, t(3), "a completely different document about sequence packing"))
    val q = DocStreams.cleanedDocs(input.toDF())
      .writeStream.format("memory").queryName("docs_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("docs_out").orderBy("doc_id").collect()
    assert(out.length == 2, s"expected 2 deduped docs, got ${out.length}")
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L))
    val kept = out.head
    assert(kept.getAs[String]("text") ==
      "the quick brown fox writes to [EMAIL] daily")
    // the streaming fingerprint/simhash columns equal the batch expressions
    // applied to the same scrubbed text
    val batch = Seq(kept.getAs[String]("text")).toDF("text").select(
      md5(lower(graft.pipeline.TextClean.collapseWs(col("text"))).cast("binary")).as("fp"),
      graft.functions.SimHash64(graft.ops.Dedup.tokens(col("text"))).as("simhash")).head()
    assert(kept.getAs[String]("fp") == batch.getString(0))
    assert(kept.getAs[Long]("simhash") == batch.getLong(1))
  }

  test("streaming BPE token metering equals the batch segment stats across micro-batches") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    val docsDf = graft.ops.Tables(spark, dir, "documents")
    // the tokenizer artifact: trained ONCE, static across the stream
    val seg = graft.ops.BpeTrain.segmentationOf(spark, docsDf).persist()
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => TestDoc(r.getLong(0), t((r.getLong(0) % 50).toInt), r.getString(1)))
    val input = MemoryStream[TestDoc](spark)
    val (first, second) = docs.splitAt(docs.length / 2)
    input.addData(first.toSeq)
    val q = DocStreams.bpeCountServe(input.toDF(), seg, out, ckpt)
    q.processAllAvailable()
    input.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()
    val served = Sinks.readSink(spark, out)
      .select("doc_id", "n_words", "n_bpe_tokens", "fertility").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.ops.BpeTrain.bpeSegmentStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    seg.unpersist()
    assert(served == batch,
      s"streamed token metering diverged: ${(served diff batch).take(3)} / ${(batch diff served).take(3)}")
  }

  test("streaming quality filter equals the batch LR classifier on the same docs") {
    val dir = "/root/testdata/sf0.001"
    val w = graft.ops.QualityModel.fitCached(spark, dir)
    val batch = graft.ops.QualityModel.qualityLrScore(spark, dir)
      .filter(col("keep"))
      .select("doc_id", "lr_logit").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => TestDoc(r.getLong(0), t((r.getLong(0) % 50).toInt), r.getString(1)))
    val input = MemoryStream[TestDoc](spark)
    // two micro-batches: the filter is stateless, so the split is arbitrary
    val (first, second) = docs.splitAt(docs.length / 2)
    input.addData(first)
    val q = DocStreams.qualityFiltered(input.toDF(), w)
      .writeStream.format("memory").queryName("quality_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    input.addData(second)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("quality_out")
      .select("doc_id", "lr_logit").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch,
      s"stream/batch quality filter diverged: ${(streamed.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff streamed.toSet).take(3)}")
    assert(batch.nonEmpty, "fixture kept no docs — spec is vacuous")
  }


  test("streaming DSIR scorer equals the batch weights on the same docs") {
    val dir = "/root/testdata/sf0.001"
    val (model, default) = graft.ops.QualityModel.dsirModel(spark, dir)
    assert(model.nonEmpty && model.size <= graft.ops.QualityModel.DsirBuckets)
    val batch = graft.ops.QualityModel.dsirWeights(spark, dir)
      .select("doc_id", "dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => TestDoc(r.getLong(0), t((r.getLong(0) % 50).toInt), r.getString(1)))
    val input = MemoryStream[TestDoc](spark)
    val (first, second) = docs.splitAt(docs.length / 2)
    input.addData(first)
    val q = DocStreams.dsirScored(input.toDF(), model, default)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    input.addData(second)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dsir_out")
      .select("doc_id", "dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.keySet == batch.keySet)
    // identical md5 buckets; the HOF left fold vs the aggregate SUM may
    // reassociate, so compare within a ulp-scale envelope of the rounding
    for ((id, w) <- batch)
      assert(math.abs(streamed(id) - w) <= 1e-4 + 1e-12, s"doc $id: ${streamed(id)} vs $w")
    assert(batch.nonEmpty)

    // the selection gate actually selects: a strictly positive threshold
    // keeps a strict, non-empty subset on this corpus
    val kept = DocStreams.dsirScored(
      graft.ops.Tables(spark, dir, "documents")
        .select(col("doc_id"), current_timestamp().as("ts"), col("text")),
      model, default, minWeight = 0.0).count()
    assert(kept > 0 && kept < batch.size)
  }

  test("hash-Bernoulli sampling filter is batch-stream identical (stateless)") {
    // the deterministic md5-draw sampler is a pure per-row filter, so the
    // SAME rows must survive whether the corpus arrives as a table or as a
    // stream — the property that makes hash-based splits safe to apply at
    // ingest time rather than in a later batch pass
    val seed = 42L
    val draw = substring(
      md5(concat(lit(s"$seed:"), col("doc_id").cast("string")).cast("binary")), 1, 4)
    val keep = draw < lit("8000") // fraction 0.5
    val docs = (1L to 200L).map(i => TestDoc(i, t((i % 50).toInt), s"doc number $i"))

    val batchKept = docs.toDF().filter(keep)
      .select("doc_id").as[Long].collect().toSet

    val input = MemoryStream[TestDoc](spark)
    input.addData(docs: _*)
    val q = input.toDF().filter(keep)
      .select("doc_id")
      .writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val streamKept = spark.table("sample_out").as[Long].collect().toSet

    assert(batchKept == streamKept)
    assert(batchKept.nonEmpty && batchKept.size < docs.size)
  }

  test("streaming near-dup against the static band index equals the batch incremental restriction") {
    import graft.ops.{Dedup, Tables}
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val isIncoming = col("doc_id") % 10 >= 8
    // static index over the history partition — the batch-built artifact
    val histBands = Dedup.bandIndex(docs.filter(!isIncoming)).persist()
    val histShingles = Dedup.shingleIndex(docs.filter(!isIncoming)).persist()
    // the batch truth: incrementalNearDup over the same split
    val expected = Dedup.incrementalNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // stream the incoming partition in TWO micro-batches (the index must
    // serve candidates across batch boundaries without streaming state)
    val incoming = docs.filter(isIncoming).collect()
      .map(r => TestDoc(r.getLong(0), t((r.getLong(0) % 50).toInt), r.getString(1)))
    val (b1, b2) = incoming.splitAt(incoming.length / 2)
    val input = MemoryStream[TestDoc](spark)
    val q = DocStreams.nearDupAgainstIndex(input.toDF(), histBands, histShingles)
      .writeStream.format("memory").queryName("inc_near_dup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("inc_near_dup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"stream-static near-dup diverged from batch: extra=${got -- expected}, missing=${expected -- got}")
    assert(got.nonEmpty, "fixture produced no near-dup pairs — spec is vacuous")
  }

  test("streaming refresh: micro-batches equal sequential batch refreshes AND one full rebuild") {
    import graft.ops.CorpusRefresh
    // curated history (ids precede the batches), then two ingest batches —
    // the CorpusRefreshSpec planting, split across micro-batches so batch 2
    // must near-dup against batch 1's LANDED doc through the grown store
    val histText = Seq(
      "the museum curator arranged ancient pottery along marble shelves " +
        "while visitors studied each label with genuine curiosity tonight",
      "the lighthouse keeper climbed seventy iron steps before dawn and " +
        "polished every lens until ships could trust the beam tonight",
      "the orchestra rehearsed a difficult passage until the strings and " +
        "brass finally agreed about tempo near the ninth measure",
      "the botanist catalogued rare ferns growing beside volcanic springs " +
        "and pressed samples carefully between sheets of waxed paper",
      "the carpenter measured oak planks twice before cutting joints for " +
        "a staircase that would spiral gently toward the attic",
      "the astronomer tracked a faint comet across winter skies and " +
        "logged its position against familiar constellations every evening",
      "the baker proofed sourdough loaves overnight then scored patterns " +
        "into the crust so steam could escape during the morning bake",
      "the cartographer traced river bends onto vellum and shaded the " +
        "foothills until the whole valley seemed to rise from the page")
    val history = (40L to 47L).zip(histText).map { case (id, t) => RefreshDoc(id, "srcA", t) }
    val b1 = Seq(
      // 48 % 40 = 8 → URL key 47 claimed by history → url_dup
      RefreshDoc(48, "srcB", "the gardener pruned climbing roses along the brick wall " +
        "and watered each bed before the sun grew too strong"),
      RefreshDoc(49, "srcB", histText(1).replace("tonight", "today")), // near_dup vs base
      RefreshDoc(58, "srcB", "tiny doc indeed"),                       // quality_too_short
      // 89: own URL key, quality-passing → LANDS, growing the store
      RefreshDoc(89, "srcB", "the fresh unique meadow text about planting orchards " +
        "with the family every spring morning while birds sing loudly"))
    val b2 = Seq(
      // near-copy of BATCH-1's landed doc 89 (id-ordered: 98 > 89) — only
      // the grown store can catch it
      RefreshDoc(98, "srcB", "the fresh unique meadow text about planting orchards " +
        "with the family every spring morning while birds sing loud"),
      RefreshDoc(108, "srcB", "the third unique essay concerning rivers that bend " +
        "through the valley and the bridges people build across them"))
    val root = java.nio.file.Files.createTempDirectory("graft-refresh-serve").toFile
    val (art, out, ckpt) = (s"$root/art", s"$root/out", s"$root/ckpt")
    val histDf = history.toDF()
    DocStreams.writeRefreshArtifacts(histDf, art)
    val input = MemoryStream[RefreshDoc](spark)
    input.addData(b1)
    val q = DocStreams.refreshServe(spark, input.toDF(), art, out, ckpt)
    q.processAllAvailable()
    input.addData(b2)
    q.processAllAvailable()
    q.stop()
    def fates(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    val streamed = fates(Sinks.readSink(spark, out)
      .select("doc_id", "fate", "shard").collect())
    // (a) equals the SEQUENTIAL batch refreshes, batch 2 against the grown
    // history (base + batch 1's landed docs in curated/scrubbed form)
    val seq1 = CorpusRefresh.refreshOf(histDf, b1.toDF()).collect()
    val landed1Ids = seq1.filter(_.getString(1) == "landed").map(_.getLong(0)).toSet
    val grown = histDf.unionAll(b1.toDF()
      .filter(col("doc_id").isin(landed1Ids.toSeq: _*))
      .select(col("doc_id"), col("source"),
        graft.ops.Corpus.scrubbed(col("text")).as("text")))
    val seq2 = CorpusRefresh.refreshOf(grown, b2.toDF()).collect()
    val sequential = fates(seq1.map(r => org.apache.spark.sql.Row(
        r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getInt(2)))
      ++ seq2.map(r => org.apache.spark.sql.Row(
        r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getInt(2))))
    assert(streamed == sequential,
      s"stream $streamed != sequential batch refreshes $sequential")
    // (b) equals one FULL REBUILD over base ∪ both batches (fate + shard;
    // pack bins are per-refresh artifacts by contract) — the composability
    // of the refresh ≡ rebuild theorem across micro-batches
    val rebuild = fates(CorpusRefresh.refreshOf(
        histDf.limit(0), (history ++ b1 ++ b2).toDF()).collect()
      .filter(r => (b1 ++ b2).exists(_.doc_id == r.getLong(0)))
      .map(r => org.apache.spark.sql.Row(
        r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getInt(2))))
    assert(streamed == rebuild, s"stream $streamed != full rebuild $rebuild")
    // the cross-micro-batch near-dup actually fired, and the store grew
    assert(streamed(89L)._1 == "landed", "batch-1's clean doc must land")
    assert(streamed(98L)._1 == "near_dup",
      "batch-2 near-copy of batch-1's landed doc must be caught via the grown store")
  }
}
