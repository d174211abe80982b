package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Similarity, Tables, TextAnalysis}

/** Stream-static lexical + hybrid serving parity: micro-batches of query
  * texts through [[TextStreams.bm25Serve]] must reproduce the batch
  * [[TextAnalysis.bm25TopKFor]] result for the same queries, and
  * [[TextStreams.hybridServe]] must reproduce the batch RRF fusion of its
  * two legs. The scoring cores are shared code; the specs pin the
  * composition (index build + persist, per-batch broadcast, sink write)
  * end to end, across micro-batch boundaries.
  */
class TextStreamsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("micro-batched BM25 serving equals the batch user-query API") {
    val root = Files.createTempDirectory("graft-bm25-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    val docs = Tables(spark, dir, "documents")
    val qs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).take(3)

    val mem = MemoryStream[(Long, String)](spark)
    val stream = mem.toDF().toDF("q_id", "text")
    mem.addData(qs(0), qs(1))
    val q = TextStreams.bm25Serve(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData(qs(2)) // second micro-batch: the cached index survives
    q.processAllAvailable()
    q.stop()

    val served = Sinks.readSink(spark, out)
      .select("q_id", "doc_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val batch = TextAnalysis.bm25TopKFor(docs, qs.toSeq.toDF("q_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served == batch,
      s"stream-served BM25 diverged from batch: ${(served diff batch).take(5)} / ${(batch diff served).take(5)}")
  }

  test("micro-batched hybrid serving equals the batch RRF fusion of both legs") {
    val root = Files.createTempDirectory("graft-hybrid-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")
    val docs = Tables(spark, dir, "documents")
    val corpus = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // the testdata's parallel id space: doc_id and vec_id coincide, so a
    // query document carries both its text and its embedding
    val qs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(corpus.select(col("vec_id").as("q_id"), col("v")), Seq("q_id"))
      .as[(Long, String, Seq[Double])].collect().sortBy(_._1).take(3)

    val mem = MemoryStream[(Long, String, Seq[Double])](spark)
    val stream = mem.toDF().toDF("q_id", "text", "v")
    mem.addData(qs(0))
    val q = TextStreams.hybridServe(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData(qs(1), qs(2))
    q.processAllAvailable()
    q.stop()

    val served = Sinks.readSink(spark, out)
      .select("q_id", "doc_id", "rank", "rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    // batch expectation: same legs, same fusion, over all three queries
    val tf = docs
      .select(col("doc_id"), explode(graft.ops.Dedup.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val books = Similarity.fitPqFrom(corpus, Similarity.PqM, Similarity.PqKs)
    val codes = Similarity.assignCodes(corpus, books, Seq("vec_id"))
    val qdf = qs.toSeq.toDF("q_id", "text", "v")
    val sparse = TextAnalysis.bm25Against(tf, qdf.select(col("q_id"), col("text")))
      .select(col("q_id"), col("doc_id"), col("rank").as("r_sparse"))
    val dense = Similarity
      .adcTopKAgainst(codes, qdf.select(col("q_id"), col("v").as("q_v")), books, 10)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank").as("r_dense"))
    val expected = Similarity.fuseRrf(sparse, dense, 10, 60).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served == expected,
      s"stream-served hybrid diverged from batch fusion: ${(served diff expected).take(5)} / ${(expected diff served).take(5)}")
  }

  test("streaming percolator alerts equal the batch fired pairs; replay idempotent") {
    val root = Files.createTempDirectory("graft-percolate").toFile
    val (qdir, out, ckpt) = (s"$root/queries", s"$root/alerts", s"$root/ckpt")
    val corpus = Tables(spark, dir, "documents")
    TextStreams.writeQuerySet(spark, corpus, qdir)

    val docs = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val q = TextStreams.percolateServe(
      input.toDF().toDF("doc_id", "text"), qdir, out, ckpt)
    for (c <- docs.grouped((docs.length + 2) / 3)) {
      input.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val served = Sinks.readSink(spark, out).select("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = TextAnalysis.firedPairs(
        TextAnalysis.docTokens(corpus),
        spark.read.parquet(qdir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && served == want,
      "streamed alert log must equal the batch predicate")
    // replaying a batch overwrites its own partition — alert set unchanged
    val replay = corpus.limit(50).toDF()
    Sinks.idempotentBatchWrite(TextAnalysis.firedPairs(
      TextAnalysis.docTokens(replay), spark.read.parquet(qdir)), 0, out)
    Sinks.idempotentBatchWrite(TextAnalysis.firedPairs(
      TextAnalysis.docTokens(replay), spark.read.parquet(qdir)), 0, out)
    val after = Sinks.readSink(spark, out).select("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.subsetOf(want), "replay introduced alerts outside the predicate")
  }

  test("incremental BM25 serve refreshes exactly onto the grown live corpus") {
    val src = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-bm25-incr").toFile
    val cdir = s"$root/corpus"
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")

    val orig = spark.read.parquet(s"$src/documents.parquet")
    orig.write.parquet(s"$cdir/documents.parquet")
    val shift = orig.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val qRows = Tables(spark, src, "documents")
      .filter(col("doc_id") % 50 === 0).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).take(2)

    val mem = MemoryStream[(Long, String)](spark)
    mem.addData(qRows(0))
    val q = TextStreams.bm25ServeIncremental(spark, cdir,
      mem.toDF().toDF("q_id", "text"), out, ckpt, k = 10, refreshEvery = 1L)
    q.processAllAvailable()
    // live table grows: shifted exact twins in a disjoint id range
    orig.withColumn("doc_id", col("doc_id") + shift)
      .write.mode("append").parquet(s"$cdir/documents.parquet")
    mem.addData(qRows(1))
    q.processAllAvailable()
    q.stop()

    val afterRefresh = Sinks.readSink(spark, out)
      .filter(col("batch_id") === 1)
      .select("q_id", "doc_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterRefresh.exists(_._2 >= shift),
      "post-refresh top-k never surfaced an appended doc — index did not grow")
    // exactness: equals a from-scratch ranking over the grown corpus
    import spark.implicits._
    val grown = spark.read.parquet(s"$cdir/documents.parquet")
      .select("doc_id", "text")
    val expected = graft.ops.TextAnalysis.bm25TopKFor(grown,
        Seq(qRows(1)).toDF("q_id", "text"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(afterRefresh == expected,
      s"incremental BM25 diverged from the grown-corpus ranking: " +
        s"${(afterRefresh diff expected).take(5)} / ${(expected diff afterRefresh).take(5)}")
  }

  test("streaming boolean percolator equals the batch k-AND-NOT predicate") {
    val root = Files.createTempDirectory("graft-percolate-bool").toFile
    val (qdir, out, ckpt) = (s"$root/queries", s"$root/alerts", s"$root/ckpt")
    val corpus = Tables(spark, dir, "documents")
    TextStreams.writeBoolQuerySet(spark, corpus, qdir)

    val docs = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val q = TextStreams.percolateBoolServe(
      input.toDF().toDF("doc_id", "text"), qdir, out, ckpt)
    for (c <- docs.grouped((docs.length + 2) / 3)) {
      input.addData(c.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val served = Sinks.readSink(spark, out).select("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = TextAnalysis.firedBoolPairs(
        TextAnalysis.docTokens(corpus),
        spark.read.parquet(qdir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && served == want,
      "streamed boolean alert log must equal the batch k-AND-NOT predicate")
  }
}
