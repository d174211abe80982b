package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Similarity, Tables}

/** Stream-static ANN serving parity: micro-batches of query vectors through
  * [[VectorStreams.adcServe]] must reproduce the batch `pq_adc_topk` result
  * for the same query ids — same fitted codebooks, same coded corpus, same
  * scoring tail (shared code, but the spec pins the composition end to
  * end: LUT build under foreachBatch, broadcast, sink write). Two batches
  * prove the static index survives across micro-batches.
  */
class VectorStreamsSpec extends SparkSuite {
  import spark.implicits._

  test("micro-batched ADC serving equals the batch PQ scan per query id") {
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-vec-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")

    val corpus = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = corpus.filter(col("vec_id") % 50 === 0)
      .select("vec_id").as[Long].collect().sorted.take(3)
    assert(qIds.length == 3, "need three query vectors in the smoke corpus")
    val qVecs = corpus.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")

    // batch 0: two queries; batch 1: the third — the coded corpus persists
    // across both micro-batches
    mem.addData((qIds(0), qVecs(qIds(0))), (qIds(1), qVecs(qIds(1))))
    val q = VectorStreams.adcServe(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData((qIds(2), qVecs(qIds(2))))
    q.processAllAvailable()
    q.stop()

    val served = Sinks.readSink(spark, out)
      .select("q_id", "n_id", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val batch = Similarity.pqAdcTopK(spark, dir)
      .filter(col("q_id").isin(qIds: _*))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served == batch,
      s"stream-served ADC diverged from batch: ${(served diff batch).take(5)} / ${(batch diff served).take(5)}")
  }
}
