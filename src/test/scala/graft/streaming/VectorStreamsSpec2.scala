package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Similarity, Tables, TextAnalysis}

/** Stream-static MMR serving parity: micro-batches of query vectors
  * through [[VectorStreams.mmrServe]] must reproduce the batch
  * `mmr_rerank_topk` rows for the same query ids — the greedy selection
  * is per-query, so which micro-batch carries a query cannot change its
  * picks. Two batches pin that the serving plan (candidate checkpoint,
  * pairwise sims, fold) re-runs cleanly per micro-batch.
  */
class VectorStreamsSpec2 extends SparkSuite {
  import spark.implicits._

  test("micro-batched MMR serving equals the batch diversified re-rank per query id") {
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-mmr-serve").toFile
    val (out, ckpt) = (s"$root/out", s"$root/ckpt")

    val corpus = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val qIds = corpus.filter(col("vec_id") <= TextAnalysis.ServeBatchMaxId)
      .select("vec_id").as[Long].collect().sorted.take(4)
    assert(qIds.length == 4)
    val qVecs = corpus.filter(col("vec_id").isin(qIds: _*))
      .as[(Long, Seq[Double])].collect().toMap

    val mem = MemoryStream[(Long, Seq[Double])](spark)
    val stream = mem.toDF().toDF("vec_id", "v")
    mem.addData((qIds(0), qVecs(qIds(0))), (qIds(1), qVecs(qIds(1))))
    val q = VectorStreams.mmrServe(spark, dir, stream, out, ckpt)
    q.processAllAvailable()
    mem.addData((qIds(2), qVecs(qIds(2))), (qIds(3), qVecs(qIds(3))))
    q.processAllAvailable()
    q.stop()

    val served = Sinks.readSink(spark, out)
      .select("q_id", "rank", "n_id", "mmr").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Similarity.mmrRerankTopK(spark, dir)
      .filter(col("q_id").isin(qIds: _*))
      .select("q_id", "rank", "n_id", "mmr").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(served == batch,
      s"stream-served MMR diverged from batch: ${(served diff batch).take(5)} / ${(batch diff served).take(5)}")
  }
}
