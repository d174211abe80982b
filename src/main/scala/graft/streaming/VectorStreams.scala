package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Similarity, Tables}

/** Stream-static ANN serving — the ingest-side twin of the batch PQ
  * family: an unbounded stream of query vectors scores against a STATIC
  * PQ-coded corpus with the exact scoring tail the batch `pq_adc_topk`
  * plans ([[Similarity.adcTopKAgainst]] is literally shared, so
  * stream/batch parity is structural, not re-implemented).
  *
  * `foreachBatch` is the right host, not a streaming window: per-query
  * top-k ranking is a window function, which Structured Streaming cannot
  * express on an unbounded frame in append mode — but each micro-batch is
  * a CLOSED query set, so the batch plan applies verbatim per batch. The
  * results land through [[Sinks.idempotentBatchWrite]], so the serving log
  * inherits the exactly-once-under-replay contract.
  *
  * Scale shape: the coded corpus (8 bytes/vector) is persisted once and
  * re-scanned per micro-batch; the query batch collapses to (id, LUT)
  * before its broadcast. At 1000 executors each micro-batch is one
  * shuffle-free pass over the code table.
  */
object VectorStreams {

  /** Start serving `queryStream` (schema: `vec_id long, v array<double>`)
    * against the embeddings table of `dir`. Output per batch: the ADC
    * top-k per query, written to `outDir/batch_id=N`.
    */
  def adcServe(
      spark: SparkSession,
      dir: String,
      queryStream: DataFrame,
      outDir: String,
      ckpt: String,
      k: Int = 10): StreamingQuery = {
    val books = Similarity.fitPq(spark, dir, Similarity.PqM, Similarity.PqKs)
    val corpus = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // The static index artifact, built+persisted ONCE for the query's
    // lifetime — micro-batches re-scan the cached codes, not the parquet.
    val codes = Similarity.assignCodes(corpus, books, Seq("vec_id")).persist()
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val queries = batch.select(col("vec_id").as("q_id"), col("v").as("q_v"))
        Sinks.idempotentBatchWrite(
          Similarity.adcTopKAgainst(codes, queries, books, k), batchId, outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
  }
}
