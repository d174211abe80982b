package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Exactly-once file-sink contract for streams that must survive batch
  * REPLAY, not just restart.
  *
  * Spark's checkpoint gives at-least-once delivery into `foreachBatch`: a
  * micro-batch whose sink write finished but whose commit marker
  * (`checkpoint/commits/N`) was never written — the crash window every
  * at-least-once system has — is re-executed on restart with the SAME
  * `batchId` and the SAME input offsets. Exactly-once therefore has to come
  * from the sink being IDEMPOTENT under that replay. The standard contract
  * (documented in the Structured Streaming guide's foreachBatch section) is
  * deterministic overwrite keyed by `batchId`:
  *
  *   - each batch writes to its own partition directory `batch_id=N`,
  *     `mode("overwrite")` — a replay of batch N rewrites the identical
  *     directory instead of appending a duplicate copy;
  *   - replayed output is byte-identical because the offset log pins the
  *     batch's input slice and the state store recovers to its pre-batch
  *     version before re-execution;
  *   - readers see the union of committed batch directories via ordinary
  *     partition discovery (`batch_id` becomes a partition column).
  *
  * Scale shape: this is driver-light — one directory rename per batch — and
  * the per-batch write is a normal distributed parquet write; nothing here
  * serializes through the driver. The built-in parquet sink gets the same
  * guarantee from its sink-side commit log, but cannot express upserts,
  * merges, or multi-table writes; `foreachBatch` + idempotent write is the
  * pattern that generalizes (and what Delta/Iceberg `txnAppId`/`txnVersion`
  * formalize).
  */
object Sinks {

  /** The idempotent per-batch write: deterministic overwrite of this
    * batch's own partition directory. Empty batches write an empty
    * directory — deliberately unguarded: an `isEmpty` probe would be a
    * SECOND action on the unpersisted batch Dataset, re-executing the
    * whole micro-batch plan (and re-loading the state store) once per
    * batch, and overwriting `batch_id=N` with the same emptiness is just
    * as idempotent as skipping it.
    */
  def idempotentBatchWrite(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Start `df` (a streaming DataFrame) into the exactly-once parquet sink:
    * `foreachBatch` + [[idempotentBatchWrite]] under `ckpt`.
    */
  def exactlyOnceParquet(
      df: DataFrame,
      outDir: String,
      ckpt: String,
      outputMode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        idempotentBatchWrite(batch, batchId, outDir))
      .option("checkpointLocation", ckpt)
      .outputMode(outputMode)
      .start()

  /** Read everything the sink has written: partition discovery over the
    * `batch_id=N` directories (adds the `batch_id` partition column).
    */
  def readSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)
}
