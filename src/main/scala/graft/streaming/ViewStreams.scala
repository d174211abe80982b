package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.IncrementalAgg

/** Streaming materialized-view maintenance — [[graft.ops.IncrementalAgg]]'s
  * merge contract applied at ingest: each micro-batch of raw order rows
  * folds into the stored per-customer view, so the view is always one
  * batch behind the stream head and NO refresh ever rescans history.
  *
  * Exactly-once comes from VERSIONED snapshots, not an in-place upsert:
  * batch N writes `version=N` computed as merge(latest version < N,
  * state(batch N)). Under at-least-once replay (the [[Sinks]] crash
  * window) a re-executed batch N re-reads the SAME predecessor — versions
  * ≥ N are ignored by construction — and overwrites `version=N` with
  * byte-identical content. This is the MV twin of the
  * `batch_id=N`-overwrite contract, with the version chain standing in
  * for partition independence (each version depends on its predecessor,
  * so the predecessor must stay addressable until the successor commits).
  *
  * Retention: after version N lands, snapshots older than its direct
  * predecessor are deleted — the directory holds at most two versions,
  * so view storage is O(keys), not O(keys × batches).
  */
object ViewStreams {

  private def versionsIn(viewDir: String): Seq[Long] =
    Option(new java.io.File(viewDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
      .map(_.getName.stripPrefix("version=").toLong)

  /** The per-batch fold, exposed for specs: merge the latest snapshot
    * strictly below `batchId` with this batch's state, write `version=N`,
    * prune older snapshots. */
  def foldBatch(batch: DataFrame, batchId: Long, viewDir: String): Unit = {
    val spark = batch.sparkSession
    val prevVersion = versionsIn(viewDir).filter(_ < batchId).sorted.lastOption
    val batchState = IncrementalAgg.state(batch)
    val merged = prevVersion match {
      case Some(v) =>
        IncrementalAgg.mergeStates(
          spark.read.parquet(s"$viewDir/version=$v"), batchState)
      case None => batchState
    }
    merged.write.mode("overwrite").parquet(s"$viewDir/version=$batchId")
    // prune strictly below the predecessor just consumed; with no
    // predecessor there is nothing safely deletable
    for (p <- prevVersion; v <- versionsIn(viewDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$viewDir/version=$v")
  }

  /** Read the view as of its latest committed version. */
  def currentView(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(s"$viewDir/version=${versionsIn(viewDir).max}")

  /** Start the maintainer on a raw order-row stream. */
  def maintainCustomerRevenue(
      orders: DataFrame, viewDir: String, ckpt: String): StreamingQuery =
    orders.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, viewDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
}
