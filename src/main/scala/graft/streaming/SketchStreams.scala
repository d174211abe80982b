package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TimeSeries

/** Streaming MERGEABLE-SKETCH view maintenance — rolling distinct counts
  * at ingest without per-user state: each micro-batch of raw events folds
  * into a stored per-(type, day) HLL sketch table, and the rolling 7-day
  * DAU serves from that calendar-sized view via the SHARED batch tail
  * ([[TimeSeries.rollingFromDailySketches]]).
  *
  * Why sketches and not `dropDuplicates` state: exact streaming distinct
  * keeps one state row PER USER per window — O(users) state that a
  * watermark must eventually evict, losing long-horizon windows. The HLL
  * view is O(types × days) REGARDLESS of user cardinality, never evicts,
  * and `hll_union_agg` is register-wise max — associative, commutative,
  * replay-idempotent — so the stream's estimates equal the batch query's
  * EXACTLY (spec-pinned), not just within the sketch envelope.
  *
  * Exactly-once: the [[ViewStreams]] versioned-snapshot contract verbatim
  * — batch N writes `version=N` = merge(latest version < N, sketches of
  * batch N); replayed batches re-read the same predecessor and overwrite
  * byte-identically; at most two versions are retained.
  */
object SketchStreams {

  private def versionsIn(viewDir: String): Seq[Long] =
    Option(new java.io.File(viewDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
      .map(_.getName.stripPrefix("version=").toLong)

  /** The per-batch fold, exposed for specs: union-merge the latest
    * snapshot strictly below `batchId` with this batch's daily sketches,
    * write `version=N`, prune older snapshots. */
  def foldBatch(batch: DataFrame, batchId: Long, viewDir: String): Unit = {
    val spark = batch.sparkSession
    val prevVersion = versionsIn(viewDir).filter(_ < batchId).sorted.lastOption
    val batchState = TimeSeries.dailySketches(batch)
    val merged = prevVersion match {
      case Some(v) =>
        spark.read.parquet(s"$viewDir/version=$v")
          .unionByName(batchState)
          .groupBy("event_type", "aday")
          .agg(hll_union_agg(col("sk")).as("sk"))
      case None => batchState
    }
    merged.write.mode("overwrite").parquet(s"$viewDir/version=$batchId")
    for (p <- prevVersion; v <- versionsIn(viewDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$viewDir/version=$v")
  }

  /** The stored daily-sketch view as of its latest committed version. */
  def currentView(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(s"$viewDir/version=${versionsIn(viewDir).max}")

  /** Rolling 7-day distinct estimates served from the stored view —
    * the batch tail over the streamed state. */
  def currentRolling(spark: SparkSession, viewDir: String): DataFrame =
    TimeSeries.rollingFromDailySketches(currentView(spark, viewDir))

  /** Start the maintainer on a raw event stream. */
  def maintainDau(events: DataFrame, viewDir: String, ckpt: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, viewDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

  // ---- bitmap twin: the EXACT mergeable view ----------------------------

  /** Per-batch fold for the SEGMENT-BITMAP view
    * ([[TimeSeries.rollingDau7dBitmap]]'s state): same versioned-snapshot
    * contract as [[foldBatch]], with `bit_or` as the merge. Where the HLL
    * view's batch/stream agreement is estimate-equality, the bitmap
    * view's is EXACT-count equality: OR idempotence absorbs replays, and
    * popcounts over the merged words equal the batch query on the full
    * corpus bit for bit (spec-pinned). State is O(types × days ×
    * ⌈|users|/32⌉) — the dense-ID regime; for sparse key spaces the HLL
    * twin is the right leg. */
  def foldBitmapBatch(batch: DataFrame, batchId: Long, viewDir: String): Unit = {
    val spark = batch.sparkSession
    val prevVersion = versionsIn(viewDir).filter(_ < batchId).sorted.lastOption
    val batchState = TimeSeries.dailyBitmapWords(batch)
    val merged = prevVersion match {
      case Some(v) =>
        spark.read.parquet(s"$viewDir/version=$v")
          .unionByName(batchState)
          .groupBy("event_type", "aday", "seg")
          .agg(expr("bit_or(w)").as("w"))
      case None => batchState
    }
    merged.write.mode("overwrite").parquet(s"$viewDir/version=$batchId")
    for (p <- prevVersion; v <- versionsIn(viewDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$viewDir/version=$v")
  }

  /** Rolling 7-day EXACT distinct served from the stored bitmap view. */
  def currentRollingBitmap(spark: SparkSession, viewDir: String): DataFrame =
    TimeSeries.rollingFromDailyWords(currentView(spark, viewDir))

  /** Start the exact-bitmap maintainer on a raw event stream. */
  def maintainDauBitmap(events: DataFrame, viewDir: String, ckpt: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldBitmapBatch(batch.toDF(), batchId, viewDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
}
