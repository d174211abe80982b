package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TimeSeries

/** Streaming CUSUM changepoint monitor —
  * [[graft.ops.TimeSeries.cusumChangepoints]] kept live against an ingest
  * stream, the [[DriftStreams]] discipline applied to the volume monitor:
  * the per-type baseline MOMENTS (k_b, S_b, S₂_b, cut) are frozen once as
  * a written parquet table, the live (type, day) count frame — mergeable
  * by addition — folds under the versioned-MV exactly-once contract, and
  * the alarm readout reuses the batch decision rule VERBATIM
  * ([[TimeSeries.cusumAlarms]]), so the streamed alarm set is
  * definitionally the batch metric on the ingested prefix.
  *
  * Scale shape: per-batch work is one hash aggregate over the batch into
  * ≤ |types|×|days| rows; state is calendar-bounded, never stream-sized;
  * the readout runs two windows over that bounded frame.
  */
object MonitorStreams {

  private def versionsIn(dir: String): Seq[Long] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
      .map(_.getName.stripPrefix("version=").toLong)

  /** Freeze the CUSUM baseline of an events-shaped frame (typically the
    * first weeks of history at deploy time). */
  def writeBaseline(ev: DataFrame, baselineDir: String): Unit =
    TimeSeries.cusumBaseline(TimeSeries.dailyTypeCounts(ev))
      .write.mode("overwrite").parquet(baselineDir)

  /** Per-batch fold: add this batch's (type, day) counts into the stored
    * live frame, write `version=N`, prune. Replaying a batch id
    * overwrites its own version — idempotent under restart. */
  def foldBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = versionsIn(stateDir).filter(_ < batchId).sorted.lastOption
    val delta = TimeSeries.dailyTypeCounts(batch)
      .select(col("event_type"), col("day"), col("n").as("dn"))
    val merged = prev match {
      case Some(v) =>
        spark.read.parquet(s"$stateDir/version=$v")
          .select(col("event_type"), col("day"), col("n").as("on"))
          .join(delta, Seq("event_type", "day"), "full_outer")
          .select(col("event_type"), col("day"),
            (coalesce(col("on"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
      case None => delta.select(col("event_type"), col("day"), col("dn").as("n"))
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/version=$batchId")
    for (p <- prev; v <- versionsIn(stateDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$stateDir/version=$v")
  }

  /** Current alarm set: the batch decision rule over the live daily frame
    * against the frozen baseline. */
  def currentAlarms(spark: SparkSession, stateDir: String,
      baselineDir: String): DataFrame =
    TimeSeries.cusumAlarms(
      spark.read.parquet(s"$stateDir/version=${versionsIn(stateDir).max}"),
      spark.read.parquet(baselineDir))

  /** Start the monitor on a raw event stream. */
  def maintainVolume(
      events: DataFrame, stateDir: String, ckpt: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, stateDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

  // ---- streaming skyline: the Pareto frontier kept live ----

  /** Per-batch fold for the skyline monitor: per-day minima are mergeable
    * by MIN, so the live (day, price) frame folds exactly like the CUSUM
    * daily counts fold above — versioned, idempotent under replay. */
  def foldSkylineBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = versionsIn(stateDir).filter(_ < batchId).sorted.lastOption
    val delta = graft.ops.Analytics.dailyMinPrice(batch)
      .select(col("day"), col("price").as("dp"))
    val merged = prev match {
      case Some(v) =>
        spark.read.parquet(s"$stateDir/version=$v")
          .select(col("day"), col("price").as("op"))
          .join(delta, Seq("day"), "full_outer")
          .select(col("day"),
            least(coalesce(col("op"), col("dp")),
              coalesce(col("dp"), col("op"))).as("price"))
      case None => delta.select(col("day"), col("dp").as("price"))
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/version=$batchId")
    for (p <- prev; v <- versionsIn(stateDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$stateDir/version=$v")
  }

  /** Current Pareto frontier over everything ingested — the batch
    * frontier filter ([[graft.ops.Analytics.frontierOf]]) VERBATIM on the
    * live calendar-bounded state. Note the frontier itself is NOT
    * monotone under ingest (a new cheap-and-new point can evict older
    * members) — which is exactly why the STATE is the per-day minima
    * (mergeable, monotone under MIN) and the frontier is a readout. */
  def currentFrontier(spark: SparkSession, stateDir: String): DataFrame =
    graft.ops.Analytics.frontierOf(
      spark.read.parquet(s"$stateDir/version=${versionsIn(stateDir).max}"))

  /** Start the skyline monitor on an orders-shaped stream. */
  def maintainFrontier(
      orders: DataFrame, stateDir: String, ckpt: String): StreamingQuery =
    orders.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldSkylineBatch(batch.toDF(), batchId, stateDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

  // ---- streaming ingest-integrity monitor: live anti-entropy ----

  /** Per-batch fold for the integrity monitor: per-bucket (count,
    * checksum) pairs are BOTH additive, so the live state folds by plain
    * addition — the cheapest mergeable state in the monitor family. */
  def foldChecksumBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = versionsIn(stateDir).filter(_ < batchId).sorted.lastOption
    val delta = graft.ops.TableChecks.bucketSums(batch, "dn", "dc")
    val merged = prev match {
      case Some(v) =>
        spark.read.parquet(s"$stateDir/version=$v")
          .select(col("bucket"), col("n").as("on"), col("c").as("oc"))
          .join(delta, Seq("bucket"), "full_outer")
          .select(col("bucket"),
            (coalesce(col("on"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("oc"), lit(0L).cast("decimal(38,0)")) +
              coalesce(col("dc"), lit(0L).cast("decimal(38,0)"))).as("c"))
      case None => delta.select(col("bucket"), col("dn").as("n"), col("dc").as("c"))
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/version=$batchId")
    for (p <- prev; v <- versionsIn(stateDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$stateDir/version=$v")
  }

  /** Divergent buckets between what has been INGESTED and a reference
    * table — the live anti-entropy readout: an empty result certifies the
    * ingested prefix bucket-for-bucket; a non-empty one localizes exactly
    * where a row was lost, duplicated, or corrupted. Reuses the batch
    * [[graft.ops.TableChecks.bucketDiffOf]] verbatim. */
  def currentIntegrityDiff(spark: SparkSession, stateDir: String,
      reference: DataFrame): DataFrame =
    graft.ops.TableChecks.bucketDiffOf(
      graft.ops.TableChecks.bucketSums(reference, "n_a", "c_a"),
      spark.read.parquet(s"$stateDir/version=${versionsIn(stateDir).max}")
        .select(col("bucket"), col("n").as("n_b"), col("c").as("c_b")))

  /** Start the integrity monitor on an orders-shaped ingest stream. */
  def maintainIntegrity(
      orders: DataFrame, stateDir: String, ckpt: String): StreamingQuery =
    orders.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldChecksumBatch(batch.toDF(), batchId, stateDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
}
