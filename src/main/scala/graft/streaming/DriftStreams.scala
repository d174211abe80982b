package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TableChecks

/** Streaming PSI drift monitor — [[graft.ops.TableChecks.psiDrift]] kept
  * live against an ingest stream: the BASELINE bucket histogram is frozen
  * once as a written parquet table (the index-is-a-table contract — a
  * monitoring baseline must survive restarts and be shared across jobs),
  * and the CURRENT-period histogram is per-(column, bucket) integer counts
  * — mergeable by addition — folded under the [[ViewStreams]] versioned-MV
  * exactly-once contract. Serving joins frozen vs live histograms and
  * reuses the batch PSI rollup verbatim, so the streamed readout is
  * DEFINITIONALLY the batch metric, not an approximation of it.
  *
  * Scale shape: per-batch work is one hash aggregate over the batch into
  * ≤ |buckets| rows; state is bucket-domain-sized (not stream-sized); the
  * readout is bounded arithmetic.
  */
object DriftStreams {

  private def versionsIn(dir: String): Seq[Long] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
      .map(_.getName.stripPrefix("version=").toLong)

  /** Freeze the baseline histogram of an events-shaped frame. */
  def writeBaseline(ev: DataFrame, baselineDir: String): Unit =
    TableChecks.bucketCounts(ev)
      .select(col("col_name"), col("bucket"), col("c").as("ce"))
      .write.mode("overwrite").parquet(baselineDir)

  /** Per-batch fold: add this batch's bucket counts into the stored
    * current-period histogram, write `version=N`, prune. */
  def foldBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = versionsIn(stateDir).filter(_ < batchId).sorted.lastOption
    val delta = TableChecks.bucketCounts(batch)
      .select(col("col_name"), col("bucket"), col("c").as("dc"))
    val merged = prev match {
      case Some(v) =>
        spark.read.parquet(s"$stateDir/version=$v")
          .select(col("col_name"), col("bucket"), col("c").as("oc"))
          .join(delta, Seq("col_name", "bucket"), "full_outer")
          .select(col("col_name"), col("bucket"),
            (coalesce(col("oc"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))
      case None => delta.select(col("col_name"), col("bucket"), col("dc").as("c"))
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/version=$batchId")
    for (p <- prev; v <- versionsIn(stateDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$stateDir/version=$v")
  }

  /** PSI of the live histogram against the frozen baseline — buckets seen
    * on only one side carry zero on the other (Laplace smoothing in the
    * rollup keeps every term finite). */
  def currentPsi(spark: SparkSession, stateDir: String,
      baselineDir: String): DataFrame = {
    val live = spark.read.parquet(s"$stateDir/version=${versionsIn(stateDir).max}")
      .select(col("col_name"), col("bucket"), col("c").as("ca"))
    val base = spark.read.parquet(baselineDir)
    val cells = base.join(live, Seq("col_name", "bucket"), "full_outer")
      .select(col("col_name"), col("bucket"),
        coalesce(col("ce"), lit(0L)).as("ce"),
        coalesce(col("ca"), lit(0L)).as("ca"))
    TableChecks.psiOfCells(cells)
  }

  /** Start the monitor on a raw event stream. */
  def maintainDrift(
      events: DataFrame, stateDir: String, ckpt: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, stateDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
}
