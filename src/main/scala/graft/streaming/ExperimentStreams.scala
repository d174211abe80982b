package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Experiment

/** Streaming experiment readout — the [[ViewStreams]] versioned-MV
  * contract applied to A/B analysis: the per-user (arm, x, y) sufficient
  * statistics of [[graft.ops.Experiment]] are MERGEABLE (decimal sums add),
  * so each micro-batch folds its per-user deltas into the stored frame and
  * the 2-row CUPED readout is re-served from state — an always-current
  * experiment dashboard that never rescans the event history.
  *
  * Exactly-once: identical to [[ViewStreams.foldBatch]] — batch N writes
  * `version=N` = merge(latest version < N, delta(batch N)); an
  * at-least-once replay of batch N re-reads the same predecessor and
  * overwrites byte-identically. Storage is O(users), bounded to two
  * versions.
  *
  * Scale shape: the per-batch delta is one hash aggregate over the batch;
  * the merge is one full-outer join keyed by user_id (state-store-sized,
  * not history-sized); the readout is [[Experiment.readoutFrom]]'s
  * scalar-combine over the state table.
  */
object ExperimentStreams {

  private def versionsIn(dir: String): Seq[Long] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
      .map(_.getName.stripPrefix("version=").toLong)

  /** Per-batch fold: merge the predecessor state with this batch's
    * per-user deltas, write `version=N`, prune older snapshots. */
  def foldBatch(batch: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = versionsIn(stateDir).filter(_ < batchId).sorted.lastOption
    val delta = Experiment.perUser(batch)
    val merged = prev match {
      case Some(v) =>
        val old = spark.read.parquet(s"$stateDir/version=$v")
        old.select(col("user_id"), col("x").as("ox"), col("y").as("oy"))
          .join(delta.select(col("user_id"), col("x").as("dx"),
            col("y").as("dy"), col("arm").as("darm")), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            // cast pins the state schema across folds (decimal addition
            // would otherwise grow precision every version)
            (coalesce(col("ox"), expr("cast(0.00 as decimal(15,2))"))
              + coalesce(col("dx"), expr("cast(0.00 as decimal(15,2))")))
              .cast("decimal(25,2)").as("x"),
            (coalesce(col("oy"), expr("cast(0.00 as decimal(15,2))"))
              + coalesce(col("dy"), expr("cast(0.00 as decimal(15,2))")))
              .cast("decimal(25,2)").as("y"))
          // arm is a pure function of user_id — recompute, never store stale
          .withColumn("arm",
            when(substring(md5(concat(lit(Experiment.AbSeed), lit(":"),
              col("user_id").cast("string")).cast("binary")), 1, 1)
              .between("0", "7"), "control").otherwise("treatment"))
      case None => delta
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/version=$batchId")
    for (p <- prev; v <- versionsIn(stateDir) if v < p)
      graft.ops.IncrementalIndex.deleteDir(s"$stateDir/version=$v")
  }

  /** The CUPED readout as of the latest committed state version. */
  def currentReadout(spark: SparkSession, stateDir: String): DataFrame =
    Experiment.readoutFrom(
      spark.read.parquet(s"$stateDir/version=${versionsIn(stateDir).max}"))

  /** Start the maintainer on a raw event stream. */
  def maintainReadout(
      events: DataFrame, stateDir: String, ckpt: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, stateDir))
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
}
