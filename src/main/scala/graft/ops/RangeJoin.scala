package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join — the operator vanilla Spark has no physical
  * strategy for: `a.ts BETWEEN w.start AND w.end` alone plans a
  * BroadcastNestedLoopJoin (O(|events| × |windows|)). The scalable
  * formulation decomposes every interval into the fixed-width time BUCKETS
  * it covers, buckets each event once, equi-joins on the bucket, and
  * re-applies the exact range predicate as a post-filter:
  *
  *   windows ─ explode to (bucket, w) ─┐
  *                                     ├─ equi-join on bucket → filter(ts ∈ w)
  *   events ──── bucket = trunc(ts) ───┘
  *
  * Join cost drops to |events| + Σ(window span / bucket width) rows through
  * one hash exchange, and skew/AQE machinery applies because it IS a plain
  * equi-join. An event matches a window through exactly one bucket (its
  * own), so no dedup is needed. This is the standard bucketized range-join
  * rewrite (Databricks' range-join hint, Flink's interval join) expressed
  * in plain DataFrame ops.
  *
  * Demo tables: maintenance windows derived deterministically from the
  * events table itself — an 8-hour window opening at every observed hour
  * with `hour % 6 == 0` (windows overlap, so events can land in several) —
  * and the counts of each event type inside each window.
  */
object RangeJoin {

  val WindowHours = 8
  val BucketWidth = "1 hour"

  /** Deterministic overlapping maintenance windows from the events table. */
  private def windows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(hour(col("ts")) % 6 === 0)
      .select(date_trunc("hour", col("ts")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr(s"INTERVAL $WindowHours HOURS"))

  /** Per-(window, event_type) counts via the bucketized equi-join. */
  def eventsInWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("bucket", date_trunc("hour", col("ts")))
    val winBuckets = windows(spark, dir).select(
      col("w_start"), col("w_end"),
      explode(sequence(
        col("w_start"),
        col("w_end") - expr(s"INTERVAL $BucketWidth"),
        expr(s"INTERVAL $BucketWidth"))).as("bucket"))
    ev.join(winBuckets, Seq("bucket"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("w_start", "event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w_start"), "yyyy-MM-dd'T'HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
  }

  /** The naive non-equi formulation — O(n·m) nested loop, correctness
    * anchor only (the spec asserts it matches the bucketized join).
    */
  private[ops] def eventsInWindowsBrute(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.join(broadcast(windows(spark, dir)),
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("w_start", "event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w_start"), "yyyy-MM-dd'T'HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
  }

  val eventsInWindowsSql: String =
    s"""WITH wins AS (
       |  SELECT DISTINCT date_trunc('hour', ts) AS w_start
       |  FROM events WHERE extract(hour FROM ts) % 6 = 0)
       |SELECT strftime(w_start, '%Y-%m-%dT%H:%M:%S') AS window_start,
       |  event_type, count(*) AS n
       |FROM events e JOIN wins w
       |  ON e.ts >= w.w_start AND e.ts < w.w_start + INTERVAL $WindowHours HOUR
       |GROUP BY 1, 2
       |ORDER BY window_start, event_type""".stripMargin
}
