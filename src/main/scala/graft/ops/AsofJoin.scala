package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic time-series operator Spark has no builtin for:
  * for each left row, attach the payload of the latest right row with
  * `right.time < left.time` (strictly earlier) sharing the join key.
  *
  * Execution shape (the reason this beats the naive formulations):
  * tag both sides, UNION them, and run ONE window over
  * (key, ORDER BY time, side-tag): `last(payload, ignoreNulls)` at each
  * left row is exactly the most recent prior right row. Cost = one shuffle
  * on the key + a per-key sort — no range join (O(n·m) BroadcastNestedLoop
  * in Spark), no per-row subquery. Skewed keys are one partition's sort,
  * handled by AQE; at 100 TB this is the standard "merge the two streams"
  * design.
  *
  * Strictness: rows sort by (time, side) with left rows BEFORE right rows
  * at equal time, so a right row at exactly left.time is NOT matched
  * (asof `>` semantics, matching the DuckDB `ASOF LEFT JOIN ... ON l.t >
  * r.t` oracle).
  */
object AsofJoin {

  /** Generic form: left keeps all its columns; each right payload column
    * (everything but `key` and `time`) is attached as `<prefix><name>`,
    * plus `<prefix><time>` = the matched row's time; all null when no prior
    * right row exists.
    */
  def asofLastPrior(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      prefix: String = "asof_"): DataFrame = {

    val payload = right.columns.filterNot(c => c == key || c == time).toSeq

    // The matched right row travels as ONE struct — `last(..., ignoreNulls)`
    // then selects the whole row atomically. Filling each payload column
    // with its own independent `last` would be wrong when payload values
    // are null: ignoreNulls would skip back to an OLDER right row for just
    // that column, stitching together fields from different right rows.
    val rightStruct = struct(payload.map(col) :+ col(time).as(time): _*)
    val leftSide = left.withColumn("_src", lit(0))
      .withColumn("_asof", lit(null).cast(
        right.select(rightStruct.as("_asof")).schema("_asof").dataType))
    val rightFull = {
      val base = right
        .select(col(key), col(time), rightStruct.as("_asof"))
        .withColumn("_src", lit(1))
      left.columns.filterNot(c => c == key || c == time)
        .foldLeft(base)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    }

    val w = Window.partitionBy(key).orderBy(col(time), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftSide.unionByName(rightFull)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
    val unpacked = (payload :+ time).foldLeft(filled) { (df, p) =>
      df.withColumn(s"$prefix$p", col("_asof").getField(p))
    }
    unpacked.filter(col("_src") === 0).drop("_src", "_asof")
  }

  /** Concrete query: for every event, the same user's most recent PRIOR
    * click (its timestamp and value). Left join semantics — events before
    * any click carry nulls.
    */
  def asofLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    asofLastPrior(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      clicks, key = "user_id", time = "ts")
      .select(col("event_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  /** Tolerance bound for [[asofClickWithin]]: 30 minutes, in microseconds. */
  val ClickTolMicros: Long = 30L * 60 * 1000000

  /** As-of with a TOLERANCE (the pandas `merge_asof(tolerance=...)` /
    * kdb `wj` within-window form): the latest strictly-prior right row
    * still matches only if it is at most `tolMicros` old; staler matches
    * null out. Composed over the native merge-join (or the window
    * formulation with `native = false`): the operator finds the latest
    * prior row, one codegen projection applies the recency gate — the
    * tolerance never changes the join shape, so it costs nothing at
    * scale.
    */
  def asofLastPriorWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tolMicros: Long,
      prefix: String = "asof_",
      native: Boolean = true): DataFrame = {
    val joined =
      if (native) graft.plans.AsofMergeJoin.asofLastPrior(left, right, key, time, prefix)
      else asofLastPrior(left, right, key, time, prefix)
    val payload = right.columns.filterNot(_ == key).toSeq
    val flagged = joined.withColumn("_within",
      col(s"$prefix$time").isNotNull &&
        unix_micros(col(time)) - unix_micros(col(s"$prefix$time")) <= tolMicros)
    payload.foldLeft(flagged)((df, p) =>
      df.withColumn(s"$prefix$p", when(col("_within"), col(s"$prefix$p"))))
      .drop("_within")
  }

  /** Concrete query: [[asofLastClick]] but a prior click only counts
    * within [[ClickTolMicros]] — events whose last click is staler than
    * 30 minutes report null, the "recent-attribution" shape.
    */
  def asofClickWithin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    asofLastPriorWithin(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      clicks, key = "user_id", time = "ts", tolMicros = ClickTolMicros)
      .select(col("event_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  /** FORWARD as-of (pandas `merge_asof(direction='forward')`): for each
    * event, the same user's EARLIEST strictly-later click. No new
    * operator needed — time reverses: run the native backward merge on
    * negated microseconds and "latest prior" becomes "earliest next".
    * The negation is a codegen projection on both sides; the join shape,
    * distribution and ordering contracts are untouched.
    */
  def asofNextClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val neg = (-unix_micros(col("ts"))).as("tneg")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), neg, col("ts"), col("value"))
    graft.plans.AsofMergeJoin.asofLastPrior(
      ev.select(col("event_id"), col("user_id"), neg),
      clicks, key = "user_id", time = "tneg")
      .select(col("event_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("next_click_ts"),
        col("asof_value").as("next_click_value"))
      .orderBy("event_id")
  }

  val asofNextClickSql: String =
    """SELECT e.event_id,
      |  strftime(c.ts, '%Y-%m-%dT%H:%M:%S.%f') AS next_click_ts,
      |  c.value AS next_click_value
      |FROM events e ASOF LEFT JOIN
      |  (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND e.ts < c.ts
      |ORDER BY e.event_id""".stripMargin

  val asofClickWithinSql: String =
    s"""SELECT e.event_id,
       |  CASE WHEN epoch_us(e.ts) - epoch_us(c.ts) <= $ClickTolMicros
       |       THEN strftime(c.ts, '%Y-%m-%dT%H:%M:%S.%f') END AS last_click_ts,
       |  CASE WHEN epoch_us(e.ts) - epoch_us(c.ts) <= $ClickTolMicros
       |       THEN c.value END AS last_click_value
       |FROM events e ASOF LEFT JOIN
       |  (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
       |  ON e.user_id = c.user_id AND e.ts > c.ts
       |ORDER BY e.event_id""".stripMargin

  /** [[asofLastClick]] through the NATIVE operator
    * ([[graft.plans.AsofMergeJoinExec]]) instead of the union+window
    * composition — same rows, same oracle, different physical plan: two
    * co-partitioned sorted children and a single-buffered merge scan.
    */
  def asofLastClickNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    graft.plans.AsofMergeJoin.asofLastPrior(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      clicks, key = "user_id", time = "ts")
      .select(col("event_id"),
        date_format(col("asof_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("last_click_ts"),
        col("asof_value").as("last_click_value"))
      .orderBy("event_id")
  }

  val asofLastClickSql: String =
    """SELECT e.event_id,
      |  strftime(c.ts, '%Y-%m-%dT%H:%M:%S.%f') AS last_click_ts,
      |  c.value AS last_click_value
      |FROM events e ASOF LEFT JOIN
      |  (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND e.ts > c.ts
      |ORDER BY e.event_id""".stripMargin
}
