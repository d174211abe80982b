package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns, written as exact-result operators so the
  * DuckDB oracle can verify them: salting changes the SHUFFLE LAYOUT, never
  * the answer.
  */
object Skew {

  val Salts = 16

  /** Salted fact⋈dim join: enrich each event with its user's first-seen
    * timestamp, then aggregate event age per type.
    *
    * The pattern under test: when the dim side is too large to broadcast
    * and fact keys are skewed (one hot user floods a reducer), replicate
    * each dim row `Salts` times and give each fact row a deterministic salt
    * — the join key becomes (user_id, salt), spreading a hot key over
    * `Salts` partitions. AQE's skew-join split handles moderate skew
    * automatically; explicit salting is the portable form that also works
    * for the stateful/streaming joins AQE can't rewrite. Results are
    * byte-identical to the unsalted join.
    */
  def saltedUserAge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val userFirst = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    // dim side: replicate per salt value
    val saltedDim = userFirst.select(col("user_id"), col("first_ts"),
      explode(sequence(lit(0), lit(Salts - 1))).as("_salt"))
    // fact side: deterministic salt (hash of a high-cardinality column)
    val saltedFact = ev.withColumn("_salt",
      pmod(xxhash64(col("event_id")), lit(Salts)).cast("int"))
    saltedFact.join(saltedDim, Seq("user_id", "_salt"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg((unix_micros(col("ts")) - unix_micros(col("first_ts")))
          .cast("double") / 1e6), 2).as("avg_age_sec"))
      .orderBy("event_type")
  }

  val saltedUserAgeSql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg((epoch_us(ts) - epoch_us(first_ts))::double / 1e6), 2) AS avg_age_sec
      |FROM events e JOIN
      |  (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id) u
      |  USING (user_id)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** HLL-sketch distinct counts — the 100-TB substitute for exact
    * count(DISTINCT): one pass, fixed memory per group, no Expand blow-up.
    * Approximate by construction → no value oracle; a spec pins relative
    * error vs the exact variant.
    */
  def distinctPartsApprox(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("n_parts_approx"),
        approx_count_distinct(col("l_suppkey"), rsd).as("n_supps_approx"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
}
