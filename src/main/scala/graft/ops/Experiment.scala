package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Online-experimentation analysis over the events stream — the A/B
  * readout a growth team runs nightly: deterministic hash assignment of
  * users to arms, per-arm metric means, and CUPED variance reduction
  * (Deng, Xu, Kohavi & Walker, WSDM'13: regression-adjust the experiment
  * metric with a PRE-EXPERIMENT covariate; same mean, strictly smaller
  * variance, so the same data decides faster).
  *
  * Everything upstream of the final scalar arithmetic is EXACT: the arm
  * is a pure function of (seed, user_id) (the [[Sampling.seededKey]]
  * md5 discipline — re-runs and other engines assign identically), the
  * per-user pre/post purchase sums ride DECIMAL(15,2) (`value` carries
  * two decimals, so sums are exact integers in cents), and the pooled
  * moment sums (Σx, Σy, Σx², Σxy) are DECIMAL aggregates of exact
  * products. θ = cov(x,y)/var(x) and the per-arm adjusted means are then
  * one fixed-shape IEEE double tree over those exact moments (the
  * [[Events.hourValueRegression]] convention), rounded to 6.
  *
  * Scale shape: one scan of events → per-user conditional sums (hash
  * aggregate on user_id); the pooled moments are ONE single-row aggregate
  * over the per-user frame, broadcast back via the scalar-combine
  * crossJoin; the per-arm rollup is a 2-row hash aggregate. No window,
  * no self-join, nothing corpus-sized on the driver.
  */
object Experiment {

  /** Assignment seed — bumping it re-randomizes every arm membership. */
  val AbSeed = "ab1"

  /** Experiment start: events before this are the CUPED pre-period. */
  val SplitDate = "2024-01-16"

  /** Per-user frame: arm, pre-period covariate x, experiment metric y. */
  private def perUser(ev: DataFrame): DataFrame = {
    val dec = "cast(0.00 as decimal(15,2))"
    val isPurchase = col("event_type") === "purchase"
    val pre = col("ts") < lit(SplitDate).cast("timestamp")
    ev.groupBy(col("user_id"))
      .agg(
        sum(when(isPurchase && pre, col("value").cast("decimal(15,2)"))
          .otherwise(expr(dec))).as("x"),
        sum(when(isPurchase && !pre, col("value").cast("decimal(15,2)"))
          .otherwise(expr(dec))).as("y"))
      .withColumn("arm",
        when(substring(md5(concat(lit(AbSeed), lit(":"),
          col("user_id").cast("string")).cast("binary")), 1, 1)
          .between("0", "7"), "control").otherwise("treatment"))
  }

  def abCupedLift(spark: SparkSession, dir: String): DataFrame =
    abCupedLiftFrom(Tables(spark, dir, "events"))

  /** [[abCupedLift]] over any events-shaped frame. */
  def abCupedLiftFrom(ev: DataFrame): DataFrame = {
    val pu = perUser(ev)
    val pooled = pu.agg(
      count(lit(1)).as("n_all"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val d = (c: String) => col(c).cast("double")
    val arms = pu.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
    arms.crossJoin(broadcast(pooled))
      .select(col("arm"), col("n_users"),
        round(d("sxa") / d("n_users"), 6).as("mean_x"),
        round(d("sya") / d("n_users"), 6).as("mean_y"),
        round((d("n_all") * d("sxy") - d("sx") * d("sy"))
          / (d("n_all") * d("sxx") - d("sx") * d("sx")), 6).as("theta"),
        round(d("sya") / d("n_users")
          - (d("n_all") * d("sxy") - d("sx") * d("sy"))
            / (d("n_all") * d("sxx") - d("sx") * d("sx"))
            * (d("sxa") / d("n_users") - d("sx") / d("n_all")), 6)
          .as("cuped_mean"))
      .orderBy("arm")
  }

  val abCupedLiftSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    coalesce(sum(CASE WHEN event_type = 'purchase'
       |      AND ts < TIMESTAMP '$SplitDate 00:00:00'
       |      THEN value::DECIMAL(15,2) END), 0.00::DECIMAL(15,2)) AS x,
       |    coalesce(sum(CASE WHEN event_type = 'purchase'
       |      AND ts >= TIMESTAMP '$SplitDate 00:00:00'
       |      THEN value::DECIMAL(15,2) END), 0.00::DECIMAL(15,2)) AS y,
       |    CASE WHEN substr(md5('$AbSeed:' || user_id::VARCHAR), 1, 1)
       |      BETWEEN '0' AND '7' THEN 'control' ELSE 'treatment' END AS arm
       |  FROM events GROUP BY user_id
       |), pooled AS (
       |  SELECT count(*) AS n_all, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM pu
       |), arms AS (
       |  SELECT arm, count(*) AS n_users, sum(x) AS sxa, sum(y) AS sya
       |  FROM pu GROUP BY arm
       |)
       |SELECT arm, n_users,
       |  round(sxa::DOUBLE / n_users::DOUBLE, 6) AS mean_x,
       |  round(sya::DOUBLE / n_users::DOUBLE, 6) AS mean_y,
       |  round((n_all::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |    / (n_all::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS theta,
       |  round(sya::DOUBLE / n_users::DOUBLE
       |    - (n_all::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |      / (n_all::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |      * (sxa::DOUBLE / n_users::DOUBLE - sx::DOUBLE / n_all::DOUBLE),
       |    6) AS cuped_mean
       |FROM arms CROSS JOIN pooled
       |ORDER BY arm""".stripMargin
}
