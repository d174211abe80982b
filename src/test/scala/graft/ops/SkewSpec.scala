package graft.ops

import graft.SparkSuite

class SkewSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("salted join result equals the unsalted join (salting is layout-only)") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, dir, "events")
    val userFirst = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    val plain = ev.join(userFirst, "user_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg((unix_micros(col("ts")) - unix_micros(col("first_ts")))
          .cast("double") / 1e6), 2).as("avg_age_sec"))
      .orderBy("event_type")
      .collect().toSeq
    val salted = Skew.saltedUserAge(spark, dir).collect().toSeq
    assert(salted == plain)
  }

  /** The 100-TB default for skewed JOINS: AQE's OptimizeSkewedJoin splits
    * the oversized shuffle partition at runtime — no manual salting
    * needed. This spec proves the rewrite fires (plan-level) and that the
    * result is unchanged. Manual salting ([[Skew.saltedUserAge]]) remains
    * required where AQE cannot rewrite: skewed AGGREGATIONS (a hot group
    * lands on one task regardless) and stateful/streaming joins.
    */
  test("AQE splits the skewed join partition the salted join handles manually") {
    import org.apache.spark.sql.functions._
    // isolated SQL conf (shared SparkContext): lowered thresholds so the
    // skew shows at test scale without a multi-GB fixture
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    // ~70% of fact rows share key 7; dim has one row per key
    val fact = s.range(100000L).select(
      when(col("id") % 10 < 7, lit(7L)).otherwise(pmod(col("id"), lit(100L))).as("k"),
      concat(lit("x" * 64), col("id")).as("payload"))
    val dim = s.range(100L).select(col("id").as("k"), (col("id") * 10).as("attr"))
    val joined = fact.join(dim, "k")
    // collect() executes THIS Dataset's QueryExecution — count() would spin
    // up a different one and leave the adaptive plan unfinalized
    assert(joined.collect().length == 100000, "every fact row matches exactly one dim row")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin(skew=true)"),
      s"expected the skew-split join in:\n$plan")
    assert(plan.contains("isFinalPlan=true"))
  }

  test("skewedHostAge: salted shuffle join equals the plain join; plan stays in the non-broadcast regime") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, dir, "events").withColumn("host", Skew.zipfHost)
    val dim = ev.groupBy("host").agg(min(col("ts")).as("first_ts"))
    val plain = ev.join(dim, "host")
      .groupBy("host")
      .agg(count(lit(1)).as("n"),
        round(avg((unix_micros(col("ts")) - unix_micros(col("first_ts")))
          .cast("double") / 1e6), 2).as("avg_age_sec"))
      .orderBy("host")
      .collect().toSeq
    val armored = Skew.skewedHostAge(spark, dir)
    assert(armored.collect().toSeq == plain, "salting/hint changed the answer")
    // the fixture is genuinely skewed: the mega-host holds ~half the facts
    val mega = plain.find(_.getString(0) == "h_mega").get.getLong(1).toDouble
    val total = plain.map(_.getLong(1)).sum.toDouble
    assert(mega / total > 0.4, s"mega-host share ${mega / total} — fixture lost its skew")
    // non-broadcast regime pinned: the hinted join must be sort-merge on
    // (host, _salt), not a silent broadcast of the tiny bench-SF dim
    val plan = armored.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected the salted SMJ in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim was broadcast — skew armor unexercised:\n$plan")
  }

  test("approx distinct counts stay within the configured error of exact") {
    val exact = Tpch.distinctParts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Skew.distinctPartsApprox(spark, dir).collect()
    approx.foreach { r =>
      val (eParts, eSupps) = exact(r.getString(0))
      // rsd 0.02 → generous 10% assertion bound (HLL error is probabilistic)
      assert(math.abs(r.getLong(1) - eParts).toDouble / eParts < 0.1)
      assert(math.abs(r.getLong(2) - eSupps).toDouble / eSupps < 0.1)
    }
  }

  test("joinSizeEstimate: histogram prediction equals the executed join exactly") {
    val dir = "/root/testdata/sf0.001"
    val row = Skew.joinSizeEstimate(spark, dir).head()
    assert(row.getBoolean(4), s"prediction ${row.getLong(1)} != actual ${row.getLong(3)}")
    // re-derive the prediction from independent per-user counts
    import org.apache.spark.sql.functions.col
    val ev = Tables(spark, dir, "events").select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cv = ev.filter(_._2 == "view").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cp = ev.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val shared = cv.keySet & cp.keySet
    assert(row.getLong(0) == shared.size.toLong)
    assert(row.getLong(1) == shared.toSeq.map(k => cv(k) * cp(k)).sum)
    assert(row.getLong(2) == shared.toSeq.map(k => cv(k) * cp(k)).max)
  }
}
