package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Tables

class BucketedRangeJoinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def naiveRangeJoin() = {
    val ev = Tables(spark, dir, "events")
    val wins = ev.filter(hour(col("ts")) % 6 === 0)
      .select(date_trunc("hour", col("ts")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr("INTERVAL 8 HOURS"))
    ev.join(wins, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("w_start", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("w_start", "event_type")
  }

  test("rewrites a naive range join to an equi-join with identical results") {
    // expected rows from the untouched planner (nested-loop join)
    val expected = naiveRangeJoin().collect().toSeq
    assert(expected.nonEmpty)
    assert(naiveRangeJoin().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "precondition: vanilla Spark nested-loops this join")

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoin
    try {
      val rewritten = naiveRangeJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "rule did not eliminate the nested loop")
      assert(plan.contains("__graft_bucket"), "bucket key missing from plan")
      assert(rewritten.collect().toSeq == expected)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("leaves joins with existing equi keys alone") {
    val ev = Tables(spark, dir, "events")
    val byUser = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoin
    try {
      val j = ev.join(byUser, ev("user_id") === byUser("user_id") &&
        ev("ts") >= byUser("first_ts"))
      assert(!j.queryExecution.executedPlan.toString.contains("__graft_bucket"),
        "rule fired on a join that already has an equi key")
      assert(j.count() > 0)
    } finally spark.experimental.extraOptimizations = prev
  }
}
