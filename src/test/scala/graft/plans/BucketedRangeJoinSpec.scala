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

    withRule {
      val rewritten = naiveRangeJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "rule did not eliminate the nested loop")
      assert(plan.contains("__graft_bucket"), "bucket key missing from plan")
      assert(rewritten.collect().toSeq == expected)
    }
  }

  test("leaves joins with existing equi keys alone") {
    val ev = Tables(spark, dir, "events")
    val byUser = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    withRule {
      val j = ev.join(byUser, ev("user_id") === byUser("user_id") &&
        ev("ts") >= byUser("first_ts"))
      assert(!j.queryExecution.executedPlan.toString.contains("__graft_bucket"),
        "rule fired on a join that already has an equi key")
      assert(j.count() > 0)
    }
  }

  test("empty and inverted intervals yield zero matches, not a Sequence error") {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
    // one inverted window (end before start), one empty (end == start),
    // one valid — only the valid one may match
    // events at sf0.001 span 2024-01-01 .. 2024-01-30
    val wins = Seq(
      ("inverted", "2024-01-10 10:00:00", "2024-01-10 08:00:00"),
      ("empty", "2024-01-10 10:00:00", "2024-01-10 10:00:00"),
      ("valid", "2024-01-01 00:00:00", "2024-02-01 00:00:00"))
      .toDF("w_name", "s", "e")
      .select(col("w_name"), col("s").cast("timestamp").as("w_start"),
        col("e").cast("timestamp").as("w_end"))
    withRule {
      val j = ev.join(wins, col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .groupBy("w_name").agg(count(lit(1)).as("n"))
      assert(j.queryExecution.executedPlan.toString.contains("__graft_bucket"))
      val byName = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byName.keySet == Set("valid"))
      assert(byName("valid") == ev.count())
    }
  }

  test("disabled by default: without the conf the plan is untouched") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoin
    try {
      assert(naiveRangeJoin().queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally spark.experimental.extraOptimizations = prev
  }

  /** Inject the rule AND enable its conf flag (opt-in by design). */
  private def withRule(body: => Unit): Unit = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoin
    spark.conf.set(BucketedRangeJoin.EnabledConf, "true")
    try body
    finally {
      spark.conf.unset(BucketedRangeJoin.EnabledConf)
      spark.experimental.extraOptimizations = prev
    }
  }
}
