package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Tables

/** Pins the approximation-mode rewrite: conf off → exact distinct plan and
  * exact values; conf on → the SAME query runs as an HLL++ aggregate (no
  * Expand, no distinct shuffle) with values inside the sketch envelope.
  */
class ApproxDistinctRewriteSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def distinctPartsPerType = Tables(spark, dir, "lineitem")
    .join(Tables(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
    .groupBy("p_type")
    .agg(countDistinct(col("l_partkey")).as("nd"), count(lit(1)).as("n"))

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ ApproxDistinctRewrite
    spark.conf.set(ApproxDistinctRewrite.EnabledConf, "true")
    try body
    finally {
      spark.conf.unset(ApproxDistinctRewrite.EnabledConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("conf off: plan keeps the exact distinct aggregate") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ ApproxDistinctRewrite
    try {
      val plan = distinctPartsPerType.queryExecution.optimizedPlan.toString
      assert(plan.contains("count(distinct"), s"exact distinct lost without opt-in:\n$plan")
      assert(!plan.contains("approx_count_distinct"), s"rewrite fired while disabled:\n$plan")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("conf on: HLL++ replaces the distinct aggregate and values stay in the envelope") {
    val exact = distinctPartsPerType.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    withRule {
      val df = distinctPartsPerType
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rewrite did not fire:\n$plan")
      assert(!plan.contains("count(distinct"),
        s"exact distinct survived alongside the sketch:\n$plan")
      // the physical plan must have no Expand — the whole point is losing
      // the duplicate-rows-per-distinct-column execution shape
      df.collect()
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Expand"), s"Expand survived the rewrite:\n$phys")
      val approx = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet)
      for ((k, (nd, n)) <- exact) {
        val (and2, an) = approx(k)
        // rsd 0.05 → 6 sigma envelope; plain count must be untouched
        assert(math.abs(and2 - nd).toDouble <= math.max(6 * 0.05 * nd, 2.0),
          s"$k: approx $and2 vs exact $nd outside envelope")
        assert(an == n, s"$k: non-distinct count changed: $an vs $n")
      }
    }
  }

  test("multi-column and non-count distincts are left exact") {
    withRule {
      val multi = Tables(spark, dir, "lineitem")
        .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("nd"))
      val plan = multi.queryExecution.optimizedPlan.toString
      assert(plan.contains("count(distinct") && !plan.contains("approx_count_distinct"),
        s"multi-column distinct must stay exact:\n$plan")
      val sumd = Tables(spark, dir, "lineitem")
        .agg(sum_distinct(col("l_quantity")).as("sd"))
      val plan2 = sumd.queryExecution.optimizedPlan.toString
      assert(!plan2.contains("approx_count_distinct"),
        s"sum(DISTINCT) must not be touched:\n$plan2")
    }
  }
}
