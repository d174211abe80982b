package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Tables

class SaltedAggRewriteSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withSalting[T](body: => T): T = {
    spark.conf.set(SaltedAggRewrite.EnabledConf, "true")
    try body
    finally spark.conf.unset(SaltedAggRewrite.EnabledConf)
  }

  private def aggregates(df: DataFrame): Seq[Aggregate] =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }

  // the zipf-hot host key from the Skew suite: half the rows on one
  // mega-host — the profile the rule exists to armor
  private def hosts: DataFrame =
    Tables(spark, dir, "events").withColumn("host",
      when(pmod(col("event_id"), lit(100)) < 50, lit("h_mega"))
        .otherwise(concat(lit("h"), pmod(col("event_id"), lit(100)))))

  test("off by default: plans carry a single un-salted aggregate") {
    val q = hosts.groupBy("host").agg(count(lit(1)).as("n"))
    val aggs = aggregates(q)
    assert(aggs.size == 1, s"expected one Aggregate, got ${aggs.size}")
    assert(!q.queryExecution.optimizedPlan.toString.contains("_graft_salt"))
  }

  test("re-aggregable battery: two-phase salted plan, identical answer") {
    def q = hosts.groupBy("host").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("long")).as("sv"),
      min("value").as("mn"),
      max("value").as("mx"))
    val unsalted = q.collect().toSeq
    withSalting {
      val salted = q
      val plan = salted.queryExecution.optimizedPlan
      val aggs = aggregates(salted)
      assert(aggs.size == 2, s"expected inner+outer Aggregate:\n$plan")
      assert(plan.toString.contains("_graft_salt"), s"no salt key:\n$plan")
      // inner aggregate groups by (host, salt) — the composite that
      // spreads the mega-host across reducers
      assert(aggs.exists(_.groupingExpressions.size == 2))
      assert(salted.collect().toSeq.sortBy(_.getString(0))
        == unsalted.sortBy(_.getString(0)),
        "salting must change layout, never the answer")
    }
  }

  test("count(distinct): value-salted buckets sum to the exact distinct count") {
    def grouped = hosts.groupBy("host").agg(countDistinct("user_id").as("u"))
    def global = hosts.agg(countDistinct("user_id").as("u"))
    val wantGrouped = grouped.collect().toSeq.sortBy(_.getString(0))
    val wantGlobal = global.collect().head.getLong(0)
    withSalting {
      val g = grouped
      assert(g.queryExecution.optimizedPlan.toString.contains("_graft_salt"))
      assert(g.collect().toSeq.sortBy(_.getString(0)) == wantGrouped)
      val t = global
      assert(t.queryExecution.optimizedPlan.toString.contains("_graft_salt"))
      assert(t.collect().head.getLong(0) == wantGlobal)
    }
  }

  test("decimal sums keep their schema; ineligible aggregates stay un-salted") {
    // exact-decimal money (testdata stores doubles; double sums reassociate
    // under ANY two-phase aggregation, Spark's own partials included)
    def money = Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(sum(col("o_totalprice").cast("decimal(15,2)")).as("rev"))
    val want = money.collect().toSeq.sortBy(_.getString(0))
    val wantSchema = money.schema
    withSalting {
      val m = money
      assert(m.schema == wantSchema,
        "sum-of-sums must cast back to the original result type")
      assert(m.collect().toSeq.sortBy(_.getString(0)) == want)
      // avg is not in the re-aggregable set: the aggregate must pass
      // through untouched (one Aggregate, no salt)
      val avgQ = hosts.groupBy("host").agg(avg("value").as("a"))
      assert(!avgQ.queryExecution.optimizedPlan.toString.contains("_graft_salt"),
        "non-re-aggregable functions must not be salted")
      // distinct count alongside another aggregate: also untouched
      val mixed = hosts.groupBy("host")
        .agg(countDistinct("user_id").as("u"), count(lit(1)).as("n"))
      assert(!mixed.queryExecution.optimizedPlan.toString.contains("_graft_salt"))
      assert(mixed.collect().nonEmpty)
    }
  }
}
