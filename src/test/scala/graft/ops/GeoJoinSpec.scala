package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class GeoJoinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("grid-blocked radius join equals the brute non-equi join it replaces") {
    val pts = GeoJoin.plantedPoints(spark, dir)
    val a = pts.select(col("c_custkey").as("cust_a"), col("x").as("xa"), col("y").as("ya"))
    val b = pts.select(col("c_custkey").as("cust_b"), col("x").as("xb"), col("y").as("yb"))
    val brute = a.crossJoin(b)
      .filter(col("cust_a") < col("cust_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(GeoJoin.RadiusM * GeoJoin.RadiusM))
      .select("cust_a", "cust_b", "dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val grid = GeoJoin.geoNearPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(grid.toSet == brute, "cell seams must lose no pair and invent none")
    assert(grid.length == grid.toSet.size, "each unordered pair exactly once")
    assert(grid.nonEmpty, "planted layout yields pairs at sf0.001")
  }

  test("the plan is an equi-join on cell keys — no nested-loop, no cartesian") {
    val plan = GeoJoin.geoNearPairs(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"grid reduction must remove the theta-join:\n$plan")
  }
}
