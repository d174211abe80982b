package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("mergeStates: base ⊕ delta equals the full recompute, both directions") {
    val orders = Tables(spark, dir, "orders")
    val split = lit(IncrementalAgg.SplitDate).cast("timestamp")
    val merged = IncrementalAgg.mergeStates(
      IncrementalAgg.state(orders.filter(col("o_orderdate") < split)),
      IncrementalAgg.state(orders.filter(col("o_orderdate") >= split)))
    val full = IncrementalAgg.state(orders)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "merged state diverges from recompute")
    // the split is non-degenerate at this SF: both sides contribute rows
    assert(orders.filter(col("o_orderdate") < split).count() > 0)
    assert(orders.filter(col("o_orderdate") >= split).count() > 0)
  }

  test("mergeStates: key present on one side only passes through unchanged") {
    import spark.implicits._
    val mk = (rows: Seq[(Long, Long, java.math.BigDecimal, java.sql.Timestamp)]) =>
      rows.toDF("o_custkey", "n_orders", "revenue", "last_order")
        .withColumn("revenue", col("revenue").cast("decimal(25,2)"))
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val base = mk(Seq((1L, 2L, new java.math.BigDecimal("10.00"), ts("2000-01-01")),
                      (2L, 1L, new java.math.BigDecimal("5.00"), ts("2000-02-01"))))
    val delta = mk(Seq((2L, 3L, new java.math.BigDecimal("7.50"), ts("2001-01-01"))))
    val got = IncrementalAgg.mergeStates(base, delta).orderBy("o_custkey").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L,
      s"base-only key changed: ${got(0)}")
    assert(got(1).getLong(1) == 4L &&
      got(1).getDecimal(2).compareTo(new java.math.BigDecimal("12.50")) == 0 &&
      got(1).getTimestamp(3) == ts("2001-01-01"),
      s"overlapping key merged wrong: ${got(1)}")
  }

  test("negative compensation rows retract counts and sums") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    val base = Seq((1L, 2L, "10.00", ts)).toDF("o_custkey", "n_orders", "revenue", "last_order")
      .withColumn("revenue", col("revenue").cast("decimal(25,2)"))
    val comp = Seq((1L, -1L, "-4.00", ts)).toDF("o_custkey", "n_orders", "revenue", "last_order")
      .withColumn("revenue", col("revenue").cast("decimal(25,2)"))
    val got = IncrementalAgg.mergeStates(base, comp).collect()(0)
    assert(got.getLong(1) == 1L && got.getDecimal(2).doubleValue() == 6.0,
      s"compensation not applied: $got")
  }

  test("incrementalCustomerRevenue: served view is complete and avg is consistent") {
    val out = IncrementalAgg.incrementalCustomerRevenue(spark, dir).collect()
    val customers = Tables(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(out.length == customers, s"view has ${out.length} keys, orders has $customers")
    for (r <- out.take(50))
      assert(math.abs(r.getDouble(4) - r.getDouble(2) / r.getLong(1)) < 1e-3,
        s"avg inconsistent with sum/count: $r")
  }
}
