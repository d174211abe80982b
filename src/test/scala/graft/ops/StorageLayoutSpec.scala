package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the two properties the storage-layout module exists to provide:
  *
  *  1. a join of two tables bucketed on the join key runs with NO Exchange
  *     under the SortMergeJoin (the co-location IS the shuffle, paid once
  *     at write time), and
  *  2. a day-range predicate over the date-partitioned events sink reaches
  *     the scan as a PartitionFilter (directory pruning, not row filtering).
  *
  * Both queries are also value-pinned against their layout-independent
  * plain-parquet formulations, and both carry DuckDB oracles in SparkEntry
  * (the result of a join/aggregate must not depend on physical layout).
  */
class StorageLayoutSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders⋈lineitem joins without shuffling either side") {
    val df = StorageLayout.bucketedJoinRevenue(spark, dir)
    df.collect() // finalize the adaptive plan before reading it
    // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    // only the final plan is what ran
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val smjAt = plan.indexOf("SortMergeJoin")
    assert(smjAt >= 0, s"bucketed join lost its sort-merge path:\n$plan")
    // tree printing puts a node's subtree strictly below it: everything
    // after the SMJ line is its two (bucketed-scan) inputs
    val below = plan.substring(smjAt)
    assert(!below.contains("Exchange"),
      s"bucketed join shuffled its input — co-location lost:\n$plan")
  }

  test("bucketed join result equals the plain-parquet join") {
    val bucketed = StorageLayout.bucketedJoinRevenue(spark, dir).collect()
    val plain = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(15,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
      .collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("day-range predicate prunes partitions at the scan") {
    val df = StorageLayout.prunedEventsDaily(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val filters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1))
    assert(filters.exists(f => f.contains("day") && f.trim.nonEmpty),
      s"day predicate did not reach the scan as a partition filter:\n$plan")
    // the pruned scan must not also re-apply day as a data filter — the
    // partition column never materializes in the files
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"),
      "day leaked into data filters — partition column written into files?")
  }

  test("pruned scan result equals the plain-parquet aggregate") {
    val pruned = StorageLayout.prunedEventsDaily(spark, dir).collect()
    val plain = Tables(spark, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("day").between("2024-01-08", "2024-01-14"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .orderBy("day", "event_type")
      .collect()
    assert(pruned.toSeq == plain.toSeq)
    assert(pruned.nonEmpty, "empty week — wrong date range for the fixture")
  }

  test("the partitioned sink actually has more partitions than the query reads") {
    StorageLayout.partitionedEvents(spark, dir) // ensure written
    // Scoped to THIS dir's tag subdirectory — a glob over every tag under
    // graft_layout could be satisfied by a stale write for another sfDir.
    val root = new java.io.File(
      s"${StorageLayout.tmpRoot}/${StorageLayout.tag(dir)}/partitioned_events")
    val dayDirs = Option(root.listFiles()).toSeq.flatten
      .count(_.getName.startsWith("day="))
    assert(dayDirs > 7, s"only $dayDirs day partitions on disk — nothing to prune")
  }
}
