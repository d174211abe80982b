package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern that
  * makes a 100-TB dashboard affordable: the per-key aggregate STATE is a
  * stored table, and when a new partition of facts lands, only the delta
  * is scanned and its state MERGED into the stored one. Recomputing the
  * view over all history on every refresh is the naive shape this
  * replaces (cost: full-corpus scan per refresh → delta scan per refresh).
  *
  * Correct merging requires every view column to be ALGEBRAIC — built
  * from mergeable partials: count merges by sum, sum by sum, min/max by
  * min/max; avg is NOT stored but derived from (sum, count) at read time.
  * This is exactly the decomposition Spark's own partial aggregation
  * applies map-side; here it is lifted to the storage layer (the same
  * contract as the PQ code-table snapshot in [[IncrementalIndex]]: the
  * state is a table, the refresh is an append-shaped job).
  *
  * The registered query proves the equivalence the pattern rests on:
  * state(base) ⊕ state(delta) == state(base ∪ delta), with the oracle
  * computing the plain recompute. Additive-only by design — row deletes
  * and updates arrive as compensating CDC rows upstream
  * ([[TableChecks.snapshotDiff]] is the detector); counts and sums accept
  * negative compensation rows unchanged, min/max would need a re-scan of
  * the affected key (the documented non-invertible-aggregate limit).
  *
  * Money sums run in exact DECIMAL (order-independent) and surface as
  * DOUBLE per the repo's money convention; the avg is a single division
  * of two exact values — no float reassociation anywhere.
  */
object IncrementalAgg {

  /** The refresh boundary: facts before it are the stored base, the rest
    * is the newly-arrived delta (the last ~8 months of the 1995–2001
    * order history at every SF). */
  val SplitDate = "2001-01-01"

  /** Per-customer aggregation state. Every column is a mergeable partial. */
  def state(orders: DataFrame): DataFrame =
    orders.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast("decimal(15,2)")).as("revenue"),
      max(col("o_orderdate")).as("last_order"))

  /** Merge two states: union + re-aggregate with each partial's combiner.
    * Keys present on one side only pass through (sum/max ignore nothing —
    * the union simply has one row for them). */
  def mergeStates(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta).groupBy("o_custkey").agg(
      sum(col("n_orders")).as("n_orders"),
      sum(col("revenue")).as("revenue"),
      max(col("last_order")).as("last_order"))

  /** Registered query: maintain the per-customer revenue view
    * incrementally and serve it with the derived avg — value-identical to
    * the full recompute the oracle performs. */
  def incrementalCustomerRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val split = lit(SplitDate).cast("timestamp")
    val base = state(orders.filter(col("o_orderdate") < split))
    val delta = state(orders.filter(col("o_orderdate") >= split))
    mergeStates(base, delta)
      .select(
        col("o_custkey"),
        col("n_orders"),
        round(col("revenue"), 2).cast("double").as("revenue"),
        col("last_order"),
        // a SINGLE IEEE division of two exact values — bit-identical in any
        // engine; rounding it would re-introduce decimal-tie divergence
        (col("revenue").cast("double") / col("n_orders")).as("avg_price"))
      .orderBy("o_custkey")
  }

  val incrementalCustomerRevenueSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(round(sum(o_totalprice::DECIMAL(15,2)), 2) AS DOUBLE) AS revenue,
      |  max(o_orderdate) AS last_order,
      |  CAST(sum(o_totalprice::DECIMAL(15,2)) AS DOUBLE) / count(*) AS avg_price
      |FROM orders GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin
}
