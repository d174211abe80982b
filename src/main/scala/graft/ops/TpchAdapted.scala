package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The seven TPC-H queries the slimmed testdata schema can't express
  * verbatim (Q2/Q9/Q11/Q16/Q20 need `partsupp`, Q12/Q21 need
  * `l_shipmode`/`l_commitdate`/`l_receiptdate` — TESTDATA.md has none of
  * these), each re-stated on present columns with the SAME plan shape the
  * original exercises, completing the 22-query decision-support family
  * alongside [[Tpch]] and [[TpchTail]]:
  *
  *  - Q2  correlated per-group MIN equality (part-supplier cost via
  *    lineitem average sale price instead of `ps_supplycost`)
  *  - Q9  multi-dimension profit rollup (cost leg from `p_retailprice`)
  *  - Q11 group-HAVING against a scalar fraction-of-total subquery
  *  - Q12 fact-fact join with a cross-table date-arithmetic predicate
  *    (late = shipped >60 days after the order date; groups by
  *    `l_linestatus` instead of the absent `l_shipmode`)
  *  - Q16 NOT-IN anti-join + count-distinct per attribute group
  *  - Q20 nested semi-join chain on a per-(part,supplier) share threshold
  *  - Q21 the double EXISTS/NOT-EXISTS ("only supplier who failed"),
  *    re-stated as "only supplier with a return in a multi-supplier order"
  *
  * Like the rest of the family, every correlated subquery is written
  * DECORRELATED — aggregate-then-join, the form Catalyst rewrites to
  * anyway — so the shuffle structure is explicit. Dimensions broadcast;
  * the only wide exchanges are lineitem aggregates on their natural keys.
  */
object TpchAdapted {

  /** TPC-H Q2 shape (minimum-cost supplier): for each qualifying part, the
    * EUROPE supplier(s) whose average sale price is the per-part minimum.
    * The correlated `= (SELECT min(...))` decorrelates into a per-part min
    * aggregate broadcast back onto the (part, supplier) cost table. Cost is
    * rounded BEFORE the min comparison in both engines so double noise
    * can't make the equality engine-dependent (same discipline as Q15).
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "PROMO")
      .select("p_partkey", "p_name")
    val euroNations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    // `cost` feeds two consumers (the per-part min and the final join) —
    // persisted so the filtered lineitem scan+aggregate runs ONCE per
    // execution instead of twice. The frame is one row per qualifying
    // (part, supplier): bounded by the dimension cross-product, not by
    // lineitem, so it caches cheaply even at 100 TB. Released by
    // clearCache/session close (the bench clears between runs).
    val cost = Tables(spark, dir, "lineitem")
      .join(broadcast(part.select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("avg_cost"))
      .persist()
    val minCost = cost.groupBy(col("l_partkey").as("min_partkey"))
      .agg(min(col("avg_cost")).as("min_cost"))
    cost
      .join(broadcast(minCost),
        col("l_partkey") === col("min_partkey") && col("avg_cost") === col("min_cost"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_name"), col("avg_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    round(avg(l_extendedprice * (1 - l_discount)), 2) AS avg_cost
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_size = 15 AND p_type = 'PROMO' AND r_name = 'EUROPE'
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, avg_cost
      |FROM cost
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE avg_cost = (SELECT min(avg_cost) FROM cost c2
      |                  WHERE c2.l_partkey = cost.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 shape (product-type profit): profit per supplier nation per
    * order year over parts matching a name pattern. The `ps_supplycost`
    * leg becomes `0.1 * p_retailprice * l_quantity` — still a cost column
    * sourced from a second dimension join, preserving the 5-table shape.
    * Only lineitem⋈orders shuffles; part and supplier⋈nation broadcast.
    *
    * Money arithmetic is EXACT DECIMAL, not double: the per-nation-year
    * profit sums millions of line values, and at the sf1 scale cross-check
    * the double-sum reordering error (bound ≈ n·ε·Σ|x|) already exceeded
    * the 2-decimal rounding margin — 7 of 175 groups differed from the
    * oracle in the last cent. Summation order is the one thing a
    * distributed engine cannot pin, so at 100 TB money aggregates belong
    * on the decimal grid where reordering is a no-op. The input casts are
    * loss-free: every money column sits within 1e-9 of its 2-dp grid
    * point (verified on the driver data), quantities are integral, and
    * the product precision (DECIMAL(21,4) / DECIMAL(16,3)) stays far
    * inside Spark's 38-digit cap, so Spark and DuckDB compute bit-equal
    * sums at every scale. The rounded result is cast back to double to
    * keep the published schema.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val profit =
      col("l_extendedprice").cast("decimal(15,2)") *
        (lit(1) - col("l_discount").cast("decimal(4,2)")) -
        lit(new java.math.BigDecimal("0.1")) *
          col("p_retailprice").cast("decimal(10,2)") *
          col("l_quantity").cast("decimal(3,0)")
    Tables(spark, dir, "lineitem")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(profit), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(round(sum(l_extendedprice::DECIMAL(15,2)
      |                   * (1 - l_discount::DECIMAL(4,2))
      |                 - 0.1 * p_retailprice::DECIMAL(10,2)
      |                   * l_quantity::DECIMAL(3,0)), 2) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2
      |ORDER BY 1, 2 DESC""".stripMargin

  /** TPC-H Q11 shape (important stock): parts whose revenue through one
    * nation's suppliers exceeds a fixed fraction of that nation's total —
    * a group-HAVING against a scalar subquery over the SAME aggregate. The
    * per-part aggregate feeds both the 1-row total (broadcast back) and
    * the filter; it is persisted so lineitem scans+aggregates ONCE per run
    * for both consumers (one row per part — bounded at any scale). The output rounds to FOUR decimals, not two: line values
    * are (2dp price)×(2dp discount) products, so every group sum lies ON
    * the 4-decimal grid — and the 2dp rounding boundary (x.xx50) is a grid
    * point, where Spark (BigDecimal of the shortest decimal repr, HALF_UP)
    * and DuckDB (FP-scaled multiply then round) measurably disagree (3
    * one-cent diffs in 1449 groups). The 4dp boundary (x.xxxx5) is OFF the
    * grid by 5e-5 ≫ the ~1e-10 summation noise, so round(·,4) returns the
    * exact grid value in both engines. The threshold compares the raw
    * sums (a strict inequality on continuous values — engine-safe). The
    * fraction is 0.0002 — TPC-H itself scales Q11's fraction inversely
    * with SF precisely because a fixed share selects ever fewer groups as
    * the part population grows; this value keeps the result non-trivial
    * at both verification scales (sf0.01 and sf0.1).
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation").filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val partval = Tables(spark, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("value"))
      .persist() // feeds both the 1-row total and the filter — aggregate once
    partval
      .join(broadcast(partval.agg((sum(col("value")) * 0.0002).as("threshold"))),
        col("value") > col("threshold"))
      .select(col("l_partkey").as("p_partkey"), round(col("value"), 4).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH partval AS (
      |  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_partkey, round(value, 4) AS value
      |FROM partval
      |WHERE value > (SELECT sum(value) * 0.0002 FROM partval)
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** TPC-H Q12 shape (shipping priority): high- vs low-priority line
    * counts among LATE shipments — a fact-fact join whose defining
    * predicate (`l_shipdate > o_orderdate + 60 days`) spans both inputs,
    * so it evaluates as a post-join residual while the year filter still
    * prunes the lineitem scan. Groups by `l_linestatus` (the absent
    * `l_shipmode`'s stand-in).
    */
  def q12LateShipments(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(Tables(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_shipdate", "l_linestatus"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy("l_linestatus")
      .agg(
        count(when(high, lit(1))).as("high_line_count"),
        count(when(!high, lit(1))).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS high_line_count,
      |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS low_line_count
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q16 shape (part-supplier relationships): distinct supplier
    * count per (brand, type, size), excluding a complained-about supplier
    * set — the NOT-IN becomes a left-anti broadcast join (the exclusion
    * set is tiny by construction), and the count-distinct shuffles once on
    * the group keys. The part→supplier link rides lineitem (no partsupp).
    */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excluded = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape (part promotion): suppliers in one nation who shipped
    * more than 20% of a small-part's 1997 volume — TPC-H's
    * `ps_availqty > 0.5 * sum(l_quantity)` nested-IN chain with the
    * availability leg re-sourced from lineitem itself. Decorrelated: the
    * per-(part,supplier) quantity aggregate joins against the broadcast
    * per-part 20% threshold, and the qualifying supplier keys semi-join
    * into the nation-filtered supplier dimension.
    */
  def q20ShareOfPart(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables(spark, dir, "part")
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    // `qty` feeds two consumers (the 20% thresholds and the qualifying
    // join) — persisted so the date+part-filtered lineitem scan+aggregate
    // runs ONCE per execution. One row per (small part, supplier): bounded,
    // cheap to cache at any scale. Released by clearCache/session close.
    val qty = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).as("supp_qty"))
      .persist()
    val thresholds = qty.groupBy(col("l_partkey").as("t_partkey"))
      .agg((sum(col("supp_qty")) * 0.2).as("qty_threshold"))
    val qualifying = qty
      .join(broadcast(thresholds),
        col("l_partkey") === col("t_partkey") && col("supp_qty") > col("qty_threshold"))
      .select("l_suppkey").distinct()
    Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation").filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  val q20Sql: String =
    """WITH qty AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM qty
      |    WHERE supp_qty > (SELECT 0.2 * sum(supp_qty) FROM qty q2
      |                      WHERE q2.l_partkey = qty.l_partkey))
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    * multi-supplier orders, the supplier who was the ONLY one to return
    * goods — the EXISTS (another supplier participated) + NOT EXISTS
    * (another supplier also failed) pair, decorrelated into one per-order
    * aggregate carrying both distinct-supplier counts. The aggregate and
    * the returning lines join on l_orderkey (the key both already shuffle
    * on, so AQE reuses the exchange); supplier attribution broadcasts.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val ostat = li.groupBy(col("l_orderkey").as("w_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret_supps"))
      .filter(col("n_supps") > 1 && col("n_ret_supps") === 1)
    li.filter(col("l_returnflag") === "R")
      .join(ostat, col("l_orderkey") === col("w_orderkey"))
      .join(broadcast(Tables(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_suppkey").distinct()
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH ostat AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supps,
      |    count(DISTINCT CASE WHEN l_returnflag = 'R'
      |                        THEN l_suppkey END) AS n_ret_supps
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT s_name, count(*) AS numwait
      |FROM (
      |  SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem
      |  JOIN ostat USING (l_orderkey)
      |  JOIN orders ON o_orderkey = l_orderkey
      |  WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
      |    AND n_supps > 1 AND n_ret_supps = 1)
      |JOIN supplier ON s_suppkey = l_suppkey
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin
}
