package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The decision-support tail of the TPC-H-shaped suite: subquery and
  * outer-join plan shapes that [[Tpch]]'s star joins don't reach —
  * correlated scalar subqueries (Q17), scalar-subquery equality against an
  * aggregate (Q15), HAVING-membership (Q18), left-outer count
  * distributions (Q13), two-role dimension joins (Q7/Q8), OR-of-ANDs
  * predicate pushdown (Q19), and scalar-average + anti-join (Q22).
  *
  * Queries are adapted to the slimmed testdata schema (no `partsupp`, no
  * `l_shipmode`/`l_commitdate`, no `c_phone` — TESTDATA.md): predicates
  * that TPC-H puts on missing columns move to present ones with the same
  * plan shape (e.g. Q13's `o_comment NOT LIKE` becomes an
  * `o_orderpriority` filter — still a join-side predicate on the outer
  * join's right input).
  *
  * Scale-first like [[Tpch]]: every correlated subquery is written
  * DECORRELATED — the aggregate-then-join form Catalyst would rewrite to
  * anyway, stated explicitly so the shuffle structure is visible in the
  * code. Dimension tables broadcast; the only big shuffles are fact-fact
  * joins and per-key aggregates of lineitem.
  */
object TpchTail {

  /** TPC-H Q7 shape (volume shipping): revenue flowing between two nations
    * by supplier-side and customer-side role, per ship year. The nation
    * dimension is joined TWICE in different roles; both role dims and
    * supplier are broadcast pre-filtered to the two nations, so the fact
    * scan is cut by the broadcast hash lookups before the one fact-fact
    * shuffle (lineitem⋈orders).
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_1", "NATION_2")
    val nation = Tables(spark, dir, "nation").filter(col("n_name").isin(nations: _*))
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables(spark, dir, "lineitem").filter(
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
      col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year,
      |    l_extendedprice * (1 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape (market share): one nation's share of regional revenue
    * for one part type, per order year — a conditional-fraction aggregate
    * over a 7-table join where nation again plays two roles (customer's
    * region membership, supplier's identity). Everything but
    * lineitem⋈orders broadcasts.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val asiaNations = nation
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("nation"))
    val promoParts = Tables(spark, dir, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val ord = Tables(spark, dir, "orders").filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("nation") === "NATION_5", vol).otherwise(lit(0.0))) / sum(vol),
        4).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT o_year, round(
      |    sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) / sum(volume),
      |    4) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume,
      |    n2.n_name AS nation
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q13 shape (customer order distribution): LEFT OUTER join with a
    * predicate on the join's RIGHT input (orders filtered before the join ≡
    * the ON-clause filter — a WHERE filter would wrongly drop zero-order
    * customers), count per customer including the zero bucket, then the
    * distribution of those counts. Two aggregates, each a single hash
    * shuffle; at 100 TB the first groups on c_custkey (already the join
    * key, so AQE coalesces the exchanges).
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val nonUrgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    Tables(spark, dir, "customer")
      .join(nonUrgent, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15 shape (top supplier): per-supplier quarterly revenue, keep
    * the supplier(s) equal to the global max. The scalar subquery is
    * decorrelated by hand: the 1-row max aggregate is broadcast back onto
    * the revenue frame (never a single-partition window, which would
    * serialize the whole frame through one task at scale). Revenue is
    * rounded BEFORE the max comparison in both engines so double noise
    * can't make the equality engine-dependent.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    revenue
      .join(broadcast(revenue.agg(max(col("total_revenue")).as("max_revenue"))),
        col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 shape (small-quantity revenue): lineitems of one brand below
    * 20% of their part's average quantity. The correlated scalar subquery
    * (`avg(l_quantity)` per outer part) is decorrelated into a per-part
    * aggregate joined back — and the aggregate input is FIRST semi-joined
    * to the brand's parts ("magic set"): the correlation is only ever
    * evaluated for brand parts, so at 100 TB the avg runs over ~1/|brands|
    * of lineitem instead of all of it.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables(spark, dir, "part")
      .filter(col("p_brand") === "Brand#12").select("p_partkey")
    val li = Tables(spark, dir, "lineitem")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val partAvg = li.groupBy(col("l_partkey").as("avg_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_threshold"))
    li.join(broadcast(partAvg), col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#12'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** TPC-H Q18 shape (large-volume orders): orders whose total quantity
    * exceeds a threshold, with customer attribution — the HAVING-membership
    * subquery. Decorrelated: the per-order quantity aggregate IS the
    * subquery and also supplies the output column, so lineitem aggregates
    * once (not once for the IN and again for the SELECT), the qualifying
    * keys broadcast onto orders, and the top-100 runs as
    * TakeOrderedAndProject.
    */
  def q18LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 300)
    Tables(spark, dir, "orders")
      .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
      |  round(sum(l_quantity), 2) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 300)
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q19 shape (discounted revenue): OR-of-ANDs across both join
    * sides. The disjunction can't be pushed whole, but Catalyst extracts
    * the common implied filters (`p_brand IN (...)`, `p_size <= 15`,
    * `l_quantity <= 30`) below the join, so both scans still prune; the
    * residual OR evaluates on the joined row inside codegen.
    */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  val q19Sql: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q22 shape (sales opportunity): above-average-balance customers
    * in chosen segments with no urgent orders (every testdata customer has
    * SOME order, so TPC-H's "no orders at all" is moved to "no 1-URGENT
    * order" — same scalar-average subquery + anti-join shape). The average
    * is a 1-row broadcast; the urgent-customer key set broadcasts into a
    * left-anti probe.
    */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val segments = Seq("BUILDING", "MACHINERY", "HOUSEHOLD")
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment").isin(segments: _*))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val urgentCusts = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct()
    cust
      .join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
      .join(broadcast(urgentCusts), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val q22Sql: String =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
      |  AND c_acctbal > (
      |    SELECT avg(c_acctbal) FROM customer
      |    WHERE c_acctbal > 0
      |      AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD'))
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
}
