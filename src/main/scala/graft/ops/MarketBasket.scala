package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Association-RULE mining over order baskets at itemset depth 3 — the
  * Apriori step past [[Tpch.alsoBought]]'s pair co-occurrence ranking:
  * rules (A, B) → C with support, confidence, and lift, i.e. "baskets
  * holding both A and B go on to hold C". Confidence is what makes this
  * rule mining rather than co-occurrence scoring — it is directional, and
  * it is the quantity a recommender thresholds. Baskets are orders; items
  * are part BRANDS (25 distinct — the granularity with co-occurrence
  * signal; raw partkeys at 200k/SF are support-1 noise).
  *
  * Every metric lands on an exact INTEGER grid, so the DuckDB oracle
  * compares bit-for-bit with no float division anywhere:
  *
  *  - support_ppm    = ⌊n_abc · 10⁶ / n_baskets⌋
  *  - confidence_ppm = ⌊n_abc · 10⁶ / n_ab⌋
  *  - lift_milli     = ⌊n_abc · n_baskets · 10³ / (n_ab · n_c)⌋
  *    (lift of the rule vs. the consequent's base rate)
  *
  * All operands are non-negative, so Spark's `div` (truncation) and
  * DuckDB's `//` (floor) agree. Products stay under 2⁶³ up to
  * n_baskets ≈ 9.2 · 10¹²; past that, promote the products to
  * DECIMAL(38,0) on the same floor-division grid.
  *
  * Scale shape: ONE basket-keyed shuffle builds the per-basket item-set
  * array (`collect_set` dedupes in the aggregate — no separate distinct
  * pass), and every itemset level then EXPLODES that sorted array
  * in-place: singles, ordered pairs (i < j), ordered triples (i < j < k)
  * — per-basket fan-out bounded by C(basket width, 3), never a self-join
  * of the corpus against itself (the naive 3-way items⋈items⋈items plan
  * costs three sort-merge passes and re-shuffles the corpus per level;
  * this one shuffles it once and the per-level aggregates run over
  * vocabulary-bounded keys, ≤ C(25,3) ≈ 2.3k triple types here). The
  * per-item and per-pair counts join back as broadcasts (≤ |vocab|²
  * rows); the basket total rides in as a broadcast 1-row cross join.
  * At 100 TB a basket-width cap before the explode is the standard
  * guard (a degenerate million-item basket would fan out cubically);
  * order baskets are schema-bounded so none is applied here.
  */
object MarketBasket {

  /** Minimum triple co-occurrence count for a rule to surface (support
    * floor — rules below it are noise and bloat the output at any scale). */
  val MinTripleCount = 20

  def basketRules(spark: SparkSession, dir: String): DataFrame = {
    val brand = broadcast(
      Tables(spark, dir, "part").select(col("p_partkey"), col("p_brand")))
    val items = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(brand, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
    basketRulesOf(items)
  }

  /** [[basketRules]] over any `(basket, item)` frame — duplicate
    * (basket, item) rows are fine, the set aggregate dedupes
    * (library surface). */
  def basketRulesOf(items: DataFrame, minTriple: Int = MinTripleCount): DataFrame = {
    val baskets = items.groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("its"))
    val nBaskets = baskets.select(count(lit(1)).as("n_baskets"))
    val itemCounts = baskets.select(explode(col("its")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairCounts = baskets.filter(size(col("its")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(its) - 1), i ->
          |  transform(sequence(i + 1, size(its)), j ->
          |    struct(element_at(its, i) AS a, element_at(its, j) AS b))))"""
          .stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val tripleCounts = baskets.filter(size(col("its")) >= 3)
      .select(explode(expr(
        """flatten(flatten(transform(sequence(1, size(its) - 2), i ->
          |  transform(sequence(i + 1, size(its) - 1), j ->
          |    transform(sequence(j + 1, size(its)), k ->
          |      struct(element_at(its, i) AS a, element_at(its, j) AS b,
          |             element_at(its, k) AS c))))))""".stripMargin)).as("t"))
      .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minTriple)
    // rules (a,b) → c for each of the triple's three consequent choices;
    // the antecedent pair key is normalized (x < y) to hit pairCounts
    val rules = tripleCounts.select(
      explode(array(
        struct(col("a").as("x"), col("b").as("y"), col("c").as("z")),
        struct(col("a").as("x"), col("c").as("y"), col("b").as("z")),
        struct(col("b").as("x"), col("c").as("y"), col("a").as("z")))).as("r"),
      col("n_abc"))
      .select(col("r.x").as("ant_1"), col("r.y").as("ant_2"),
        col("r.z").as("consequent"), col("n_abc"))
    rules
      .join(broadcast(pairCounts
        .select(col("a").as("ant_1"), col("b").as("ant_2"), col("n_ab"))),
        Seq("ant_1", "ant_2"))
      .join(broadcast(itemCounts
        .select(col("item").as("consequent"), col("n_item").as("n_c"))),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("ant_1"), col("ant_2"), col("consequent"),
        col("n_abc"), col("n_ab"), col("n_c"), col("n_baskets"),
        expr("(n_abc * 1000000) div n_baskets").as("support_ppm"),
        expr("(n_abc * 1000000) div n_ab").as("confidence_ppm"),
        expr("(n_abc * n_baskets * 1000) div (n_ab * n_c)").as("lift_milli"))
      .orderBy("ant_1", "ant_2", "consequent")
  }

  val basketRulesSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |), n AS (
       |  SELECT count(DISTINCT basket) AS n_baskets FROM items
       |), ic AS (
       |  SELECT item, count(*) AS n_item FROM items GROUP BY item
       |), pc AS (
       |  SELECT a.item AS a, b.item AS b, count(*) AS n_ab
       |  FROM items a JOIN items b
       |    ON a.basket = b.basket AND a.item < b.item
       |  GROUP BY 1, 2
       |), tc AS (
       |  SELECT a.item AS a, b.item AS b, c.item AS c, count(*) AS n_abc
       |  FROM items a
       |  JOIN items b ON a.basket = b.basket AND a.item < b.item
       |  JOIN items c ON b.basket = c.basket AND b.item < c.item
       |  GROUP BY 1, 2, 3
       |  HAVING count(*) >= $MinTripleCount
       |), rules AS (
       |  SELECT a AS ant_1, b AS ant_2, c AS consequent, n_abc FROM tc
       |  UNION ALL
       |  SELECT a, c, b, n_abc FROM tc
       |  UNION ALL
       |  SELECT b, c, a, n_abc FROM tc
       |)
       |SELECT ant_1, ant_2, consequent, n_abc, n_ab, ic.n_item AS n_c,
       |  n_baskets,
       |  (n_abc * 1000000) // n_baskets AS support_ppm,
       |  (n_abc * 1000000) // n_ab AS confidence_ppm,
       |  (n_abc * n_baskets * 1000) // (n_ab * ic.n_item) AS lift_milli
       |FROM rules
       |JOIN pc ON pc.a = ant_1 AND pc.b = ant_2
       |JOIN ic ON ic.item = consequent
       |CROSS JOIN n
       |ORDER BY ant_1, ant_2, consequent""".stripMargin
}
