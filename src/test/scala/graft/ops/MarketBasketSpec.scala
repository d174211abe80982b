package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MarketBasketSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("basketRulesOf: hand-built baskets produce exactly the hand-computed rules") {
    import spark.implicits._
    // 6 baskets over items {A,B,C,D}: {A,B,C} ×3, {A,B,D} ×2, {A,C} ×1
    val items = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "A"), (3L, "B"), (3L, "C"),
      (4L, "A"), (4L, "B"), (4L, "D"),
      (5L, "A"), (5L, "B"), (5L, "D"),
      (6L, "A"), (6L, "C"))
      .toDF("basket", "item")
    val out = MarketBasket.basketRulesOf(items, minTriple = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // frequent triples: (A,B,C) n=3, (A,B,D) n=2 → 3 rules each
    assert(out.length == 6)
    val abc = out.find(t => (t._1, t._2, t._3) == (("A", "B", "C"))).get
    // n_abc=3, n_ab(A,B)=5, n_c(C)=4
    assert((abc._4, abc._5, abc._6) == ((3L, 5L, 4L)))
    val acb = out.find(t => (t._1, t._2, t._3) == (("A", "C", "B"))).get
    // antecedent pair (A,C) has n_ab=4 (baskets 1,2,3,6); consequent B n=5
    assert((acb._4, acb._5, acb._6) == ((3L, 4L, 5L)))
    val abd = out.find(t => (t._1, t._2, t._3) == (("A", "B", "D"))).get
    assert((abd._4, abd._5, abd._6) == ((2L, 5L, 2L)))
  }

  test("basketRules: integer-grid metrics re-derive from the counts; Apriori bounds hold") {
    val out = MarketBasket.basketRules(spark, dir).collect()
    assert(out.nonEmpty, "no frequent triples at this SF")
    for (r <- out) {
      val (nAbc, nAb, nC, nBaskets) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      // Apriori monotonicity: a triple is never more frequent than its
      // antecedent pair or its consequent item
      assert(nAbc <= nAb && nAbc <= nC && nAb <= nBaskets)
      assert(nAbc >= MarketBasket.MinTripleCount)
      assert(r.getLong(7) == nAbc * 1000000L / nBaskets, "support_ppm")
      assert(r.getLong(8) == nAbc * 1000000L / nAb, "confidence_ppm")
      assert(r.getLong(9) == nAbc * nBaskets * 1000L / (nAb * nC), "lift_milli")
      assert(r.getString(0) < r.getString(1), "antecedent pair normalized")
    }
    // every triple contributes exactly its 3 consequent choices
    val byTriple = out.groupBy(r =>
      Set(r.getString(0), r.getString(1), r.getString(2)))
    assert(byTriple.values.forall(_.length == 3))
    assert(byTriple.values.forall(g => g.map(_.getLong(3)).distinct.length == 1),
      "the three rules of one triple must share n_abc")
  }
}
