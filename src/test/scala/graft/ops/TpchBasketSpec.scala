package graft.ops

import graft.SparkSuite

class TpchBasketSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("alsoBought: pairs only from shared orders; lift re-derived independently") {
    val out = Tpch.alsoBought(spark, dir, minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty, "no co-occurring pairs at this SF")
    val items = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val partOrders = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for ((p1, p2, nab, na, nb, lift) <- out.take(20)) {
      assert(p1 < p2)
      val shared = byOrder.values.count(s => s.contains(p1) && s.contains(p2)).toLong
      assert(shared == nab, s"($p1,$p2) support $nab vs brute $shared")
      assert(na == partOrders(p1) && nb == partOrders(p2))
      val want = (nab * nOrders).toDouble / (na * nb)
      assert(math.abs(lift - want) < 1e-12, s"lift $lift vs $want")
    }
  }
}
