package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DimTruncationSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"
  val k = 10

  private def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
    var (dt, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < d) { dt += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dt / (math.sqrt(na) * math.sqrt(nb))
  }

  test("full-width row is the exact anchor; recall re-derives from a brute recompute") {
    val out = Similarity.dimTruncationEval(spark, dir, k).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == Set(16, 32, 64))
    assert(out.values.map(_._1).toSet.size == 1, "same panel size per width")
    // truth-vs-itself: the full-width leg must be a perfect 1.0/1.0/1.0
    assert(out(64) == ((out(64)._1, 1.0, 1.0, 1.0)), s"anchor row ${out(64)}")
    for ((_, (_, rec, mrr, ndcg)) <- out)
      assert(rec >= 0 && rec <= 1 && mrr >= 0 && mrr <= 1 && ndcg >= 0 && ndcg <= 1)
    // independent recall@k recompute from the raw vectors
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val panel = vecs.filter(_._1 % 50 == 0).map(_._1)
    def topk(q: Long, d: Int): Set[Long] = vecs.filter(_._1 != q)
      .map { case (n, v) => (n, cos(vecs.find(_._1 == q).get._2, v, d)) }
      .sortBy { case (n, rel) => (-rel, n) }.take(k).map(_._1).toSet
    for (d <- Seq(16, 32)) {
      val want = panel.map { q =>
        val truth = topk(q, 64)
        topk(q, d).count(truth).toDouble / k
      }.sum / panel.length
      assert(math.abs(out(d)._2 - BigDecimal(want).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"d=$d recall ${out(d)._2} vs brute $want")
    }
  }
}
