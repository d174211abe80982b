package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TripletMiningSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("triplet selections match the independent brute recompute; band semantics hold") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val out = Contrastive.tripletMining(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4),
        r.getLong(5), r.getDouble(6), r.getBoolean(7)))).toMap
    val anchors = vecs.filter(_._1 % 50 == 0)
    assert(out.keySet == anchors.map(_._1).toSet)
    val margin = 0.05
    for ((aId, aLabel, aV) <- anchors) {
      val (posId, cosAp, semiHard, negId, cosAn, violation) = out(aId)
      val scored = vecs.filter(_._1 != aId)
        .map { case (n, l, v) => (n, l, cos(aV, v)) }
      // hardest positive: same label, min cosine, tie → smaller id
      val (wantPos, wantCosAp) = scored.filter(_._2 == aLabel)
        .map { case (n, _, c) => (c, n) }.min match { case (c, n) => (n, c) }
      assert(posId == wantPos, s"a=$aId pos $posId vs $wantPos")
      assert(math.abs(cosAp - BigDecimal(wantCosAp).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      val negs = scored.filter(_._2 != aLabel)
      val band = negs.filter(x => x._3 < wantCosAp && x._3 > wantCosAp - margin)
      val want =
        if (band.nonEmpty) band.maxBy(x => (x._3, -x._1))
        else negs.maxBy(x => (x._3, -x._1))
      assert(semiHard == band.nonEmpty, s"a=$aId semi_hard flag")
      assert(negId == want._1, s"a=$aId neg $negId vs ${want._1}")
      assert(violation == (want._3 >= wantCosAp), s"a=$aId violation flag")
      // a semi-hard pick can never itself violate the margin ordering
      if (semiHard) assert(!violation && cosAn < cosAp + 1e-12)
    }
  }
}
