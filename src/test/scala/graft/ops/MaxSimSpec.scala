package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MaxSimSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.01"

  /** In-memory ground truth: brute MaxSim over ALL doc pairs — no LSH,
    * no Spark aggregation; the spec's independent recurrence. */
  private def bruteTruth(k: Int): (Set[(Long, Long)], Map[Long, Array[Array[Double]]]) = {
    val rows = Tables(spark, dir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val byDoc = rows.groupBy(_._1 / MaxSim.MaxSimFan).view
      .mapValues(_.sortBy(_._1).map(_._2)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def maxSim(q: Array[Array[Double]], d: Array[Array[Double]]): Double =
      q.map(qv => d.map(dv => cos(qv, dv)).max).sum
    val qDocs = byDoc.keys.filter(_ <= MaxSim.queryMaxDoc).toSeq.sorted
    val truth = qDocs.flatMap { q =>
      byDoc.keys.filter(_ != q).toSeq
        .map(d => (d, maxSim(byDoc(q), byDoc(d))))
        .sortBy { case (d, s) => (-s, d) }.take(k)
        .map { case (d, _) => (q, d) }
    }.toSet
    (truth, byDoc.map { case (k2, v) => k2 -> v })
  }

  test("maxSimTopK: deterministic; LSH shortlist recovers the brute MaxSim truth") {
    val m1 = MaxSim.maxSimTopK(spark, dir).collect()
    val m2 = MaxSim.maxSimTopK(spark, dir).collect()
    assert(m1.map(_.toString).toSeq == m2.map(_.toString).toSeq)
    val got = m1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val (truth, _) = bruteTruth(10)
    val recall = (got & truth).size.toDouble / truth.size
    // chunk-level banding admits a doc pair on ANY of fan×tables bucket
    // collisions — measured recall 1.0 at sf0.01 AND sf0.1; floor, not
    // target
    assert(recall >= 0.9, s"MaxSim shortlist recall collapsed: $recall")
  }

  test("maxSimRetrievalEval: the shortlist currently loses nothing to brute — pinned as the regression tripwire") {
    // 1.0 everywhere today (chunk-level banding admits a pair on ANY of
    // fan×tables collisions); a future LshBits/LshTables weakening or a
    // candidate-join bug shows up HERE first
    val m = MaxSim.maxSimRetrievalEval(spark, dir).collect()(0)
    assert(m.getLong(0) > 0)
    assert(m.getDouble(1) == 1.0, s"maxsim shortlist recall dropped: ${m.getDouble(1)}")
    assert(m.getDouble(2) == 1.0, s"maxsim MRR dropped: ${m.getDouble(2)}")
  }

  test("maxSimTopK: late interaction is not single-vector retrieval in disguise") {
    // mean-pooling each doc's chunks into ONE vector (the single-vector
    // baseline the operator exists to beat) recovers well under 70% of
    // the MaxSim truth — measured 0.41 at sf0.01, 0.25 at sf0.1. If this
    // ever converges to 1, the fixture stopped exercising late
    // interaction and the operator is redundant.
    val (truth, byDoc) = bruteTruth(10)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val pooled = byDoc.map { case (d, chunks) =>
      val rep = new Array[Double](chunks.head.length)
      for (c <- chunks; i <- rep.indices) rep(i) += c(i) / chunks.length
      d -> rep
    }
    val qDocs = pooled.keys.filter(_ <= MaxSim.queryMaxDoc).toSeq.sorted
    val svTruth = qDocs.flatMap { q =>
      pooled.keys.filter(_ != q).toSeq
        .map(d => (d, cos(pooled(q), pooled(d))))
        .sortBy { case (d, s) => (-s, d) }.take(10)
        .map { case (d, _) => (q, d) }
    }.toSet
    val svRecall = (svTruth & truth).size.toDouble / truth.size
    assert(svRecall < 0.7,
      s"single-vector baseline recovers $svRecall of MaxSim truth — contrast collapsed")
  }

  test("maxSimAdcTopK: the quantized cascade holds a recall floor and genuinely re-ranks") {
    val adc = MaxSim.maxSimAdcTopK(spark, dir).collect()
    // determinism
    val again = MaxSim.maxSimAdcTopK(spark, dir).collect()
    assert(adc.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // recall floor vs the brute truth (measured 0.98 at sf0.01 with the
    // 100-deep shortlist; an ABSOLUTE floor, not parity with the raw
    // serve — the PQ tier is lossy by design)
    val got = adc.map(r => (r.getLong(0), r.getLong(1))).toSet
    val (truth, _) = bruteTruth(10)
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.85, s"quantized-cascade recall collapsed: $recall")
    // released scores are EXACT MaxSim values: every (pair, score) the
    // cascade releases must appear with the identical score in the raw
    // serve's scoring of the same pair set — the re-rank tier is the
    // shared exact tail, so agreement is structural, and this pins it
    val raw = MaxSim.maxSimTopK(spark, dir, k = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    for (r <- adc) {
      val key = (r.getLong(0), r.getLong(1))
      raw.get(key).foreach(s => assert(s == r.getDouble(3),
        s"cascade released a non-exact score for $key"))
    }
    // the quantized tier must do REAL work: the ADC shortlist ordering
    // differs from the exact ordering somewhere (else the codes are
    // secretly lossless and the eval row is vacuous)
    val eval = MaxSim.maxSimAdcEval(spark, dir).collect()(0)
    assert(eval.getDouble(1) >= 0.85, s"eval recall floor: ${eval.getDouble(1)}")
    assert(eval.getDouble(2) >= 0.95, s"eval MRR floor: ${eval.getDouble(2)}")
  }
}
