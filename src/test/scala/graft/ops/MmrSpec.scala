package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MmrSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"
  val (k, nCand) = (8, 20)

  /** Same accumulation order as [[graft.functions.CosineSimilarity]]:
    * left-to-right dot + norms, one final divide — bit-equal on the JVM. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Full independent recompute from the raw embeddings: brute top-nCand
    * candidates, then the greedy λ·rel − μ·maxsim selection in plain
    * Scala doubles (identical IEEE ops ⇒ identical decisions). */
  private def bruteMmr(): Map[Long, Seq[(Long, Double)]] = {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val (lam, mu) = (0.7, 0.3)
    vecs.filter(_._1 <= TextAnalysis.ServeBatchMaxId).map { case (q, qv) =>
      val cand = vecs.filter(_._1 != q)
        .map { case (n, v) => (n, cos(qv, v), v) }
        .sortBy { case (n, rel, _) => (-rel, n) }
        .take(nCand)
      val selected = collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double])]
      (1 to k).foreach { _ =>
        val pick = cand
          .filter { case (n, _, _) => !selected.exists(_._1 == n) }
          .map { case (n, rel, v) =>
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.map(s => cos(v, s._3)).max
            (lam * rel - mu * maxSim, n, v)
          }
          .minBy { case (score, n, _) => (-score, n) }
        selected += ((pick._2, pick._1, pick._3))
      }
      q -> selected.toSeq.map(s => (s._1, s._2))
    }.toMap
  }

  test("mmrRerankTopK: greedy selection matches the independent brute recompute") {
    val got = Similarity.mmrRerankTopK(spark, dir, k, nCand).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    val want = bruteMmr()
    assert(got.keySet == want.keySet)
    for ((q, sel) <- want) {
      val g = got(q)
      assert(g.map(_._1) == sel.map(_._1),
        s"q=$q: picked ${g.map(_._1)} vs brute ${sel.map(_._1)}")
      for (((_, gs), (_, ws)) <- g.zip(sel))
        assert(math.abs(gs - BigDecimal(ws).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("exhausted queries truncate cleanly: k > nCand yields exactly nCand picks, no nulls") {
    // nCand = 3 < k = 8: every query runs out of candidates mid-fold — the
    // guard must stop the selection at 3 clean rows (never a null struct
    // from array_max over an empty filtered set)
    val small = 3
    val out = Similarity.mmrRerankTopK(spark, dir, k, small).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.isNullAt(2)), "null n_id leaked from an exhausted fold step")
    val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    for ((q, ranks) <- perQ)
      assert(ranks == (1 to small), s"q=$q: expected ranks 1..$small, got $ranks")
  }

  test("mmr diversifies: selected sets are no more self-similar than plain top-k") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for {
        (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      } yield cos(vecs(a), vecs(b))
      ps.sum / ps.length
    }
    // plain relevance top-k per batch query, brute from the raw vectors
    def topk(q: Long, n: Int): Seq[Long] = vecs.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, cos(vecs(q), v)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(n).map(_._1)
    val mmr = Similarity.mmrRerankTopK(spark, dir, k, nCand).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSeq).toMap
    val plain = mmr.keys.map(q => q -> topk(q, k)).toMap
    val (m, p) = (mmr.map { case (_, ids) => meanPairSim(ids) }.sum / mmr.size,
      plain.map { case (_, ids) => meanPairSim(ids) }.sum / plain.size)
    assert(m <= p + 1e-12, s"MMR mean pairwise sim $m > top-k's $p")
    // rank 1 is the pure-relevance argmax (empty-selection penalty = 0)
    val first = Similarity.mmrRerankTopK(spark, dir, k, nCand).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(first == mmr.keys.map(q => q -> topk(q, 1).head).toMap,
      "rank-1 pick must be the relevance argmax")
  }
}
