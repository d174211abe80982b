package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("cosine: exact on known vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(3.0, 4.0), Seq(3.0, 4.0), 1.0)
    ).toDF("a", "b", "expected")
    val bad = df.filter(
      abs(Similarity.cosine(col("a"), col("b")) - col("expected")) > 1e-12).count()
    assert(bad == 0)
  }

  test("retrievalEval: metrics re-derive from the raw id sets (bitmask arithmetic guard)") {
    // Independent recompute path: collect the two top-k id sets and walk
    // them directly — no bitmask, no decimal grid — then compare against
    // the operator's averaged metrics at the final 6-dp rounding. Guards
    // the pow/bitmask fold and the decimal averaging against silent
    // arithmetic drift (the DuckDB oracle pins cross-engine equality, not
    // internal correctness of the shared expression strings).
    val dir = "/root/testdata/sf0.01"
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Int)]] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = pairs(Similarity.annLshTopK(spark, dir, k))
    val truth = pairs(Similarity.annTopKBrute(spark, dir, k))
    val w = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val idcg = w.sum
    val perQ = truth.keys.toSeq.map { q =>
      val t = truth(q).map(_._1).toSet
      val hitRanks = got.getOrElse(q, Seq.empty).filter(p => t.contains(p._1)).map(_._2)
      val recall = hitRanks.size.toDouble / k
      val mrr = if (hitRanks.isEmpty) 0.0 else 1.0 / hitRanks.min
      val ndcg = hitRanks.sorted.map(r => w(r - 1)).sum / idcg
      (recall, mrr, ndcg)
    }
    def avg6(xs: Seq[Double]): Double =
      (xs.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        / perQ.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Similarity.retrievalEval(spark, dir, k).collect().head
    assert(row.getLong(0) == perQ.size, "n_queries mismatch")
    val (gr, gm, gn) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    val (er, em, en) =
      (avg6(perQ.map(_._1)), avg6(perQ.map(_._2)), avg6(perQ.map(_._3)))
    // the walk recomputes on plain doubles; the operator on the decimal
    // grid — agreement to 1e-6 at the shared final rounding is the claim
    assert(math.abs(gr - er) <= 1e-6, s"recall $gr vs recompute $er")
    assert(math.abs(gm - em) <= 1e-6, s"mrr $gm vs recompute $em")
    assert(math.abs(gn - en) <= 1e-6, s"ndcg $gn vs recompute $en")
  }

  test("codegen cosine expression is bit-equal to the HOF formulation") {
    val vecs = Similarity.asDoubleForTest(spark, "/root/testdata/sf0.001")
    val hof = Similarity.dot(col("a"), col("b")) /
      (Similarity.norm(col("a")) * Similarity.norm(col("b")))
    val bad = vecs.filter(
      graft.functions.CosineSimilarity(col("a"), col("b")) =!= hof).count()
    assert(bad == 0)
  }

  test("LSH embedding near-dup: recall against the brute-force anchor") {
    val dir = "/root/testdata/sf0.01"
    val brute = Dedup.embeddingNearDup(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are a subset — no false pairs (exact cosine verifies)
    assert((lsh -- brute).isEmpty)
    val recall = (brute & lsh).size.toDouble / brute.size
    // cos 0.4-0.5 pairs → per-table p ≈ 0.11, 12 tables → ~0.77 expected
    assert(recall >= 0.5, s"LSH near-dup recall degraded: $recall")
  }

  test("IVF top-k: recall against the brute-force anchor, deterministic") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = Similarity.annIvfTopK(spark, dir).collect()
    val ivf2 = Similarity.annIvfTopK(spark, dir).collect()
    assert(ivf1.map(_.toString).toSeq == ivf2.map(_.toString).toSeq,
      "seeded KMeans quantizer must make IVF deterministic")
    val ivfSet = ivf1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    // 4/16 cells probed on near-orthogonal vectors — a recall floor, not a
    // quality target (see the LSH note above)
    assert(recall >= 0.3, s"IVF recall@10 degraded: $recall")
  }

  test("annFilteredTopK: label predicate enforced pre-scan, deterministic, beats post-filtering") {
    val dir = "/root/testdata/sf0.01"
    val rows = Tables(spark, dir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val labels = rows.map(r => r._1 -> r._3).toMap
    val vecs = rows.map(r => r._1 -> r._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val f1 = Similarity.annFilteredTopK(spark, dir).collect()
    val f2 = Similarity.annFilteredTopK(spark, dir).collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq,
      "fitted-centroid quantizer must make the filtered serve deterministic")
    // the serving contract: fixed batch, and EVERY neighbor satisfies the
    // metadata predicate (the filter ran in the scan, nothing leaked past)
    for (r <- f1) {
      assert(r.getLong(0) <= 100L, s"query outside the pinned batch: $r")
      assert(labels(r.getLong(1)) == labels(r.getLong(0)),
        s"neighbor violates the label predicate: $r")
    }
    // recall vs the brute same-label truth: at this SF every label's
    // member count (~50) is below the k·α = 150 adaptive budget, so the
    // serve probes the label exhaustively — recall must be ≈ 1
    val batch = rows.filter(_._1 <= 100L)
    val truth = batch.flatMap { case (q, qv, ql) =>
      rows.filter(r => r._1 != q && r._3 == ql)
        .map(r => (q, r._1, cos(qv, r._2)))
        .sortBy { case (_, id, c) => (-c, id) }.take(10).map(t => (t._1, t._2))
    }.toSet
    val got = f1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.95, s"filtered-serve recall@10 degraded: $recall")
    // the CONTRAST the docstring documents: post-filtering an UNfiltered
    // exact top-k by label keeps only the same-label fraction (~1/|labels|
    // of each list) — far fewer answers than the pre-filtered scan returns
    val postFilter = batch.flatMap { case (q, qv, ql) =>
      rows.filter(_._1 != q)
        .map(r => (r._1, cos(qv, r._2), r._3))
        .sortBy { case (id, c, _) => (-c, id) }.take(10)
        .filter(_._3 == ql).map(t => (q, t._1))
    }
    assert(postFilter.size < got.size / 2,
      s"post-filter kept ${postFilter.size} of the pre-filter's ${got.size} — " +
        "contrast collapsed, the pre-filter scan is not earning its place")
  }

  test("ivfPqFilteredTopK: label predicate enforced on the coded scan, deterministic, candidates agree with the exact-rank filtered serve") {
    val dir = "/root/testdata/sf0.01"
    val labels = Tables(spark, dir, "embeddings").select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val f1 = Similarity.ivfPqFilteredTopK(spark, dir).collect()
    val f2 = Similarity.ivfPqFilteredTopK(spark, dir).collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq,
      "fitted quantizers must make the filtered ADC serve deterministic")
    for (r <- f1) {
      assert(r.getLong(0) <= 100L, s"query outside the pinned batch: $r")
      assert(labels(r.getLong(1)) == labels(r.getLong(0)),
        s"neighbor violates the label predicate: $r")
    }
    // both filtered serves prune the IDENTICAL (cell, label) candidate set
    // and differ only in scoring (exact cosine vs ADC) — so per query they
    // return the same NUMBER of results, and their id sets overlap well
    // above the unfiltered-vs-filtered baseline
    val exact = Similarity.annFilteredTopK(spark, dir).collect()
    val exactByQ = exact.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val adcByQ = f1.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(adcByQ == exactByQ,
      "candidate exhaustion must match the exact-rank filtered serve per query")
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcSet = f1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (exactSet & adcSet).size.toDouble / exactSet.size
    assert(overlap >= 0.2, s"ADC diverged from exact ranking beyond quantization error: $overlap")
  }

  test("adaptiveProbes: budget rule is the minimal score-ranked prefix, label-aware, minProbe-floored") {
    import spark.implicits._
    // synthetic 2-dim corpus with 4 well-separated cells: label 9 is RARE
    // (one member per cell), label 1 is DENSE (many members per cell) —
    // the budget must probe rare-label queries deeper than dense-label ones
    val cent = Array(Array(10.0, 0.0), Array(-10.0, 0.0), Array(0.0, 10.0), Array(0.0, -10.0))
    val members = (0 until 4).flatMap { c =>
      val base = cent(c)
      // 8 dense-label members + 1 rare-label member near each centroid
      (0 until 8).map(i => (1000L + c * 100 + i, Array(base(0) + i * 0.01, base(1) + 0.1), 1)) :+
        ((2000L + c, Array(base(0) - 0.05, base(1) - 0.1), 9))
    }
    // two served queries (vec_id ≤ ServeBatchMaxId): one per label
    val qs = Seq((1L, Array(10.0, 0.05), 1), (2L, Array(10.0, -0.05), 9))
    val e = (members ++ qs).toDF("vec_id", "v", "label")
    val assigned = Similarity.assignCells(e, cent)
    val k = 2; val minProbe = 1; val alpha = 3 // budget = 6
    val probes = Similarity.adaptiveProbes(assigned, cent, k, minProbe, alpha)
      .select("q_id", "label", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byQ = probes.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // dense label (9 candidates in the first cell incl. the query): the
    // first cell alone holds ≥ 6, so exactly one cell is probed
    assert(byQ(1L).size == 1, s"dense-label query over-probed: ${byQ(1L)}")
    // rare label (1 candidate per cell + the query itself): prefix counts
    // run 2,3,4,5 < 6 — all 4 cells probed and still under budget
    assert(byQ(2L).size == 4, s"rare-label query under-probed: ${byQ(2L)}")
    // minProbe floor: alpha = 0 forces budget 0, yet minProbe cells remain
    val floored = Similarity.adaptiveProbes(assigned, cent, k, 3, 0)
      .groupBy("q_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(floored.values.forall(_ == 3L), s"minProbe floor violated: $floored")
  }

  test("ivfRetrievalEval: the fixed-probe trade measured — MRR stays ~1, recall floor holds") {
    // 4/16 probes on near-orthogonal vectors: measured recall@10 0.48 at
    // sf0.01 with MRR 1.0 (the top hit is essentially always found; the
    // tail is the probe-budget trade, nProbe is the knob)
    val m = Similarity.ivfRetrievalEval(spark, "/root/testdata/sf0.01").collect()(0)
    assert(m.getDouble(1) >= 0.3, s"IVF recall@10 collapsed: ${m.getDouble(1)}")
    assert(m.getDouble(2) >= 0.9, s"IVF MRR collapsed: ${m.getDouble(2)}")
  }

  test("filteredRetrievalEval: adaptive budget clears the production recall bar") {
    // the r15 fixed-probe serve measured recall@10 0.41/0.46 — the
    // adaptive budget's whole point is clearing 0.8 (measured 1.0 at
    // sf0.01, 0.9149 at sf0.1; MRR 1.0 at both)
    val m = Similarity.filteredRetrievalEval(spark, "/root/testdata/sf0.01").collect()(0)
    assert(m.getDouble(1) >= 0.8, s"filtered recall@10 below the bar: ${m.getDouble(1)}")
    assert(m.getDouble(2) >= 0.9, s"filtered MRR collapsed: ${m.getDouble(2)}")
  }

  test("binary sign quantization: deterministic, Hamming integer-exact, exact re-rank beats the raw tier") {
    val dir = "/root/testdata/sf0.01"
    val b1 = Similarity.bqHammingTopK(spark, dir).collect()
    val b2 = Similarity.bqHammingTopK(spark, dir).collect()
    assert(b1.map(_.toString).toSeq == b2.map(_.toString).toSeq)
    // every reported distance is a valid 0..64 popcount
    assert(b1.forall(r => r.getInt(3) >= 0 && r.getInt(3) <= 64))
    val truth = Similarity.annTopKBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      (rows.map(r => (r.getLong(0), r.getLong(1))).toSet & truth).size.toDouble / truth.size
    val rBq = recall(b1)
    val rRer = recall(Similarity.bqRerankTopK(spark, dir).collect())
    // 64 sign bits on near-orthogonal vectors are a coarse pass, not a
    // ranking (measured 0.30 / 0.73 at sf0.01) — floors, not targets
    assert(rBq >= 0.15, s"binary-tier recall collapsed: $rBq")
    assert(rRer >= 0.5, s"re-ranked binary recall collapsed: $rRer")
    assert(rRer >= rBq, s"exact re-rank lost to raw Hamming: $rRer < $rBq")
    // the three-tier serve digs a 4× deeper binary shortlist before the
    // ADC cut; an ABSOLUTE floor, not dominance over the two-tier serve —
    // the lossy ADC middle tier can legitimately evict a true neighbor the
    // two-tier's direct Hamming shortlist kept, so rThree >= rRer is not
    // mathematically guaranteed and a codebook/fixture change could flip
    // it without any bug (measured 0.77 at sf0.01)
    val rThree = recall(Similarity.bqAdcRerankTopK(spark, dir).collect())
    assert(rThree >= 0.5, s"three-tier recall collapsed: $rThree")
  }

  test("semDedup: planted near-identical vectors dropped in favor of the min id; originals kept") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // 40 near-orthogonal base vectors (random 64-d) — mutually dissimilar —
    // plus an exact copy of every 4th one at id+1000
    val bases = (0L until 40L).map(i => (i, Array.fill(64)(rng.nextDouble() * 2 - 1)))
    val copies = bases.filter(_._1 % 4 == 0).map { case (id, v) => (id + 1000, v.clone()) }
    val e = (bases ++ copies).map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    val out = Similarity.semDedupFrom(e, nCentroids = 4, tau = 0.99).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every base vector kept (random 64-d vectors are far below cos 0.99)…
    for ((id, _) <- bases) assert(out(id), s"base $id wrongly dropped")
    // …and every planted copy dropped (its lower-id twin is in the corpus)
    for ((id, _) <- copies) assert(!out(id), s"planted copy $id not dropped")
  }

  test("semDedup: deterministic, and the keep rule is exactly 'no similar lower id in my cell'") {
    val dir = "/root/testdata/sf0.01"
    val r1 = Similarity.semDedup(spark, dir).collect()
    val r2 = Similarity.semDedup(spark, dir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "seeded quantizer + id-ordered keep rule must be deterministic")
    // recompute the rule from the output's own cell assignment + raw vectors
    val cells = r1.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kept = r1.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val vecs = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((id, c) <- cells) {
      val similarLower = cells.exists { case (o, oc) =>
        oc == c && o < id && cos(vecs(o), vecs(id)) >= 0.45
      }
      assert(kept(id) == !similarLower, s"keep rule violated for vec $id")
    }
  }

  test("hybridRrfTopK: fusion equals hand-computed RRF over the two retrievers' lists") {
    val dir = "/root/testdata/sf0.01"
    val sparse = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val dense = Similarity.annTopKBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (sparse.keySet ++ dense.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq
          .map { k =>
            val rrf = sparse.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
              dense.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0)
            (k._2, rrf)
          }
          .sortBy { case (id, rrf) => (-rrf, id) }.take(10).zipWithIndex
          .map { case ((id, rrf), i) =>
            (q, id, i + 1,
              BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.toSet
    val got = Similarity.hybridRrfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == expected, s"fusion mismatch: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
  }

  test("hybridRrfLshTopK: fusion equals hand-computed RRF over bm25 + LSH lists") {
    val dir = "/root/testdata/sf0.01"
    val sparse = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val dense = Similarity.annLshTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (sparse.keySet ++ dense.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq
          .map { k =>
            val rrf = sparse.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
              dense.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0)
            (k._2, rrf)
          }
          .sortBy { case (id, rrf) => (-rrf, id) }.take(10).zipWithIndex
          .map { case ((id, rrf), i) =>
            (q, id, i + 1,
              BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.toSet
    val got = Similarity.hybridRrfLshTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == expected, s"fusion mismatch: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
  }

  test("multi-table LSH top-k: recall against the brute-force anchor") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLshTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // This corpus's neighbors sit at cos ≈ 0.3–0.5 (near-orthogonal), the
    // worst regime for sign-LSH; 5 bits × 12 tables measures ≈ 0.57 here.
    // The bound is a regression floor, not a quality target.
    assert(recall >= 0.4, s"LSH recall@10 degraded: $recall")
  }

  test("PQ codes: every code in [0, ks); the code table carries no vectors") {
    val dir = "/root/testdata/sf0.01"
    val e = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val books = Similarity.fitPqFrom(e, Similarity.PqM, Similarity.PqKs)
    val codes = Similarity.assignCodes(e, books, Seq("vec_id"))
    assert(codes.columns.toSeq == "vec_id" +: (0 until Similarity.PqM).map(i => s"code$i"),
      "codes table must be vec_id + m code columns only (the compact index artifact)")
    val outOfRange = (0 until Similarity.PqM).map(j =>
      codes.filter(col(s"code$j") < 0 || col(s"code$j") >= Similarity.PqKs).count()).sum
    assert(outOfRange == 0)
  }

  test("PQ-ADC top-k: recall floor against brute; IVF+PQ agrees with IVF's candidates; both deterministic") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq1 = Similarity.pqAdcTopK(spark, dir).collect()
    val pq2 = Similarity.pqAdcTopK(spark, dir).collect()
    assert(pq1.map(_.toString).toSeq == pq2.map(_.toString).toSeq,
      "deterministic codebook fit must make PQ-ADC deterministic")
    val pqSet = pq1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pqSet).size.toDouble / brute.size
    // 4-bit codes on near-orthogonal synthetic vectors: a floor, not a
    // quality target (production corpora with real cluster structure
    // quantize far better) — the IVF/LSH specs' convention
    assert(recall >= 0.2, s"PQ-ADC recall@10 degraded: $recall")

    // IVF+PQ scans the SAME probed cells as IVF (shared coarse fit), so its
    // result ids are a subset of the IVF candidate cells' members — checked
    // through determinism + a recall floor against the IVF result itself
    val ivfpq = Similarity.ivfPqTopK(spark, dir).collect()
    val ivfpq2 = Similarity.ivfPqTopK(spark, dir).collect()
    assert(ivfpq.map(_.toString).toSeq == ivfpq2.map(_.toString).toSeq)
    val ivf = Similarity.annIvfTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpqSet = ivfpq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (ivf & ivfpqSet).size.toDouble / ivf.size
    assert(overlap >= 0.2, s"IVF+PQ diverged from IVF beyond quantization error: $overlap")
  }

  test("PQ re-rank: exact ordering on the shortlist, recall at least the raw ADC's") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.pqAdcTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rer1 = Similarity.pqRerankTopK(spark, dir).collect()
    val rer2 = Similarity.pqRerankTopK(spark, dir).collect()
    assert(rer1.map(_.toString).toSeq == rer2.map(_.toString).toSeq)
    val rerSet = rer1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = (brute & adc).size.toDouble / brute.size
    val rerRecall = (brute & rerSet).size.toDouble / brute.size
    // the 50-deep shortlist re-ranked exactly must dominate the raw ADC@10
    assert(rerRecall >= adcRecall,
      s"re-rank recall $rerRecall fell below raw ADC recall $adcRecall")
    assert(rerRecall >= 0.5, s"PQ re-rank recall@10 degraded: $rerRecall")
  }

  test("SQ8 top-k: high recall against brute (int8 loses little at 64 dims), deterministic") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = Similarity.sq8TopK(spark, dir).collect()
    val s2 = Similarity.sq8TopK(spark, dir).collect()
    assert(s1.map(_.toString).toSeq == s2.map(_.toString).toSeq)
    val sqSet = s1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & sqSet).size.toDouble / brute.size
    // scalar int8 on 64 dims barely perturbs the ordering — well above the
    // coarse quantizers' floors
    assert(recall >= 0.6, s"SQ8 recall@10 degraded: $recall")
  }

  test("OPQ: rotation is orthogonal, fit is deterministic, recall beats plain PQ") {
    val dir = "/root/testdata/sf0.01"
    val (rot, books) = Similarity.fitOpq(spark, dir, Similarity.PqM, Similarity.PqKs)
    // R Rᵀ = I within numerical tolerance — orthogonality is what makes
    // ⟨Rq, Rv⟩ = ⟨q, v⟩ and therefore ADC-over-rotated a valid estimator
    val dims = rot.length
    for (i <- 0 until dims; j <- 0 until dims) {
      val dot = (0 until dims).map(t => rot(i)(t) * rot(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8,
        s"R Rᵀ[$i][$j] = $dot, expected $expect — rotation not orthogonal")
    }
    // deterministic re-fit: the cache bypassed, same literals out
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val (rot2, books2) = Similarity.fitOpqFrom(e, Similarity.PqM, Similarity.PqKs)
    assert(rot.map(_.toSeq).toSeq == rot2.map(_.toSeq).toSeq, "rotation fit drifted")
    assert(books.map(_.map(_.toSeq).toSeq).toSeq == books2.map(_.map(_.toSeq).toSeq).toSeq,
      "codebook fit drifted")
    // the rotation must EARN its place: recall@10 vs the brute anchor at
    // least plain PQ's on the same corpus (measured 0.36 vs 0.29 at
    // sf0.01 when pinned — equality allowed so isotropic re-generations
    // of the testdata don't flake)
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqSet = Similarity.pqAdcTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val opqSet = Similarity.opqTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqRecall = (brute & pqSet).size.toDouble / brute.size
    val opqRecall = (brute & opqSet).size.toDouble / brute.size
    // Small tolerance: OPQ minimizes sample reconstruction error, which
    // usually but not PROVABLY implies >= recall@10 — on a near-isotropic
    // regeneration of the testdata (driver redraws it between rounds) the
    // strict relation can flake without anything being wrong.
    assert(opqRecall >= pqRecall - 0.02,
      s"OPQ recall $opqRecall fell below plain PQ's $pqRecall − 0.02 — rotation hurting")
  }

  test("residual IVFPQ + refine: exact ordering on the shortlist, recall at least the raw residual ADC's") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcSet = Similarity.ivfPqResidualTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerSet = Similarity.ivfPqResidualRerankTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = (brute & adcSet).size.toDouble / brute.size
    val rerRecall = (brute & rerSet).size.toDouble / brute.size
    // the refine stage re-orders the index's shortlist by EXACT cosine, so
    // whatever the index recalled can only rank better
    assert(rerRecall >= adcRecall,
      s"refine recall $rerRecall fell below raw residual ADC recall $adcRecall")
  }

  test("OPQ,IVF,PQ chain: deterministic, recall floor (corpus isotropy documented in the plan)") {
    val dir = "/root/testdata/sf0.01"
    val c1 = Similarity.opqIvfPqTopK(spark, dir).collect()
    val c2 = Similarity.opqIvfPqTopK(spark, dir).collect()
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq, "chain not deterministic")
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val chainSet = c1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & chainSet).size.toDouble / brute.size
    // absolute floor, not a vs-residual relation: on this near-isotropic
    // synthetic corpus the rotation does not beat the unrotated residual
    // index (0.23 vs 0.26 when pinned) — see the plan's docstring
    assert(recall >= 0.15, s"OPQ,IVF,PQ recall@10 degraded: $recall")
  }
}
