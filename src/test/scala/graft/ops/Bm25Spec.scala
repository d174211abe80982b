package graft.ops

import graft.SparkSuite

class Bm25Spec extends SparkSuite {
  import spark.implicits._

  test("phraseSearch: adjacency required, overlaps counted, top-k ordered by hits then id") {
    val docs = Seq(
      (1L, "table scan is fast but a table scan repeats"), // 2 adjacent hits
      (2L, "the table scan wins"),                         // 1 hit
      (3L, "table big scan"),                              // terms present, NOT adjacent
      (4L, "scan table"),                                  // reversed — no hit
      (5L, "no relevant words here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearchOf(docs, Seq("table", "scan")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // only true adjacent occurrences count; ordering hits desc, id asc
    assert(out == Seq((1L, 2L), (2L, 1L)), s"got $out")
    // overlapping occurrences all count ("a a a" contains "a a" twice)
    val ov = TextAnalysis.phraseSearchOf(
      Seq((9L, "a a a")).toDF("doc_id", "text"), Seq("a", "a")).collect()
    assert(ov.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((9L, 2L)))
    // a 3-term phrase needs all three in order
    val tri = TextAnalysis.phraseSearchOf(docs, Seq("the", "table", "scan")).collect()
    assert(tri.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
  }

  test("phraseSearch: term filters reach the index scan (postings read, not the corpus)") {
    val df = TextAnalysis.phraseSearch(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    // both posting-list legs are filtered on the phrase term BEFORE the
    // join — the plan must show the equality filters, not a post-join one
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("= table") || plan.contains("tok = table") ||
      plan.contains("(tok#") && plan.contains("table"),
      s"term filter missing from the plan:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      "phrase join degenerated to a cartesian product")
  }

  test("bm25: rare shared terms outrank ubiquitous ones; ranks dense, scores non-increasing, no self-match") {
    // doc 0 is the query (0 % 50 == 0). "quasar pulsar" are rare (query +
    // doc 1 only); "data table" appear in every doc — IDF must make doc 1
    // beat doc 2, which shares only the ubiquitous terms.
    val docs = Seq(
      (0L, "quasar pulsar data table analysis"),
      (1L, "quasar pulsar data table discussion"),
      (2L, "data table data table data table"),
      (3L, "completely unrelated content here"),
      (4L, "data table something else entirely")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopKFrom(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val q0 = out.filter(_._1 == 0L).sortBy(_._3)
    assert(q0.nonEmpty)
    // dense ranks from 1, strictly no self-match
    assert(q0.map(_._3).toSeq == (1 to q0.length), s"ranks not dense: $q0")
    assert(q0.forall(_._2 != 0L), "query doc retrieved itself")
    // scores non-increasing in rank order
    assert(q0.map(_._4).toSeq == q0.map(_._4).sortBy(-_).toSeq)
    // the rare-term sharer is ranked first, above the common-term-only doc
    assert(q0.head._2 == 1L, s"expected doc 1 (rare terms) first, got $q0")
    val pos = q0.map(_._2).indexOf(2L)
    assert(pos > 0, s"doc 2 (common terms only) should be retrieved but not first: $q0")
  }

  test("vocabHeavyHittersCms: one-sided error envelope and top-k agreement vs the exact aggregate") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val exact = TextAnalysis.vocabTopTerms(spark, dir, k = 1000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = exact.values.sum // small corpus: 1000 >> vocabulary
    val cms = TextAnalysis.vocabHeavyHittersCms(spark, dir, k = 20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // CMS never underestimates, and overestimates by at most eps*N
    // (eps = 5e-4, 5x slack for the probabilistic bound)
    for ((tok, est) <- cms) {
      val truth = exact(tok)
      assert(est >= truth, s"$tok: CMS underestimated $est < $truth")
      assert(est <= truth + (5 * 0.0005 * totalTokens).toLong + 1,
        s"$tok: CMS overestimate $est vs $truth beyond envelope")
    }
    // heavy hitters recall: the estimated top-20 contains the true top-10
    val trueTop = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(10).map(_._1).toSet
    val estSet = cms.map(_._1).toSet
    assert(trueTop.subsetOf(estSet),
      s"true heavy hitters missing from CMS top-k: ${trueTop -- estSet}")
  }

  test("qualityPrune: per-language keep counts are exactly ceil(n/2), and the kept set is the rank-top") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val kept = TextAnalysis.qualityPrune(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val all = TextAnalysis.qualityScore(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"), Seq("doc_id"))
      .select("doc_id", "lang", "quality").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    for ((lang, docs) <- all.groupBy(_._2)) {
      val expectN = math.ceil(docs.size / 2.0).toLong
      val keptLang = kept.filter(_._2 == lang)
      assert(keptLang.size == expectN, s"$lang: kept ${keptLang.size}, expected $expectN")
      // the kept set is exactly the top by (quality desc, doc_id asc)
      val expected = docs.sortBy(d => (-d._3, d._1)).take(expectN.toInt).map(_._1).toSet
      assert(keptLang.map(_._1).toSet == expected, s"$lang kept wrong docs")
    }
  }

  test("qualityPruneApprox: threshold envelope vs the exact rank — superset above threshold, divergence only in the boundary tie class") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val approx = TextAnalysis.qualityPruneApprox(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val exact = TextAnalysis.qualityPrune(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val all = TextAnalysis.qualityScore(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"), Seq("doc_id"))
      .select("doc_id", "lang", "quality").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    for ((lang, docs) <- all.groupBy(_._2)) {
      val keptA = approx.filter(_._2 == lang)
      assert(keptA.nonEmpty, s"$lang: approx prune kept nothing")
      val t = keptA.head._4
      assert(keptA.map(_._4).distinct.length == 1, s"$lang: threshold not constant")
      // kept set is EXACTLY { quality >= t }: downward-closed in quality,
      // whole tie classes in or out — never a partial class
      val expectedIds = docs.filter(_._3 >= t).map(_._1).toSet
      assert(keptA.map(_._1).toSet == expectedIds,
        s"$lang: approx kept set is not exactly the >=threshold class union")
      // divergence from the exact rank-top is confined to the boundary tie
      // class: everything the exact prune kept with quality STRICTLY above
      // the threshold is kept here too, and nothing strictly below the
      // exact prune's minimum kept quality survives
      val keptE = exact.filter(_._2 == lang)
      val minKeptExact = keptE.map(_._3).min
      assert(keptE.filter(_._3 > t).map(_._1).toSet.subsetOf(keptA.map(_._1).toSet),
        s"$lang: approx dropped docs the exact prune kept above threshold")
      // the threshold sits at (or, via rank-convention off-by-one on a
      // straddling tie class, one 0.25 grid step below) the exact floor
      assert(t >= minKeptExact - 0.25 - 1e-9 && t <= minKeptExact + 1e-9,
        s"$lang: threshold $t more than one grid class from exact floor $minKeptExact")
      // and the threshold itself is a real grid value from this language
      assert(docs.map(_._3).contains(t), s"$lang: threshold $t not a data value")
    }
  }

  test("bm25TopKFor: user-query API matches the benchmark form on its own sample; ad-hoc queries retrieve") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    // parity: handing the %50 sample in as explicit queries reproduces the
    // benchmark formulation row for row (same tokenizer, same model legs)
    val sample = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("q_id"), col("text"))
    val viaApi = TextAnalysis.bm25TopKFor(docs, sample).collect().map(_.toString).toSeq
    val bench = TextAnalysis.bm25TopKFrom(docs).collect().map(_.toString).toSeq
    assert(viaApi == bench, "user-query API diverged from the benchmark formulation")
    // ad-hoc retrieval: a fresh query in a disjoint id space gets results,
    // scored only through its own terms
    val someText = docs.orderBy("doc_id").select("text").head().getString(0)
    val adHoc = Seq((999999999L, someText)).toDF("q_id", "text")
    val hits = TextAnalysis.bm25TopKFor(docs, adHoc).collect()
    assert(hits.nonEmpty, "ad-hoc query returned nothing on a corpus containing its text")
    assert(hits.forall(_.getLong(0) == 999999999L))
    // terms absent from the corpus contribute nothing (inner df join):
    // a nonsense query scores no candidates at all
    val nonsense = Seq((7L, "zqxjkwv bbqzzz notaword")).toDF("q_id", "text")
    assert(TextAnalysis.bm25TopKFor(docs, nonsense).collect().isEmpty)
  }

  test("qldTopK: decomposition equals the full query-likelihood formula among candidates") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val mu = TextAnalysis.QldMu
    // first-principles re-derivation: full score(q,d) = Σ_t qtf·ln((tf +
    // μ·cf/C)/(dl+μ)) over ALL query terms, computed in plain Scala; the
    // engine's sparse decomposition must match to rounding on every
    // released row
    val docs = Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val tf = docs.map { case (d, ts) => d -> ts.groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val cf = tf.values.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cTotal = cf.values.sum.toDouble
    val dl = tf.view.mapValues(_.values.sum).toMap
    val got = TextAnalysis.qldTopK(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (q, d, score) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val full = tf(q).map { case (t, qtf) =>
        qtf * math.log((tf(d).getOrElse(t, 0L) + mu * cf(t) / cTotal) / (dl(d) + mu))
      }.sum
      assert(math.abs(full - score) < 1e-3,
        s"q=$q d=$d engine $score vs first-principles $full")
    }
    // dominance tripwire: the engine releases top-k over CANDIDATES only
    // (docs sharing ≥1 query term — the bm25 candidate convention), resting
    // on the claim that constant-only scores of non-candidates never reach
    // the released top-k. That claim is corpus-specific: an unmatched very
    // short doc gets a large −qlen·ln(dl+μ) advantage. Assert it HOLDS on
    // this corpus — every released score must exceed the best possible
    // non-candidate score qconst − qlen·ln(min_dl+μ) — so a fixture change
    // that breaks the dominance fails loudly instead of silently releasing
    // a top-k wrong w.r.t. the documented formula.
    val byQuery = got.groupBy(_.getLong(0))
    for ((q, rows) <- byQuery) {
      val qtfs = tf(q)
      val qlen = qtfs.values.sum.toDouble
      val qconst = qtfs.map { case (t, qtf) => qtf * math.log(mu * cf(t) / cTotal) }.sum
      val candidates = rows.map(_.getLong(1)).toSet
      val nonCandDl = docs.keys
        .filter(d => d != q && !candidates.contains(d) &&
          !qtfs.keys.exists(t => tf(d).contains(t)))
        .map(dl(_)).toSeq
      if (nonCandDl.nonEmpty) {
        val bestNonCand = qconst - qlen * math.log(nonCandDl.min + mu)
        for (r <- rows)
          assert(r.getDouble(3) > bestNonCand,
            s"q=$q released score ${r.getDouble(3)} does not dominate the best " +
              s"constant-only non-candidate score $bestNonCand — the candidate " +
              "rule no longer yields the true top-k on this corpus")
        // blind-spot guard: a query with FEWER than k candidates releases
        // a short list whose missing tail should (under the documented
        // full formula) be the best non-candidates — the per-released-row
        // dominance check above cannot see that. Require a full list
        // whenever non-candidates exist to fill it.
        assert(rows.size == 10,
          s"q=$q released only ${rows.size} rows while non-candidate docs " +
            "exist — the candidate rule is truncating the documented top-k")
      }
    }
    // determinism + the model genuinely differs from bm25's ranking
    val again = TextAnalysis.qldTopK(spark, dir).collect().map(_.toString).toSeq
    assert(got.map(_.toString).toSeq == again)
    val bm = TextAnalysis.bm25TopKServed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ql = got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ql != bm, "QL ranking identical to BM25 — the second model is redundant")
  }

  test("bm25PrfTopK: reduces to the plain serve at fbTerms=0; expansion is bounded, disjoint, and does something") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // reduction: zero expansion terms leaves only the original terms at
    // weight 1.0, and ×1.0 is an IEEE identity — row-for-row equality
    val reduced = TextAnalysis.bm25PrfTopK(spark, dir, fbTerms = 0)
      .collect().map(_.toString).toSeq
    val plain = TextAnalysis.bm25TopKServed(spark, dir).collect().map(_.toString).toSeq
    assert(reduced == plain, "fbTerms=0 did not reduce to the unexpanded serve")
    // determinism of the full two-pass form
    val p1 = TextAnalysis.bm25PrfTopK(spark, dir).collect()
    val p2 = TextAnalysis.bm25PrfTopK(spark, dir).collect()
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
    // the expansion must genuinely move rankings for SOME query (if this
    // converges to zero the fixture stopped exercising feedback)
    val expanded = p1.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = plain.toSet
    assert(expanded.map(t => s"[${t._1},${t._2},${t._3}]") != base,
      "expansion changed nothing — spec is vacuous")
    // ranks stay dense 1..k per query and scores non-increasing
    for ((_, rows) <- p1.groupBy(_.getLong(0))) {
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to byRank.length))
      val scores = byRank.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
