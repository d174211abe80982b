package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Source-concentration (HHI / Gini / top share) and cross-source
  * vocabulary overlap: full re-derivation from independent counts.
  */
class CorpusAuditsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("sourceConcentration: HHI, Gini, top share re-derive from raw counts") {
    val row = graft.ops.TableChecks.sourceConcentration(spark, dir).head()
    val counts = Tables(spark, dir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(c => (c._2, c._1))
    val n = counts.length
    val total = counts.map(_._2).sum
    val hhi = counts.map(c => c._2 * c._2).sum.toDouble / (total.toDouble * total)
    val gini = counts.zipWithIndex
      .map { case ((_, c), i0) => (2L * (i0 + 1) - n - 1) * c }.sum.toDouble /
      (n.toDouble * total)
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - hhi) < 1e-6)
    assert(math.abs(row.getDouble(2) - gini) < 1e-6)
    assert(math.abs(row.getDouble(3) - counts.map(_._2).max.toDouble / total) < 1e-6)
    // a near-uniform synthetic grid has HHI ~ 1/n and tiny Gini — the
    // testdata sources are near-uniform, so the audit should say so
    assert(row.getDouble(1) < 2.0 / n, "HHI far above uniform on balanced sources")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 0.5)
  }

  test("sourceVocabOverlap: Jaccard re-derives from the distinct token sets") {
    val out = graft.ops.TextAnalysis.sourceVocabOverlap(spark, dir).collect()
    assert(out.length == graft.ops.TextAnalysis.VocabOverlapK)
    val vocab = Tables(spark, dir, "documents")
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (r <- out) {
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pair order canonical")
      val inter = (vocab(a) & vocab(b)).size
      assert(r.getLong(2) == inter.toLong)
      assert(r.getLong(3) == vocab(a).size.toLong && r.getLong(4) == vocab(b).size.toLong)
      val j = inter.toDouble / (vocab(a).size + vocab(b).size - inter)
      assert(math.abs(r.getDouble(5) - j) < 1e-6)
    }
    // rows arrive most-similar-first
    val js = out.map(_.getDouble(5))
    assert(js.zip(js.tail).forall { case (x, y) => x >= y })
  }

  test("langIdConfusion: cells re-derive from the per-doc classifier; diagonal is recall") {
    val preds = graft.ops.TextAnalysis.langId(spark, dir)
      .select("labeled", "predicted").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cells = graft.ops.TextAnalysis.langIdConfusion(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(cells.keySet == want.keySet)
    val labTotals = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for ((k, (n, frac)) <- cells) {
      assert(n == want(k))
      assert(math.abs(frac - n.toDouble / labTotals(k._1)) < 1e-6)
    }
    // the classifier is better than chance: every label's diagonal share
    // beats the uniform 1/(n_langs) baseline
    val langs = labTotals.keySet
    for (l <- langs if cells.contains((l, l)))
      assert(cells((l, l))._2 > 1.0 / (langs.size + 1))
  }

  test("oovRateAudit: per-lang rates equal a brute vocab walk and stay interior") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] = t.toLowerCase.split("\\s+").toSeq
    val tf = scala.collection.mutable.Map.empty[String, Long]
    for ((_, _, t) <- docs; w <- toks(t)) tf(w) = tf.getOrElse(w, 0L) + 1
    val vocab = tf.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextAnalysis.OovVocabSize).map(_._1).toSet
    val byLang = docs.groupBy(_._2)
    val out = TextAnalysis.oovRateAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet == byLang.keySet)
    for ((lang, g) <- byLang) {
      val all = g.toSeq.flatMap(d => toks(d._3))
      val oov = all.count(w => !vocab(w)).toLong
      val (nd, tt, ot, pm) = out(lang)
      assert(nd == g.size.toLong && tt == all.size.toLong && ot == oov,
        s"$lang: got ($nd,$tt,$ot) want (${g.size},${all.size},$oov)")
      assert(pm == oov * 1000L / all.size)
    }
    // the audit is live only if the vocab misses something and hits something
    val (tots, oovs) = (out.values.map(_._2).sum, out.values.map(_._3).sum)
    assert(oovs > 0 && oovs < tots, "OOV rate degenerate at this vocab size")
  }

  test("percolateAlerts: query set and firing counts re-derive from a brute scan") {
    val out = TextAnalysis.percolateAlerts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    val m = TextAnalysis.PercolateQueries
    assert(out.length == m && out.map(_._1).toSeq == (0L until m.toLong),
      "one row per stored query, in id order")

    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").toSet))
    // brute query derivation: top-2m df terms, ties by term
    val top = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length).toSeq
      .sortBy { case (t, df) => (-df, t) }.take(2 * m).map(_._1)
    for ((qid, ta, tb, n, first, last) <- out) {
      assert(ta == top(qid.toInt) && tb == top(qid.toInt + m),
        s"query $qid terms")
      val hits = docs.filter { case (_, ts) => ts(ta) && ts(tb) }.map(_._1)
      assert(n == hits.length.toLong, s"query $qid n_docs")
      assert(first == (if (hits.isEmpty) -1L else hits.min), s"query $qid first")
      assert(last == (if (hits.isEmpty) -1L else hits.max), s"query $qid last")
    }
    // the alert surface is live: some query fires, none fires on everything
    assert(out.exists(_._4 > 0) && out.forall(_._4 < docs.length))
  }

  test("percolateBooleanAlerts: k-AND-NOT semantics re-derive from a brute scan; negation is live") {
    val out = TextAnalysis.percolateBooleanAlerts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    val m = TextAnalysis.PercolateBoolQueries
    val k = TextAnalysis.PercolateBoolK
    assert(out.length == m && out.map(_._1).toSeq == (0L until m.toLong))

    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").toSet))
    val top = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length).toSeq
      .sortBy { case (t, df) => (-df, t) }.take((k + 1) * m).map(_._1)
    var negationSuppressed = 0L
    for ((qid, posStr, neg, n, first, last) <- out) {
      val pos = (0 until k).map(j => top(qid.toInt + j * m))
      assert(posStr == pos.mkString(",") && neg == top(qid.toInt + k * m),
        s"query $qid terms")
      val posHits = docs.filter { case (_, ts) => pos.forall(ts) }
      val hits = posHits.filter { case (_, ts) => !ts(neg) }.map(_._1)
      negationSuppressed += posHits.length - hits.length
      assert(n == hits.length.toLong, s"query $qid n_docs")
      assert(first == (if (hits.isEmpty) -1L else hits.min), s"query $qid first")
      assert(last == (if (hits.isEmpty) -1L else hits.max), s"query $qid last")
    }
    // the NOT leg must actually do work on this corpus: somewhere a doc
    // matches all positives but is suppressed by its negation
    assert(negationSuppressed > 0, "negation semantics unexercised by the query set")
    assert(out.exists(_._4 > 0))
  }
}
