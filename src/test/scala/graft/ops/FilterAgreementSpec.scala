package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FilterAgreementSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("kappa re-derives from the confusion counts; marginals tie to qualityFilter") {
    val out = Corpus.filterAgreementKappa(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, n11, n10, n01, n00) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n == n11 + n10 + n01 + n00, "confusion cells partition n")
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      val num = n * (n11 + n00) - pe
      val den = n * n - pe
      if (den != 0) {
        val want = BigDecimal(num.toDouble / den.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(6) - want) < 1e-12,
          s"${r.getString(0)}: kappa ${r.getDouble(6)} vs re-derived $want")
        assert(r.getDouble(6) >= -1.0 - 1e-9 && r.getDouble(6) <= 1.0 + 1e-9)
      }
      val po = BigDecimal((n11 + n00).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(7) - po) < 1e-12, "po re-derivation")
    }
    // filter-1 marginal per language == the shipped battery's keep count
    // (the k1 flag must BE qualityFilter's verdict, not a re-invention)
    val keep1 = out.map(r => r.getString(0) -> (r.getLong(2) + r.getLong(3))).toMap
    val docs = Tables(spark, dir, "documents").select("doc_id", "lang")
    val shipped = Corpus.qualityFilter(spark, dir)
      .join(docs, "doc_id").filter(col("keep"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, k) <- shipped)
      assert(keep1.getOrElse(lang, 0L) == k,
        s"$lang: k1 marginal ${keep1.getOrElse(lang, 0L)} vs qualityFilter keep $k")
  }

  test("a tightened filter only drops: no (drop→keep) cell on threshold-nested batteries would be wrong — n01 counts real boundary redraws") {
    // The candidate battery is strictly tighter on every threshold, so a
    // doc kept by v2 must be kept by v1 → n01 = 0. This pins that the
    // two batteries really are nested (a regression here means someone
    // loosened one arm of the candidate without updating the audit).
    val out = Corpus.filterAgreementKappa(spark, dir).collect()
    assert(out.map(_.getLong(4)).sum == 0L, "v2 kept a doc v1 dropped")
  }
}
