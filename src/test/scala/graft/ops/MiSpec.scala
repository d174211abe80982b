package graft.ops

import graft.SparkSuite

/** lang×source mutual information: independence and perfect-dependence
  * limits, plus re-derivation against an independent Scala computation.
  */
class MiSpec extends SparkSuite {

  private def frame(rows: Seq[(String, String)]) = {
    val sparkS = spark
    import sparkS.implicits._
    rows.toDF("lang", "source")
  }

  test("independent axes give MI ~ 0; identical axes give mi_norm ~ 1") {
    // independent: every (lang, source) cell equally filled
    val indep = for { l <- Seq("a", "b"); s <- Seq("x", "y"); _ <- 1 to 25 } yield (l, s)
    val r0 = TextAnalysis.langSourceMiOf(frame(indep)).head()
    assert(math.abs(r0.getDouble(1)) < 1e-9, s"independent MI ${r0.getDouble(1)}")
    // dependent: source determines lang exactly
    val dep = (for { l <- Seq("a", "b"); _ <- 1 to 30 } yield (l, "s" + l))
    val r1 = TextAnalysis.langSourceMiOf(frame(dep)).head()
    assert(math.abs(r1.getDouble(4) - 1.0) < 1e-9, s"dependent mi_norm ${r1.getDouble(4)}")
  }

  test("MI and entropies re-derive from independent counts on testdata") {
    val dir = "/root/testdata/sf0.001"
    val row = TextAnalysis.langSourceMi(spark, dir).head()
    val cells = Tables(spark, dir, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val cl = cells.groupBy(_._1._1).view.mapValues(_.values.sum.toDouble).toMap
    val cs = cells.groupBy(_._1._2).view.mapValues(_.values.sum.toDouble).toMap
    def dec(v: Double) = BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val mi = cells.map { case ((l, s), c) =>
      dec((c / n) * math.log(c * n / (cl(l) * cs(s)))) }.sum.toDouble
    val hl = cl.values.map(c => dec(-(c / n) * math.log(c / n))).sum.toDouble
    val hs = cs.values.map(c => dec(-(c / n) * math.log(c / n))).sum.toDouble
    assert(row.getLong(0) == cells.size.toLong)
    assert(math.abs(row.getDouble(1) - mi) < 1e-6)
    assert(math.abs(row.getDouble(2) - hl) < 1e-6)
    assert(math.abs(row.getDouble(3) - hs) < 1e-6)
    assert(math.abs(row.getDouble(4) - mi / math.min(hl, hs)) < 1e-6)
    assert(row.getDouble(1) >= -1e-12 && row.getDouble(4) <= 1.0 + 1e-12)
  }
}
