package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Zipf rank–frequency fit: planted-exponent recovery and moment
  * re-derivation against an independent Scala computation.
  */
class ZipfSpec extends SparkSuite {

  test("zipfFit: recovers the exponent of a planted power law; R2 near 1") {
    val sparkS = spark
    import sparkS.implicits._
    // term t_r appears floor(2000 / r^1.2) times: a clean power law with
    // slope -1.2 in log-log space
    val words = (1 to 60).flatMap { r =>
      Seq.fill(math.floor(2000.0 / math.pow(r, 1.2)).toInt)(f"w$r%03d")
    }
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val row = TextAnalysis.zipfFitOf(docs).head()
    assert(row.getLong(0) == 60)
    assert(math.abs(row.getDouble(1) - (-1.2)) < 0.05,
      s"slope ${row.getDouble(1)} far from planted -1.2")
    assert(row.getDouble(3) > 0.99, s"r2 ${row.getDouble(3)} too low for a clean power law")
  }

  test("zipfFit: moments re-derive from an independent Scala computation") {
    val dir = "/root/testdata/sf0.001"
    val row = TextAnalysis.zipfFit(spark, dir).head()
    val counts = Tables(spark, dir, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, c) => (-c, t) }.take(TextAnalysis.ZipfHead)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    val n = pts.length.toDouble
    def dec(v: Double) = BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sx = pts.map(p => dec(p._1)).sum.toDouble
    val sy = pts.map(p => dec(p._2)).sum.toDouble
    val sxx = pts.map(p => dec(p._1 * p._1)).sum.toDouble
    val syy = pts.map(p => dec(p._2 * p._2)).sum.toDouble
    val sxy = pts.map(p => dec(p._1 * p._2)).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getLong(0) == pts.length.toLong)
    assert(math.abs(row.getDouble(1) - slope) < 1e-6, s"slope ${row.getDouble(1)} vs $slope")
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(row.getDouble(3) - r2) < 1e-6)
  }
}
