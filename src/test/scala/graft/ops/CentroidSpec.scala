package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CentroidSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def microsQ(x: Float): Long =
    math.floor(x.toDouble * 1000000.0 + 0.5).toLong + 2000000L

  test("fitCentroids equals a BigInt re-derivation of the rounded mean") {
    val emb = Tables(spark, dir, "embeddings")
    val cents = Centroid.fitCentroids(emb).toMap
    val raw = emb.select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    for ((lbl, rows) <- raw.groupBy(_._1)) {
      val dims = rows.head._2.length
      val expect = (0 until dims).map { d =>
        val xs = rows.map(r => BigInt(microsQ(r._2(d))))
        val s = xs.sum; val n = BigInt(xs.length)
        // exactly-rounded mean: floor((2S + n) / (2n)) on positive values
        ((2 * s + n) / (2 * n)).toLong
      }
      assert(cents(lbl) == expect, s"centroid for label $lbl")
    }
  }

  test("nearestCentroidConfusion equals the brute argmin; counts conserve") {
    val out = Centroid.nearestCentroidConfusion(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

    val emb = Tables(spark, dir, "embeddings")
    val cents = Centroid.fitCentroids(emb).toMap
    val raw = emb.select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val brute = raw.map { case (lbl, v) =>
      val xq = v.map(microsQ)
      val pred = cents.toSeq.map { case (l, c) =>
        val dist = xq.zip(c).map { case (a, b) =>
          val d = a - b; d * d }.sum
        (dist, l)
      }.min._2 // ties to the smaller label via tuple ordering
      (lbl, pred)
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    assert(out == brute, "confusion matrix must equal the brute argmin")
    assert(out.values.sum == raw.length.toLong, "every vector is classified")
    // the synthetic labels are noisily clustered (~37% separable): the
    // classifier must still beat 10-class chance by at least 2x
    val nLabels = cents.size
    val diag = out.collect { case ((a, b), n) if a == b => n }.sum
    assert(diag * nLabels > 2L * raw.length,
      s"diagonal $diag of ${raw.length} with $nLabels labels")
  }
}
