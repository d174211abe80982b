package graft.ops

import graft.SparkSuite

class ClusteringSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("kmeansClusters: full integer Lloyd matches an independent JVM mirror exactly") {
    // Load + quantize exactly as the operator documents: floor((x+1)·2¹⁴).
    val rows = Tables(spark, dir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor((x.toDouble + 1.0) * 16384.0)).toArray)
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var daa = 0.0; var dab = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) { daa += a(i) * a(i); dab += a(i) * b(i); dbb += b(i) * b(i); i += 1 }
      daa - 2.0 * dab + dbb
    }
    // Gonzalez maxmin seeding (ties: larger d first, then smaller vec_id)
    var centers = Vector(rows.head._2)
    for (_ <- 2 to Clustering.KmK) {
      val next = rows.map { case (id, v) => (id, v, centers.map(c => d2(v, c)).min) }
        .maxBy { case (id, _, d) => (d, -id) }
      centers = centers :+ next._2
    }
    val dims = centers.head.length
    def assign(v: Array[Double]): (Double, Int) =
      centers.zipWithIndex.map { case (c, i) => (d2(v, c), i + 1) }.min
    // Lloyd iterations: floored integer means; empty cluster keeps its centroid
    var moved = false
    for (_ <- 1 to Clustering.KmIters) {
      val members = rows.groupBy { case (_, v) => assign(v)._2 }
      val next = centers.zipWithIndex.map { case (old, ix) =>
        members.get(ix + 1).fold(old) { ms =>
          Array.tabulate(dims)(i => math.floor(ms.map(_._2(i)).sum / ms.length))
        }
      }
      if (next.zip(centers).exists { case (a, b) => !a.sameElements(b) }) moved = true
      centers = next.toVector
    }
    assert(moved, "vacuous test: no center moved across the Lloyd iterations")
    val want = rows.map { case (id, v) =>
      val (d, r) = assign(v); (id, r, d.toLong)
    }.toSeq
    val got = Clustering.kmeansClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, {
      val diff = got.zip(want).filter { case (g, w) => g != w }.take(5)
      s"distributed Lloyd diverged from the mirror at ${diff.size}+ rows: $diff"
    })
    // the partition is non-trivial: several clusters are populated, none
    // holds everything
    val sizes = got.groupBy(_._2).map(_._2.size)
    assert(sizes.size >= 3 && sizes.max < rows.length,
      s"degenerate clustering: sizes $sizes")
    // determinism (pure function of the data)
    val again = Clustering.kmeansClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == again)
  }
}
