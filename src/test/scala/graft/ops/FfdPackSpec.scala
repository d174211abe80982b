package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FfdPackSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("ffdPackBins: assignments match the brute FFD; capacity and contiguity hold") {
    val cap = Corpus.FfdCapacity
    val out = Corpus.ffdPackBins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
    val nDocs = Tables(spark, dir, "documents").count()
    assert(out.length == nDocs, "every document packed exactly once")
    // per-shard brute FFD recompute from (doc_id, n_tokens)
    for ((shard, docs) <- out.groupBy(_._2)) {
      val ordered = docs.sortBy(d => (-d._3, d._1))
      val loads = collection.mutable.ArrayBuffer.empty[Long]
      for ((docId, _, n, bin, oversize) <- ordered) {
        val idx = loads.indexWhere(_ + n <= cap)
        val want = if (idx >= 0) idx + 1 else { loads += 0L; loads.length }
        loads(want - 1) += n
        assert(bin == want, s"shard $shard doc $docId: bin $bin vs FFD $want")
        assert(oversize == (n > cap))
      }
      // capacity: every bin fits unless it is an oversize singleton
      for ((bin, members) <- docs.groupBy(_._4)) {
        val tot = members.map(_._3.toLong).sum
        assert(tot <= cap || (members.length == 1 && members.head._3 > cap),
          s"shard $shard bin $bin overfull ($tot) without being an oversize singleton")
      }
      // bins are contiguous 1..max (FFD never skips an id)
      val bins = docs.map(_._4).distinct.sorted
      assert(bins.toSeq == (1 to bins.max), s"shard $shard bins not contiguous: $bins")
    }
    // padding economy: FFD must not use more bins than naive next-fit order
    val ffdBins = out.groupBy(_._2).view.mapValues(_.map(_._4).max).values.sum
    val lower = out.groupBy(_._2).view
      .mapValues(ds => (ds.map(_._3.toLong).sum + cap - 1) / cap).values.sum
    assert(ffdBins >= lower, "cannot beat the volume lower bound")
  }
}
