package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered join equals the brute all-pairs Jaccard at tau") {
    val out = SetSimJoin.prefixJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val arr = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("arr")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val brute = (for {
      (a, sa) <- arr; (b, sb) <- arr if a < b
      inter = (sa & sb).size.toLong
      un = (sa | sb).size.toLong
      if inter * SetSimJoin.TauDen >= un * SetSimJoin.TauNum
    } yield (a, b, inter, un)).toSet
    assert(out == brute, "prefix filtering is lossless: result equals brute")
    assert(out.nonEmpty, "the corpus plants near-dup pairs")
  }

  test("a boundary pair at exactly J = tau survives the prefix filter") {
    // two 6-word docs sharing 3 of their 4 shingles: J = 3/5 = 0.6 = tau —
    // the inclusive boundary, where an off-by-one prefix length would
    // silently drop the pair
    val tmp = java.nio.file.Files.createTempDirectory("ppjoin").toString
    import spark.implicits._
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6", "en", "t", 17L),
      (2L, "w1 w2 w3 w4 w5 zz", "en", "t", 17L),
      (3L, "a1 a2 a3 a4 a5 a6", "en", "t", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SetSimJoin.prefixJaccardPairs(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 5L)), s"got ${out.toSeq}")
  }

  test("split-leakage audit re-buckets exactly the lossless pair set") {
    val pairs = SetSimJoin.prefixJaccardPairs(spark, dir)
      .select("a_id", "b_id", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.head >= 'c' && hex.head <= 'f') "test" else "train"
    }
    val brute = pairs
      .map { case (a, b, j) =>
        val (sa, sb) = (splitOf(a), splitOf(b))
        ((if (sa <= sb) (sa, sb) else (sb, sa)), j)
      }
      .groupBy(_._1)
      .map { case ((sa, sb), rows) => (sa, sb, rows.length.toLong, rows.map(_._2).max) }
      .toSet
    val out = SetSimJoin.splitLeakageAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == brute, s"audit buckets diverge: $out vs $brute")
    assert(out.map(t => (t._1, t._2)).contains(("test", "train")) ||
      out.nonEmpty, "corpus yields at least one bucket")
  }

  test("prefixes are strictly shorter than the sets they index") {
    val arr = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("arr"))
    val sh = arr.select(col("doc_id"), explode(col("arr")).as("s"))
    val dft = sh.groupBy("s").agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val pref = sh.join(dft, "s")
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("n") -
        expr(s"(${SetSimJoin.TauNum} * n + ${SetSimJoin.TauDen - 1}) div ${SetSimJoin.TauDen}") + 1)
    val total = sh.count().toDouble
    val kept = pref.count().toDouble
    // prefix fraction is ~(1 - tau) of each set (+1 element) — the join
    // index the filter builds is a strict subset of the full shingle table
    assert(kept < total * 0.55, s"prefix kept $kept of $total rows")
    assert(kept > 0)
  }
}
