package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ContrastiveSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("batchNegatives re-derives from an independent JVM md5 walk") {
    val emb = Tables(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val batchOf = emb.map { case (id, _) =>
      id -> "0123456789abcdef".indexOf(md5Hex(s"b7:$id").charAt(0))
    }.toMap
    val labelOf = emb.toMap
    val expected = (for {
      (a, aLab) <- emb
      negs = emb.filter { case (c, cLab) => batchOf(c) == batchOf(a) && cLab != aLab }
        .sortBy { case (c, _) => (md5Hex(s"n11:$a:$c"), c) }
        .take(Contrastive.NegsPerAnchor)
      ((c, cLab), i) <- negs.zipWithIndex
    } yield (a, aLab, c, cLab, i + 1)).toSet
    val got = Contrastive.batchNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("hardNegativesLsh: cross-label only, ranked by cosine, and HARDER than batch negatives") {
    val hard = Contrastive.hardNegativesLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
    assert(hard.nonEmpty)
    assert(hard.forall { case (_, aLab, _, nLab, _, _) => aLab != nLab },
      "a negative must come from a different label class")
    for ((_, group) <- hard.groupBy(_._1)) {
      val byRank = group.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1 to byRank.length).toSeq, "dense ranks")
      assert(byRank.map(_._6).toSeq == byRank.map(_._6).toSeq.sorted.reverse,
        "cosine non-increasing in rank")
    }
    // the point of mining: hard negatives sit closer to the anchor than
    // random in-batch ones do. Compare mean exact cosine of the two pair
    // sets over the SAME anchors.
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    def meanCos(pairs: org.apache.spark.sql.DataFrame) =
      pairs.join(e.select(col("vec_id").as("anchor_id"), col("v").as("av")), Seq("anchor_id"))
        .join(e.select(col("vec_id").as("neg_id"), col("v").as("nv")), Seq("neg_id"))
        .agg(avg(Similarity.cosine(col("av"), col("nv")))).head.getDouble(0)
    val anchorSet = hard.map(_._1).toSet
    val hardPairs = Contrastive.hardNegativesLsh(spark, dir)
      .select("anchor_id", "neg_id")
    val easyPairs = Contrastive.batchNegatives(spark, dir)
      .filter(col("anchor_id").isin(anchorSet.toSeq: _*))
      .select("anchor_id", "neg_id")
    val (h, ez) = (meanCos(hardPairs), meanCos(easyPairs))
    assert(h > ez + 0.05,
      s"hard negatives should be decision-boundary close: hard=$h easy=$ez")
  }
}
