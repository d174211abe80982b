package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RAKE keyphrases ([[TextAnalysis.rakeKeyphrases]]) against a brute
  * re-derivation of Rose et al.'s construction from the raw corpus.
  */
class RakeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("top-k keyphrases equal the brute degree/frequency walk") {
    val stops = TextAnalysis.Stopwords.flatMap(_._2).toSet
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // candidate phrases: maximal non-stopword runs per doc
    val cand = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split("\\s+").toSeq
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        if (stops.contains(t)) { if (cur.nonEmpty) { runs += cur.toSeq; cur.clear() } }
        else cur += t
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs
    }
    val freq = cand.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = cand.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val phraseScore = cand.map(p => p.mkString(" ") -> p).toMap.map { case (ph, ws) =>
      val terms = ws.map(w =>
        BigDecimal(deg(w).toDouble / freq(w)).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      (ph, ws.size.toLong,
        cand.count(_.mkString(" ") == ph).toLong, r6(terms.sum.toDouble))
    }
    val bruteTop = phraseScore.toSeq
      .sortBy { case (ph, _, _, s) => (-s, ph) }.take(TextAnalysis.RakeTopK)
    val out = TextAnalysis.rakeKeyphrases(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == bruteTop,
      s"RAKE diverges: ${out.take(3).toSeq} vs ${bruteTop.take(3)}")
    assert(out.exists(_._2 > 1), "at least one MULTIWORD phrase ranks in the top-k")
  }
}
