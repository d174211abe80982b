package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("fuzzyPairsOf: toy dictionary — shared-token pairs within the bound, ordered, deduped") {
    import spark.implicits._
    val names = Seq("cold anvil", "old anvil", "old anvil", "red widget",
      "red gear", "blue bolt").toDF("p_name")
    val got = FuzzyJoin.fuzzyPairsOf(names, "p_name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // dist("cold anvil","old anvil")=1 via shared "anvil"; duplicates in the
    // input collapse (distinct dictionary); name_a < name_b exactly once
    assert(got.contains(("cold anvil", "old anvil", 1)))
    assert(got.forall { case (a, b, d) => a < b && d <= 3 })
    // "red widget" vs "red gear" share "red" but dist=5 > 3: verified away
    assert(!got.exists(p => p._1 == "red gear" && p._2 == "red widget"))
  }

  test("fuzzyPairsOf: blocking recall trade is real — close pair sharing no token is missed") {
    import spark.implicits._
    // dist("abc def","abd dee")=2 but the token sets are disjoint: blocking
    // cannot reach the pair. This is the documented contract, not a bug.
    val names = Seq("abc def", "abd dee").toDF("p_name")
    assert(FuzzyJoin.fuzzyPairsOf(names, "p_name", maxDist = 3).count() == 0)
  }

  test("fuzzyPairsOf: stop-token cap drops the mega-token's candidates") {
    import spark.implicits._
    // "x" appears in all 4 names; with the cap at 3 it blocks nothing and
    // only the rarer "aa"/"ab" tokens may form candidates.
    val names = Seq("x aa", "x ab", "x cc", "x dd").toDF("p_name")
    val uncapped = FuzzyJoin.fuzzyPairsOf(names, "p_name", maxDist = 2).count()
    val capped = FuzzyJoin.fuzzyPairsOf(names, "p_name", maxDist = 2, maxTokenDf = 3).count()
    assert(uncapped == 6, s"all pairs reachable via 'x': got $uncapped")
    assert(capped == 0, s"capped blocking should form no candidates: got $capped")
  }

  test("fuzzyEntityClusters: components consistent with the pair graph; canonical = min key") {
    val out = FuzzyJoin.fuzzyEntityClusters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val names = Tables(spark, dir, "part").select("p_name").distinct().count()
    assert(out.length == names.toInt, "every distinct name appears exactly once")
    // each cluster has exactly one canonical member, and it owns the min key
    val byCluster = out.groupBy(_._2)
    for ((cid, members) <- byCluster) {
      assert(members.count(_._3) == 1, s"cluster $cid canonical count != 1")
    }
    // transitivity witness: a chained pair (a~b, b~c) lands in ONE cluster
    val pairs = FuzzyJoin.fuzzyPairsOf(Tables(spark, dir, "part"), "p_name", 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cluster = out.map(t => t._1 -> t._2).toMap
    for ((a, b) <- pairs)
      assert(cluster(a) == cluster(b), s"linked pair ($a, $b) split across clusters")
  }

  test("entityGoldenRecords: survivorship re-derives from the cluster map + a brute collapse") {
    val dir = "/root/testdata/sf0.001"
    val clusters = FuzzyJoin.fuzzyEntityClusters(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val part = Tables(spark, dir, "part")
      .select("p_partkey", "p_name", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val brute = part.groupBy(p => clusters(p._2)).map { case (cid, rows) =>
      val golden = rows.minBy(_._1)._2
      def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cid, golden, rows.map(_._2).distinct.size.toLong, rows.size.toLong,
        r2(rows.map(_._3).min), r2(rows.map(_._3).max))
    }.toSet
    val out = FuzzyJoin.entityGoldenRecords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(out == brute, s"golden records diverge: ${(out diff brute).take(3)} vs ${(brute diff out).take(3)}")
    assert(out.exists(_._3 > 1), "at least one multi-variant entity collapses")
  }

  test("fuzzyPartPairs: real dictionary — pairs found, support attached, verify bound holds") {
    val out = FuzzyJoin.fuzzyPartPairs(spark, dir).collect()
    assert(out.nonEmpty, "no fuzzy part-name pairs at this SF")
    for (r <- out) {
      assert(r.getString(0) < r.getString(1))
      assert(r.getInt(2) <= 3 && r.getInt(2) >= 1, s"dist out of band: $r")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0, s"support missing: $r")
    }
  }

  test("sortedNeighborhoodPairs equals the single-window textbook derivation") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val out = FuzzyJoin.sortedNeighborhoodPairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    // brute: global sort in memory, all rank-gap <= w pairs, verify edits
    val names = Tables(spark, dir, "part")
      .select(col("p_name")).distinct().collect().map(_.getString(0)).sorted
    val brute = (for {
      i <- names.indices; j <- (i + 1) to math.min(i + 5, names.length - 1)
      d = levenshteinDist(names(i), names(j)) if d <= 3
    } yield (names(i), names(j), d, (j - i).toLong)).toSet
    assert(out == brute, "two-phase rank + block join equals the global window")
    assert(out.nonEmpty)
  }

  test("sorted-neighborhood and token blocking catch COMPLEMENTARY variants") {
    // lexicographic neighbors that share no token (every token edited) are
    // invisible to token blocking; entities differing in their first
    // characters are far apart in sort order — each method's documented
    // blind spot is the other's catch
    val sn = FuzzyJoin.sortedNeighborhoodPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val tok = FuzzyJoin.fuzzyPartPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // both non-degenerate on this dictionary, and neither subsumes the
    // other's recall obligation by definition (they may coincide on easy
    // corpora; the assert is on non-emptiness, the doc carries the trade)
    assert(sn.nonEmpty && tok.nonEmpty)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
