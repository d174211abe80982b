package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("WordNGrams expression equals the builtin-composition shingles") {
    // edge cases: empty, whitespace-only, < n tokens (uppercase to check the
    // lowercased fallback), exactly n, repeated shingles (distinct), and
    // trailing whitespace (Spark split keeps trailing empty tokens)
    val edge = Seq("", "   ", "One TWO", "a b c", "x y z x y z x y z",
      "tab\tsep\ntokens here", "trailing space ")
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).as[String].collect().toSeq
    val df = (edge ++ corpus).toDF("text")
    val bad = df.filter(
      Dedup.shingles(col("text")) =!= Dedup.shinglesHof(col("text"))).count()
    assert(bad == 0)
  }

  test("property: WordNGrams equals the composition on random strings") {
    import org.scalacheck.{Arbitrary, Gen}
    // lone surrogates don't survive the UTF-8 roundtrip (encoding artifact
    // of the test path, not the operator) — drop them, as in TextCleanSpec
    val gen = Gen.listOfN(300,
      Arbitrary.arbitrary[String].map(_.filterNot(_.isSurrogate)))
    val samples = gen.sample.get ++ Seq("a b c d", "ONE two THREE four")
    val df = samples.toDF("text")
    val bad = df.filter(
      Dedup.shingles(col("text")) =!= Dedup.shinglesHof(col("text"))).count()
    assert(bad == 0)
  }

  test("winnow near-dup finds every planted duplicate pair") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents").count()
    val pairs = Dedup.winnowNearDupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the doubled corpus plants (i, i+1000000) exact-dup pairs — identical
    // text shares ALL fingerprints, so each must surface
    val planted = (0L until docs).map(i => (i, i + 1000000L)).toSet
    assert((planted -- pairs).isEmpty,
      s"missed ${(planted -- pairs).size} planted duplicate pairs")
  }

  test("shingle contract: distinct trigrams in first-occurrence order") {
    val got = Seq("the cat sat on the cat sat").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh")).as[Seq[String]].head()
    assert(got == Seq("the cat sat", "cat sat on", "sat on the", "on the cat"))
  }
}
