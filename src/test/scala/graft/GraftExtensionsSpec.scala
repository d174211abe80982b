package graft

class GraftExtensionsSpec extends SparkSuite {

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  html_unescape('AI &amp; ML &apos;26') AS s,
        |  cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c_same,
        |  cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c_orth
        |""".stripMargin).head()
    assert(row.getString(0) == "AI & ML '26")
    assert(row.getDouble(1) == 1.0)
    assert(row.getDouble(2) == 0.0)
    val grams = spark.sql("SELECT word_ngrams('a b c d'), word_ngrams('a b c d', 2)").head()
    assert(grams.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(grams.getSeq[String](1) == Seq("a b", "b c", "c d"))
    val hashes = spark.sql(
      """SELECT minhash_bands(word_ngrams('a b c d e')) AS mb,
        |  simhash64(split('a b c', ' ')) AS sh,
        |  winnow('the quick brown fox jumps over the lazy dog') AS wf
        |""".stripMargin).head()
    assert(hashes.getSeq[Long](0).length == 16)
    // fingerprints are deterministic — same input, same value
    assert(hashes.getLong(1) ==
      spark.sql("SELECT simhash64(split('a b c', ' '))").head().getLong(0))
    assert(hashes.getSeq[Long](2).nonEmpty)
  }

  test("registration is idempotent and survives re-registration") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT html_unescape('&lt;x&gt;')").head().getString(0) == "<x>")
  }
}
