package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private val K = 8
  private val W = 16

  private def fps(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("t").select(Winnow(col("t"), K, W).as("fp"))
      .as[Seq[Long]].collect().toSeq

  test("winnowing guarantee: shared substring ≥ w+k-1 chars ⇒ shared fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog near the riverbank"
    val a = s"completely unrelated preamble text here $shared and then some tail"
    val b = s"different document start $shared with another ending entirely"
    val Seq(fa, fb) = fps(Seq(a, b))
    assert(fa.toSet.intersect(fb.toSet).nonEmpty,
      "documents sharing a long substring must share a fingerprint")
  }

  test("fingerprints are a subset of the k-gram rolling hashes (independent check)") {
    val text = "spark catalyst tungsten codegen whole stage execution engine"
    val Seq(fp) = fps(Seq(text))
    // independent per-gram polynomial computation (no rolling update)
    val direct = (0 to text.length - K).map { i =>
      text.substring(i, i + K).foldLeft(0L)((h, c) => h * 257L + c)
    }.toSet
    assert(fp.nonEmpty && fp.forall(direct.contains),
      "every selected fingerprint must be a genuine k-gram hash")
  }

  test("edge cases: short text, empty, density bound") {
    val texts = Seq("", "abc", "exactlyEightC", "a" * 100)
    val results = fps(texts)
    assert(results(0).isEmpty)                 // shorter than k → none
    assert(results(1).isEmpty)
    assert(results(2).size == 1)               // < one window → single fp
    assert(results(3).size == 1)               // all k-grams identical
    // density: far fewer fingerprints than k-grams on real-ish text
    val Seq(long) = fps(Seq(("lorem ipsum dolor sit amet " * 20)))
    assert(long.size < (("lorem ipsum dolor sit amet " * 20).length - K + 1) / 2)
  }

  test("deterministic across evaluations") {
    val t = Seq.fill(3)("determinism check text with enough length to window").toDF("t")
    val out = t.select(Winnow(col("t")).as("fp")).as[Seq[Long]].collect().toSeq
    assert(out.distinct.size == 1)
  }
}
