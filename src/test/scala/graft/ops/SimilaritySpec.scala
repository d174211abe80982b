package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("cosine: exact on known vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(3.0, 4.0), Seq(3.0, 4.0), 1.0)
    ).toDF("a", "b", "expected")
    val bad = df.filter(
      abs(Similarity.cosine(col("a"), col("b")) - col("expected")) > 1e-12).count()
    assert(bad == 0)
  }

  test("codegen cosine expression is bit-equal to the HOF formulation") {
    val vecs = Similarity.asDoubleForTest(spark, "/root/testdata/sf0.001")
    val hof = Similarity.dot(col("a"), col("b")) /
      (Similarity.norm(col("a")) * Similarity.norm(col("b")))
    val bad = vecs.filter(
      graft.functions.CosineSimilarity(col("a"), col("b")) =!= hof).count()
    assert(bad == 0)
  }

  test("LSH embedding near-dup: recall against the brute-force anchor") {
    val dir = "/root/testdata/sf0.01"
    val brute = Dedup.embeddingNearDup(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are a subset — no false pairs (exact cosine verifies)
    assert((lsh -- brute).isEmpty)
    val recall = (brute & lsh).size.toDouble / brute.size
    // cos 0.4-0.5 pairs → per-table p ≈ 0.11, 12 tables → ~0.77 expected
    assert(recall >= 0.5, s"LSH near-dup recall degraded: $recall")
  }

  test("IVF top-k: recall against the brute-force anchor, deterministic") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = Similarity.annIvfTopK(spark, dir).collect()
    val ivf2 = Similarity.annIvfTopK(spark, dir).collect()
    assert(ivf1.map(_.toString).toSeq == ivf2.map(_.toString).toSeq,
      "seeded KMeans quantizer must make IVF deterministic")
    val ivfSet = ivf1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    // 4/16 cells probed on near-orthogonal vectors — a recall floor, not a
    // quality target (see the LSH note above)
    assert(recall >= 0.3, s"IVF recall@10 degraded: $recall")
  }

  test("multi-table LSH top-k: recall against the brute-force anchor") {
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.annTopKBrute(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLshTopK(spark, dir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // This corpus's neighbors sit at cos ≈ 0.3–0.5 (near-orthogonal), the
    // worst regime for sign-LSH; 5 bits × 12 tables measures ≈ 0.57 here.
    // The bound is a regression floor, not a quality target.
    assert(recall >= 0.4, s"LSH recall@10 degraded: $recall")
  }
}
