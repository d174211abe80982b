package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus sampling / splitting operators for training-data pipelines.
  *
  * The load-bearing one is [[splitCounts]]'s hash-split: split membership
  * must be a PURE FUNCTION of a stable key — not of partitioning, row
  * order, or an RNG stream — so that re-runs, backfills, and other engines
  * agree on which rows are held out. md5 of the key gives that: the same
  * row lands in the same split on any cluster, any engine (the DuckDB
  * oracle computes the identical assignment).
  */
object Sampling {

  /** Deterministic train/test assignment: first hex nibble of
    * md5(doc_id) — 'c'..'f' (4/16 = 25%) → test, else train.
    */
  def withSplit(df: DataFrame, key: String): DataFrame =
    df.withColumn("split",
      when(substring(md5(col(key).cast("string").cast("binary")), 1, 1)
        .between("c", "f"), "test").otherwise("train"))

  /** Per-(lang, split) counts of the hash-split documents table. */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    withSplit(Tables(spark, dir, "documents"), "doc_id")
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")

  val splitCountsSql: String =
    """SELECT lang,
      |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 1) BETWEEN 'c' AND 'f'
      |       THEN 'test' ELSE 'train' END AS split,
      |  count(*) AS n
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY lang, split""".stripMargin

  /** Seeded stratified sample: per-language fractions via `sampleBy`
    * (Bernoulli per row, deterministic for a fixed seed and partitioning).
    * Engine-specific RNG → no value oracle; the spec pins determinism and
    * per-stratum bounds.
    */
  def stratifiedSample(
      spark: SparkSession,
      dir: String,
      fractions: Map[String, Double] = Map(
        "en" -> 0.5, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.5),
      seed: Long = 42L): DataFrame =
    Tables(spark, dir, "documents")
      .stat.sampleBy("lang", fractions, seed)
      .select("doc_id", "lang")
      .orderBy("doc_id")
}
