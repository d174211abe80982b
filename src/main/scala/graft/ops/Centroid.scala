package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nearest-centroid classification over the embeddings table — the
  * Rocchio classifier / IVF-coarse-quantizer building block: fit one
  * centroid per label, assign every vector to its nearest centroid, and
  * report the label×prediction confusion matrix (the embedding-space
  * analogue of the [[TextAnalysis]] lang-ID confusion audit).
  *
  * Exactness discipline: components quantize to offset micros
  * (`floor(x·1e6 + 0.5) + 2e6` — the offset keeps every value positive so
  * truncating and flooring integer division agree across engines), the
  * per-(label, dim) centroid is the exactly-rounded mean
  * `(2S + n) div (2n)`, and distances are pure BIGINT sums of squares
  * (≤ 64·(4e6)² ≈ 1e15). Argmin ties break to the smaller label. Every
  * step is integer-exact, so Spark and the oracle agree bit-for-bit.
  *
  * Scale shape (the [[QualityModel]] literal-model discipline): the fit is
  * one hash aggregate to |labels|×dims cells (a few hundred rows) collected
  * once; serving embeds the centroids as PLAN LITERALS, so assignment is a
  * single codegen'd projection over the corpus — per-row `aggregate`/
  * `zip_with` folds, zero joins, zero extra shuffles — followed by one
  * |labels|²-bounded confusion aggregate. At 100 TB the corpus is touched
  * twice (fit aggregate + serve projection), both embarrassingly parallel.
  */
object Centroid {

  /** Micro-quantization: positive-offset integer micros of a unit-scale
    * float component. */
  private def microsQ(x: Column): Column =
    floor(x * lit(1000000.0) + lit(0.5)).cast("long") + lit(2000000L)

  /** Fit: (label, dim) -> exactly-rounded mean of offset micros. Bounded
    * output (|labels| × dims), deterministic, integer-exact. */
  private[ops] def fitCentroids(emb: DataFrame): Array[(Int, Seq[Long])] = {
    val q = emb.select(col("label"),
      posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("xq", microsQ(col("x")))
    q.groupBy("label", "d")
      .agg(sum(col("xq")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("(2 * s + n) div (2 * n)"))
      .select("label", "d", "c")
      .collect()
      .groupBy(_.getInt(0))
      .map { case (lbl, rows) =>
        lbl -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
      .toArray.sortBy(_._1)
  }

  /** Registered query: confusion matrix of the nearest-centroid classifier
    * on the embeddings table (true `label`, `predicted`, `n`). */
  def nearestCentroidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val cents = fitCentroids(emb)
    val xq = transform(col("embedding"), x => microsQ(x))
    // per-label literal centroid arrays -> one codegen'd fold per label
    val scored = cents.map { case (lbl, c) =>
      val cLit = array(c.map(lit): _*)
      val dist = aggregate(
        zip_with(xq, cLit, (x, cv) => (x - cv) * (x - cv)),
        lit(0L), (acc, v) => acc + v)
      struct(dist.as("dist"), lit(lbl).as("lbl"))
    }
    // array_min orders structs lexicographically: (dist, label) — the
    // argmin with ties to the smaller label, as one expression
    emb.select(col("label"),
        array_min(array(scored: _*)).getField("lbl").as("predicted"))
      .groupBy("label", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "predicted")
  }

  /** Oracle: the same integer-exact pipeline stated relationally —
    * unnest + moment aggregate + rounded-mean centroid + distance join +
    * deterministic argmin window. */
  val nearestCentroidConfusionSql: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    generate_subscripts(embedding, 1) AS d,
      |    CAST(floor(unnest(embedding) * 1000000 + 0.5) AS BIGINT)
      |      + 2000000 AS xq
      |  FROM embeddings
      |), c AS (
      |  SELECT label AS lbl, d,
      |    (2 * sum(xq) + count(*)) // (2 * count(*)) AS c
      |  FROM q GROUP BY 1, 2
      |), dist AS (
      |  SELECT q.vec_id, q.label, c.lbl,
      |    sum((q.xq - c.c) * (q.xq - c.c)) AS dist
      |  FROM q JOIN c USING (d) GROUP BY 1, 2, 3
      |), pred AS (
      |  SELECT vec_id, label, lbl,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, lbl) AS rn
      |  FROM dist
      |)
      |SELECT label, lbl AS predicted, count(*) AS n
      |FROM pred WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
