package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial radius self-join — "find every pair of points within distance
  * R" — via uniform-grid blocking, the equi-join reduction every
  * distributed spatial engine uses (the grid-partition join of SpatialSpark
  * / Sedona's partitioned KDB/quadtree joins, in its simplest exact form).
  *
  * The naive formulation is a non-equi θ-join (dist(a,b) ≤ R) that Spark
  * can only execute as a broadcast nested loop — O(n²) compares and a
  * scale-killer. The grid reduction makes it an equi-join: bucket every
  * point into a ⌈R⌉-sized cell, explode each LEFT point to its 3×3 cell
  * neighborhood, equi-join on the cell key, then verify the exact
  * distance on candidates only. Completeness is geometric: two points
  * within R differ by < 1 cell index per axis, so the true partner's cell
  * is always in the neighborhood. Each unordered pair is emitted exactly
  * once: the right side keeps its own cell (no explode), so a pair is
  * seen once per B-cell, and `key_a < key_b` kills the mirror.
  *
  * Scale shape: ×9 narrow explode on one side, one shuffle per side on
  * the cell key, candidate-only distance arithmetic — candidates are
  * density-bounded (points per cell), never corpus-bounded. Dense cells
  * (urban clusters) are ordinary AQE skew-join territory because the hot
  * key is an equi-join key. The reference has no spatial surface — this
  * is the 100-TB extension suite (SURVEY.md §2 extensions).
  *
  * Coordinates are planted deterministically from `c_custkey` (the
  * [[Sampling.urlCanonicalDedup]] planted-column convention: the table
  * carries no geo columns, both engines derive identical integer meters
  * in a 100 km square). All arithmetic — planting, cells, squared
  * distance — is int64-exact; no transcendentals, so the oracle (a brute
  * non-equi self-join) matches hash-exactly. A haversine variant only
  * changes the verify predicate; the blocking is latitude-banded the
  * same way.
  */
object GeoJoin {

  /** Radius in meters; also the grid cell size (cell = R ⇒ 3×3
    * neighborhood suffices). */
  val RadiusM = 4000L

  /** Planted-coordinate side length: a 100 km × 100 km square, integer
    * meters. */
  val WorldM = 100000L

  private[graft] def plantedPoints(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(
      col("c_custkey"),
      pmod(col("c_custkey") * 48271L, lit(WorldM)).as("x"),
      pmod(col("c_custkey") * 69621L, lit(WorldM)).as("y"))

  /** All unordered point pairs within [[RadiusM]], with their exact
    * squared distance. */
  def geoNearPairs(spark: SparkSession, dir: String): DataFrame = {
    val pts = plantedPoints(spark, dir)
      .withColumn("cx", expr(s"x DIV $RadiusM"))
      .withColumn("cy", expr(s"y DIV $RadiusM"))
    val probe = pts.select(
        col("c_custkey").as("cust_a"), col("x").as("xa"), col("y").as("ya"),
        explode(expr("sequence(cx - 1, cx + 1)")).as("jx"), col("cy"))
      .select(col("cust_a"), col("xa"), col("ya"), col("jx"),
        explode(expr("sequence(cy - 1, cy + 1)")).as("jy"))
    val build = pts.select(col("c_custkey").as("cust_b"),
      col("x").as("xb"), col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy"))
    probe.join(build, Seq("jx", "jy"))
      .filter(col("cust_a") < col("cust_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(RadiusM * RadiusM))
      .select("cust_a", "cust_b", "dist2")
      .orderBy("cust_a", "cust_b")
  }

  /** Oracle: the brute non-equi self-join the grid reduction replaces —
    * equality IS the completeness claim (no pair lost at a cell seam,
    * none duplicated, none outside R kept). */
  val geoNearPairsSql: String =
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    ((c_custkey * 48271) % $WorldM + $WorldM) % $WorldM AS x,
       |    ((c_custkey * 69621) % $WorldM + $WorldM) % $WorldM AS y
       |  FROM customer
       |)
       |SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
       |FROM pts a, pts b
       |WHERE a.c_custkey < b.c_custkey
       |  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |      <= ${RadiusM * RadiusM}
       |ORDER BY cust_a, cust_b""".stripMargin
}
