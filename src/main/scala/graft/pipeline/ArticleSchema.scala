package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON article source (reference O1, cleaner.py:124-143) + schema alias
  * (reference O7, cleaner.py:311-312).
  *
  * Accepted envelopes: top-level array, `{"articles": [...]}`, single object,
  * `null`/empty. `multiLine=true` handles all four shapes in one reader; the
  * `articles` wrapper is unwrapped with `explode`.
  */
object ArticleSchema {

  /** Canonical article schema (FIXTURES.md §1) in reference column order.
    * The reference infers its schema; we keep inference as the default for
    * behavioral parity but expose this for production use (inference = one
    * extra pass over the data at scale).
    */
  val schema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("url", StringType),
    StructField("published", StringType),
    StructField("category", StringType),
    StructField("author", StringType)
  ))

  /** Load one JSON article file, normalize the envelope, and attach `row_id`.
    *
    * `row_id` preserves file order for keep-first dedup (SURVEY.md H1): the
    * reference relies on the pandas positional index; Spark has no implicit
    * order, so we capture `monotonically_increasing_id()` at the scan (stable
    * within a single-file multiLine read — a whole-file, non-splittable scan).
    * At scale, ingest should provide a real ordinal (file + offset) instead.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val unwrapped = raw.schema.fields.find(_.name == "articles") match {
      case Some(StructField(_, ArrayType(_: StructType, _), _, _)) =>
        raw.select(explode(col("articles")).as("a")).select("a.*")
      case _ if raw.columns.isEmpty || raw.columns.sameElements(Array("_corrupt_record")) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case _ => raw
    }
    // Spark's JSON schema inference sorts fields alphabetically; pandas
    // preserves JSON key order. Restore the canonical article order for the
    // fields we know, extras (if any) after — report layout and output
    // column order then match the reference.
    val canonical = schema.fieldNames.filter(unwrapped.columns.contains)
    val extras = unwrapped.columns.filterNot(canonical.contains)
    unwrapped.select((canonical ++ extras).map(col): _*)
      .withColumn("row_id", monotonically_increasing_id())
  }

  /** O7: copy `published` → `published_date` when the latter is absent. */
  def aliasPublished(df: DataFrame): DataFrame =
    if (df.columns.contains("published") && !df.columns.contains("published_date"))
      df.withColumn("published_date", col("published"))
    else df
}
