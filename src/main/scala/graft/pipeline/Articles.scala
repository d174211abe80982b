package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** Raw article record as loaded from JSON (reference data model, SURVEY §1). */
case class Article(
    title: Option[String],
    content: Option[String],
    url: Option[String],
    published: Option[String],
    category: Option[String],
    author: Option[String])

/** Cleaned + validation-flagged article (the pipeline's working row). */
case class FlaggedArticle(
    title: Option[String],
    content: Option[String],
    url: Option[String],
    published: Option[String],
    category: Option[String],
    author: Option[String],
    published_date: Option[String],
    row_id: Long,
    errors: Seq[String],
    passed: Boolean,
    reason: Option[String],
    message: Option[String])

/** Typed `Dataset` facade over the article pipeline, for callers who want
  * case-class rows and compile-time field checks. The heavy lifting stays
  * in the column-expression pipeline (fully codegen'd) — the typed layer is
  * a zero-cost `as[T]` view over the same plan, not a `map`-based
  * reimplementation (a typed lambda would break whole-stage codegen).
  */
object Articles {

  def load(spark: SparkSession, path: String): Dataset[Article] = {
    import spark.implicits._
    ArticleSchema.load(spark, path).drop("row_id").as[Article]
  }

  /** Full clean+validate chain with typed output. */
  def cleanAndFlag(spark: SparkSession, path: String): Dataset[FlaggedArticle] = {
    import spark.implicits._
    ArticlePipeline.cleanAndFlag(ArticleSchema.load(spark, path)).as[FlaggedArticle]
  }
}
