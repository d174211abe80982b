package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, HtmlUnescape}

/** SQL surface for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT html_unescape(title) ...")` works alongside the
  * Column API.
  *
  * Two registration paths, same function list:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) — the standard
  *    SparkSessionExtensions plugin hook, applied at session build;
  *  - [[GraftFunctions.register]] — post-hoc injection into a live
  *    session's function registry (useful in shells and tests where the
  *    session already exists).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  /** (identifier, catalog info, builder) per custom function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("html_unescape"),
      new ExpressionInfo(classOf[HtmlUnescape].getName, "html_unescape"),
      (children: Seq[Expression]) => HtmlUnescape(children.head)),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))

  /** Register every custom function into an existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
