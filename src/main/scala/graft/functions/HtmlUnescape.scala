package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decodes HTML entities (named + numeric) in a string column.
  *
  * Equivalent of the reference pipeline's `html.unescape` step inside
  * `clean_text_series` (reference: cleaner.py:42). Implemented as a native
  * Catalyst expression with `doGenCode` so it participates in whole-stage
  * codegen (no Scala-UDF serialization / row conversion on the hot path).
  * Backed by commons-text `StringEscapeUtils.unescapeHtml4`, which decodes
  * the same named (`&amp;` `&nbsp;` `&lt;`) and numeric (`&#65;` `&#x42;`)
  * entity families as Python's `html.unescape`.
  */
case class HtmlUnescape(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_unescape requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_unescape"

  override def nullSafeEval(input: Any): Any =
    HtmlUnescape.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUnescape.unescape($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
}

object HtmlUnescape {
  /** Static hook invoked from generated code. Fast path: no '&' → no alloc. */
  def unescape(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) s
    else UTF8String.fromString(org.apache.commons.text.StringEscapeUtils.unescapeHtml4(str))
  }

  /** Column-level entry point: `html_unescape($"title")`. */
  def apply(c: Column): Column =
    ColumnShim.column(HtmlUnescape(ColumnShim.expression(c)))
}
