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
  *
  * Coverage vs Python's `html.unescape` (which implements the full HTML5
  * table): the HTML 4.0 named set + numeric (`&#65;` `&#x42;`) entities via
  * commons-text `unescapeHtml4`, extended with `&apos;` (HTML5/XML, not in
  * HTML4) and the common legacy semicolon-less forms (`&amp` `&lt` `&gt`
  * `&quot` `&nbsp` `&copy` `&reg`, upper-case where HTML5 lists a twin)
  * that HTML5 also accepts.
  * NOT covered: the long tail of HTML5-only names (e.g. `&planck;`) and the
  * remaining ~100 semicolon-less legacy entities — none appear in the
  * reference corpus.
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

  import org.apache.commons.text.StringEscapeUtils
  import org.apache.commons.text.translate.{AggregateTranslator, LookupTranslator}

  /** HTML5 compatibility layer over the HTML4 table: `&apos;` plus the
    * common semicolon-less legacy entities. Both the `;`-terminated and bare
    * forms live in ONE LookupTranslator so its longest-key match consumes
    * `&amp;` whole rather than `&amp` + dangling `;`.
    */
  private val translator = {
    val html5Compat = new java.util.HashMap[CharSequence, CharSequence]
    html5Compat.put("&apos;", "'")
    // Per the HTML5 named-references table: these entities accept a bare
    // (semicolon-less) form; the upper-case twin exists only where listed.
    val legacy = Seq(
      "amp" -> "&", "AMP" -> "&", "lt" -> "<", "LT" -> "<",
      "gt" -> ">", "GT" -> ">", "quot" -> "\"", "QUOT" -> "\"",
      "nbsp" -> " ", "copy" -> "©", "COPY" -> "©",
      "reg" -> "®", "REG" -> "®")
    for ((n, repl) <- legacy) {
      html5Compat.put(s"&$n;", repl)
      html5Compat.put(s"&$n", repl)
    }
    new AggregateTranslator(
      new LookupTranslator(html5Compat),
      StringEscapeUtils.UNESCAPE_HTML4)
  }

  /** Static hook invoked from generated code. Fast path: no '&' → no alloc. */
  def unescape(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) s
    else UTF8String.fromString(translator.translate(str))
  }

  /** Column-level entry point: `html_unescape($"title")`. */
  def apply(c: Column): Column =
    ColumnShim.column(HtmlUnescape(ColumnShim.expression(c)))
}
