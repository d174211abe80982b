package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, as ONE codegen'd
  * expression: whitespace-split → n-gram join → distinct, in a single pass
  * with no intermediate array columns.
  *
  * Replaces the builtin composition
  * `array_distinct(zip_with(zip_with(split(c), …)))` on the dedup hot
  * path — zip_with is a lambda higher-order function, which Catalyst
  * evaluates interpreted, and the composition walks the token array once
  * per shingle position. Semantics are IDENTICAL to the composition
  * (verified by spec): tokens come from `\s+`-split with Java limit -1
  * (matching Spark's `split`, which KEEPS trailing empty strings), and
  * texts with fewer than n tokens fall back to `[text]`.
  *
  * Deliberately does NOT fold case: Spark 4's `lower()` uses ICU collation
  * tables while the JVM's `toLowerCase` carries older Unicode data — the
  * two disagree on rare codepoints (found by the property spec: U+A7C0).
  * Callers compose `lower()` themselves ([[WordNGrams.apply]] does), so
  * case folding always comes from Spark's own expression.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Static hook shared by interpreted eval and generated code. When
    * `distinct` is false, every occurrence is kept in position order — the
    * multiset the repetition-statistics operator counts.
    */
  def compute(s: UTF8String, n: Int, distinct: Boolean = true): ArrayData = {
    val str = s.toString
    // limit -1: keep trailing empty strings, matching Spark's split()
    val tokens = ws.split(str, -1)
    if (tokens.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(str)))
    } else {
      // LinkedHashSet: distinct while preserving first-occurrence order,
      // matching array_distinct's stable semantics (plain list when the
      // full multiset is wanted)
      val grams: java.util.Collection[String] =
        if (distinct) new java.util.LinkedHashSet[String]()
        else new java.util.ArrayList[String](tokens.length)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        grams.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](grams.size)
      val it = grams.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column-level entry point: lowercased distinct n-grams of `c` —
    * `word_ngrams(lower($"text"), 3)` with Spark's own case folding.
    */
  def apply(c: Column, n: Int): Column =
    ColumnShim.column(WordNGrams(
      ColumnShim.expression(org.apache.spark.sql.functions.lower(c)), n))

  /** Lowercased n-gram MULTISET (all occurrences, position order). */
  def all(c: Column, n: Int): Column =
    ColumnShim.column(WordNGrams(
      ColumnShim.expression(org.apache.spark.sql.functions.lower(c)), n,
      distinct = false))
}
