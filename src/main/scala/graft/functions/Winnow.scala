package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme): polynomial rolling
  * hashes over character k-grams, then one representative hash per sliding
  * window of w consecutive k-grams — the rightmost minimum, which
  * guarantees any shared substring of length ≥ w+k−1 between two documents
  * yields at least one shared fingerprint, while storing only ~2/(w+1) of
  * the hashes.
  *
  * One codegen'd pass: the k-gram hash rolls in O(1) per character
  * (subtract the outgoing char's highest-power term, multiply, add), and
  * window minima are tracked over the hash ring. Output = distinct selected
  * fingerprints in first-selection order.
  */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow"

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {

  private val Base = 257L

  /** Static hook shared by interpreted eval and generated code. Hash
    * arithmetic wraps mod 2⁶⁴ deliberately (plain JVM longs — this is
    * library code, not Catalyst arithmetic, so ANSI overflow rules don't
    * apply).
    */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array.empty[Any])

    // rolling k-gram hashes
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var topPow = 1L // Base^(k-1)
    var i = 1
    while (i < k) { topPow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + str.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * topPow) * Base + str.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }

    if (m <= w) {
      // document shorter than one window: single fingerprint, the
      // rightmost minimum over all k-grams
      var best = 0
      i = 1
      while (i < m) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      return new GenericArrayData(Array[Any](hashes(best)))
    }

    // winnow: rightmost minimum per window of w hashes; record a
    // fingerprint only when the selected POSITION changes
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    var minPos = -1
    var start = 0
    while (start + w <= m) {
      if (minPos < start) {
        minPos = start
        i = start + 1
        while (i < start + w) { if (hashes(i) <= hashes(minPos)) minPos = i; i += 1 }
        selected.add(hashes(minPos))
      } else {
        val newest = start + w - 1
        if (hashes(newest) <= hashes(minPos)) {
          minPos = newest
          selected.add(hashes(minPos))
        }
      }
      start += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `winnow($"text", k = 8, w = 16)`. */
  def apply(c: Column, k: Int = 8, w: Int = 16): Column =
    ColumnShim.column(Winnow(ColumnShim.expression(c), k, w))
}
