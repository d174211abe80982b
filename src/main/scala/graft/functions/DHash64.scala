package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit difference-hash (dHash) perceptual fingerprint of a binary media
  * payload — the image-dedup primitive, generalized to any byte stream.
  *
  * The classic dHash resizes an image to a 9×8 luminance grid and sets bit i
  * when cell i+1 is brighter than cell i; near-identical images differ in a
  * few bits (Hamming distance), wildly different images in ~32. Here the
  * payload's bytes stand in for luminance samples: the stream is divided
  * into 65 equal-width windows (byte i of n falls in window ⌊i·65/n⌋ — the
  * "resize"), each window's unsigned-byte mean is its "brightness" (integer
  * floor division, empty window ⇒ 0), and bit i (0 ≤ i < 64) is set iff
  * mean(i+1) > mean(i). Local byte perturbations move one or two window
  * means slightly and flip at most the adjacent comparison bits, so
  * near-duplicate payloads land within a small Hamming radius — exactly the
  * property segment-blocked near-dup joins need.
  *
  * Pure integer arithmetic on the byte array in one codegen'd pass — the
  * same discipline as [[SimHash64]] — and re-derivable position-by-position
  * in DuckDB SQL for an exact oracle ([[graft.ops.Multimodal.mediaPhashSql]]).
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash64 requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash64"

  override def nullSafeEval(input: Any): Any =
    DHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object DHash64 {

  /** 64 comparison bits need 65 windows. */
  val Cells = 65

  /** Static hook shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val sums = new Array[Long](Cells)
    val cnts = new Array[Int](Cells)
    var i = 0
    while (i < n) {
      // window of byte i: floor(i * 65 / n) — i*65 fits a long trivially
      val cell = (i.toLong * Cells / n).toInt
      sums(cell) += (payload(i) & 0xFF)
      cnts(cell) += 1
      i += 1
    }
    var fp = 0L
    var prev = if (cnts(0) == 0) 0L else sums(0) / cnts(0)
    i = 1
    while (i < Cells) {
      val cur = if (cnts(i) == 0) 0L else sums(i) / cnts(i)
      if (cur > prev) fp |= 1L << (i - 1)
      prev = cur
      i += 1
    }
    fp
  }

  /** Column-level entry point over a binary payload: `dhash64(payload)`. */
  def apply(c: Column): Column =
    ColumnShim.column(DHash64(ColumnShim.expression(c)))
}
