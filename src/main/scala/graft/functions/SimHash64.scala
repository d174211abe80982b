package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE generated pass: per token,
  * xxhash64; per bit, a ±1 vote; fingerprint bit = sign of the vote sum.
  *
  * Same rationale as [[MinHashBands]]: the declarative formulation —
  * explode tokens, then one HashAggregate with 64 `sum(when(bit,1,-1))`
  * buffers — shuffles every token row and generates a 64-expression update
  * method that sits at the edge of the JVM's inlining budget. This
  * expression computes the fingerprint map-side in a tight compiled loop:
  * each token hashed once, no explode, no shuffle.
  *
  * Hash parity with the aggregate formulation (spec-pinned): token hash =
  * builtin xxhash64 (seed 42); bit i votes +1 iff bit i of the hash is
  * set; fingerprint bit i is set iff its vote sum is strictly positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val Seed = 42L // builtin xxhash64's seed

  /** Static hook shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XXH64.hashUTF8String(tokens.getUTF8String(j), Seed)
      var i = 0
      while (i < 64) {
        // +1 when bit i is set, -1 otherwise
        votes(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** Column-level entry point over a token array: `simhash64(tokens)`. */
  def apply(c: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(c)))
}
