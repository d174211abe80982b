package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two `array<double>` columns as a native Catalyst
  * expression: ONE pass accumulating dot product and both squared norms,
  * with `doGenCode` so it fuses into whole-stage codegen.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))` per
  * dot product, three of them per cosine) is interpreted — lambda-function
  * expressions don't code-generate — and walks both arrays three times;
  * this walks them once in a tight generated loop. Semantics match the HOF
  * version exactly: left-to-right IEEE-754 accumulation, null if either
  * side is null, NaN on zero-norm input (never produced by the testdata).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires two array<double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  // Different-length arrays → null, matching the HOF formulation (zip_with
  // pads the shorter side with nulls, which nulls the whole fold). A silent
  // prefix-cosine would be a wrong-but-plausible number.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineSimilarity.compute($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Static hook shared by interpreted eval and generated code. Callers
    * guarantee equal lengths (the expression returns null otherwise).
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-level entry point: `cosine_similarity($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))
}
