package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column ↔ Expression conversion (Spark 4 moved
  * Column onto ColumnNode; `ExpressionUtils` is the classic-session adapter).
  * Lives in an `org.apache.spark.sql` subpackage purely to satisfy the
  * `private[sql]` qualifier — the standard pattern used by public Spark
  * extension libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
