package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column API no longer exposes its Catalyst expression
  * directly (Connect refactor); the converters live behind
  * `private[sql]`. This bridge re-exports the two conversions custom
  * Catalyst expressions need — the standard pattern for Spark-native
  * extension libraries.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
