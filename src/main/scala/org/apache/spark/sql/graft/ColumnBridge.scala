package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ↔ Expression bridge for graft's native Catalyst
  * expressions. Spark 4 made these conversions private[sql] (the Connect
  * refactor); the supported extension idiom is a shim in the sql package
  * namespace — this object is the only code graft places there.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
