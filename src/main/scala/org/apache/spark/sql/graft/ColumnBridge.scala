package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge: `classic.ExpressionUtils` is
  * `private[sql]`, so the (one) custom Catalyst expression reaches it
  * through this package-located shim — the standard pattern for
  * third-party expression libraries on Spark 4.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
