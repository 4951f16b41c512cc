package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge: `classic.ExpressionUtils` is
  * `private[sql]`, so the (one) custom Catalyst expression reaches it
  * through this package-located shim — the standard pattern for
  * third-party expression libraries on Spark 4.
  *
  * `expression` converts EAGERLY (`ColumnNodeToExpressionConverter`)
  * rather than via `ExpressionUtils.expression`: the latter returns a
  * lazy `ColumnNodeExpression` wrapper, which is `Unevaluable` and
  * opaque when an injected SQL function builder returns it mid-
  * analysis (measured: INTERNAL_ERROR "Cannot generate code for
  * expression columnnodeexpression(...)"). Eager conversion hands the
  * analyzer a plain Catalyst tree it can resolve. */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
