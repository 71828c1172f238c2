package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 moved Column to a backend-agnostic representation;
  * the Expression<->Column converters live in `classic.ExpressionUtils`
  * which is private[sql] — this shim re-exports just the two conversions.
  */
object GraftShims {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
