package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `sql` package so the engine can lift its
  * custom Catalyst [[Expression]]s (e.g. the codegen'd geodesic length
  * kernel) into public [[Column]]s and back — the classic-API
  * converters are `private[sql]` in Spark 4.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
