package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access bridge for building `Column`s from custom Catalyst
  * `Expression`s: Spark 4 made the Column⇄Expression converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * extension libraries provide the conversion from inside the package —
  * the standard pattern used by public Spark extension projects. This is
  * the ONLY file outside the `graft` namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
