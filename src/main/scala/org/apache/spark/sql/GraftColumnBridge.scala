package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters of the
  * classic (non-connect) API, so the engine's custom Catalyst expressions
  * can be exposed as `Column`s. Same technique many Spark extension
  * libraries use; confined to this one file. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
