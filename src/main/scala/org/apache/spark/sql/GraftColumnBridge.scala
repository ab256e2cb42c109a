package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters so the
  * engine can expose custom Catalyst expressions (e.g.
  * graft.functions.HyperplaneSignature) as ordinary Columns — the usual
  * extension-library seam for classic Spark. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
