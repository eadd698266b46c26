package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the package-private Column <-> Expression
  * converters, so graft's native Catalyst expressions can be exposed as
  * Columns (the standard pattern for Spark extension libraries).
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
