package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's parameterized expressions
  * (e.g. IvfAssign, whose centroid table is a constructor argument and so
  * cannot go through the string-based function registry). Spark 4 hides
  * this behind `classic.ExpressionUtils` (private[sql]); this shim is the
  * conventional extension-library escape hatch.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
