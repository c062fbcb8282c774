package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils) so the engine can
  * expose native Catalyst expressions as Columns. Lives in the
  * org.apache.spark.sql package on purpose — the sanctioned pattern for
  * libraries extending Catalyst without forking Spark. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
