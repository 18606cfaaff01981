package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for third-party Catalyst expressions: Spark 4 made the
  * Column ⇄ Expression converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so library code
  * needing a Column over a custom Expression goes through this shim.
  * Only conversion — no behavior. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
