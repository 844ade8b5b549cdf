package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made Column node-based and hid the Expression conversions
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Extension libraries conventionally expose them from inside the
  * `org.apache.spark.sql` namespace — this is the only file in this repo
  * living outside the `graft` package, and it contains no logic.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
