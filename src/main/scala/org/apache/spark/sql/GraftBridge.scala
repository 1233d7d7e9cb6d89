package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the conversion helpers (`classic.ExpressionUtils`)
  * `private[sql]`; the documented pattern for libraries contributing
  * custom expressions is a small shim in the `org.apache.spark.sql`
  * package (the same access route `SparkSessionExtensions` users take).
  */
object GraftBridge {
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
