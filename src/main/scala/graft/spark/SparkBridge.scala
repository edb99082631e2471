package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column↔Expression converters (Spark
  * 4 removed the public `new Column(expr)` constructor). Lives in the
  * org.apache.spark.sql package — the standard pattern for libraries
  * that define custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
