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

  /** Apply a SparkSessionExtensions' injected functions to a live
    * session's registry (the hook sessions run at creation; exposed
    * so specs can exercise the injection path without a fresh JVM).
    */
  def registerInjectedFunctions(
      ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.sessionState.functionRegistry.asInstanceOf[
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
}
