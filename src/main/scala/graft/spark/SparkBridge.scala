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

  /** Free the storage behind an eagerly `localCheckpoint(true)`'d
    * Dataset. `Dataset.unpersist` only consults the CacheManager, so
    * a checkpoint's MEMORY_AND_DISK blocks otherwise live until the
    * ContextCleaner eventually collects the RDD — in an iterative
    * operator that re-checkpoints a corpus-sized frame every round,
    * that leaves r live copies in executor storage. The checkpointed
    * plan is a `LogicalRDD` leaf over the persisted RDD; unpersist
    * that RDD directly. Safe only once nothing will read `df` again
    * (a localCheckpoint cannot recompute its blocks).
    */
  def unpersistCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case r: execution.LogicalRDD => r.rdd.unpersist(blocking)
      case _ => ()
    }
}
