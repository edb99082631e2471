package graft.plans

import graft.functions.{Md5Long60, SortedIntersectCount, VecDist2, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point (SURVEY.md §4): registers the
  * engine's custom Catalyst expressions so any session configured
  * with `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) gets them in SQL.
  *
  * No custom Rule/SparkStrategy is injected — SURVEY §4's analysis
  * holds: Catalyst's built-ins cover the whole §2 inventory; the only
  * custom piece we measured a need for is the expression below.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("md5long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5long60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Long60(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("vecdot"),
      new ExpressionInfo(classOf[VecDot].getName, "vecdot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vecdist2"),
      new ExpressionInfo(classOf[VecDist2].getName, "vecdist2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDist2(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(exprs(0), exprs(1))))
  }
}
