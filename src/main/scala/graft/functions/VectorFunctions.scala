package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the
  * codegen'd [[VecDot]]/[[VecDist2]] Catalyst expressions (no UDF, no
  * collect). The equivalent higher-order-function form
  * (`aggregate(zip_with(...))`) is what the DuckDB oracle still runs
  * (list_zip/list_transform/list_sum), so correctness of the fast
  * path is oracle-pinned on every run.
  *
  * Every element is cast to DOUBLE before multiplying and the sum
  * folds left-to-right in both engines — bit-identical results.
  */
object VectorFunctions {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  private def ex(c: Column) = org.apache.spark.sql.GraftSqlBridge.expression(c)

  /** Dot product of two array<float|double> columns as DOUBLE. */
  def dot(a: String, b: String): Column =
    bridge(VecDot(ex(expr(a)), ex(expr(b))))

  /** DuckDB rendering of [[dot]] — identical fold order. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  /** L2 norm. */
  def norm(a: String): Column = sqrt(dot(a, a))

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Squared euclidean distance between an array<float> column and an
    * array<double> column (e.g. a centroid).
    */
  def dist2(a: String, b: String): Column =
    bridge(VecDist2(ex(expr(a)), ex(expr(b))))

  def dist2Sql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> pow(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE), 2)))"
}
