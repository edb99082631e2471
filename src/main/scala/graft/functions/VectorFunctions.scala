package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, expressed with
  * Spark's codegen'd higher-order functions (no UDF, no collect) so
  * Catalyst keeps the whole pipeline in WholeStageCodegen and the
  * same arithmetic is expressible in the DuckDB oracle
  * (list_zip/list_transform/list_sum).
  *
  * Every element is cast to DOUBLE before multiplying so Spark and
  * DuckDB produce bit-identical sums (both fold left-to-right).
  */
object VectorFunctions {

  /** Dot product of two array<float|double> columns as DOUBLE. */
  def dot(a: String, b: String): Column =
    expr(s"""aggregate(
      zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""")

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
    expr(s"""aggregate(
      zip_with($a, $b, (x, y) -> pow(CAST(x AS DOUBLE) - CAST(y AS DOUBLE), 2)),
      CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""")

  def dist2Sql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> pow(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE), 2)))"
}
