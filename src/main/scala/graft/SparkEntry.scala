package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the category modules under
  * graft.queries (SURVEY.md §2 inventory).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema join lineitem⋈orders⋈customer⋈nation⋈region with
    * broadcast dims (SURVEY.md §7 step 8).
    */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.q04.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Q.registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
