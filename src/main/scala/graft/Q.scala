package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows-only check.
  *
  * Determinism contract (SURVEY.md §5): every query ends in a total
  * ORDER BY (or is a single-row aggregate); float aggregates are
  * rounded; oracle ORDER BYs say NULLS FIRST to match Spark's
  * ascending default.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** include in the Bench headline set */
    bench: Boolean = true)

object Q {
  /** All query modules, in SURVEY.md §2 category order. */
  def registry: Vector[Q] =
    queries.Relational.all ++
      queries.Relational2.all ++
      queries.Relational3.all ++
      queries.Aggregates.all ++
      queries.Analytics.all ++
      queries.Scalars.all ++
      queries.Events.all ++
      queries.TextOps.all ++
      queries.VectorOps.all ++
      queries.MultimodalOps.all ++
      queries.StreamingOps.all ++
      queries.Extended.all ++
      queries.PipelineOps.all ++
      queries.CorpusOps.all ++
      queries.Relational4.all ++
      queries.CorpusOps2.all ++
      queries.SearchOps.all ++
      queries.Relational5.all ++
      queries.GraphOps.all ++
      queries.PipelineOps2.all ++
      queries.Analytics2.all ++
      queries.Scalars2.all
}
