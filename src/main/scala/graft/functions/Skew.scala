package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation via salting (SURVEY.md / builder scale notes).
  *
  * A hot grouping key sends all its rows to one reducer; salting
  * splits each key into `saltBuckets` sub-keys, aggregates partially
  * per sub-key, then merges — two small shuffles instead of one
  * skewed one. Only associative aggregates can ride this path; the
  * API takes (partial, merge) column pairs to keep that explicit.
  */
object Skew {

  /** Salted two-phase aggregation.
    *
    * @param df      input
    * @param key     grouping column name
    * @param saltBuckets  sub-keys per key (≈ max reducer fan-out)
    * @param partial aggregate per (key, salt), e.g. sum, count partials
    * @param merge   re-aggregation of the partial columns, keyed by
    *                the partial output names
    */
  def saltedAggregate(
      df: DataFrame, key: String, saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // deterministic salt (hash of the full row position-free columns
    // would be ideal; monotonically_increasing_id is partition-local
    // and cheap, and only distribution — not correctness — depends
    // on it)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
