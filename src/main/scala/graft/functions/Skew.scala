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

  /** Salted equi-join for a skewed FACT side against a dimension too
    * large (or a planner unable) to broadcast: each fact row takes a
    * random-ish salt in [0, saltBuckets), the dimension is replicated
    * once per salt value, and the join key becomes (key, salt) — so a
    * hot key's rows spread over `saltBuckets` reducers instead of
    * one. Shuffle volume grows by |dim| × saltBuckets, which is the
    * explicit trade against the hot reducer; result equals the plain
    * inner join row-for-row.
    *
    * Spark's AQE skew-join (OptimizeSkewedJoin) solves the same
    * problem transparently for sort-merge joins and should be the
    * first resort; this form covers what AQE cannot: shuffle-hash
    * joins, skew known ahead of time (skip the lopsided first
    * attempt), and engines/plans where AQE is off.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val fs = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val ds = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    fs.join(ds, Seq(key, "__salt")).drop("__salt")
  }
}
