package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.InterleaveBits

/** Z-order (Morton-curve) data layout: cluster a table so that a
  * range predicate on ANY of several columns maps to a small
  * fraction of files, not just predicates on the leading sort key.
  *
  * Why this matters at 100 TB: Spark skips parquet ROW GROUPS whose
  * column [min,max] stats exclude a pushed-down predicate, and
  * whole FILES when an external table format carries file stats —
  * but both only help if the layout makes per-file ranges narrow.
  * A single-column sort gives narrow ranges for that column alone;
  * interleaving the bits of k normalized columns gives every
  * interleaved column ~|files|^(1/k)-fractional ranges, which is
  * the difference between scanning 100 TB and scanning a few
  * hundred GB for a multi-dimensional slice (cf. the layout
  * clustering in Delta/Iceberg OPTIMIZE ZORDER).
  *
  * The normalization pass is ONE distributed min/max aggregate (a
  * single tiny row to the driver — no data collect); bucketing is
  * uniform within [min,max], so heavily skewed columns should be
  * pre-transformed (log, rank) by the caller.
  */
object ZOrder {

  /** The z-value column: each column min-max-normalized to
    * `[0, 2^bits)` and bit-interleaved. `bits` defaults to the most
    * precision that fits a long for the dimension count.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 0): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    // default precision: 16 bits/dim is ~65k buckets — far finer than
    // any file count — while staying well inside Int bucket math
    // (buckets are Int columns, so bits must stay <= 30)
    val b = if (bits > 0) bits else math.min(16, 63 / cols.size)
    require(b <= 30, s"$b bits per dimension exceeds Int bucket math")
    require(cols.size * b <= 63, s"${cols.size} dims x $b bits exceeds a long")
    // one stats pass; the result is 2k doubles, never row data
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head
    val m = 1 << b
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // empty input / all-null column: degenerate to bucket 0 rather
      // than NPE (min/max aggregate to null)
      val mn = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val mx = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      val span = if (mx > mn) mx - mn else 1.0
      least(lit(m - 1), greatest(lit(0),
        floor((col(c).cast("double") - lit(mn)) / lit(span) * lit(m)).cast("int")))
    }
    org.apache.spark.sql.GraftSqlBridge.column(InterleaveBits(
      org.apache.spark.sql.GraftSqlBridge.expression(array(buckets: _*)),
      b))
  }

  /** Re-cluster `df` along the z-curve of `cols` into `numFiles`
    * output partitions: range-partition by z-value (so files tile
    * the curve in contiguous, stats-tight segments), sort within
    * each, drop the helper column. Write the result with one task
    * per file.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 0): DataFrame =
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
