package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Fixture-table access (TESTDATA.md). One parquet file per table.
  *
  * Mirrors the reference's "external table over files in object
  * storage" model (reference backend/hive_manager.py:169-181 registers
  * S3-located external tables); here the location is a parquet path and
  * Spark's datasource layer provides the scan with predicate pushdown
  * and column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in three parquet layouts across driver
    * fixture generations, and all three must read back as one Spark
    * type (TIMESTAMP, UTC instant) or every windowed/watermarked query
    * breaks:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read
    *    as long (legacy flag) and truncate ns→µs — exactly what DuckDB
    *    does reading the same file.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark maps it to
    *    TIMESTAMP_NTZ, which Structured Streaming event time and
    *    unix_micros both reject. Cast to TIMESTAMP — with the session
    *    timezone pinned to UTC the wall-clock reinterpretation is the
    *    identity, matching DuckDB's naive reading.
    *  - TIMESTAMP(MICROS, UTC-adjusted) (ScaleUp-written): already
    *    TIMESTAMP; pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  }

  /** The documents fixture is a single-row-group parquet file, which
    * Spark cannot split — without an explicit spread every tokenize/
    * hash/explode pipeline over it would run on ONE core. The rows
    * are tiny and the downstream per-row compute is heavy, so a
    * repartition to full parallelism costs one negligible shuffle and
    * wins back the whole cluster. (Same reasoning holds at 100 TB
    * whenever a narrow scan feeds CPU-heavy per-row work.)
    */
  def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)

  /** Register every fixture table as a temp view (for spark.sql paths).
    * Idempotent and metadata-only — no data is read until a query runs.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
