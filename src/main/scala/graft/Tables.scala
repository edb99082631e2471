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

  /** Resolve each fixture table ONCE per (session, path) and reuse
    * the analyzed DataFrame — this is what a catalog does, and what
    * `spark.read.parquet` per query throws away: ProfileTax measured
    * every read at ~58 ms steady-state (footer/schema re-resolution),
    * which multiplied into THE dominant fixed per-query cost of the
    * whole bench (~60–120 ms × 267 queries; the r5→r9 "planning tax"
    * BASELINE.md decomposed — its analyzer attribution was wrong,
    * physical planning measured at <10 ms/query). At 100 TB the same
    * discipline matters more, not less: object-store listing + footer
    * reads per query per table is a real cluster tax, and production
    * metastores exist precisely to resolve a table's schema/layout
    * once. Fixture dirs are immutable for the life of a JVM (ScaleUp
    * writes only to dirs it never reads back through Tables), so no
    * invalidation path is needed. Keyed weakly by session so stopped
    * spec sessions don't pin their plans.
    */
  private val frameCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def cached(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    val per = frameCache.synchronized {
      var m = frameCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        frameCache.put(spark, m)
      }
      m
    }
    per.computeIfAbsent(key, _ => build)
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else cached(spark, s"$dir/$name.parquet") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

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
  def events(spark: SparkSession, dir: String): DataFrame =
    cached(spark, s"$dir/events.parquet#retyped") {
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
