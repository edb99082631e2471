package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the §2.9 event-time operators. The
  * aggregation expressions are identical to the batch versions in
  * graft.queries.Events — Spark's unified model means the same
  * groupBy(window(...)) plan runs incrementally with state + a
  * watermark. The parquet fixture drives the stream (file source),
  * a memory sink collects the result synchronously for verification.
  */
object EventStreams {

  /** Read the events fixture as a stream (same ns→µs normalization as
    * graft.Tables.events).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling event-time window counts with a watermark, run to
    * completion over the fixture and returned as a static DataFrame.
    */
  def tumblingCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    runToCompletion(agg, "complete", queryName)
      .select(
        unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Sliding event-time window (T2), streaming form of q35. */
  def slidingCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    runToCompletion(agg, "complete", queryName)
      .select(unix_timestamp(col("window.start")).as("wstart"), col("n"), col("sum_value"))
  }

  /** Session windows (T3) in append mode: emitted sessions are those
    * the watermark has closed — a strict subset of the batch result
    * (the trailing open session per user stays in state).
    */
  def sessionCounts(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
    runToCompletion(agg, "append", queryName)
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("sstart"),
        col("n_events"), col("sum_value"))
  }

  private def runToCompletion(
      agg: DataFrame, mode: String, queryName: String): DataFrame = {
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    agg.sparkSession.table(queryName)
  }
}
