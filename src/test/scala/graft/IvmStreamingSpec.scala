package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming twins for the round-9 IVM shapes (VERDICT r9 #3):
  * stream-maintained == batch-merged == full-recompute, per key —
  * the q255 parity pattern applied to q267 (top-k) and q269
  * (sessions), with the session twin explicitly hitting the
  * bridge-two-stored-sessions case from a LATE micro-batch.
  */
class IvmStreamingSpec extends SparkSpec {

  /** Write each "arrival batch" as its own file with strictly
    * increasing modification times, so the file stream (oldest-first,
    * maxFilesPerTrigger=1) replays the batches in the intended order —
    * this is how a late batch is made to arrive AFTER the sessions it
    * bridges were already stored.
    */
  private def writeArrivalBatches(
      dir: String, batches: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$dir/_stage$i"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(dir, f"b$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
  }

  test("top-k IVM view maintained across micro-batches == full recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topkivm").toString
    Tables.t(spark, sf(), "orders")
      .select(col("o_orderpriority").as("k"), col("o_orderkey").as("id"),
        (col("o_totalprice").cast("decimal(18,4)") * 100).cast("long").as("cts"))
      .repartition(4).write.parquet(s"$dir/ord")
    val schema = spark.read.parquet(s"$dir/ord").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/ord")
    val (view, batches) = EventStreams.topkViewMaintenance(stream, 5)
    assert(batches >= 4, s"merge path must run across batches, got $batches")
    val got = view.select("k", "id", "cts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("cts").desc, col("id"))
    val want = spark.read.parquet(s"$dir/ord")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("k", "id", "cts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      "stream-maintained top-k must equal the from-scratch top-k exactly")
    // bounded state: k rows per key, never more
    assert(view.groupBy("k").count().agg(max("count")).head().getLong(0) <= 5L)
  }

  test("session IVM view: late micro-batch bridges two stored sessions") {
    import spark.implicits._
    val gapUs = 21600000000L // 6 hours
    val h = 3600000000L // 1 hour in µs
    val dir = java.nio.file.Files.createTempDirectory("graft-sessivm").toString
    // batch 0: user 1 builds TWO stored sessions 12h apart; user 2 one
    // session. batch 1 (LATE): user 1's bridging event lands exactly
    // between its two stored sessions (within gap of both) and must
    // merge them into ONE; user 3 opens a fresh session; user 2
    // untouched (passes through verbatim).
    val b0 = Seq((1L, 0L), (1L, h), (1L, 12L * h), (1L, 13L * h),
      (2L, 2L * h)).toDF("user_id", "us")
    val b1 = Seq((1L, 7L * h), (3L, 5L * h)).toDF("user_id", "us")
    writeArrivalBatches(dir, Seq(b0, b1))
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val (view, batches) = EventStreams.sessionViewMaintenance(stream, gapUs)
    assert(batches == 2, s"the late batch must arrive separately, got $batches")
    val got = view.orderBy("user_id", "s_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 13L * h, 5L), // bridged: one session spanning both + the late point
      (2L, 2L * h, 2L * h, 1L), // untouched
      (3L, 5L * h, 5L * h, 1L)), // opened by the late batch
      s"bridge case wrong: ${got.toSeq}")
  }

  test("session IVM view across fixture micro-batches == full resessionization") {
    val gapUs = 21600000000L
    val dir = java.nio.file.Files.createTempDirectory("graft-sessivm2").toString
    Tables.events(spark, sf())
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
      .repartition(4).write.parquet(s"$dir/ev")
    val schema = spark.read.parquet(s"$dir/ev").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/ev")
    val (view, batches) = EventStreams.sessionViewMaintenance(stream, gapUs)
    assert(batches >= 4, s"merge path must run across batches, got $batches")
    // full recompute from raw events (hash-partitioned arrival order
    // means plenty of late deliveries relative to event time)
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us")
    val want = spark.read.parquet(s"$dir/ev")
      .withColumn("nf", when(lag("us", 1).over(wo).isNull ||
        col("us") - lag("us", 1).over(wo) > gapUs, 1).otherwise(0))
      .withColumn("sid", sum("nf").over(wo.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("s_start"), max("us").as("s_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "s_start", "s_end", "n_events")
    val got = view.select("user_id", "s_start", "s_end", "n_events")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-maintained sessions must equal full resessionization")
  }
}
