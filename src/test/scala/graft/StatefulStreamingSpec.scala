package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** flatMapGroupsWithState sessionizer: state must carry across
  * micro-batches (the behavior batch execution cannot show) and the
  * closed-session stream must agree with the declarative
  * session_window batch result.
  */
class StatefulStreamingSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 + m

  test("open session state survives micro-batch boundaries") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.statefulSessions(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("stateful_spec").start()
    try {
      // batch 1: two events of one session for user 7
      input.addData((7L, ts(0), 1.0), (7L, ts(10), 2.0))
      q.processAllAvailable()
      assert(spark.table("stateful_spec").count() == 0, "session still open")
      // batch 2: an event 40min later (beyond the 30min gap) closes
      // the session started in batch 1 — requires carried state
      input.addData((7L, ts(50), 4.0))
      q.processAllAvailable()
      val rows = spark.table("stateful_spec")
        .select("user_id", "n_events", "sum_value").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 7L)
      assert(rows.head.getLong(1) == 2L)   // both batch-1 events
      assert(rows.head.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replays across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_spec").start()
    try {
      input.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0)) // dup inside batch
      q.processAllAvailable()
      input.addData((1L, ts(2), 3.0)) // replay in a later micro-batch
      q.processAllAvailable()
      val rows = spark.table("dedup_spec").collect()
      assert(rows.length == 1, "replays within the watermark must be dropped")
      assert(rows.head.getDouble(2) == 1.0) // first occurrence wins
    } finally q.stop()
  }

  test("transformWithState sessionizer: state and timers across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val providerBefore =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val q = EventStreams.startWithRocksDb(spark,
      EventStreams.statefulSessionsTws(events)
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_spec"))
    assert(
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        == providerBefore,
      "RocksDB provider must not leak onto the shared session")
    try {
      input.addData((7L, ts(0), 1.0), (7L, ts(10), 2.0))
      q.processAllAvailable()
      assert(spark.table("tws_spec").count() == 0, "session still open")
      // beyond the 30-min gap: closes the carried session (same
      // contract as the flatMapGroupsWithState form)
      input.addData((7L, ts(50), 4.0))
      q.processAllAvailable()
      val rows = spark.table("tws_spec")
        .select("user_id", "n_events", "sum_value").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 7L)
      assert(rows.head.getLong(1) == 2L)
      assert(rows.head.getDouble(2) == 3.0)
      // advancing the watermark far past lastEvent+gap fires the
      // event-time TIMER and closes the open session with no further
      // events for user 7
      input.addData((9L, ts(200), 1.0))
      q.processAllAvailable()
      val closed = spark.table("tws_spec")
        .filter(col("user_id") === 7L).collect()
      assert(closed.length == 2, "timer must close the trailing session")
    } finally q.stop()
  }

  test("transformWithState closed sessions match the flatMapGroupsWithState ones") {
    val tws = EventStreams.statefulSessionsTws(
      EventStreams.readEvents(spark, sf()))
    val q1 = EventStreams.startWithRocksDb(spark,
      tws.writeStream.outputMode("append").format("memory")
        .queryName("tws_fixture"))
    try q1.processAllAvailable() finally q1.stop()
    val fmg = EventStreams.statefulSessions(
      EventStreams.readEvents(spark, sf()))
    val q2 = fmg.writeStream.outputMode("append").format("memory")
      .queryName("fmg_fixture").start()
    try q2.processAllAvailable() finally q2.stop()
    val legacy = spark.table("fmg_fixture")
    val got = spark.table("tws_fixture")
    assert(got.count() > 0)
    assert(got.exceptAll(legacy).isEmpty && legacy.exceptAll(got).isEmpty,
      "both stateful APIs must close the identical session set")
  }

  test("closed sessions from the fixture match the batch session_window result") {
    val stream = EventStreams.statefulSessions(
      graft.streaming.EventStreams.readEvents(spark, sf()))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("stateful_fixture").start()
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.table("stateful_fixture")
      .select(col("user_id"), col("sstart"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
    val batch = Q.registry.find(_.name == "q36_session_window").get
      .fn(spark, sf())
      .select("user_id", "sstart", "n_events", "sum_value")
    assert(emitted.count() > 0)
    assert(emitted.exceptAll(batch).isEmpty,
      "every closed session must exist identically in the batch result")
  }
}
