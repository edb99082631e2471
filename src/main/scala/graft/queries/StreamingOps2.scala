package graft.queries

import graft.{Q, Tables}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming additions, second batch. */
object StreamingOps2 {

  /** Heavy hitters over the STREAM: a count-min sketch aggregated
    * through Structured Streaming (complete mode — the sketch buffer
    * is the streaming state, merged across micro-batches), then
    * audited against the exact batch top-10 panel exactly like q199.
    * This is the production shape for "what's trending" at 100 TB/day:
    * constant state per key-space regardless of throughput, and the
    * audit proves the streamed sketch equals a batch sketch would.
    * CMS cell adds are commutative integer sums, so micro-batch
    * arrival order cannot change the estimate.
    */
  val q218 = Q(
    "q218_stream_heavy_hitters",
    (s, dir) => {
      val eps = 0.001
      val row = EventStreams.cmsOverStream(s, dir, "q218_sink").head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
      val n = row.getAs[Long]("n")
      val bound = math.ceil(eps * n).toLong
      val exact = Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("k")).limit(10)
      val panel = exact.collect().toSeq.map { r =>
        val k = r.getString(0); val c = r.getAs[Long]("cnt")
        val est = cms.estimateCount(k)
        (k, c, est >= c && est <= c + bound)
      }
      import s.implicits._
      panel.toDF("k", "cnt", "est_ok").orderBy(col("cnt").desc, col("k"))
    },
    Some("""SELECT k, count(*) AS cnt, TRUE AS est_ok
      |FROM (SELECT json_extract_string(props, '$.k') AS k FROM events)
      |GROUP BY 1 ORDER BY cnt DESC, k LIMIT 10""".stripMargin))

  /** Streaming approx-distinct parity: an HLL sketch aggregated
    * through the streaming engine (complete mode, register-max merge
    * across micro-batches) must estimate EXACTLY what the same
    * sketch over the batch frame estimates — HLL registers are
    * per-bucket maxima, so arrival order is provably irrelevant, and
    * any difference is an engine regression, not sketch noise. The
    * output panel carries the exact distinct count, both estimates,
    * their equality, and a 5%-relative-error audit of the sketch
    * itself; the oracle pins the exact count and the audit flags.
    */
  val q230 = Q(
    "q230_stream_distinct_parity",
    (s, dir) => {
      val streamRow = EventStreams.hllOverStream(s, dir, "q230_sink").head()
      val streamEst = streamRow.getAs[Long]("est")
      val batch = Tables.events(s, dir)
        .select(concat(col("user_id").cast("string"), lit(":"),
          col("event_type")).as("k"))
      val batchEst = batch
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(k, 12))").as("est"))
        .head().getAs[Long]("est")
      val exact = batch.distinct().count()
      import s.implicits._
      Seq((exact, streamEst == batchEst,
        math.abs(streamEst - exact).toDouble / exact <= 0.05))
        .toDF("n_exact", "stream_eq_batch", "within_5pct")
    },
    Some("""SELECT count(DISTINCT concat(CAST(user_id AS VARCHAR), ':', event_type))
      |  AS n_exact, TRUE AS stream_eq_batch, TRUE AS within_5pct
      |FROM events""".stripMargin))

  val all: Vector[Q] = Vector(q218, q230)
}
