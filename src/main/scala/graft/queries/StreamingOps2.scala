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

  val all: Vector[Q] = Vector(q218)
}
