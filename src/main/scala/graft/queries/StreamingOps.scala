package graft.queries

import graft.Q
import graft.streaming.EventStreams

/** SURVEY.md §2.9 streaming stretch goal: the tumbling-window
  * aggregate executed through Structured Streaming (file source →
  * watermark → windowed state → memory sink). Its oracle is the same
  * batch SQL as q34 — the unified-model guarantee that the streaming
  * result equals the batch result over the same data is exactly what
  * the check verifies.
  */
object StreamingOps {

  val q56 = Q(
    "q56_stream_tumbling_counts",
    (s, dir) =>
      EventStreams.tumblingCounts(s, dir, "q56_sink")
        .orderBy("wstart", "event_type"),
    Some("""SELECT CAST(floor(epoch(time_bucket(INTERVAL '5 minutes', ts))) AS BIGINT) AS wstart,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY wstart, event_type""".stripMargin))

  val all: Vector[Q] = Vector(q56)
}
