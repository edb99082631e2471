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
    // the batch tumbling oracle IS the streaming oracle — unified model
    Events.q34.oracle)

  /** Sliding windows (T2) through the streaming engine: overlapping
    * windows mean every event feeds two state rows; the watermark
    * bounds that state. Shares q35's batch oracle.
    */
  val q80 = Q(
    "q80_stream_sliding_counts",
    (s, dir) =>
      EventStreams.slidingCounts(s, dir, "q80_sink")
        .orderBy("wstart"),
    Events.q35.oracle)

  val all: Vector[Q] = Vector(q56, q80)
}
