package graft

import graft.graph.IncrementalCC
import org.apache.spark.sql.functions._

/** Pins the two `withDeletions` deployment modes (ADVICE r9):
  * refresh-loop mode (`pinAndRelease = true`) must not accumulate
  * pinned block-manager storage across calls — the lazy query mode
  * deliberately leaves its intermediates pinned (documented, JVM ends
  * anyway) and would leak Θ(nodes) per call in a loop.
  */
class IncrementalCCReleaseSpec extends SparkSpec {

  private def edges(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  // a 3-component snapshot; the takedown removes the (3,4) bridge —
  // splitting {1..5} — and node 10 entirely (label-carrier removal)
  private val snap = edges(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (11L, 12L), (20L, 21L)))
  private val surv = edges(Seq((1L, 2L), (2L, 3L), (4L, 5L),
    (11L, 12L), (20L, 21L)))

  private def labels(df: org.apache.spark.sql.DataFrame) =
    df.select("node", "component").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("refresh-loop mode returns the same labels as the lazy query mode") {
    assert(labels(IncrementalCC.withDeletions(snap, surv, pinAndRelease = true))
      == labels(IncrementalCC.withDeletions(snap, surv)))
  }

  test("refresh-loop mode does not accumulate pinned blocks across calls") {
    val sc = spark.sparkContext
    // settle: one warm call, then measure GROWTH over a 4-call loop
    // (relative, because suites share the session and may hold pins)
    IncrementalCC.withDeletions(snap, surv, pinAndRelease = true).count()
    val before = sc.getPersistentRDDs.size
    val outputs = (1 to 4).map { _ =>
      IncrementalCC.withDeletions(snap, surv, pinAndRelease = true)
    }
    val growth = sc.getPersistentRDDs.size - before
    // each loop call legitimately keeps ONE pin (its output — the
    // loop's next snapshot); the leak this guards against kept >=3
    // extra Θ(nodes) checkpoints per call (snapshot CC, affected set,
    // recomputed CC), i.e. >=12 extra pins over this loop. Slack of 2
    // absorbs concurrent suites touching the shared session.
    assert(growth <= 4 + 2,
      s"refresh loop grew pinned storage by $growth RDDs over 4 calls")
    outputs.foreach(org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(_))
  }
}
