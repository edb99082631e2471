package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-8 release-management wave: the diff between two corpus
  * releases — the artifact a training-data org reviews before
  * shipping snapshot N+1 (what entered, what left, what silently
  * changed, per source). Complements q217's release manifest (one
  * release's content) and q238's cross-split contamination (one
  * release's internal hygiene).
  */
object ReleaseOps {

  /** Release diff / manifest delta. Two releases of the corpus are
    * derived deterministically from the fixture (PREVIOUS lacks the
    * doc_id % 7 == 3 slice — later-crawled docs; CURRENT carries a
    * content revision on the doc_id % 11 == 5 slice), then diffed by
    * a single full-outer join on doc_id comparing sha256 content
    * digests — 32-byte fixed-width shuffle keys/payloads, NEVER the
    * document text (the q198 discipline: at 100 TB the diff join
    * moves digests, text is read once in the projection). Output per
    * source: previous/current cardinality, added / removed / changed
    * / identical counts, and churn = (added+removed+changed)/current
    * — the number a release gate thresholds before promoting a
    * snapshot. Churn is emitted in INTEGER BASIS POINTS
    * (churn·10000 floor-divided, exact BIGINT in both engines) —
    * a round()ed double quotient over a fixture-sized denominator
    * can tie at .xxxx5 where Spark's HALF_UP and DuckDB's
    * binary-double rounding diverge (ADVICE r8 #2). Scale shape: one
    * hash-partitioned join keyed by doc_id, one aggregation; both
    * linear.
    */
  val q257 = Q(
    "q257_release_diff_audit",
    (s, dir) => {
      val docs = Tables.docs(s, dir).select("doc_id", "source", "text")
      val prev = docs
        .filter(pmod(col("doc_id"), lit(7)) =!= 3)
        .select(col("doc_id"), col("source").as("src_p"),
          sha2(col("text"), 256).as("h_prev"))
      val curr = docs
        .select(col("doc_id"), col("source").as("src_c"),
          sha2(when(pmod(col("doc_id"), lit(11)) === 5,
            concat(col("text"), lit(" v2"))).otherwise(col("text")), 256)
            .as("h_curr"))
      prev.join(curr, Seq("doc_id"), "full_outer")
        .select(coalesce(col("src_c"), col("src_p")).as("source"),
          when(col("h_prev").isNull, lit("added"))
            .when(col("h_curr").isNull, lit("removed"))
            .when(col("h_prev") =!= col("h_curr"), lit("changed"))
            .otherwise(lit("identical")).as("status"))
        .groupBy("source")
        .agg(
          sum((col("status") === "added").cast("long")).as("n_added"),
          sum((col("status") === "removed").cast("long")).as("n_removed"),
          sum((col("status") === "changed").cast("long")).as("n_changed"),
          sum((col("status") === "identical").cast("long")).as("n_identical"))
        .select(col("source"),
          (col("n_removed") + col("n_changed") + col("n_identical"))
            .as("n_prev"),
          (col("n_added") + col("n_changed") + col("n_identical"))
            .as("n_curr"),
          col("n_added"), col("n_removed"), col("n_changed"),
          col("n_identical"),
          expr("""(n_added + n_removed + n_changed) * 10000
            div (n_added + n_changed + n_identical)""").as("churn_bps"))
        .orderBy("source")
    },
    Some("""WITH prev AS (
      |  SELECT doc_id, source, sha256(text) AS h
      |  FROM documents WHERE doc_id % 7 <> 3),
      |curr AS (
      |  SELECT doc_id, source,
      |    sha256(CASE WHEN doc_id % 11 = 5 THEN text || ' v2'
      |                ELSE text END) AS h
      |  FROM documents),
      |d AS (
      |  SELECT coalesce(c.source, p.source) AS source,
      |    CASE WHEN p.h IS NULL THEN 'added'
      |         WHEN c.h IS NULL THEN 'removed'
      |         WHEN p.h <> c.h THEN 'changed'
      |         ELSE 'identical' END AS status
      |  FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id),
      |g AS (
      |  SELECT source,
      |    CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_added,
      |    CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_removed,
      |    CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_changed,
      |    CAST(sum(CASE WHEN status = 'identical' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_identical
      |  FROM d GROUP BY source)
      |SELECT source,
      |  n_removed + n_changed + n_identical AS n_prev,
      |  n_added + n_changed + n_identical AS n_curr,
      |  n_added, n_removed, n_changed, n_identical,
      |  (n_added + n_removed + n_changed) * 10000
      |    // (n_added + n_changed + n_identical) AS churn_bps
      |FROM g ORDER BY source""".stripMargin))

  val all: Vector[Q] = Vector(q257)
}
