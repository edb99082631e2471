package graft.queries

import graft.Q
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** Round-12 retrieval wave: SEMANTIC cross-split contamination — the
  * embedding-space counterpart of q238's fingerprint-based
  * train/eval check. Fingerprint contamination catches verbatim
  * leakage; an eval example that was paraphrased or lightly
  * perturbed before landing in the training set shares no n-gram
  * fingerprint but sits at a suspiciously small embedding distance —
  * exactly what eval decontamination pipelines screen for before a
  * benchmark run.
  */
object SearchOps7 {

  /** Top-20 eval vectors by nearest-TRAIN embedding distance, with a
    * contamination flag at d² ≤ 1.15 (the fixture's 5th-percentile
    * neighborhood — "closer than 95% of natural nearest-neighbor
    * distances"). Split is q257's release framing: vec_id % 7 == 3
    * is the eval set, the rest train.
    *
    * Scale shape (the q284 quantizer discipline): both splits are
    * assigned to the SHARED √n-cell quantizer
    * ([[graft.pipeline.SemDeDup.cellAssign]]) in one pass over the
    * pinned frame, and the eval×train pair space is cell-local —
    * Σ evalᵢ·trainᵢ ≈ n^1.5, never n². Distances are the engine-
    * exact rounded d² lifted to integers; the per-eval argmin is a
    * lexicographic (d2i, train_id) min — fold-order-free. An eval
    * vector whose cell holds no train vector is excluded (no pair
    * row exists in either engine — q284's singleton convention);
    * the within-cell restriction UNDERSTATES true proximity only
    * across cell boundaries, the measured-recall posture of
    * q180/q284.
    */
  val q287 = Q(
    "q287_semantic_contamination",
    (s, dir) => {
      val assigned = graft.pipeline.SemDeDup.cellAssign(VectorOps.emb(s, dir))
        .select("vec_id", "cell", "embedding")
        .localCheckpoint(true) // read as BOTH split sides
      val ev = assigned.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id").as("ev_id"), col("cell"), col("embedding").as("ee"))
      val tr = assigned.filter(pmod(col("vec_id"), lit(7)) =!= 3)
        .select(col("vec_id").as("tr_id"), col("cell"), col("embedding").as("te"))
      ev.join(tr, Seq("cell"))
        .withColumn("d2i",
          round(round(V.dist2("ee", "te"), 6) * 1e6, 0).cast("long"))
        .groupBy(col("ev_id").as("vec_id"), col("cell"))
        .agg(min(struct(col("d2i"), col("tr_id"))).as("best"))
        .select(col("vec_id"), col("cell"),
          col("best.tr_id").as("nearest_train"),
          round(col("best.d2i") / 1e6, 6).as("min_d2"),
          (col("best.d2i") <= 1150000L).as("contaminated"))
        .orderBy(col("min_d2"), col("vec_id"))
        .limit(20)
    },
    Some(s"""WITH st AS (
      |  SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS step
      |  FROM embeddings),
      |seeds AS MATERIALIZED (
      |  SELECT vec_id AS seed_id, embedding AS svec
      |  FROM embeddings CROSS JOIN st WHERE vec_id % st.step = 0),
      |assigned AS MATERIALIZED (
      |  SELECT vec_id, embedding, cell FROM (
      |    SELECT e.vec_id, e.embedding, s.seed_id AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(${V.dist2Sql("e.embedding", "s.svec")}, 6), s.seed_id)
      |        AS rn
      |    FROM embeddings e CROSS JOIN seeds s)
      |  WHERE rn = 1),
      |ev AS (SELECT vec_id AS ev_id, cell, embedding AS ee
      |       FROM assigned WHERE vec_id % 7 = 3),
      |tr AS (SELECT vec_id AS tr_id, cell, embedding AS te
      |       FROM assigned WHERE vec_id % 7 <> 3),
      |d AS (
      |  SELECT ev_id, ev.cell AS cell, tr_id,
      |    CAST(round(round(${V.dist2Sql("ee", "te")}, 6) * 1e6) AS BIGINT) AS d2i,
      |    row_number() OVER (PARTITION BY ev_id
      |      ORDER BY CAST(round(round(${V.dist2Sql("ee", "te")}, 6) * 1e6) AS BIGINT),
      |               tr_id) AS rn
      |  FROM ev JOIN tr ON ev.cell = tr.cell)
      |SELECT ev_id AS vec_id, cell, tr_id AS nearest_train,
      |  round(d2i / 1e6, 6) AS min_d2, d2i <= 1150000 AS contaminated
      |FROM d WHERE rn = 1
      |ORDER BY min_d2, vec_id LIMIT 20""".stripMargin))

  val all: Vector[Q] = Vector(q287)
}
