package graft.queries

import graft.{Q, Tables}
import graft.functions.{Portable, VectorFunctions => V}
import org.apache.spark.sql.functions._

/** Round-5 curation tail — the remaining large-corpus preparation
  * operators a training-data pipeline runs between ingest and export:
  * k-means clustering of embeddings (q182), temperature-based
  * multilingual mixture sampling (q183), learned linear quality
  * scoring with hashed features (q184), and corpus snapshot diffing
  * (q185). Reference scope: the (N) pipeline surface of SURVEY.md
  * §2.13 (the reference delegates analytics to its Hive binary and
  * has no native counterparts; these are the standard published
  * constructions re-expressed Spark-first).
  */
object CurationOps {

  private val dim = 64

  /** One Lloyd round of the q182 oracle: assignment (a_i) under the
    * previous centroids (c_{i-1}), then the centroid update (c_i) —
    * the SQL twin of [[graft.pipeline.KMeans.assign]]/`update`.
    */
  private def lloydSql(i: Int): String =
    s"""a$i AS (
       |  SELECT vec_id, embedding, cl, d2 AS d2r FROM (
       |    SELECT vec_id, embedding, cl, d2,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
       |    FROM (
       |      SELECT e.vec_id, e.embedding, c.cl,
       |        round(${V.dist2Sql("e.embedding", "c.cv")}, 6) AS d2
       |      FROM embeddings e CROSS JOIN c${i - 1} c) p) q
       |  WHERE rn = 1),
       |c$i AS (
       |  SELECT cl, list(m ORDER BY pos) AS cv FROM (
       |    SELECT cl, g.i AS pos,
       |      round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS m
       |    FROM a$i, generate_series(1, $dim) g(i)
       |    GROUP BY 1, 2) t
       |  GROUP BY cl)""".stripMargin

  /** Distributed Lloyd k-means (k=8, 3 update rounds + final
    * assignment) over the embeddings table, reporting per-cluster
    * size and inertia. The iteration machinery — driver-held
    * centroids, broadcast assignment with map-side argmin, k·d-key
    * update aggregation — is [[graft.pipeline.KMeans]]; see its
    * scaladoc for the 100 TB argument (per-iteration shuffle volume
    * is O(partitions·k·d), independent of n). k is a constant here so
    * DuckDB can replay the loop as an unrolled CTE chain; production
    * k only widens the broadcast.
    *
    * Inertia accumulates the ROUNDED per-vector distances in
    * DECIMAL(28,6) — fold-order-free (the moneySum reasoning), so the
    * sum is bit-identical across engines at any scale.
    */
  val q182 = Q(
    "q182_kmeans_lloyd",
    (s, dir) => {
      val e = Tables.t(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select("vec_id", "embedding")
      graft.pipeline.KMeans.fit(e, k = 8, iters = 3)
        .groupBy("cl")
        .agg(count(lit(1)).as("n"),
          sum(col("d2r").cast("decimal(28,6)")).cast("double").as("inertia"))
        .orderBy("cl")
    },
    Some(s"""WITH c0 AS (
      |  SELECT CAST(vec_id AS INTEGER) AS cl,
      |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |${lloydSql(1)},
      |${lloydSql(2)},
      |${lloydSql(3)},
      |a4 AS (
      |  SELECT vec_id, cl, d2 AS d2r FROM (
      |    SELECT vec_id, cl, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
      |    FROM (
      |      SELECT e.vec_id, c.cl,
      |        round(${V.dist2Sql("e.embedding", "c.cv")}, 6) AS d2
      |      FROM embeddings e CROSS JOIN c3 c) p) q
      |  WHERE rn = 1)
      |SELECT cl, count(*) AS n,
      |  CAST(sum(CAST(d2r AS DECIMAL(28,6))) AS DOUBLE) AS inertia
      |FROM a4 GROUP BY cl ORDER BY cl""".stripMargin))

  /** Temperature-based multilingual mixture sampling (the α-sampling
    * of multilingual pretraining, α = 0.5): per-language sampling
    * rates ∝ n_lang^α re-normalized to a half-corpus budget, capped
    * at 1 (downsample-only), then a deterministic portable-hash
    * Bernoulli per document. Complements q104 (waterfill to uniform):
    * temperature sampling RESHAPES the mix toward low-resource
    * languages instead of flattening it.
    *
    * Determinism: α = 0.5 makes the weight sqrt(n)·10⁶ rounded to a
    * BIGINT — sqrt is IEEE-correctly-rounded in both engines (pow is
    * not, which is why the exponent is half) — so rates are quotients
    * of identical integers and the hash filter compares identical
    * doubles. Scale: two aggregations over the corpus plus a
    * broadcast of #languages rows; the budget arithmetic stays in
    * 64-bit range to ~10¹⁰ docs.
    */
  val q183 = Q(
    "q183_temperature_mix",
    (s, dir) => {
      val d = Tables.docs(s, dir)
      val langN = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val scored = langN.withColumn("s",
        round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
      val tot = scored.agg(sum("s").as("stot"), sum("n_docs").as("ntot"))
      val rates = scored.crossJoin(broadcast(tot))
        .withColumn("budget", floor(col("ntot") / 2).cast("long"))
        .withColumn("rate", least(lit(1.0),
          (col("budget") * col("s")).cast("double") /
            (col("stot") * col("n_docs")).cast("double")))
        .select(col("lang").as("lang2"), col("n_docs"), col("rate"))
      val kept = d
        .join(broadcast(rates.select("lang2", "rate")), col("lang") === col("lang2"))
        .filter(Portable.md5Long(concat(lit("mix:"), col("doc_id").cast("string")))
          .cast("double") / lit(1.152921504606846976e18) < col("rate"))
        .groupBy("lang").agg(count(lit(1)).as("kept"))
      rates.join(kept, col("lang2") === col("lang"), "left")
        .select(col("lang2").as("lang"), col("n_docs"),
          round(col("rate"), 6).as("rate"),
          coalesce(col("kept"), lit(0L)).as("kept"))
        .orderBy("lang")
    },
    Some(s"""WITH langn AS (
      |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |scored AS (
      |  SELECT lang, n_docs,
      |    CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS s
      |  FROM langn),
      |tot AS (SELECT sum(s) AS stot, sum(n_docs) AS ntot FROM scored),
      |rates AS (
      |  SELECT lang, n_docs,
      |    least(1.0, CAST(CAST(floor(ntot / 2) AS BIGINT) * s AS DOUBLE)
      |               / CAST(stot * n_docs AS DOUBLE)) AS rate
      |  FROM scored CROSS JOIN tot),
      |kept AS (
      |  SELECT d.lang, count(*) AS kept
      |  FROM documents d JOIN rates r ON d.lang = r.lang
      |  WHERE CAST(${Portable.md5LongSql("'mix:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
      |          / 1152921504606846976.0 < r.rate
      |  GROUP BY 1)
      |SELECT r.lang, r.n_docs, round(r.rate, 6) AS rate,
      |  coalesce(k.kept, 0) AS kept
      |FROM rates r LEFT JOIN kept k ON r.lang = k.lang
      |ORDER BY r.lang""".stripMargin))

  /** Learned linear quality classifier with feature hashing — the
    * fasttext-style model-based filter of the GPT-3/LLaMA data
    * recipes, re-expressed as a pure dataflow: tokens hash into 64
    * feature buckets, each bucket carries a weight, and the per-doc
    * score is the normalized weighted sum. The weights here derive
    * from the bucket id by a fixed integer formula so the oracle can
    * replay them; in production they'd be an offline-trained model
    * broadcast exactly the same way (O(buckets) values).
    *
    * Determinism by integer math: weights are integers in [-48, 48],
    * the per-doc accumulation is an exact BIGINT sum, and the single
    * double division at the end divides identical integers — no
    * float fold anywhere. Scale: explode + one doc_id-keyed
    * aggregation with map-side combine; no joins.
    */
  val q184 = Q(
    "q184_quality_classifier",
    (s, dir) => {
      Tables.docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(Portable.tokens(col("text"))).as("tok"))
        .withColumn("w",
          (pmod(Portable.md5Long(col("tok")), lit(64)) * 37 + 11) % 97 - 48)
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("wsum"))
        .withColumn("score", round(
          col("wsum").cast("double") / (col("n_toks").cast("double") * 97.0), 6))
        .withColumn("keep", when(col("score") > 0, 1).otherwise(0))
        .select("doc_id", "lang", "n_toks", "score", "keep")
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id, lang, unnest(${Portable.tokensSql("text")}) AS tok
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang, count(*) AS n_toks,
      |    CAST(sum(((${Portable.md5LongSql("tok")} % 64) * 37 + 11) % 97 - 48)
      |      AS BIGINT) AS wsum
      |  FROM toks GROUP BY 1, 2),
      |final AS (
      |  SELECT doc_id, lang, n_toks,
      |    round(CAST(wsum AS DOUBLE) / (CAST(n_toks AS DOUBLE) * 97.0), 6) AS score
      |  FROM scored)
      |SELECT doc_id, lang, n_toks, score,
      |  CASE WHEN score > 0 THEN 1 ELSE 0 END AS keep
      |FROM final ORDER BY doc_id""".stripMargin))

  /** Corpus snapshot diff — the release-engineering view of a living
    * corpus: given two versions, report added / removed / changed /
    * unchanged document counts and character volume. Versions are
    * derived deterministically from the fixture (v1 drops one
    * hash-decile, v2 drops a different one and edits every 7th doc)
    * so the oracle replays them exactly; in production the two sides
    * are two snapshot paths. One co-partitioned full-outer join on
    * doc_id — single shuffle, linear at any corpus size; content
    * equality compares md5 digests, never text.
    */
  val q185 = Q(
    "q185_corpus_diff",
    (s, dir) => {
      val d = Tables.docs(s, dir).select("doc_id", "text")
      def h(tag: String) =
        Portable.md5Long(concat(lit(tag), col("doc_id").cast("string")))
      val v1 = d.filter(h("v1:") % 10 < 9)
        .select(col("doc_id").as("id1"), md5(col("text")).as("h1"),
          length(col("text")).cast("long").as("nc1"))
      val v2 = d.filter(h("v2:") % 10 < 9)
        .withColumn("t2", when(h("edit:") % 7 === 0,
          concat(col("text"), lit(" edited"))).otherwise(col("text")))
        .select(col("doc_id").as("id2"), md5(col("t2")).as("h2"),
          length(col("t2")).cast("long").as("nc2"))
      v1.join(v2, col("id1") === col("id2"), "full_outer")
        .withColumn("status",
          when(col("id1").isNull, "added")
            .when(col("id2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("nc2"), col("nc1"))).as("n_chars"))
        .orderBy("status")
    },
    Some(s"""WITH v1 AS (
      |  SELECT doc_id AS id1, md5(text) AS h1, length(text) AS nc1
      |  FROM documents
      |  WHERE ${Portable.md5LongSql("'v1:' || CAST(doc_id AS VARCHAR)")} % 10 < 9),
      |v2 AS (
      |  SELECT doc_id AS id2, md5(t2) AS h2, length(t2) AS nc2 FROM (
      |    SELECT doc_id,
      |      CASE WHEN ${Portable.md5LongSql("'edit:' || CAST(doc_id AS VARCHAR)")} % 7 = 0
      |           THEN text || ' edited' ELSE text END AS t2
      |    FROM documents
      |    WHERE ${Portable.md5LongSql("'v2:' || CAST(doc_id AS VARCHAR)")} % 10 < 9) s)
      |SELECT status, count(*) AS n_docs,
      |  CAST(sum(coalesce(nc2, nc1)) AS BIGINT) AS n_chars
      |FROM (
      |  SELECT CASE WHEN id1 IS NULL THEN 'added'
      |              WHEN id2 IS NULL THEN 'removed'
      |              WHEN h1 <> h2 THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |    nc1, nc2
      |  FROM v1 FULL OUTER JOIN v2 ON id1 = id2) t
      |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Vector[Q] = Vector(q182, q183, q184, q185)
}
