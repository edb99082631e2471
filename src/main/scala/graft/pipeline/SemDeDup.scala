package graft.pipeline

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF cell assignment for SemDeDup-style embedding near-dup removal
  * (SURVEY.md §2.13 L2; Abbas et al. 2023), with the 100 TB broadcast
  * story made explicit.
  *
  * The coarse quantizer is SAMPLED FROM THE DATA — every √n-th vec_id
  * is a seed, so cell count k ≈ √n grows with the corpus and tracks
  * data density. Assignment then has two regimes:
  *
  *  - '''one-level''' (k ≤ maxBroadcastSeeds): broadcast the seed set,
  *    every vector scans all k seeds — n·√n work, broadcast of k·d
  *    floats. The right plan while the seed set fits in an executor
  *    (k=438 at the sf10 fixtures ≈ 110 KB).
  *  - '''two-level''' (k > maxBroadcastSeeds): at n = 10¹⁰ docs and
  *    d = 768, k = √n = 10⁵ seeds ≈ 300 MB — past broadcast comfort.
  *    So the quantizer recurses once: every √k-th seed becomes a
  *    SUPER-seed (k₂ ≈ √k ≈ n^¼ of them — the only broadcast frame,
  *    ~1 MB at n = 10¹⁰), seeds are assigned to super-cells with a
  *    tiny k·k₂ pass, vectors find their super-cell against the
  *    broadcast super-seeds (n·k₂), and the final nearest-seed search
  *    is an EQUI-JOIN on the super-cell key — a shuffle the optimizer
  *    is free to hash/merge, never a nested-loop over all k seeds —
  *    with ~k/k₂ ≈ n^¼ candidate seeds per vector. Total assignment
  *    work n·n^¼ instead of n·√n, and nothing broadcast beyond the
  *    super-seeds.
  *
  * Both regimes emit the same shape: (vec_id, embedding, cell, nrm).
  * The two-level cell can differ from the one-level cell near
  * super-cell boundaries (the vector's true nearest seed may sit in a
  * neighbouring super-cell) — the usual IVF tradeoff, measured by
  * SemDeDupSpec against brute-force ground truth exactly like the
  * one-level path. All distance ranking is on round(d², 6) with id
  * tie-breaks so a DuckDB oracle reproduces assignments bit-for-bit.
  */
object SemDeDup {

  /** Sampling steps derived from the corpus: seed step ≈ √n (≥ 16),
    * super-seed step = step·m with m ≈ √k (≥ 2). Exposed so oracle
    * SQL and specs can derive the identical constants.
    */
  final case class Steps(n: Long, step: Long, k: Long, m: Long) {
    def superStep: Long = step * m
  }

  def steps(e: DataFrame): Steps = {
    val n = e.count()
    val step = math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val k = e.filter(pmod(col("vec_id"), lit(step)) === 0).count()
    val m = math.max(2L, math.ceil(math.sqrt(k.toDouble)).toLong)
    Steps(n, step, k, m)
  }

  /** Assign every embedding to its IVF cell; switches to the
    * two-level quantizer when the seed count exceeds
    * `maxBroadcastSeeds`. Input needs (vec_id, embedding).
    */
  def cellAssign(e: DataFrame, maxBroadcastSeeds: Long = 65536L): DataFrame = {
    val st = steps(e)
    if (st.k <= maxBroadcastSeeds) cellAssignOneLevel(e, st)
    else cellAssignTwoLevel(e, st)
  }

  /** k ≤ maxBroadcastSeeds: broadcast all seeds, one pass. */
  def cellAssignOneLevel(e: DataFrame, st: Steps): DataFrame = {
    val seeds = e.filter(pmod(col("vec_id"), lit(st.step)) === 0)
      .select(col("vec_id").as("seed_id"), col("embedding").as("svec"))
    e.crossJoin(broadcast(seeds))
      .withColumn("d2", round(V.dist2("embedding", "svec"), 6))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("seed_id"), col("embedding"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.seed_id").as("cell"))
      .withColumn("nrm", V.norm("embedding"))
  }

  /** k > maxBroadcastSeeds: recurse the quantizer once — broadcast
    * only the super-seeds, reach the seeds through an equi-join on
    * the super-cell key.
    */
  def cellAssignTwoLevel(e: DataFrame, st: Steps): DataFrame = {
    val seeds = e.filter(pmod(col("vec_id"), lit(st.step)) === 0)
      .select(col("vec_id").as("seed_id"), col("embedding").as("svec"))
    // super-seeds are seeds whose seed INDEX is a multiple of m —
    // i.e. vec_id % (step·m) == 0, a subset of the seeds, so every
    // super-cell contains at least its own super-seed
    val superSeeds = seeds.filter(pmod(col("seed_id"), lit(st.superStep)) === 0)
      .select(col("seed_id").as("ss_id"), col("svec").as("ssvec"))
    // level A (tiny, k·k₂): seeds → super-cells
    val seedCells = seeds.crossJoin(broadcast(superSeeds))
      .withColumn("d2", round(V.dist2("svec", "ssvec"), 6))
      .groupBy("seed_id")
      .agg(min(struct(col("d2"), col("ss_id"), col("svec"))).as("b"))
      .select(col("b.ss_id").as("scell"), col("seed_id"), col("b.svec").as("svec"))
    // level B (n·k₂): vectors → super-cells against the broadcast
    // super-seeds only
    val vecSuper = e.crossJoin(broadcast(superSeeds))
      .withColumn("d2", round(V.dist2("embedding", "ssvec"), 6))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("ss_id"), col("embedding"))).as("b"))
      .select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.ss_id").as("scell"))
    // level C (n·k/k₂ work, ZERO broadcast of the seed set): nearest
    // seed within the super-cell via a plain equi-join on scell
    vecSuper.join(seedCells, "scell")
      .withColumn("d2", round(V.dist2("embedding", "svec"), 6))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("seed_id"), col("embedding"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.seed_id").as("cell"))
      .withColumn("nrm", V.norm("embedding"))
  }

  /** MULTI-PROBE assignment: each vector's `p` NEAREST cells as an
    * array, same (d², id)-rounded ranking as [[cellAssign]] so probe 1
    * is exactly the cellAssign cell. This is standard IVF multi-probe:
    * a query vector near a cell boundary has its true neighbors in the
    * runner-up cell, and probing the top-p cells trades p× candidate
    * volume for the boundary recall a single-cell restriction loses —
    * q292 MEASURED that loss at 2/6 captured (pair recall 0.33) for
    * q287's single-probe screen before this existed.
    *
    * Same two regimes as [[cellAssign]]. The top-p is a per-vector
    * sorted slice of (d², seed) pairs — the collect_list buffer holds
    * k ≈ √n 16-byte pairs per vector (no embeddings), partial-
    * aggregated map-side inside the crossJoin's own partitioning, so
    * nothing new shuffles. In the two-level regime candidates come
    * from the vector's super-cell only (the [[cellAssignTwoLevel]]
    * tradeoff, unchanged).
    */
  def cellProbes(e: DataFrame, p: Int,
      maxBroadcastSeeds: Long = 65536L): DataFrame = {
    val st = steps(e)
    val scored =
      if (st.k <= maxBroadcastSeeds) {
        val seeds = e.filter(pmod(col("vec_id"), lit(st.step)) === 0)
          .select(col("vec_id").as("seed_id"), col("embedding").as("svec"))
        e.crossJoin(broadcast(seeds))
      } else {
        val seeds = e.filter(pmod(col("vec_id"), lit(st.step)) === 0)
          .select(col("vec_id").as("seed_id"), col("embedding").as("svec"))
        val superSeeds = seeds.filter(pmod(col("seed_id"), lit(st.superStep)) === 0)
          .select(col("seed_id").as("ss_id"), col("svec").as("ssvec"))
        val seedCells = seeds.crossJoin(broadcast(superSeeds))
          .withColumn("d2", round(V.dist2("svec", "ssvec"), 6))
          .groupBy("seed_id")
          .agg(min(struct(col("d2"), col("ss_id"), col("svec"))).as("b"))
          .select(col("b.ss_id").as("scell"), col("seed_id"), col("b.svec").as("svec"))
        val vecSuper = e.crossJoin(broadcast(superSeeds))
          .withColumn("d2", round(V.dist2("embedding", "ssvec"), 6))
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("ss_id"), col("embedding"))).as("b"))
          .select(col("vec_id"), col("b.embedding").as("embedding"),
            col("b.ss_id").as("scell"))
        vecSuper.join(seedCells, "scell")
      }
    scored
      .withColumn("d2", round(V.dist2("embedding", "svec"), 6))
      .groupBy("vec_id")
      .agg(
        slice(array_sort(collect_list(struct(col("d2"), col("seed_id")))),
          1, p).as("top"),
        // every row of a vec_id group carries the same embedding
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        transform(col("top"), t => t.getField("seed_id")).as("probes"))
  }

  /** Cell-scoped near-dup pairs → keeper policy, shared by the q180 /
    * q181 registry forms: exact cosine within a cell, keep the lowest
    * vec_id, report each dropped member with its best keeper score.
    */
  def dedupReport(assigned: DataFrame, threshold: Double): DataFrame = {
    val a = assigned.select(col("vec_id").as("keeper_cand"), col("cell"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("vec_id").as("dropped"), col("cell").as("cellb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("cell") === col("cellb") && col("keeper_cand") < col("dropped"))
      .withColumn("cos", round(V.dot("ea", "eb") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .groupBy("dropped")
      .agg(
        min("keeper_cand").as("keeper"),
        max("cos").as("max_cos"),
        count(lit(1)).as("n_dups"))
      .orderBy("dropped")
  }
}
