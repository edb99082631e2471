package graft

import org.apache.spark.sql.functions._

/** Recall audit for the two SemDeDup variants against brute-force
  * ground truth. "Truth" = every vector with ANY smaller-id neighbour
  * at rounded cosine >= 0.35, no cell scoping at all (all-pairs is
  * affordable at sf0.01: ~200 vectors). Both variants are approximate
  * BY DESIGN — q139 scopes pairs to label-centroid cells, q180 to
  * sampled-seed cells — and this pins their measured recall so a
  * quantizer regression (or a fixture change that silently degrades
  * the cell structure) fails the build rather than shipping a dedup
  * that drops nothing.
  */
class SemDeDupSpec extends SparkSpec {

  private def drops(name: String): Set[Long] =
    Q.byName(name).fn(spark, sf("sf0.01"))
      .collect()
      .map(r => r.getLong(r.fieldIndex("dropped")))
      .toSet

  private lazy val truth: Set[Long] = {
    import graft.functions.{VectorFunctions => V}
    val wn = Tables.t(spark, sf("sf0.01"), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", V.norm("embedding"))
    val a = wn.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = wn.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("cos", round(V.dot("ea", "eb") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= 0.35)
      .select(col("vb"))
      .distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("q139, q180 and q181 drop sets are sound (subsets of ground truth)") {
    assert(truth.nonEmpty, "ground truth found no dups — fixture drift?")
    for (name <- Seq("q139_semdedup_cells", "q180_semdedup_scaled",
        "q181_semdedup_2level")) {
      val extra = drops(name) -- truth
      assert(extra.isEmpty,
        s"$name dropped vectors with no true near-dup neighbour: $extra")
    }
  }

  test("two-level quantizer q181 recall is within 10 points of one-level q180") {
    // the second quantizer level trades a bit more boundary recall
    // (a vector's true nearest seed can sit in a neighbouring
    // super-cell) for an n^1.25 assignment and an n^¼-sized
    // broadcast; this pins that the trade stays bounded
    val r180 = drops("q180_semdedup_scaled").size.toDouble / truth.size
    val r181 = drops("q181_semdedup_2level").size.toDouble / truth.size
    info(f"recall vs brute force: q180=$r180%.3f q181=$r181%.3f (truth=${truth.size})")
    assert(r181 >= r180 - 0.10,
      f"second quantizer level lost too much recall: q181=$r181%.3f vs q180=$r180%.3f")
    // measured-margin bound (VERDICT r5 #4): observed 0.239 at
    // sf0.01 — pin to within 5 points of that, not a lax absolute
    // floor, so a regression that halves recall fails the build
    assert(r181 >= 0.19, f"q181 recall regressed below measured margin: $r181%.3f (observed 0.239)")
  }

  test("scaled-quantizer q180 recall is within 10 points of full-cell q139") {
    // Cell scoping is lossy at this threshold by design — ground
    // truth includes cross-cell pairs no cell-scoped variant can see
    // (measured: q139 0.32, q180 0.26 at sf0.01). What this pins is
    // that the Θ(n^1.5) sampled quantizer buys its asymptotic win
    // WITHOUT giving up meaningful recall vs the Θ(n²) label cells.
    val r139 = drops("q139_semdedup_cells").size.toDouble / truth.size
    val r180 = drops("q180_semdedup_scaled").size.toDouble / truth.size
    info(f"recall vs brute force: q139=$r139%.3f q180=$r180%.3f (truth=${truth.size})")
    assert(r180 >= r139 - 0.10,
      f"scaled quantizer lost too much recall: q180=$r180%.3f vs q139=$r139%.3f")
    // measured-margin bound: observed 0.264 at sf0.01
    assert(r180 >= 0.21, f"q180 recall regressed below measured margin: $r180%.3f (observed 0.264)")
  }
}
