package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation — the merge step every near-dup dedup pipeline needs
  * once candidate pairs exist (LSH buckets only assert "these two
  * MIGHT match"; turning pairwise matches into dedup groups is a
  * connected-components problem, cf. the reference's dedup intent at
  * backend/hive_manager.py:296's batch ingest which has no such
  * operator at all).
  *
  * Algorithm: every node starts labelled with itself; each round
  * re-labels a node with the minimum label among itself and its
  * neighbours; fixpoint = every node carries the minimum node id of
  * its component. Rounds are bounded by the graph diameter, and each
  * round is two shuffles of fixed-width longs (a join edge⋈label and
  * a groupBy-min) — no driver-side graph state, no adjacency
  * materialisation beyond the edge list.
  *
  * Scale: LSH bucket graphs are star-dominated (a bucket connects all
  * its members), so the diameter — and the round count — stays single
  * digit even at 10⁹ nodes; for adversarial long chains the
  * large-star/small-star variant halves rounds, which this corpus
  * does not need. Labels are localCheckpoint'ed every round to
  * truncate lineage (a 10-round loop would otherwise re-plan a
  * 20-join tree); a multi-hour production run would swap in reliable
  * `checkpoint` against the cluster store every k rounds.
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns `a`, `b`
    *              (self-loops and duplicates are tolerated)
    * @return one row per distinct node: (node, component) where
    *         component = min node id reachable from `node`
    */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var lbl = sym.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(true)
    // labels only ever decrease, so sum(labels) strictly decreases
    // until the fixpoint: an unchanged sum IS convergence (cheaper
    // than an anti-join change count; decimal beats long overflow at
    // 2^60-sized labels × 10⁹ nodes)
    var prevSum = lbl.agg(sum(col("lab").cast("decimal(38,0)"))).head.getDecimal(0)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = sym.join(lbl, sym("b") === lbl("node"))
        .select(sym("a").as("node"), col("lab"))
        .union(lbl)
        .groupBy("node").agg(min("lab").as("lab"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("lab").cast("decimal(38,0)"))).head.getDecimal(0)
      done = s.compareTo(prevSum) == 0
      prevSum = s
      lbl = next
      iter += 1
    }
    lbl.select(col("node"), col("lab").as("component"))
  }
}
