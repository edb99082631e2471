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
  * neighbours (self-loops make the node's own label arrive through
  * the same join), then compresses pointers by following each label
  * to that label's own label — pointer halving, which keeps the round
  * count logarithmic in component diameter instead of linear (the
  * worst case for chained near-dups). Fixpoint = every node carries
  * the minimum node id of its component.
  *
  * Iteration discipline (this is where naive Spark loops die):
  * each round is exactly ONE action — the convergence aggregate —
  * which materialises that round's label table into the block-manager
  * cache on the way; propagate, compress, and the convergence sum all
  * ride the same job. The compress self-join's two references to the
  * propagation subplan dedup to a single exchange (ReusedExchange),
  * and lineage is truncated by localCheckpoint every few rounds so
  * plan analysis stays O(1) per round. A multi-hour production run
  * would swap the periodic localCheckpoint for reliable `checkpoint`
  * against the cluster store.
  *
  * Checkpoint rotation follows the shared [[Rotate]] policy (rule 1,
  * supersede-don't-accumulate): each lineage truncation releases the
  * superseded label checkpoint's blocks, and the loop-invariant
  * node/edge pins are released once the output has materialized — a
  * long dedup campaign calling CC per corpus slice must not
  * accumulate one pinned label table per call. Rule 2 (shrink-gated
  * re-materialization) is deliberately NOT applied: unlike k-core
  * peeling, min-label propagation never shrinks its edge set, so
  * there is nothing to rotate down to.
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns `a`, `b`
    *              (self-loops and duplicates are tolerated)
    * @return one row per distinct node: (node, component) where
    *         component = min node id reachable from `node`
    */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // symmetrised edge list WITH self-loops: a node's own label then
    // arrives through the join like any neighbour's, so each round is
    // a plain join+groupBy (no union arm for Catalyst to rewrite)
    val nodes = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .distinct()
      .localCheckpoint(true)
    // no edges → no nodes → the convergence sums below would be NULL
    // (sum over zero rows) and the decimal compare would NPE
    if (nodes.head(1).isEmpty)
      return nodes.select(col("node"), col("node").as("component"))
    // Size the loop's shuffle partitions to the GRAPH, not the
    // session: every round pays scheduling for 3 shuffles × N tasks,
    // and a label table of a few thousand rows under the session's
    // fact-table partition count is pure fixed overhead (measured
    // ~1.5-2 s of the sf0.1 loop). ~100k labels per partition,
    // floored at 8, capped at the session setting so a 10¹⁰-node
    // graph still uses the cluster's full configured parallelism.
    // (AQE must stay ON: it is what turns each round's propagate
    // join into a runtime broadcast; with it off the loop is 7×
    // slower in sort-merge joins.)
    //
    // The override lives on a CLONED session (same SparkContext, own
    // conf), never the caller's: the loop holds its narrow setting
    // for many seconds, and mutating the shared session would race
    // any concurrent caller that save-and-restores the same key
    // (e.g. the streaming runToCompletion swap) into permanently
    // capturing the loop's value. DataFrames cross sessions via
    // their RDDs — both inputs are pinned right after, so the extra
    // deserialization boundary is one pass over pinned blocks.
    val spark = edges.sparkSession
    val sp0 = spark.conf.get("spark.sql.shuffle.partitions")
    val loopParts = math.min(sp0.toLong, math.max(8L, nodes.count() / 100000L + 1))
    val loopSession = spark.newSession()
    loopSession.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    loopSession.conf.set("spark.sql.adaptive.enabled", "true")
    val out = runLoop(
      loopSession.createDataFrame(nodes.rdd, nodes.schema),
      loopSession.createDataFrame(edges.rdd, edges.schema),
      maxIter)
    // the output is its own eager checkpoint, so the node pin is now
    // superseded (Rotate rule 1)
    org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(nodes)
    // hand the (pinned) result back on the caller's session so it
    // composes with the caller's own frames
    spark.createDataFrame(out.rdd, out.schema)
  }

  private def runLoop(nodes: DataFrame, edges: DataFrame, maxIter: Int): DataFrame = {
    // hash-partition the (loop-invariant) edge table on the join key
    // BEFORE pinning it: localCheckpoint preserves the partitioning,
    // so every round's propagate join shuffles only the label side —
    // at scale the edge table is the big side, and this removes its
    // per-round exchange entirely
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .union(nodes.select(col("node").as("a"), col("node").as("b")))
      .distinct()
      .repartition(col("b"))
      .localCheckpoint(true)
    var lbl = nodes.withColumn("lab", col("node")).localCheckpoint(true)
    // the live label checkpoint; every rotation supersedes it (Rotate
    // rule 1) instead of leaving one pinned copy per truncation
    var lblCkpt = lbl
    // one propagate + pointer-halving hop (pure plan construction)
    def hop(cur: DataFrame): DataFrame = {
      val prop = sym.join(cur, sym("b") === cur("node"))
        .select(sym("a").as("node"), col("lab"))
        .groupBy("node").agg(min("lab").as("lab"))
      prop
        .join(prop.select(col("node").as("n2"), col("lab").as("lab2")),
          col("lab") === col("n2"))
        .select(col("node"), col("lab2").as("lab"))
    }
    // labels only ever decrease, so sum(labels) strictly decreases
    // until the fixpoint: an unchanged sum IS convergence (cheaper
    // than an anti-join change count; decimal beats long overflow at
    // 2^60-sized labels × 10⁹ nodes)
    var prevSum = lbl.agg(sum(col("lab").cast("decimal(38,0)"))).head.getDecimal(0)
    var cached = List.empty[DataFrame]
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // TWO hops per action: each round's fixed cost (job scheduling +
      // the convergence aggregate) dominates at small label tables, so
      // checking convergence every other hop nearly halves wall time;
      // the at-most-one wasted extra hop after the true fixpoint is a
      // no-op join on an already-stable table. The second hop is
      // skipped when it would exceed maxIter, so odd bounds are
      // honored exactly.
      val twoHops = iter + 1 < maxIter
      val next = (if (twoHops) hop(hop(lbl)) else hop(lbl)).persist()
      val s = next.agg(sum(col("lab").cast("decimal(38,0)"))).head.getDecimal(0)
      done = s.compareTo(prevSum) == 0
      prevSum = s
      iter += (if (twoHops) 2 else 1)
      if (iter % 4 == 0 && !done) {
        // truncate lineage: pin the new label table, release the
        // superseded checkpoint AND the cache chain (Rotate rule 1 —
        // safe because every later hop builds only on the new pin)
        lbl = Rotate.supersede(next, lblCkpt)
        lblCkpt = lbl
        (next :: cached).foreach(_.unpersist(false))
        cached = Nil
      } else {
        lbl = next
        cached = next :: cached
      }
      if (sys.env.contains("GRAFT_CC_LOG"))
        System.err.println(s"[cc] round $iter labelSum=$s")
    }
    val out = lbl.select(col("node"), col("lab").as("component"))
      .localCheckpoint(true)
    // the eager output supersedes every loop pin: the cache chain,
    // the live label checkpoint, and the loop-invariant edge table
    cached.foreach(_.unpersist(false))
    org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(lblCkpt)
    org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(sym)
    out
  }
}
