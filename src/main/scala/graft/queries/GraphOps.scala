package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Graph analytics over warehouse relations (SURVEY §2.13 extension
  * family, next to graph.ConnectedComponents): iterative PageRank on
  * the customer↔supplier purchase graph. The reference's delegated
  * HiveQL surface has no iterative operator at all — this is the
  * capability a Spark-native engine adds for influence/centrality
  * scoring over entity graphs extracted from fact tables.
  */
object GraphOps {

  /** PageRank, 3 unrolled iterations, damping 0.85, over the
    * undirected bipartite graph of distinct (customer, supplier)
    * purchase pairs. Each iteration is one join + one aggregate on
    * the (node, pr) table — the same shuffle-by-key shape as the CC
    * loop, so a 10⁹-edge graph runs with the edge table hash-
    * partitioned once and only the rank table moving per round. The
    * iteration count is FIXED (not convergence-driven) so the DuckDB
    * oracle can mirror it as a CTE chain; ranks are rounded before
    * the top-k cut.
    */
  val q142 = Q(
    "q142_pagerank_purchases",
    (s, dir) => {
      // Node ids are LONGS inside the loop (customer 2k, supplier
      // 2k+1), mapped to the emitted "c…"/"s…" labels only on the
      // final top-20: the r9 sf10 runs showed the graph family is
      // heap-marginal on local[32] (GC-bound variance, BASELINE.md),
      // and the string node ids were the single biggest pinned-frame
      // inflation — an 8-byte long vs a "c1234567" UTF8String plus
      // offset per endpoint, ~3× on the frame every iteration scans.
      // On a 1000-executor cluster the same change shrinks shuffle
      // AND block-manager bytes by the same factor.
      // pinned before the symmetric union (both branches otherwise
      // re-run the join+distinct), released once sym materializes
      val e = Tables.t(s, dir, "orders")
        .join(Tables.t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(
          (col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
        .localCheckpoint(true)
      // pin the loop-invariant edge table pre-partitioned on the join
      // key (the CC-loop discipline): without the checkpoint every
      // iteration's LAZY plan re-derives orders⋈lineitem→distinct from
      // scratch, and without the repartition every iteration
      // re-shuffles the (big) edge side instead of only the rank
      // table. The iterations themselves stay lazy — AQE coalesces
      // their small rank-table shuffles at runtime, so no manual
      // shuffle-partition override is needed (measured: an eager
      // per-round conf swap was a net LOSS here, unlike the
      // convergence-driven CC loop which must act every round anyway).
      //
      // The pinned frame carries ONLY (src, dst): the out-degree no
      // longer rides the edge table (r6 #3 pre-joined it to save a
      // per-round edge⋈deg join, at 1.5× the pinned bytes). The same
      // join is saved cheaper by folding pr/deg into a NODE-sized
      // contribution table per round — the edge join then carries one
      // double instead of (pr, deg), and the per-edge division
      // becomes a per-node one.
      val sym = graft.graph.Rotate.supersede(
        e.union(e.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(col("src")),
        e)
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true) // pin: node-sized, seeds pr0 and n
      val nFrame = broadcast(deg.agg(count(lit(1)).as("n")))
      var pr = deg.crossJoin(nFrame)
        .select(col("src").as("node"), (lit(1.0) / col("n")).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = pr.join(deg, pr("node") === deg("src"))
          .select(pr("node").as("cnode"), (col("pr") / col("deg")).as("c"))
        pr = sym
          .join(contrib, sym("src") === contrib("cnode"))
          .groupBy(col("dst").as("node2"))
          .agg(sum(col("c")).as("inflow"))
          .crossJoin(nFrame)
          .select(col("node2").as("node"),
            (lit(0.15) / col("n") + lit(0.85) * col("inflow")).as("pr"))
      }
      // map back to the public labels BEFORE the ordering cut: ties
      // at equal rounded pr must break on the emitted string label,
      // exactly as the oracle orders them
      pr.select(
          concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
            shiftright(col("node"), 1)).as("label"),
          round(col("pr"), 6).as("pr"))
        .select(col("label").as("node"), col("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(20)
    },
    Some("""WITH e AS MATERIALIZED (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |sym AS MATERIALIZED (SELECT src, dst FROM e
      |        UNION ALL SELECT dst AS src, src AS dst FROM e),
      |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
      |nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
      |pr0 AS MATERIALIZED (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
      |pr1 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    0.15 / (SELECT n FROM nn) + 0.85 * sum(pr / deg) AS pr
      |  FROM sym JOIN pr0 ON sym.src = pr0.node JOIN deg USING (src)
      |  GROUP BY dst),
      |pr2 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    0.15 / (SELECT n FROM nn) + 0.85 * sum(pr / deg) AS pr
      |  FROM sym JOIN pr1 ON sym.src = pr1.node JOIN deg USING (src)
      |  GROUP BY dst),
      |pr3 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    0.15 / (SELECT n FROM nn) + 0.85 * sum(pr / deg) AS pr
      |  FROM sym JOIN pr2 ON sym.src = pr2.node JOIN deg USING (src)
      |  GROUP BY dst)
      |SELECT node, round(pr, 6) AS pr FROM pr3
      |ORDER BY pr DESC, node LIMIT 20""".stripMargin))

  val all: Vector[Q] = Vector(q142)
}
