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
      val e = Tables.t(s, dir, "orders")
        .join(Tables.t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
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
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .localCheckpoint(true)
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true) // pin: node-sized, seeds pr0 and n
      // pre-join the out-degree onto the edge table ONCE (VERDICT r6
      // #3): each iteration is then ONE join (only the small rank
      // table moves) + ONE aggregate over this pinned contrib-ready
      // frame, instead of re-joining the full edge set against deg
      // every round. The plain sym checkpoint is superseded — free it
      // as soon as symdeg has materialized.
      val symdeg = graft.graph.Rotate.supersede(
        sym.join(deg, "src").select(col("src"), col("dst"), col("deg")), sym)
      val nFrame = broadcast(deg.agg(count(lit(1)).as("n")))
      var pr = deg.crossJoin(nFrame)
        .select(col("src").as("node"), (lit(1.0) / col("n")).as("pr"))
      for (_ <- 1 to 3) {
        pr = symdeg
          .join(pr, symdeg("src") === pr("node"))
          .groupBy(col("dst").as("node2"))
          .agg(sum(col("pr") / col("deg")).as("inflow"))
          .crossJoin(nFrame)
          .select(col("node2").as("node"),
            (lit(0.15) / col("n") + lit(0.85) * col("inflow")).as("pr"))
      }
      pr.select(col("node"), round(col("pr"), 6).as("pr"))
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
