package graft.queries

import graft.{Q, Tables}
import graft.functions.{Portable => P}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Further (D)-surface OLAP idioms: generated date spines with
  * zero-filled outer joins, skew-salted two-phase aggregation, and
  * argmax/argmin (max_by/min_by) aggregates.
  */
object Relational3 {

  /** Calendar-spine report: one row per day of 1995-03 including
    * order-free days — a generated dimension (sequence + explode)
    * left-joined to the fact rollup. The spine is generated, not
    * scanned: at 100 TB the fact side prunes to the month partition
    * while the 31-row spine is a broadcast.
    */
  val q71 = Q(
    "q71_date_spine",
    (s, dir) => {
      val spine = s.range(1).select(explode(expr(
        "sequence(to_date('1995-03-01'), to_date('1995-03-31'), interval 1 day)")).as("d"))
      val per = Tables.t(s, dir, "orders")
        .withColumn("d", to_date(col("o_orderdate")))
        .filter(col("d").between("1995-03-01", "1995-03-31"))
        .groupBy("d")
        .agg(count(lit(1)).as("n"), P.moneySum(col("o_totalprice")).as("rev"))
      spine.join(per, Seq("d"), "left_outer")
        .select(
          col("d"),
          coalesce(col("n"), lit(0L)).as("n_orders"),
          coalesce(col("rev"), lit(0.0)).as("revenue"))
        .orderBy("d")
    },
    Some(s"""WITH spine AS (
      |  SELECT CAST(unnest(generate_series(
      |    DATE '1995-03-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS d),
      |per AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n,
      |    ${P.moneySumSql("o_totalprice")} AS rev
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      |  GROUP BY 1)
      |SELECT spine.d, COALESCE(n, 0) AS n_orders,
      |  COALESCE(rev, 0.0) AS revenue
      |FROM spine LEFT OUTER JOIN per ON spine.d = per.d
      |ORDER BY spine.d""".stripMargin))

  /** Skew-salted two-phase aggregation as a first-class query: phase 1
    * aggregates (key, salt) so a hot supplier key spreads over 8
    * reducers, phase 2 merges partials per key. The oracle is the
    * PLAIN single-phase GROUP BY — proving salting is a pure execution
    * strategy with identical semantics. Summed measures are
    * integer-valued doubles, so re-associating the addition is exact.
    */
  val q76 = Q(
    "q76_salted_topk_suppliers",
    (s, dir) => {
      Tables.t(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
        .groupBy("l_suppkey", "salt")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("c"))
        .groupBy("l_suppkey")
        .agg(round(sum("q"), 2).as("sum_qty"), sum("c").cast("long").as("n_items"))
        .orderBy(col("sum_qty").desc, col("l_suppkey"))
        .limit(25)
    },
    Some("""SELECT l_suppkey, round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n_items
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY sum_qty DESC, l_suppkey
      |LIMIT 25""".stripMargin))

  /** Argmax/argmin aggregates (max_by/min_by ≡ DuckDB arg_max/arg_min):
    * richest and poorest customer per nation in ONE aggregation pass —
    * no row_number window, no self-join. Ties are broken by packing
    * (balance, custkey) into a single ordered key: acctbal has 2
    * decimals, so balance*100 is integral and the pack is lossless.
    */
  val q77 = Q(
    "q77_argmax_customer",
    (s, dir) => {
      val ord = (expr("CAST(round(c_acctbal * 100) AS BIGINT)") * lit(100000L)
        + col("c_custkey")).as("ord")
      Tables.t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_name"), col("c_acctbal"), ord)
        .groupBy("c_nationkey")
        .agg(
          max_by(col("c_name"), col("ord")).as("richest"),
          round(max(col("c_acctbal")), 2).as("max_bal"),
          min_by(col("c_name"), col("ord")).as("poorest"),
          round(min(col("c_acctbal")), 2).as("min_bal"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey,
      |  arg_max(c_name, ord) AS richest, round(max(c_acctbal), 2) AS max_bal,
      |  arg_min(c_name, ord) AS poorest, round(min(c_acctbal), 2) AS min_bal
      |FROM (SELECT c_nationkey, c_name, c_acctbal,
      |        CAST(round(c_acctbal * 100) AS BIGINT) * 100000 + c_custkey AS ord
      |      FROM customer)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin))

  /** UNPIVOT — the dual of q63's PIVOT: wide metric columns melt into
    * (metric, value) rows. Planned as a single Expand projection (no
    * shuffle, no join), which is why melt scales linearly.
    */
  val q82 = Q(
    "q82_unpivot_part_metrics",
    (s, dir) => {
      Tables.t(s, dir, "part")
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")),
          "metric", "value")
        .orderBy("p_partkey", "metric")
    },
    Some("""SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
      |FROM part WHERE p_partkey <= 500
      |UNION ALL
      |SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE)
      |FROM part WHERE p_partkey <= 500
      |ORDER BY p_partkey, metric""".stripMargin))

  /** TPC-H Q21-shaped "waiting suppliers": suppliers with a SLOW line
    * (shipped >90 days after order date) on a multi-supplier order
    * where NO other supplier was slow. The EXISTS / NOT EXISTS pair
    * (the oracle's form) is algebraized into per-order counts instead
    * of self-joins: a qualifying pair is a slow supplier on an order
    * with ≥2 distinct suppliers and exactly 1 distinct SLOW supplier.
    * One (orderkey, suppkey) aggregate + one orderkey-partitioned
    * window replaces the distinct + semi-join + anti-join fan —
    * 2 shuffles instead of 4+ and no 600k×600k join sides, the shape
    * that survives a 100× fact scale-up. Supplier dim broadcasts.
    */
  val q86 = Q(
    "q86_waiting_suppliers",
    (s, dir) => {
      val per = Tables.t(s, dir, "lineitem")
        .join(Tables.t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90))
            .as("slow"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("slow")).as("slow"))
      val w = Window.partitionBy("l_orderkey")
      per
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nslow", sum(when(col("slow"), 1).otherwise(0)).over(w))
        .filter(col("slow") && col("nsupp") >= 2 && col("nslow") === 1)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },
    Some("""WITH l AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90 AS slow
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |slow AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE slow)
      |SELECT s_name, count(*) AS numwait
      |FROM slow s1 JOIN supplier ON l_suppkey = s_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM l WHERE l.l_orderkey = s1.l_orderkey
      |      AND l.l_suppkey <> s1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM slow s2 WHERE s2.l_orderkey = s1.l_orderkey
      |      AND s2.l_suppkey <> s1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin))

  /** Ratio-to-report: each nation's share of global revenue via a
    * whole-frame window sum OVER the 25-row aggregate — the window
    * runs over the tiny rollup, never the fact table.
    */
  val q87 = Q(
    "q87_revenue_share",
    (s, dir) => {
      Tables.t(s, dir, "orders")
        .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(P.moneySum(col("o_totalprice")).as("rev"))
        .withColumn("share",
          round(col("rev") / sum("rev").over(Window.partitionBy()), 6))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, rev, round(rev / sum(rev) OVER (), 6) AS share
      |FROM (
      |  SELECT n_name, ${P.moneySumSql("o_totalprice")} AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |ORDER BY n_name""".stripMargin))

  /** grouping() markers on a ROLLUP — Hive's grouping__id surface:
    * subtotal rows are distinguishable from genuine NULL group keys
    * by the flag, not by guessing.
    */
  val q89 = Q(
    "q89_grouping_flags",
    (s, dir) => {
      Tables.t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status,
      |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  /** Basic array-function surface over token arrays (contains /
    * position / min / max / overlap) — §2.8's non-higher-order array
    * row, all per-row projections.
    */
  val q90 = Q(
    "q90_array_basics",
    (s, dir) => {
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Portable.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          array_contains(col("toks"), "data").as("has_data"),
          array_position(col("toks"), "data").as("pos_data"),
          array_min(col("toks")).as("min_tok"),
          array_max(col("toks")).as("max_tok"),
          arrays_overlap(col("toks"), array(lit("data"), lit("model"))).as("overlaps"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
      |  CAST(len(toks) AS INTEGER) AS n_toks,
      |  list_contains(toks, 'data') AS has_data,
      |  CAST(COALESCE(list_position(toks, 'data'), 0) AS BIGINT) AS pos_data,
      |  list_min(toks) AS min_tok,
      |  list_max(toks) AS max_tok,
      |  len(list_intersect(toks, ['data', 'model'])) > 0 AS overlaps
      |FROM (SELECT doc_id, ${graft.functions.Portable.tokensSql("text")} AS toks
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin))

  /** Month-over-month revenue growth: lag over the monthly rollup —
    * the reporting staple where the window runs over the aggregated
    * series (84 rows), never the fact table. Growth divides two
    * already-rounded month totals, so it's deterministic.
    */
  val q95 = Q(
    "q95_monthly_growth",
    (s, dir) => {
      Tables.t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"))
        .agg(P.moneySum(col("o_totalprice")).as("rev"))
        .withColumn("prev", lag("rev", 1).over(
          Window.orderBy(col("y"), col("m"))))
        .withColumn("growth",
          round((col("rev") - col("prev")) / col("prev"), 6))
        .orderBy("y", "m")
    },
    Some(s"""SELECT y, m, rev,
      |  lag(rev, 1) OVER (ORDER BY y, m) AS prev,
      |  round((rev - lag(rev, 1) OVER (ORDER BY y, m)) /
      |        lag(rev, 1) OVER (ORDER BY y, m), 6) AS growth
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
      |    CAST(month(o_orderdate) AS INTEGER) AS m,
      |    ${P.moneySumSql("o_totalprice")} AS rev
      |  FROM orders GROUP BY 1, 2)
      |ORDER BY y, m""".stripMargin))

  /** Global ORDER BY rank over every customer's lifetime spend —
    * the full-table ranking a leaderboard/export needs. Ranks come
    * from [[graft.functions.Dist.globalRank]]: range-bucketed
    * two-phase ranking (per-bucket row_number + broadcast prefix
    * offsets), because the naive `row_number() OVER (ORDER BY …)`
    * with no partition key funnels the whole table through one task —
    * the q101 cumsum trap in rank form.
    */
  val q106 = Q(
    "q106_global_spend_rank",
    (s, dir) => {
      // Sum in decimal so customers with identical order multisets
      // (guaranteed by the key-shifted sf1 shards) are EXACT ties that
      // the custkey tie-break resolves identically in both engines; a
      // double sum's fold order decides such near-ties differently in
      // Spark vs the oracle.
      val spend = Tables.t(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      graft.functions.Dist.globalRank(
          spend, Seq(col("total").desc, col("custkey")), "rnk",
          s.sparkContext.defaultParallelism)
        .select(col("custkey"), col("total").cast("double").as("total"), col("rnk"))
        .orderBy("rnk")
    },
    Some("""SELECT o_custkey AS custkey, CAST(total AS DOUBLE) AS total,
      |  CAST(row_number() OVER (ORDER BY total DESC, o_custkey) AS BIGINT) AS rnk
      |FROM (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders GROUP BY 1)
      |ORDER BY rnk""".stripMargin))

  val all: Vector[Q] =
    Vector(q71, q76, q77, q82, q86, q87, q89, q90, q95, q106)
}
