package graft.queries

import graft.{Q, Tables}
import graft.functions.{Portable => P}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 (D)-surface wave: the deep multi-join rollup, MERGE
  * (Hive ACID `MERGE INTO`) expressed as a full-outer combine, SCD-2
  * history construction, a Bloom-filter join prescreen (the 100 TB
  * semi-join pruning pattern), and z-score outlier screening.
  */
object Relational4 {

  /** TPC-H Q9-style profit rollup: the 5-table snowflake join
    * (lineitem → part/supplier/nation + orders) grouped by supplier
    * nation × order year. Scale shape: the three dimensions are
    * broadcast (no shuffle), so the only shuffle is lineitem ⋈ orders
    * on orderkey followed by the 2-key aggregate — Catalyst orders
    * the broadcasts after the filter prunes part. At 100 TB the same
    * plan holds: dims stay broadcast-size, the fact join is AQE's
    * problem, and the aggregate is 25 nations × a few years wide.
    */
  val q110 = Q(
    "q110_profit_by_nation_year",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      val ord = Tables.t(s, dir, "orders")
      li.join(broadcast(Tables.t(s, dir, "part").filter(col("p_size") <= 25)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        // exact DECIMAL arithmetic: the wide double sum straddles a
        // half-cent rounding boundary at sf0.01, so its fold order
        // (Spark partials vs DuckDB's scan order) flips the cent.
        // Prices/discounts are 2-decimal values — decimals make the
        // sum order-independent; cast back to double for the output.
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("profit"))
        .orderBy("nation", "o_year")
    },
    Some("""SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_size <= 25
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2
      |ORDER BY nation, o_year""".stripMargin))

  /** MERGE INTO semantics (Hive ACID `MERGE`, SURVEY §2 (D) surface)
    * as a full-outer combine: target = a stale customer snapshot
    * (every third customer missing), source = per-customer order
    * totals. WHEN MATCHED → update balance, WHEN NOT MATCHED BY
    * TARGET → insert, WHEN NOT MATCHED BY SOURCE → keep. One shuffle
    * on the merge key; at scale this is exactly how MERGE executes
    * (minus the transactional commit, which the storage layer owns).
    */
  val q111 = Q(
    "q111_merge_upsert",
    (s, dir) => {
      val target = Tables.t(s, dir, "customer")
        .filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("t_key"), col("c_acctbal").as("t_bal"))
      // s_delta in decimal: per-customer double sums flip the final
      // 2-dp rounding at scale; the later t_bal + s_delta addition is
      // a single op on identical doubles, so it stays deterministic
      val source = Tables.t(s, dir, "orders")
        .groupBy(col("o_custkey").as("s_key"))
        .agg(P.moneySum(col("o_totalprice")).as("s_delta"))
      target.join(source, col("t_key") === col("s_key"), "full_outer")
        .select(
          coalesce(col("t_key"), col("s_key")).as("custkey"),
          when(col("t_key").isNotNull && col("s_key").isNotNull, "update")
            .when(col("t_key").isNull, "insert")
            .otherwise("keep").as("action"),
          round(coalesce(col("t_bal"), lit(0.0)) + coalesce(col("s_delta"), lit(0.0)), 2)
            .as("balance"))
        .orderBy("custkey")
    },
    Some(s"""SELECT COALESCE(t_key, s_key) AS custkey,
      |  CASE WHEN t_key IS NOT NULL AND s_key IS NOT NULL THEN 'update'
      |       WHEN t_key IS NULL THEN 'insert'
      |       ELSE 'keep' END AS action,
      |  round(COALESCE(t_bal, 0.0) + COALESCE(s_delta, 0.0), 2) AS balance
      |FROM (SELECT c_custkey AS t_key, c_acctbal AS t_bal FROM customer
      |      WHERE c_custkey % 3 <> 0) t
      |FULL OUTER JOIN (SELECT o_custkey AS s_key,
      |                   ${P.moneySumSql("o_totalprice")} AS s_delta
      |                 FROM orders GROUP BY 1) s
      |  ON t_key = s_key
      |ORDER BY custkey""".stripMargin))

  /** SCD-2 history build: collapse each user's event stream into
    * type-change intervals with `valid_from`/`valid_to` (µs epochs)
    * and an `is_current` flag — change-point filter via lag, interval
    * close via lead. Two window passes over one user-partitioned
    * sort; at scale one shuffle on user_id serves both.
    */
  val q112 = Q(
    "q112_scd2_history",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("vf", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("vf"))
        .withColumn("prev", lag("event_type", 1).over(byUser))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead("vf", 1).over(byUser))
        .select(col("user_id"), col("event_type"), col("vf").as("valid_from"),
          col("valid_to"), col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH ev AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS vf,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, event_id, vf,
      |    lead(vf) OVER (PARTITION BY user_id ORDER BY vf, event_id) AS valid_to
      |  FROM ev WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type, vf AS valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM chg
      |ORDER BY user_id, valid_from""".stripMargin))

  /** Bloom-filter join prescreen — the 100 TB semi-join pruning
    * pattern: build a Bloom filter over the small side's keys
    * (`DataFrameStatFunctions.bloomFilter`, a distributed aggregate),
    * broadcast the ~KB sketch, drop non-matching fact rows BEFORE the
    * shuffle, then run the exact semi-join to remove the ≤1% false
    * positives. Semantically identical to the plain semi-join (the
    * oracle), but at scale the shuffle moves ~10% of the fact table
    * instead of all of it. (Spark's runtime row-level filtering does
    * this automatically for some shapes; this is the explicit,
    * always-on form.)
    */
  val q113 = Q(
    "q113_bloom_join_prescreen",
    (s, dir) => {
      val hot = Tables.t(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .select("o_orderkey")
      val bloom = hot.stat.bloomFilter("o_orderkey", 20000L, 0.01)
      val bloomRef = s.sparkContext.broadcast(bloom)
      val might = udf((k: Long) => bloomRef.value.mightContainLong(k))
      Tables.t(s, dir, "lineitem")
        .filter(might(col("l_orderkey")))
        .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          P.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, count(*) AS n,
      |  ${P.moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
      |GROUP BY 1
      |ORDER BY l_returnflag""".stripMargin))

  /** Z-score outlier screen: per-type mean/std (one tiny aggregate,
    * broadcast back) flags events with |z| > 2.5. The stats side is
    * 5 rows however big the fact is — the canonical two-pass
    * anomaly screen with no window over the full stream.
    */
  val q114 = Q(
    "q114_value_zscore_outliers",
    (s, dir) => {
      val st = Tables.events(s, dir)
        .groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
      Tables.events(s, dir)
        .join(broadcast(st), "event_type")
        .filter(col("sd") > 0 && abs((col("value") - col("mu")) / col("sd")) > 2.5)
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"),
          round((col("value") - col("mu")) / col("sd"), 4).as("z"))
        .orderBy("event_id")
    },
    Some("""WITH st AS (
      |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      |  FROM events GROUP BY 1)
      |SELECT event_id, event_type, round(value, 2) AS value,
      |  round((value - mu) / sd, 4) AS z
      |FROM events JOIN st USING (event_type)
      |WHERE sd > 0 AND abs((value - mu) / sd) > 2.5
      |ORDER BY event_id""".stripMargin))

  /** Join-key skew report: the per-key row-count distribution of the
    * fact table's join key — key cardinality, max/avg rows per key,
    * p99, and the max/avg skew factor. This is the diagnosis that
    * decides between a plain shuffle join, AQE's skew split, and
    * `Skew.saltedJoin` BEFORE launching a 100 TB join; it runs as one
    * aggregate over one aggregate (key profile is never collected).
    *
    * The p99 goes through a HISTOGRAM of the per-key counts, not the
    * raw counts: `percentile(n, 0.99)` over one global group buffers
    * every key's count in a single aggregation buffer — 15M longs on
    * one reducer at the sf10 fixtures (measured 13× at 10× data), and
    * a straight driver-kill at 100 TB key cardinalities. Per-key
    * counts take few distinct VALUES, so reducing to (value, freq)
    * first and feeding Spark's frequency-weighted `percentile(n, p,
    * f)` is bit-identical and fully distributed; every other measure
    * is distributive over the same histogram (the integer sums are
    * exact, so avg as sum(n·f)/sum(f) reproduces avg(n)).
    */
  val q125 = Q(
    "q125_join_skew_report",
    (s, dir) => {
      Tables.t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1)).as("f"))
        .agg(
          sum("f").as("n_keys"),
          max("n").as("max_rows"),
          round(sum(col("n") * col("f")) / sum("f"), 6).as("avg_rows"),
          round(expr("percentile(n, 0.99, f)"), 4).as("p99_rows"),
          round(max("n") / (sum(col("n") * col("f")) / sum("f")), 4)
            .as("skew_factor"))
    },
    Some("""WITH c AS (
      |  SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
      |SELECT count(*) AS n_keys,
      |  CAST(max(n) AS BIGINT) AS max_rows,
      |  round(avg(n), 6) AS avg_rows,
      |  round(quantile_cont(n, 0.99), 4) AS p99_rows,
      |  round(CAST(max(n) AS DOUBLE) / avg(n), 4) AS skew_factor
      |FROM c""".stripMargin))

  val all: Vector[Q] = Vector(q110, q111, q112, q113, q114, q125)
}
