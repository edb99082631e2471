package graft.queries

import graft.{Q, Tables}
import graft.functions.GeoMean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Surface-completion queries: typed stateful sessionization, map
  * functions, registered UDF + typed Aggregator UDAF, approximate
  * aggregates, and LIMIT/OFFSET pagination.
  */
object Extended {

  /** Event row for the typed sessionizer (top-level so Spark can
    * derive its Encoder).
    */
  final case class SessEvent(user_id: Long, us: Long, value: Double)

  /** Typed sessionization through KeyValueGroupedDataset.flatMapGroups
    * — the batch form of a flatMapGroupsWithState streaming handler
    * (identical per-key logic; in batch each key's full history
    * arrives at once, so state never carries across calls). Produces
    * EXACTLY the q36 session_window result, and shares its oracle:
    * three implementations (declarative session_window, custom typed
    * state logic, gaps-and-islands SQL) pinned to one answer.
    */
  val q57 = Q(
    "q57_stateful_sessionize",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
        .as[SessEvent]
      val sessions = ev.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(_.us)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
        var start = 0
        var i = 1
        def emit(from: Int, until: Int): Unit = {
          val slice = evs.slice(from, until)
          out += ((uid, slice.head.us / 1000000L, slice.length.toLong, slice.map(_.value).sum))
        }
        while (i < evs.length) {
          if (evs(i).us - evs(i - 1).us >= 1800000000L) { emit(start, i); start = i }
          i += 1
        }
        if (evs.nonEmpty) emit(start, evs.length)
        out
      }
      sessions.toDF("user_id", "sstart", "n_events", "sum_value")
        .withColumn("sum_value", round(col("sum_value"), 2))
        .orderBy("user_id", "sstart")
    },
    // same answer as q36 (session_window) — shared oracle
    Events.q36.oracle)

  /** Map type + map functions (str_to_map, map_keys, map_values,
    * element access), rendered to deterministic strings so the oracle
    * can mirror them without a MAP type.
    */
  val q58 = Q(
    "q58_map_functions",
    (s, dir) => {
      Tables.events(s, dir).repartition(s.sparkContext.defaultParallelism)
        .withColumn("k", get_json_object(col("props"), "$.k"))
        // guard against props rows lacking '$.k' — the oracle emits
        // constant mkeys/msize, so a NULL k would silently diverge
        .filter(col("k").isNotNull)
        .withColumn("m", expr("str_to_map(concat('type:', event_type, ',k:', k), ',', ':')"))
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), "|").as("mkeys"),
          array_join(map_values(col("m")), "|").as("mvals"),
          size(col("m")).as("msize"),
          expr("m['type']").as("mtype"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
      |  'type|k' AS mkeys,
      |  event_type || '|' || json_extract_string(props, '$.k') AS mvals,
      |  2 AS msize,
      |  event_type AS mtype
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id""".stripMargin))

  /** UDF/UDAF surface (SURVEY.md §2.10): a registered scalar Scala
    * UDF and a typed Aggregator registered through udaf(). Kept OUT
    * of other queries — built-ins codegen, UDFs don't — but the
    * registration surface itself is part of the warehouse contract
    * (Hive CREATE FUNCTION).
    */
  val q59 = Q(
    "q59_udf_udaf",
    (s, dir) => {
      s.udf.register("vowel_count", (t: String) => t.count("aeiouAEIOU".contains(_)))
      s.udf.register("geo_mean", udaf(GeoMean))
      Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(expr("geo_mean(l_extendedprice)"), 4).as("geomean_price"),
          sum(expr("vowel_count(l_linestatus)")).cast("long").as("status_vowels"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n,
      |  round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price,
      |  CAST(sum(length(regexp_replace(lower(l_linestatus), '[^aeiou]', '', 'g'))) AS BIGINT)
      |    AS status_vowels
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin))

  /** Approximate aggregates for the 100 TB path: HyperLogLog distinct
    * counts and quantile sketches. Sketch internals are
    * engine-specific, so the query is SELF-AUDITING: it computes both
    * the sketch and the exact aggregate and emits the exact values
    * plus within-bound verdicts, which DuckDB CAN hash-match (its
    * side asserts TRUE). Bounds: HLL default rsd is 0.05, verdict
    * allows 3σ = 15%; percentile_approx with accuracy 10000 has rank
    * error ≤ 1e-4, verdict allows a ±0.05-rank envelope from an
    * INDEPENDENT source (exact histogram for the bounded quantity
    * domain, a second sketch at accuracy 2000 for the continuous
    * price) — orders of magnitude looser than observed error yet
    * tight enough that a broken sketch fails the hash compare.
    * ApproxSpec additionally bounds both raw sketches' error.
    */
  val q60 = Q(
    "q60_approx_aggregates",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      // No aggregate here buffers raw values: exact percentile over
      // the raw column would buffer every value per group (it cost
      // 8x the whole query at sf0.1), so everything below is a
      // sketch or a constant-size histogram — mergeable/streaming.
      // Two structural choices, measured at sf0.1, 6x combined:
      // one sketch per column (the array form) instead of one per
      // percentile, and the exact COUNT(DISTINCT)s as their own
      // two-level aggregates rather than in the sketch aggregate —
      // multiple-distinct triggers Catalyst's Expand (3x every row)
      // and drags every sketch buffer through the widened shuffle.
      // The audited sketch must NOT supply its own band: a single
      // percentile_approx array is monotone by construction, so
      // "p50 within [p45, p55] of the same sketch" can never fail.
      // Each band therefore comes from an INDEPENDENT source:
      //  - l_quantity has a bounded integer domain, so its p45/p55
      //    band is EXACT via the (value, freq)-histogram percentile
      //    (the q19 pattern — constant-size buffers, streams fine);
      //  - l_extendedprice is continuous, so its band is a SECOND
      //    sketch at accuracy 2000 (a separate aggregate buffer:
      //    rank error ≤ 5e-4 against a ±0.05 rank envelope, so the
      //    verdict is still a guarantee, but a broken p90 sketch
      //    now fails it).
      val sketches = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey")).as("asu"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50q"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
          .as("p90e"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.85), lit(0.95)), lit(2000)).as("bande"))
      val bandQ = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("freq"))
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.45, 0.55), freq)")
          .as("bandq"))
      def exactDistinct(key: String, as: String) =
        li.select(col("l_returnflag"), col(key)).distinct
          .groupBy("l_returnflag").agg(count(lit(1)).as(as))
      sketches
        .join(bandQ, "l_returnflag")
        .join(exactDistinct("l_partkey", "exact_parts"), "l_returnflag")
        .join(exactDistinct("l_suppkey", "exact_supps"), "l_returnflag")
        .select(
          col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.15)
            .as("parts_ok"),
          (abs(col("asu") - col("exact_supps")) <= col("exact_supps") * 0.15)
            .as("supps_ok"),
          col("p50q").between(col("bandq")(0), col("bandq")(1)).as("p50_ok"),
          col("p90e").between(col("bande")(0), col("bande")(1)).as("p90_ok"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_suppkey) AS exact_supps,
      |  TRUE AS parts_ok, TRUE AS supps_ok, TRUE AS p50_ok, TRUE AS p90_ok
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** LIMIT/OFFSET pagination (reference P2 row slicing). */
  val q61 = Q(
    "q61_limit_offset",
    (s, dir) => {
      Tables.t(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .offset(100)
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 25 OFFSET 100""".stripMargin))

  val all: Vector[Q] = Vector(q57, q58, q59, q60, q61)
}
