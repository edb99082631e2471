package graft.queries

import graft.{Q, Tables}
import graft.functions.{Portable => P}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 — event-time windows (T1-T3), as-of join (J9), and
  * stateful-style dedup (T5), all in their batch form so the DuckDB
  * oracle can check them. The same groupBy(window(...)) /
  * session_window expressions run unchanged under Structured Streaming
  * with a watermark — see graft.streaming and StreamingOps.
  *
  * Window starts are emitted as epoch seconds (unix_timestamp floors
  * to the second, matching DuckDB floor(epoch(...))) to keep raw
  * timestamp encodings out of the comparison.
  */
object Events {

  /** Tumbling 5-minute event-time window aggregate (T1). */
  val q34 = Q(
    "q34_tumbling_window",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), P.moneySum(col("value")).as("sum_value"))
        .select(
          unix_timestamp(col("window.start")).as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")
    },
    Some(s"""SELECT CAST(floor(epoch(time_bucket(INTERVAL '5 minutes', ts))) AS BIGINT) AS wstart,
      |  event_type, count(*) AS n, ${P.moneySumSql("value")} AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY wstart, event_type""".stripMargin))

  /** Sliding 10-minute window, 5-minute slide (T2): each event lands
    * in exactly two windows; the oracle reproduces that with an
    * offset cross join.
    */
  val q35 = Q(
    "q35_sliding_window",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), P.moneySum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("wstart"), col("n"), col("sum_value"))
        .orderBy("wstart")
    },
    Some(s"""SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - o) * 300 AS wstart,
      |  count(*) AS n, ${P.moneySumSql("value")} AS sum_value
      |FROM events CROSS JOIN (VALUES (0), (1)) t(o)
      |GROUP BY 1
      |ORDER BY wstart""".stripMargin))

  /** Session windows with a 30-minute gap per user (T3). The oracle
    * is the classic gaps-and-islands rewrite; a new session starts
    * when the gap is >= the timeout (Spark sessions are half-open:
    * [first, last+gap)).
    */
  val q36 = Q(
    "q36_session_window",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), P.moneySum(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          unix_timestamp(col("session_window.start")).as("sstart"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "sstart")
    },
    Some(s"""WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sstart,
      |  count(*) AS n_events, ${P.moneySumSql("value")} AS sum_value
      |FROM numbered
      |GROUP BY user_id, sid
      |ORDER BY user_id, sstart""".stripMargin))

  /** As-of join (J9): each purchase picks up the latest preceding
    * click of the same user — expressed as last(..., ignoreNulls)
    * over an ordered per-user window (one shuffle on user_id, no
    * range join explosion at scale).
    */
  val q37 = Q(
    "q37_asof_last_click",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("click_val",
          last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ets"),
          col("click_val").as("last_click_value"),
          unix_timestamp(col("click_ts")).as("last_click_epoch"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ets,
      |  last_click_value,
      |  CAST(floor(epoch(last_click_ts)) AS BIGINT) AS last_click_epoch
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
      |      OVER w AS last_click_value,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER w AS last_click_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin))

  /** Keep-first dedup per (user, event_type) — the batch form of
    * streaming dropDuplicates-within-watermark (T5).
    */
  val q38 = Q(
    "q38_event_dedup_first",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("first_epoch"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS first_epoch
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin))

  /** As-of join with TOLERANCE (vs q37's unbounded as-of): each
    * purchase matches the user's latest strictly-earlier click only
    * if it happened within the last hour — the bounded-staleness
    * semantics trades/sensor pipelines need. One window over one
    * shuffle; the strictly-before frame is ROWS ... 1 PRECEDING.
    */
  val q92 = Q(
    "q92_asof_tolerance",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("lc", last(
          when(col("event_type") === "click", col("us")), ignoreNulls = true)
          .over(Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          when(col("us") - col("lc") <= 3600000000L, col("lc")).as("click_us"))
        .orderBy("purchase_id")
    },
    Some("""SELECT event_id AS purchase_id, user_id,
      |  CASE WHEN us - lc <= 3600000000 THEN lc END AS click_us
      |FROM (
      |  SELECT event_id, user_id, event_type, us,
      |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
      |  FROM (
      |    SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us
      |    FROM events WHERE event_type IN ('click', 'purchase')))
      |WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin))

  val all: Vector[Q] = Vector(q34, q35, q36, q37, q38, q92)
}
