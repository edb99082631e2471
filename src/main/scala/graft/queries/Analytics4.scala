package graft.queries

import graft.{Q, Tables}
import graft.functions.{Portable => P}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 experimentation / governance analytics: A/B lift with a
  * Welch z-statistic over hash-assigned arms, a Benford first-digit
  * audit, a k-anonymity risk report over quasi-identifiers, and
  * expanding-window time-series CV folds. Each is one or two
  * aggregations over the fact table — the per-group frames they
  * window over are bounded by arm/digit/band/year cardinality, never
  * by corpus size.
  */
object Analytics4 {

  /** A/B experiment readout: users are split into two arms by the
    * portable 60-bit md5 of their id (deterministic, balanced,
    * reproducible across engines and cluster sizes — the way a real
    * experiment assigns by identity hash, not RNG), the metric is
    * per-user purchase value, and the output is one row with arm
    * means, relative lift, and a Welch z-score. All sums accumulate
    * in decimal (exact, fold-order-free); the variance identity
    * Σx² − (Σx)²/n runs in double FROM those exact decimals, so both
    * engines do identical IEEE arithmetic. Scale: one groupBy user,
    * one groupBy arm (2 rows), nothing else.
    */
  val q222 = Q(
    "q222_ab_lift_ztest",
    (s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0)).cast("decimal(18,4)")).cast("decimal(18,4)")
          .as("x"))
        .withColumn("arm", P.md5Long(col("user_id").cast("string")) % 2)
      val arms = perUser.groupBy("arm").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n").as("na"), col("sx").as("sxa"), col("sxx").as("sxxa"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n").as("nb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
      a.crossJoin(broadcast(b))
        .select(
          col("na"), col("nb"),
          round(col("sxa").cast("double") / col("na"), 6).as("mean_a"),
          round(col("sxb").cast("double") / col("nb"), 6).as("mean_b"),
          round((col("sxb").cast("double") / col("nb") -
            col("sxa").cast("double") / col("na")) /
            (col("sxa").cast("double") / col("na")) * 100, 6).as("lift_pct"),
          round(
            (col("sxb").cast("double") / col("nb") -
              col("sxa").cast("double") / col("na")) /
              sqrt(
                ((col("sxxa").cast("double") -
                  col("sxa").cast("double") * col("sxa").cast("double") / col("na")) /
                  (col("na") - 1)) / col("na") +
                ((col("sxxb").cast("double") -
                  col("sxb").cast("double") * col("sxb").cast("double") / col("nb")) /
                  (col("nb") - 1)) / col("nb")), 6).as("z_score"))
    },
    Some(s"""WITH per_user AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value
      |                       ELSE 0.0 END AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS x,
      |    ${P.md5LongSql("CAST(user_id AS VARCHAR)")} % 2 AS arm
      |  FROM events GROUP BY user_id),
      |arms AS (
      |  SELECT arm, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
      |  FROM per_user GROUP BY arm),
      |a AS (SELECT n AS na, sx AS sxa, sxx AS sxxa FROM arms WHERE arm = 0),
      |b AS (SELECT n AS nb, sx AS sxb, sxx AS sxxb FROM arms WHERE arm = 1)
      |SELECT na, nb,
      |  round(CAST(sxa AS DOUBLE) / na, 6) AS mean_a,
      |  round(CAST(sxb AS DOUBLE) / nb, 6) AS mean_b,
      |  round((CAST(sxb AS DOUBLE) / nb - CAST(sxa AS DOUBLE) / na)
      |        / (CAST(sxa AS DOUBLE) / na) * 100, 6) AS lift_pct,
      |  round((CAST(sxb AS DOUBLE) / nb - CAST(sxa AS DOUBLE) / na)
      |        / sqrt(
      |            ((CAST(sxxa AS DOUBLE)
      |              - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE) / na) / (na - 1)) / na
      |          + ((CAST(sxxb AS DOUBLE)
      |              - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE) / nb) / (nb - 1)) / nb),
      |        6) AS z_score
      |FROM a, b""".stripMargin))

  /** Benford first-significant-digit audit on order totals — the
    * standard fabricated-data screen. Expected shares are the 6-dp
    * Benford constants as LITERALS in both engines (log10 at runtime
    * would put two libm implementations' last ulp into the compare);
    * per-digit χ² contributions round to 6 dp and the total χ² sums
    * those EXACTLY in decimal, so no 9-way double fold-order enters
    * the output. Scale: one digit-extraction pass, a 9-row frame
    * after.
    */
  val q223 = Q(
    "q223_benford_audit",
    (s, dir) => {
      val benford = Seq(
        (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
        (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
        (9, 0.045757))
      val exp = s.createDataFrame(benford).toDF("digit", "expected")
      val obs = Tables.t(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = obs.agg(sum("n").cast("long").as("total"))
      val parts = obs.join(broadcast(exp), "digit")
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          col("expected"),
          round(
            (col("n") - col("expected") * col("total")) *
              (col("n") - col("expected") * col("total")) /
              (col("expected") * col("total")), 6)
            .cast("decimal(18,6)").as("chi2_part"))
      val chi2 = parts.agg(sum("chi2_part").cast("decimal(18,6)")
        .cast("double").as("chi2"))
      parts.crossJoin(broadcast(chi2))
        .select(col("digit"), col("n"), col("share"), col("expected"),
          col("chi2_part").cast("double").as("chi2_part"), col("chi2"))
        .orderBy("digit")
    },
    Some("""WITH expv(digit, expected0) AS (VALUES
      |  (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
      |  (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
      |  (9, 0.045757)),
      |-- force DOUBLE: the bare VALUES literals type as DECIMAL(7,6),
      |-- which would make (n - expected*total) exact-decimal here but
      |-- double in Spark (ADVICE r6)
      |exp AS (SELECT digit, CAST(expected0 AS DOUBLE) AS expected FROM expv),
      |obs AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
      |    1, 1) AS INTEGER) AS digit, count(*) AS n
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
      |parts AS (
      |  SELECT digit, CAST(n AS BIGINT) AS n,
      |    round(CAST(n AS DOUBLE) / total, 6) AS share, expected,
      |    CAST(round((n - expected * total) * (n - expected * total)
      |      / (expected * total), 6) AS DECIMAL(18,6)) AS chi2_part
      |  FROM obs JOIN exp USING (digit) CROSS JOIN tot),
      |chi2 AS (SELECT CAST(CAST(sum(chi2_part) AS DECIMAL(18,6)) AS DOUBLE)
      |         AS chi2 FROM parts)
      |SELECT digit, n, share, expected, CAST(chi2_part AS DOUBLE) AS chi2_part,
      |  chi2
      |FROM parts CROSS JOIN chi2
      |ORDER BY digit""".stripMargin))

  /** k-anonymity risk report: group customers into equivalence
    * classes by quasi-identifiers (nation, market segment, account-
    * balance thousand-bucket), histogram the class sizes (band 10+ is
    * one row), and report the share of customers whose class is
    * smaller than k=5 — the re-identification risk measure a
    * training-data release audit needs. Scale: one groupBy on the QI
    * tuple, then a ≤10-row frame; the risk share joins back as a
    * broadcast 1-row aggregate.
    */
  val q224 = Q(
    "q224_k_anonymity",
    (s, dir) => {
      val classes = Tables.t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).as("bal_bucket"))
        .agg(count(lit(1)).as("size"))
      val bands = classes
        .groupBy(least(col("size"), lit(10)).cast("long").as("band"))
        .agg(count(lit(1)).as("classes"),
          sum("size").cast("long").as("customers"))
      val risk = bands.agg(
        (sum(when(col("band") < 5, col("customers")).otherwise(0L)) /
          sum("customers").cast("double")).as("rr"))
        .select(round(col("rr"), 6).as("risk_share"))
      bands.crossJoin(broadcast(risk))
        .select(col("band"), col("classes"), col("customers"),
          col("risk_share"))
        .orderBy("band")
    },
    Some("""WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    floor(c_acctbal / 1000) AS bal_bucket, count(*) AS size
      |  FROM customer GROUP BY 1, 2, 3),
      |bands AS (
      |  SELECT CAST(least(size, 10) AS BIGINT) AS band,
      |    count(*) AS classes, CAST(sum(size) AS BIGINT) AS customers
      |  FROM classes GROUP BY 1),
      |risk AS (
      |  SELECT round(CAST(sum(CASE WHEN band < 5 THEN customers ELSE 0 END)
      |    AS DOUBLE) / sum(customers), 6) AS risk_share FROM bands)
      |SELECT band, classes, customers, risk_share
      |FROM bands CROSS JOIN risk
      |ORDER BY band""".stripMargin))

  /** Expanding-window time-series CV folds: each order year is a
    * test fold whose training window is every EARLIER year — the
    * backtest split a forecasting pipeline needs, with leakage
    * impossible by construction (train strictly precedes test).
    * Revenue accumulates per year in exact decimal and the expanding
    * sums run over the ≤#years aggregated frame, so no
    * data-proportional window and no double fold-order. Output: one
    * row per test year with train/test order counts and revenue.
    */
  val q225 = Q(
    "q225_time_series_folds",
    (s, dir) => {
      val byYear = Tables.t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("test_year"))
        .agg(count(lit(1)).as("test_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
      val w = Window.orderBy("test_year")
        .rowsBetween(Window.unboundedPreceding, -1)
      byYear
        .withColumn("train_orders",
          coalesce(sum("test_orders").over(w), lit(0L)).cast("long"))
        .withColumn("train_revenue",
          round(coalesce(sum("rev").over(w), lit(0).cast("decimal(18,4)")), 2)
            .cast("double"))
        .select(col("test_year"), col("train_orders"), col("train_revenue"),
          col("test_orders"),
          round(col("rev"), 2).cast("double").as("test_revenue"))
        .orderBy("test_year")
    },
    Some("""WITH by_year AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS test_year,
      |    count(*) AS test_orders,
      |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT test_year,
      |  CAST(coalesce(sum(test_orders) OVER (ORDER BY test_year
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS train_orders,
      |  CAST(round(coalesce(sum(rev) OVER (ORDER BY test_year
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    CAST(0 AS DECIMAL(18,4))), 2) AS DOUBLE) AS train_revenue,
      |  test_orders,
      |  CAST(round(rev, 2) AS DOUBLE) AS test_revenue
      |FROM by_year
      |ORDER BY test_year""".stripMargin))

  val all: Vector[Q] = Vector(q222, q223, q224, q225)
}
