package graft

import org.apache.spark.sql.functions._

/** q60 is self-auditing (it emits within-bound verdicts the DuckDB
  * oracle hash-matches); this spec keeps the TIGHTER raw-error bound
  * the verdict columns deliberately relax: HLL within 5% of exact,
  * approx p50 within one unit of exact.
  */
class ApproxSpec extends SparkSpec {

  test("q60 verdict columns all report within-bound") {
    val rows = Q.registry.find(_.name == "q60_approx_aggregates").get
      .fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("parts_ok", "supps_ok", "p50_ok", "p90_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"${r.getString(0)} $c must be true")
      }
    }
  }

  test("approx aggregates land within tolerance of exact") {
    val approx = Tables.t(spark, sf(), "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("nd"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.t(spark, sf(), "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_quantity, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (nd, p50)) =>
      val (end, ep50) = exact(k)
      assert(math.abs(nd - end).toDouble / end < 0.05, s"$k HLL off >5%: $nd vs $end")
      assert(math.abs(p50 - ep50) <= 1.0, s"$k p50 off: $p50 vs $ep50")
    }
  }
}
