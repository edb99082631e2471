package graft

import org.apache.spark.sql.functions._

/** q60 is self-auditing (it emits within-bound verdicts the DuckDB
  * oracle hash-matches); this spec keeps the TIGHTER raw-error bound
  * the verdict columns deliberately relax: HLL within 5% of exact,
  * approx p50 within one unit of exact, and the p90 price sketch
  * (banded in-query only by a coarser second sketch) within the
  * exact p89..p91 envelope.
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
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
          .as("p90e"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Tables.t(spark, sf(), "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, array(0.89, 0.91))").as("band"))
      .collect()
      .map { r =>
        val b = r.getSeq[Double](3)
        r.getString(0) -> (r.getLong(1), r.getDouble(2), b(0), b(1))
      }
      .toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (nd, p50, p90e)) =>
      val (end, ep50, lo, hi) = exact(k)
      assert(math.abs(nd - end).toDouble / end < 0.05, s"$k HLL off >5%: $nd vs $end")
      assert(math.abs(p50 - ep50) <= 1.0, s"$k p50 off: $p50 vs $ep50")
      assert(p90e >= lo && p90e <= hi,
        s"$k p90 price sketch outside exact p89..p91: $p90e vs [$lo, $hi]")
    }
  }
}
