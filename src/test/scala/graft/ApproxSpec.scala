package graft

import org.apache.spark.sql.functions._

/** q60 has no cross-engine oracle (sketches are engine-specific);
  * this spec bounds its error against the exact aggregates instead.
  */
class ApproxSpec extends SparkSpec {

  test("approx aggregates land within tolerance of exact") {
    val approx = Q.registry.find(_.name == "q60_approx_aggregates").get
      .fn(spark, sf()).collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
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
