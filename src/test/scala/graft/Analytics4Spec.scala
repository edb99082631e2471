package graft

import org.apache.spark.sql.functions._

/** Independent driver recomputations for q222-q225. */
class Analytics4Spec extends SparkSpec {

  test("q222 arm stats and Welch z equal a driver recompute") {
    val out = Q.byName("q222_ab_lift_ztest").fn(spark, sf()).head()
    val perUser = Tables.events(spark, sf())
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0).cast("decimal(18,4)")).cast("double").as("x"))
      .withColumn("arm",
        graft.functions.Portable.md5Long(col("user_id").cast("string")) % 2)
      .collect().map(r => (r.getLong(r.fieldIndex("arm")), r.getDouble(1)))
    def stats(a: Long): (Long, Double, Double) = {
      val xs = perUser.filter(_._1 == a).map(_._2)
      val n = xs.length; val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n.toLong, m, v)
    }
    val (na, ma, va) = stats(0); val (nb, mb, vb) = stats(1)
    assert(out.getAs[Long]("na") == na && out.getAs[Long]("nb") == nb)
    assert(math.abs(out.getAs[Double]("mean_a") - ma) < 1e-4)
    assert(math.abs(out.getAs[Double]("mean_b") - mb) < 1e-4)
    val z = (mb - ma) / math.sqrt(va / na + vb / nb)
    assert(math.abs(out.getAs[Double]("z_score") - z) < 1e-3,
      s"z ${out.getAs[Double]("z_score")} vs driver $z")
  }

  test("q223 Benford shares sum to 1 and chi2 equals the sum of its parts") {
    val rows = Q.byName("q223_benford_audit").fn(spark, sf()).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val nTotal = rows.map(_.getAs[Long]("n")).sum
    assert(nTotal == Tables.t(spark, sf(), "orders").count())
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(expSum - 1.0) < 1e-3, "Benford constants must sum to ~1")
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(rows.forall(_.getAs[Double]("chi2") == chi2), "chi2 is query-constant")
    val partSum = rows.map(_.getAs[Double]("chi2_part")).sum
    assert(math.abs(partSum - chi2) < 1e-5)
  }

  test("q224 bands partition all customers and the risk share matches") {
    val rows = Q.byName("q224_k_anonymity").fn(spark, sf()).collect()
    val customers = rows.map(_.getAs[Long]("customers")).sum
    assert(customers == Tables.t(spark, sf(), "customer").count())
    val risky = rows.filter(_.getAs[Long]("band") < 5)
      .map(_.getAs[Long]("customers")).sum
    val rs = rows.head.getAs[Double]("risk_share")
    assert(rows.forall(_.getAs[Double]("risk_share") == rs))
    assert(math.abs(rs - risky.toDouble / customers) < 1e-6)
  }

  test("q225 folds are leak-free and expanding sums telescope") {
    val rows = Q.byName("q225_time_series_folds").fn(spark, sf()).collect()
      .map(r => (r.getAs[Int]("test_year"), r.getAs[Long]("train_orders"),
        r.getAs[Double]("train_revenue"), r.getAs[Long]("test_orders"),
        r.getAs[Double]("test_revenue")))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.head._2 == 0L && rows.head._3 == 0.0,
      "first fold has an empty training window")
    rows.sliding(2).foreach {
      case Array((_, tr1, _, te1, _), (_, tr2, _, _, _)) =>
        assert(tr2 == tr1 + te1, "train window = all earlier test folds")
      case _ =>
    }
    assert(rows.last._2 + rows.last._4 ==
      Tables.t(spark, sf(), "orders").count(),
      "last fold's train+test covers every order")
  }
}
