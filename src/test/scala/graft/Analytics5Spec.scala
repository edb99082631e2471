package graft

import org.apache.spark.sql.functions._

/** Driver recomputes for the round-7 analytics wave
  * (q248/q249/q253).
  */
class Analytics5Spec extends SparkSpec {

  private def h60(s: String): Long =
    graft.functions.Md5Long60.hashBytes(s.getBytes("UTF-8"))

  test("q248 skyline: exact driver recompute, no dominated row survives") {
    val out = Q.byName("q248_skyline_pareto_docs").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // driver recompute from raw docs
    val docs = Tables.t(spark, sf(), "documents").select("doc_id", "text", "n_chars")
      .collect()
      .flatMap { r =>
        val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some((r.getLong(0),
          BigDecimal(toks.distinct.length.toDouble / toks.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          r.getLong(2)))
      }
    val sky = docs.filter { case (id, q, len) =>
      !docs.exists { case (id2, q2, len2) =>
        id2 != id && q2 >= q && len2 >= len && (q2 > q || len2 > len)
      }
    }
    assert(out.map(t => (t._1, t._2, t._3)).toSet ==
      sky.map(t => (t._1, t._2, t._3)).toSet)
    assert(out.forall(_._4 == docs.length - sky.length))
    assert(out.nonEmpty && docs.length > sky.length)
  }

  test("q249 ER: class totals recompute; blocking is lossless at fixture density") {
    val rows = Q.byName("q249_entity_resolution_golden").fn(spark, sf())
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("0_clean", "1_lower", "2_chardrop", "3_all"))
    // recompute perturbation class sizes from the hash
    val custs = Tables.t(spark, sf(), "customer").select("c_custkey").collect()
      .map(_.getLong(0))
    val byCls = custs.groupBy { id =>
      h60(s"erd:$id") % 5 match {
        case 0 | 1 | 2 => "0_clean"
        case 3         => "1_lower"
        case _         => "2_chardrop"
      }
    }.map { case (k, v) => k -> v.length.toLong }
    for ((cls, n) <- byCls) assert(rows(cls).getLong(1) == n, cls)
    assert(rows("3_all").getLong(1) == custs.length.toLong)
    // every derived CRM record has exactly one true parent and the
    // half-offset band keys guarantee a shared block (|Δbal| ≤ 5¢):
    // at fixture density nothing is capped and linkage is perfect
    for (r <- rows.values) {
      assert(r.getLong(6) == 0L) // capped_blocks
      assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0) // precision, recall
    }
  }

  test("q253 conformal: qhat is the ceil(0.9(n+1))-th residual; coverage recomputes") {
    val out = Q.byName("q253_conformal_coverage").fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    val joined = Tables.t(spark, sf(), "orders")
      .join(Tables.t(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        h60(s"conf:${r.getLong(2)}") % 2 == 0))
    for ((seg, nCal, nTest, qhat, nCov, cov) <- out) {
      val cal = joined.filter(t => t._1 == seg && t._3).map(_._2)
      val tst = joined.filter(t => t._1 == seg && !t._3).map(_._2)
      assert(cal.length.toLong == nCal && tst.length.toLong == nTest, seg)
      val mu = cal.map(v => BigDecimal(v).setScale(4)).sum.toDouble / cal.length
      def r2(y: Double): Double =
        BigDecimal(math.abs(y - mu))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val k = ((nCal + 1) * 9 + 9) / 10
      val qh = cal.map(r2).sorted.apply(k.toInt - 1)
      assert(qh == qhat, s"$seg qhat")
      val covered = tst.count(y => r2(y) <= qhat)
      assert(covered.toLong == nCov, s"$seg covered")
      assert(cov == BigDecimal(covered.toDouble / tst.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // the conformal promise: ≥ ~90% held-out coverage
      assert(cov > 0.8, s"$seg coverage $cov")
    }
  }

  test("q261 interpolation: exact on observed days, between neighbours on gaps") {
    val rows = Q.byName("q261_resample_interpolate").fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getString(0))
    for ((_, rs) <- byNation) {
      val seq = rs.sortBy(_.get(1).toString)
      // every interpolated value lies in [min, max] of its two
      // neighbouring observations (convexity of linear interpolation)
      var lastObs: Option[Double] = None
      var pending = List.empty[Double]
      for (r <- seq) {
        val v = r.getDouble(3)
        if (r.getBoolean(2)) {
          for (p <- pending; lo <- lastObs)
            assert(p >= math.min(lo, v) - 0.01 && p <= math.max(lo, v) + 0.01,
              s"gap value $p outside neighbour envelope [$lo, $v]")
          pending = Nil
          lastObs = Some(v)
        } else pending = v :: pending
      }
      // values are exact cents
      for (r <- seq)
        assert((BigDecimal(r.getDouble(3)) * 100).isWhole,
          s"value must be an exact cent amount: ${r.getDouble(3)}")
    }
  }
}
