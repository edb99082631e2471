package graft

import org.apache.spark.sql.functions._

/** Independent recomputations for the q206-q209 batch. */
class CurationOps5Spec extends SparkSpec {

  test("q206 bootstrap band brackets the observed mean and is ordered") {
    val r = Q.byName("q206_bootstrap_ci").fn(spark, sf()).collect().head
    val (obs, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(lo < hi, s"degenerate band [$lo, $hi]")
    // mean-of-the-data always sits inside its own 2nd..31st replicate
    // band unless the metric is pathologically skewed — the fixture
    // order values are not
    assert(lo <= obs && obs <= hi, s"observed $obs outside [$lo, $hi]")
  }

  test("q207 winsorized stats match a driver brute force") {
    val out = Q.byName("q207_winsorized_stats").fn(spark, sf()).collect()
    val rows = Tables.t(spark, sf(), "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    out.foreach { r =>
      val flag = r.getString(0)
      val qs = rows.filter(_._1 == flag).map(_._2).sorted
      def pct(p: Double) = { // quantile_cont linear interpolation
        val pos = p * (qs.length - 1)
        val i = pos.toInt
        val frac = pos - i
        if (i + 1 < qs.length) qs(i) + frac * (qs(i + 1) - qs(i)) else qs(i)
      }
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      val (lo, hi) = (r6(pct(0.05)), r6(pct(0.95)))
      assert(math.abs(r.getDouble(r.fieldIndex("p05")) - lo) < 1e-9)
      assert(math.abs(r.getDouble(r.fieldIndex("p95")) - hi) < 1e-9)
      val win = qs.map(q => math.max(lo, math.min(hi, q))).sum / qs.length
      assert(math.abs(r.getDouble(r.fieldIndex("winsorized_mean")) - win) < 1e-6)
      val trimmed = qs.filter(q => q >= lo && q <= hi)
      assert(math.abs(r.getDouble(r.fieldIndex("trimmed_mean")) -
        trimmed.sum / trimmed.length) < 1e-9)
    }
  }

  test("q208 k-center selection matches a driver greedy and radii shrink") {
    val out = Q.byName("q208_kcenter_coreset").fn(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == (0 to 7))
    assert(out.map(_._2).distinct.length == 8, "re-selected a center")
    // radii are non-increasing (each round covers the worst point)
    val radii = out.drop(1).map(_._3)
    radii.sliding(2).foreach(w => assert(w(1) <= w(0) + 1e-9))
    // brute force greedy on the driver
    val vs = Tables.t(spark, sf(), "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    def d2(a: Array[Float], b: Array[Float]) =
      r6(a.indices.foldLeft(0.0)((s, i) =>
        s + (a(i).toDouble - b(i).toDouble) * (a(i).toDouble - b(i).toDouble)))
    var centers = Vector(vs.head)
    var md = vs.map(v => d2(v._2, vs.head._2))
    val picks = collection.mutable.ArrayBuffer((vs.head._1, 0.0))
    for (_ <- 1 to 7) {
      val best = md.zipWithIndex.maxBy { case (d, i) => (d, -vs(i)._1) }
      picks += ((vs(best._2)._1, best._1))
      val c = vs(best._2)
      centers :+= c
      md = md.zipWithIndex.map { case (d, i) => math.min(d, d2(vs(i)._2, c._2)) }
    }
    assert(out.map(r => (r._2, r._3)).toSeq == picks.toSeq,
      s"spark ${out.toSeq} vs driver $picks")
  }

  test("q209 exact dups are always flagged by both near-dup methods") {
    val cells = Q.byName("q209_dedup_method_overlap").fn(spark, sf()).collect()
    val total = cells.map(_.getLong(3)).sum
    val en = Tables.docs(spark, sf()).filter(col("lang") === "en").count()
    assert(total == en, s"cells sum $total != en docs $en")
    cells.filter(_.getBoolean(0)).foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2),
        s"exact-dup cell escaped a near-dup method: $r")
    }
  }
}
