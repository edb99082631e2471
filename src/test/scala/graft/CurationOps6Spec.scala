package graft

import org.apache.spark.sql.functions._

/** Independent recomputations for the q210-q213 batch. */
class CurationOps6Spec extends SparkSpec {

  test("q210 chi2 matches a driver 2x2 recompute for every reported cell") {
    val out = Q.byName("q210_chi2_keywords").fn(spark, sf()).collect()
    assert(out.nonEmpty)
    val toks = Tables.docs(spark, sf())
      .select(col("source"),
        explode(graft.functions.Portable.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = toks.length.toDouble
    out.foreach { r =>
      val (src, tok) = (r.getString(0), r.getString(2))
      val a = toks.count(p => p._1 == src && p._2 == tok).toDouble
      val stot = toks.count(_._1 == src).toDouble
      val g = toks.count(_._2 == tok).toDouble
      val (b, c, d) = (stot - a, g - a, n - stot - g + a)
      val t = a * d - b * c
      val chi2 = n * (t * t) / ((a + b) * (c + d)) / ((a + c) * (b + d))
      assert(math.abs(r.getDouble(3) - math.round(chi2 * 1e4) / 1e4) < 1e-6,
        s"$src/$tok: ${r.getDouble(3)} vs $chi2")
      assert(a * n > stot * g, "reported keyword is not over-represented")
    }
  }

  test("q211 pair matrix is upper-triangular with sane bounds") {
    val rows = Q.byName("q211_cross_source_dups").fn(spark, sf()).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (shared, lb) = (r.getLong(2), r.getLong(3))
      assert(shared >= 1 && lb >= shared,
        s"dup_docs_lb $lb < shared_contents $shared")
    }
  }

  test("q212 med/mad match a driver recompute and gates are one-sided") {
    val out = Q.byName("q212_mad_length_gate").fn(spark, sf()).collect()
    val docs = Tables.docs(spark, sf())
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def q50(xs: Seq[Double]) = { // quantile_cont median
      val s = xs.sorted; val pos = 0.5 * (s.length - 1)
      val i = pos.toInt; val f = pos - i
      val v = if (i + 1 < s.length) s(i) + f * (s(i + 1) - s(i)) else s(i)
      math.round(v * 1e6) / 1e6
    }
    out.foreach { r =>
      val lang = r.getString(0)
      val xs = docs.filter(_._1 == lang).map(_._2.toDouble)
      val med = q50(xs)
      val mad = q50(xs.map(x => math.abs(x - med)))
      assert(r.getDouble(r.fieldIndex("med")) == med)
      assert(r.getDouble(r.fieldIndex("mad")) == mad)
      val flagged = xs.count(x => 0.6745 * math.abs(x - med) > 3.5 * mad)
      assert(r.getLong(r.fieldIndex("n_flagged")) == flagged)
      assert(r.getLong(r.fieldIndex("n_flagged")) * 2 <= xs.length,
        "a robust gate must never flag the majority")
    }
  }

  test("q213 equi-depth boundaries are monotone inside [min, max]") {
    val rows = Q.byName("q213_equidepth_stats").fn(spark, sf()).collect()
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to 9))
      val bs = sorted.map(_.getDouble(6))
      bs.sliding(2).foreach(w => assert(w(0) <= w(1), s"non-monotone: $bs"))
      val (vmin, vmax) = (sorted.head.getDouble(3), sorted.head.getDouble(4))
      assert(vmin <= bs.head && bs.last <= vmax)
      assert(sorted.head.getLong(2) > 0)
    }
  }
}
