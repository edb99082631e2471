package graft

import org.apache.spark.sql.functions._

/** Driver recomputations for q231-q234 (round-6 second wave). */
class CorpusOps4Spec extends SparkSpec {

  test("q231 equals a driver Apriori recompute (L1>=4, L2>=2, top-10)") {
    val out = Q.byName("q231_apriori_triples").fn(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    val items = Tables.t(spark, sf(), "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val l1 = items.groupBy(_._2).collect {
      case (p, xs) if xs.length >= 4 => p
    }.toSet
    val baskets = items.filter(x => l1(x._2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.sorted).toMap
    val pairCnt = collection.mutable.Map.empty[(Long, Long), Int]
    baskets.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCnt((ps(i), ps(j))) = pairCnt.getOrElse((ps(i), ps(j)), 0) + 1
    }
    // filter + keySet, NOT collect-to-tuple: Map.collect returning a
    // pair would rebuild a MAP keyed by the pair's first element and
    // silently collapse the set (same trap noted in GraphOps2Spec)
    val l2 = pairCnt.filter(_._2 >= 2).keySet.toSet
    val triCnt = collection.mutable.Map.empty[(Long, Long, Long), Int]
    baskets.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length; k <- j + 1 until ps.length)
        if (l2((ps(i), ps(j))) && l2((ps(j), ps(k))) && l2((ps(i), ps(k))))
          triCnt((ps(i), ps(j), ps(k))) =
            triCnt.getOrElse((ps(i), ps(j), ps(k)), 0) + 1
    }
    val want = triCnt.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10)
      .map { case (k, n) => (k, n.toLong) }
    assert(out.toSeq == want, s"spark ${out.toSeq} vs driver $want")
    assert(out.nonEmpty)
  }

  test("q232 RRF scores recompute from the emitted ranks; lists bounded") {
    val rows = Q.byName("q232_rrf_fusion").fn(spark, sf()).collect()
    assert(rows.map(_.getLong(0)).distinct.sorted.toSeq == (0L to 4L))
    rows.foreach { r =>
      val rl = Option(r.get(r.fieldIndex("r_lex"))).map(_.asInstanceOf[Int])
      val rv = Option(r.get(r.fieldIndex("r_vec"))).map(_.asInstanceOf[Int])
      assert(rl.nonEmpty || rv.nonEmpty)
      rl.foreach(x => assert(x >= 1 && x <= 100))
      rv.foreach(x => assert(x >= 1 && x <= 100))
      val want = math.rint((rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)) * 1e6) / 1e6
      assert(r.getAs[Double]("rrf") == want)
    }
    // per query: exactly 5 fused results, ranks 1..5, rrf non-increasing
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val scores = sorted.map(_.getAs[Double]("rrf"))
      scores.sliding(2).foreach(w => assert(w(1) <= w(0)))
    }
  }

  test("q233 encoding equals a driver BPE train+apply (5 merges)") {
    val out = Q.byName("q233_bpe_apply").fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // driver Sennrich loop INCLUDING the final application
    var corpus = Tables.docs(spark, sf())
      .select(col("lang"), explode(graft.functions.Portable.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0),
        r.getString(1).toSeq.map(_.toString).toVector))
    for (_ <- 1 to 5) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { case (_, syms) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
      corpus = corpus.map { case (lang, syms) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += syms(i); i += 1 }
        }
        (lang, nb.result())
      }
    }
    val want = corpus.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong,
        xs.map(_._2.map(_.length).sum.toLong).sum,
        xs.map(_._2.length.toLong).sum)
    }.toMap
    assert(out == want, s"spark $out vs driver $want")
    out.foreach { case (_, (_, chars, syms)) => assert(syms <= chars) }
  }

  test("q234 equals a driver containment recompute over rare-anchor candidates") {
    val out = Q.byName("q234_containment_dedup").fn(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val docs = Tables.docs(spark, sf()).filter(col("lang") === "en")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    val sh = docs.filter(_._2.length >= 8).map { case (id, t) =>
      id -> t.sliding(8).toSet
    }
    val df = collection.mutable.Map.empty[String, Int]
    sh.foreach { case (_, gs) => gs.foreach(g => df(g) = df.getOrElse(g, 0) + 1) }
    val anchored = sh.map { case (id, gs) => id -> gs.filter(df(_) <= 10) }
    val want = (for {
      i <- anchored.indices; j <- i + 1 until anchored.length
      (ia, ga) = anchored(i); (ib, gb) = anchored(j)
      (a, b) = if (ia < ib) (ia, ib) else (ib, ia)
      if (ga & gb).nonEmpty
      c = (toks(a) & toks(b)).size.toDouble /
        math.min(toks(a).size, toks(b).size)
      if c >= 0.7
    } yield (a, b) -> math.rint(c * 1e6) / 1e6).toMap
    assert(out == want, s"spark ${out.size} pairs vs driver ${want.size}")
  }
}
