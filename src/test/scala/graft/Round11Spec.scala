package graft

import org.apache.spark.sql.functions._

/** Independent driver recomputations for the round-11 additions:
  * q282 t-closeness, q283 ECE/reliability, q284 kNN-distance
  * outliers, q285 tokenizer fertility.
  */
class Round11Spec extends SparkSpec {

  test("q282 t-closeness equals a BigInt EMD recompute and is bounded") {
    val out = Q.byName("q282_t_closeness_audit").fn(spark, sf()).collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val cells = Tables.t(spark, sf(), "orders")
      .join(Tables.t(spark, sf(), "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getString(1)),
        r.getString(2), r.getLong(3)))
    val sensRanks = cells.map(_._2).distinct.sorted
    val m = sensRanks.length
    val bigN = cells.map(_._3).sum
    val gCum = sensRanks.scanLeft(0L)((acc, sv) =>
      acc + cells.filter(_._2 == sv).map(_._3).sum).tail
    val groups = cells.groupBy(_._1)
    assert(out.size == groups.size, "one row per QI group")
    for ((qi, members) <- groups) {
      val n = members.map(_._3).sum
      val cCum = sensRanks.scanLeft(0L)((acc, sv) =>
        acc + members.filter(_._2 == sv).map(_._3).sum).tail
      val emdNum = cCum.zip(gCum)
        .map { case (c, g) => (BigInt(c) * bigN - BigInt(g) * n).abs }.sum
      val t = BigDecimal(
        emdNum.toDouble / (n.toDouble * bigN.toDouble * (m - 1)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (on, ot, ok) = out(qi)
      assert(on == n, s"$qi n")
      assert(ot == t, s"$qi t_emd $ot vs $t")
      assert(ok == (t <= 0.2))
      assert(t >= 0.0 && t <= 1.0, s"$qi t out of range: $t")
    }
  }

  test("q282 t is zero for a group distributed exactly like the corpus") {
    // synthetic sanity on the formula itself (not the fixtures): a
    // group that IS the corpus has EMD 0; a group concentrated on
    // the extreme rank of a two-value corpus splits the mass —
    // recompute the closed form directly
    def emd(group: Seq[Long], global: Seq[Long]): Double = {
      val n = group.sum; val bigN = global.sum; val m = group.length
      val cCum = group.scanLeft(0L)(_ + _).tail
      val gCum = global.scanLeft(0L)(_ + _).tail
      cCum.zip(gCum).map { case (c, g) => (BigInt(c) * bigN - BigInt(g) * n).abs }
        .sum.toDouble / (n.toDouble * bigN.toDouble * (m - 1))
    }
    assert(emd(Seq(3L, 7L), Seq(30L, 70L)) == 0.0)
    assert(math.abs(emd(Seq(10L, 0L), Seq(10L, 10L)) - 0.5) < 1e-12)
    assert(math.abs(emd(Seq(0L, 10L), Seq(10L, 0L)) - 1.0) < 1e-12)
  }

  test("q283 reliability bins equal a driver recompute and ECE sums to [0,1]") {
    val out = Q.byName("q283_ece_reliability").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // per-doc (pm, pos) via the same engine-exact score q191 pins;
    // the bin/spine/ECE arithmetic is what this recomputes
    val pm = Tables.docs(spark, sf())
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.Portable.tokens(col("text"))).as("tok"))
      .withColumn("w",
        (pmod(graft.functions.Portable.md5Long(col("tok")), lit(64)) * 37 + 11) % 97 - 48)
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("wsum"))
      .select(
        (round(round(col("wsum").cast("double") /
          (col("n_toks").cast("double") * 97.0), 6) * 1e6, 0).cast("long")
          + 500000L).as("pm"),
        (col("lang") === "en").cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bigNAll = pm.length.toLong
    assert(out.map(_._2).sum == bigNAll, "bins must partition the corpus")
    assert(out.map(_._1).toSeq == (0L to 9L), "full 10-bin spine in order")
    val ece = out.map(_._6).sum
    assert(ece >= 0.0 && ece <= 1.0, s"ECE out of range: $ece")
    for ((bin, n, nPos, conf, acc, contrib) <- out) {
      val members = pm.filter(d => math.min(d._1 / 100000L, 9L) == bin)
      assert(n == members.length, s"bin $bin n")
      assert(nPos == members.map(_._2).sum, s"bin $bin n_pos")
      val pmSum = members.map(_._1).sum
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (n > 0) {
        assert(conf == r6(pmSum.toDouble / (n * 1e6)), s"bin $bin conf")
        assert(acc == r6(nPos.toDouble / n), s"bin $bin acc")
      } else assert(conf == 0.0 && acc == 0.0)
      val want = BigDecimal((BigInt(pmSum) - BigInt(nPos) * 1000000L).abs.toDouble
        / (bigNAll.toDouble * 1e6))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(contrib == want, s"bin $bin contrib $contrib vs $want")
    }
  }

  test("q284 outliers equal a driver within-cell kNN recompute") {
    val out = Q.byName("q284_knn_distance_outliers").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val assigned = graft.pipeline.SemDeDup
      .cellAssign(Tables.t(spark, sf(), "embeddings"))
      .select("vec_id", "cell", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def d2i(a: Array[Float], b: Array[Float]): Long = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      val r6 = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(r6 * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val scored = assigned.groupBy(_._2).values.flatMap { cell =>
      // singleton-cell points have no within-cell neighbor and are
      // excluded by the query in both engines (see q284 scaladoc) —
      // guard here too, or a fixture with a 1-point cell divides 0/0
      cell.flatMap { case (va, c, ea) =>
        val nn = cell.filter(_._1 != va)
          .map { case (vb, _, eb) => (d2i(ea, eb), vb) }
          .sorted.take(5)
        if (nn.isEmpty) None
        else Some((va, c, nn.length.toLong,
          BigDecimal(nn.map(x => BigInt(x._1)).sum.toDouble / (nn.length * 1e6))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toSeq.sortBy { case (v, _, _, sc) => (-sc, v) }.take(20)
    assert(out.toSeq == scored,
      s"spark ${out.take(3).toSeq} vs driver ${scored.take(3)}")
  }

  test("q285 fertility ratios equal a driver recompute and are >= 1 here") {
    val out = Q.byName("q285_tokenizer_fertility").fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val perDoc = Tables.docs(spark, sf())
      .select(col("lang"),
        size(graft.functions.Portable.tokens(col("text"))).cast("long").as("w"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0)"))
          .cast("long").as("t"),
        octet_length(col("text")).cast("long").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((lang, nDocs, words, toks, bytes, fert, bpt) <- out) {
      val docs = perDoc.filter(_._1 == lang)
      assert(nDocs == docs.length && words == docs.map(_._2).sum &&
        toks == docs.map(_._3).sum && bytes == docs.map(_._4).sum, s"$lang sums")
      assert(fert == r6(toks.toDouble / words), s"$lang fertility")
      assert(bpt == r6(bytes.toDouble / toks), s"$lang bytes/token")
      // every whitespace word contributes >= 1 pre-token, and
      // punctuation adds more — on text fixtures fertility >= 1
      assert(fert >= 1.0, s"$lang fertility $fert < 1")
    }
  }
}
