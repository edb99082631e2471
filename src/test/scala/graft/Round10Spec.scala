package graft

import org.apache.spark.sql.functions._

/** Driver recomputations + invariants for the round-10 wave:
  * q271 brand modularity, q272 l-diversity, q273 PSI,
  * q274 water-filling, q275 Adamic–Adar.
  */
class Round10Spec extends SparkSpec {

  private def coPairs: Array[(Long, Long)] = {
    val items = Tables.t(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toArray.distinct
  }

  test("q271 modularity equals a driver recompute and sums structurally") {
    val out = Q.byName("q271_brand_modularity").fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pairs = coPairs
    val brand = Tables.t(spark, sf(), "part")
      .select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = pairs.length.toDouble
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dSum = deg.toSeq.groupBy { case (n, _) => brand(n) }
      .view.mapValues(_.map(_._2).sum).toMap
    val lIn = pairs.filter { case (x, y) => brand(x) == brand(y) }
      .groupBy { case (x, _) => brand(x) }.view.mapValues(_.length.toLong).toMap
    // every brand's exact integers must match; contribution to 1e-8
    for ((b, l, d, q) <- out) {
      assert(l == lIn.getOrElse(b, 0L), s"$b l_in")
      assert(d == dSum(b), s"$b d_sum")
      val want = l / m - math.pow(d / (2 * m), 2)
      assert(math.abs(q - want) < 1e-7, s"$b q_contrib $q vs $want")
    }
    // partition identities: Σ D_c = 2m, Σ L_c ≤ m
    assert(out.map(_._3).sum == 2 * pairs.length)
    assert(out.map(_._2).sum <= pairs.length)
  }

  test("q275 Adamic–Adar equals a driver recompute of the top-20") {
    val out = Q.byName("q275_adamic_adar_links").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val items = Tables.t(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // integer-exact semantics (r11): per-order weight is the scaled
    // long round(1e12/ln(bsz)), summed exactly; the ordered cut ranks
    // the exact sum; display score = one final divide + round
    val scored = items.groupBy(_._1).values.filter(_.size >= 2).flatMap { b =>
      val ws = math.round(1e12 / math.log(b.size))
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield ((ps(i), ps(j)), ws)
    }.toSeq.groupBy(_._1).view
      .mapValues(ws => (ws.size.toLong, ws.map(w => BigInt(w._2)).sum)).toSeq
      .sortBy { case ((x, y), (_, aa)) => (-aa, x, y) }.take(20)
      .map { case ((x, y), (n, aa)) =>
        (x, y, n, BigDecimal(aa.toDouble / 1e12)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(out.toSeq == scored, s"spark ${out.take(3).toSeq} vs driver ${scored.take(3)}")
  }

  test("q272 entropy l-diversity is consistent and strictly stronger than distinct-l") {
    val out = Q.byName("q272_l_diversity_audit").fn(spark, sf()).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, l, h) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      val (dOk, eOk) = (r.getBoolean(5), r.getBoolean(6))
      assert(l >= 1 && l <= n)
      // 0 ≤ H ≤ ln(l_distinct): entropy is maximal for the uniform law
      assert(h >= -1e-9 && h <= math.log(l.toDouble) + 1e-6, s"H=$h l=$l")
      assert(dOk == (l >= 3))
      // entropy l-diversity ⇒ distinct l-diversity, never the reverse
      if (eOk) assert(dOk, s"entropy-ok group must be distinct-ok: $r")
    }
  }

  test("q273 PSI contributions are nonnegative on a full 12-bin spine") {
    val out = Q.byName("q273_psi_release_drift").fn(spark, sf()).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L to 11L),
      "exactly one row per band, in order")
    val (pb, pn) = (out.map(_.getDouble(3)).sum, out.map(_.getDouble(4)).sum)
    assert(math.abs(pb - 1.0) < 1e-4 && math.abs(pn - 1.0) < 1e-4,
      s"smoothed masses must each sum to 1: $pb / $pn")
    // (p−q)·ln(p/q) ≥ 0 pointwise — a negative contribution is a math bug
    assert(out.forall(_.getDouble(5) >= -1e-12))
  }

  test("q274 water-filling funds the budget exactly with a max-min fair level") {
    val out = Q.byName("q274_token_budget_waterfill").fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val total = out.map(_._2).sum
    val budget = total * 3 / 5
    val allocSum = out.map(_._3).sum
    // Σ min(avail, t) = B up to the per-row 1e-4 rounding
    assert(math.abs(allocSum - budget) < 1e-4 * out.length + 1e-6,
      s"allocations $allocSum must fund the budget $budget")
    for ((src, avail, alloc, capped) <- out) {
      assert(alloc <= avail + 1e-6, s"$src overfunded")
      if (capped) assert(alloc == avail.toDouble, s"$src capped ⇒ fully funded")
    }
    // uncapped sources all sit AT the water level (max-min fairness)
    val levels = out.filterNot(_._4).map(_._3).distinct
    assert(levels.length <= 1, s"one water level, got $levels")
    // and the level exceeds every capped source's availability
    if (levels.nonEmpty)
      assert(out.filter(_._4).forall(_._2 <= levels.head + 1e-6))
  }

  test("q276 nDCG equals a driver recompute and respects its bounds") {
    val out = Q.byName("q276_ndcg_retrieval_eval").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.length == 10)
    for ((qid, n2, n1, dcg, idcg, ndcg) <- out) {
      assert(dcg <= idcg + 1e-9, s"q$qid dcg>idcg")
      assert(ndcg > 0 && ndcg <= 1.0 + 1e-9, s"q$qid ndcg=$ndcg")
      // idcg closed form: n2 twos then n1 ones down the 10-rank spine
      val want = (1 to 10).map { r =>
        val rel = if (r <= n2) 2 else if (r <= n2 + n1) 1 else 0
        (math.pow(2, rel) - 1) / (math.log(r + 1) / math.log(2))
      }.sum
      assert(math.abs(idcg - want) < 1e-5, s"q$qid idcg $idcg vs $want")
    }
  }

  test("q277 FD histogram partitions the table with the Freedman-Diaconis width") {
    val out = Q.byName("q277_fd_histogram").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cents = Tables.t(spark, sf(), "orders")
      .select((col("o_totalprice").cast("decimal(18,4)") * 100)
        .cast("long").as("c")).collect().map(_.getLong(0)).sorted
    val n = cents.length
    // type-1 quartiles + the FD width, recomputed on the driver
    val (q1, q3) = (cents(math.ceil(0.25 * n).toInt - 1),
      cents(math.ceil(0.75 * n).toInt - 1))
    val w = math.max(1L, math.ceil(2.0 * (q3 - q1) / math.pow(n, 1.0 / 3)).toLong)
    assert(out.forall { case (_, lo, hi, _) => hi - lo == w },
      s"every bin must be the FD width $w")
    assert(out.map(_._4).sum == n, "bins must partition the table")
    val byBin = cents.groupBy(c => (c - cents.head) / w).view.mapValues(_.length.toLong)
    assert(out.forall { case (b, _, _, cnt) => byBin(b) == cnt },
      "per-bin counts must match a driver recount")
  }

  test("q278 correlations equal an exact-moment driver recompute") {
    val row = Q.byName("q278_feature_correlations").fn(spark, sf()).collect()(0)
    val feats = Tables.t(spark, sf(), "lineitem")
      .select(col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(18,4)") * 100).cast("long").as("p"),
        (col("l_discount").cast("decimal(18,4)") * 10000).cast("long").as("d"),
        (col("l_tax").cast("decimal(18,4)") * 10000).cast("long").as("t"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = BigInt(feats.length)
    def s(i: Int) = feats.map(r => BigInt(r(i))).sum
    def sxy(i: Int, j: Int) = feats.map(r => BigInt(r(i)) * BigInt(r(j))).sum
    val idx = Map("q" -> 0, "p" -> 1, "d" -> 2, "t" -> 3)
    val pairs = Seq("q" -> "p", "q" -> "d", "q" -> "t", "p" -> "d", "p" -> "t", "d" -> "t")
    pairs.zipWithIndex.foreach { case ((a, b), k) =>
      val (i, j) = (idx(a), idx(b))
      val want = (n * sxy(i, j) - s(i) * s(j)).toDouble /
        math.sqrt((n * sxy(i, i) - s(i) * s(i)).toDouble *
          (n * sxy(j, j) - s(j) * s(j)).toDouble)
      val got = row.getDouble(k)
      assert(math.abs(got) <= 1.0 + 1e-9, s"corr_${a}_$b out of range")
      assert(math.abs(got - want) < 1e-5, s"corr_${a}_$b $got vs $want")
    }
  }

  test("q279 bitmap merge equals exact distincts and bounds compose") {
    val out = Q.byName("q279_bitmap_distinct_view_maintenance").fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rows = Tables.t(spark, sf(), "orders")
      .select(col("o_orderpriority"), col("o_custkey"),
        (col("o_orderdate") < to_date(lit("1997-07-01"))).as("is_snap"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val byPr = rows.groupBy(_._1)
    assert(out.map(_._1).toSeq == byPr.keys.toSeq.sorted)
    for ((pr, ns, nd, nm, nb) <- out) {
      val g = byPr(pr)
      assert(ns == g.filter(_._3).map(_._2).distinct.length, s"$pr n_snap")
      assert(nd == g.filterNot(_._3).map(_._2).distinct.length, s"$pr n_delta")
      assert(nm == g.map(_._2).distinct.length, s"$pr merged != exact distinct")
      // set-union bounds: max(halves) ≤ merged ≤ snap + delta
      assert(nm >= math.max(ns, nd) && nm <= ns + nd, s"$pr bounds")
      assert(nb == g.map(v => Math.floorDiv(v._2 - 1, 32768L)).distinct.length,
        s"$pr state bucket count")
    }
  }

  /** Driver twin of the Portable 60-bit md5 hash. */
  private def md5_60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q280 shard shuffle balances and interleaves per a driver recount") {
    val out = Q.byName("q280_seeded_shard_shuffle").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.docs(spark, sf()).select("doc_id", "source")
      .collect().map(r => (md5_60(s"shuf1:${r.getLong(0)}") >> 56, r.getString(1)))
    val total = docs.length.toLong
    assert(out.map(_._2).sum == total, "shards must partition the corpus")
    val bpGlobal = docs.groupBy(_._2).view
      .mapValues(_.length * 10000L / total).toMap
    for ((shard, nDocs, shareBp, maxDev) <- out) {
      val inShard = docs.filter(_._1 == shard)
      assert(nDocs == inShard.length, s"shard $shard count")
      assert(shareBp == nDocs * 10000L / total)
      val want = bpGlobal.map { case (src, g) =>
        math.abs(inShard.count(_._2 == src) * 10000L / nDocs - g)
      }.max
      assert(maxDev == want, s"shard $shard dev $maxDev vs $want")
    }
  }

  test("q281 consistent hashing moves only successor-stolen keys, all to the new shard") {
    val row = Q.byName("q281_consistent_hash_rebalance").fn(spark, sf()).collect()(0)
    val (nKeys, movedMod, movedCh) =
      (row.getLong(0), row.getLong(1), row.getLong(3))
    def ring(shards: Int) = (0 until shards * 8)
      .map(v => (v / 8).toLong -> md5_60(s"ring:${v / 8}:${v % 8}"))
    def assignCh(hk: Long, r: Seq[(Long, Long)]): Long = {
      val succ = r.filter(_._2 >= hk)
      (if (succ.nonEmpty) succ.minBy(_._2) else r.minBy(_._2))._1
    }
    val keys = Tables.t(spark, sf(), "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    assert(nKeys == keys.length)
    val (rOld, rNew) = (ring(16), ring(17))
    val moves = keys.map(ck => (assignCh(md5_60(s"key:$ck"), rOld),
      assignCh(md5_60(s"key:$ck"), rNew)))
    assert(movedCh == moves.count { case (a, b) => a != b })
    // every consistent-hash move is a steal BY the new shard
    assert(moves.filter { case (a, b) => a != b }.forall(_._2 == 16L),
      "a key may only move to the added shard")
    assert(movedMod == keys.count(ck => ck % 16 != ck % 17))
    // and the headline claim: CH moves a small fraction, mod nearly all
    assert(movedCh * 100 <= nKeys * 25, s"CH moved $movedCh of $nKeys")
    assert(movedMod * 100 >= nKeys * 75, s"mod moved only $movedMod of $nKeys")
  }
}
