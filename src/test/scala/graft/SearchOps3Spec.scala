package graft

import org.apache.spark.sql.functions._

/** Driver recomputes for the ANN-construction and retrieval waves
  * (q244/q247 round 7; q254/q258/q263 round 8).
  */
class SearchOps3Spec extends SparkSpec {

  private def h60(s: String): Long =
    graft.functions.Md5Long60.hashBytes(s.getBytes("UTF-8"))

  private def vecs(): Array[(Long, Array[Float])] =
    Tables.t(spark, sf(), "embeddings").select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q244 one NN-descent round: recall equals the driver's recompute and never drops") {
    val rows = Q.byName("q244_nn_descent_round").fn(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a_seed", "b_refined"))
    val vs = vecs()
    val n = vs.length
    // blocks of 64 in portable-hash order
    val order = vs.map(_._1).sortBy(id => (h60(s"nnd:$id"), id))
    val blkOf = order.zipWithIndex.map { case (id, i) => id -> (i / 64) }.toMap
    val byId = vs.toMap
    def topk(cands: Map[Long, Set[Long]]): Map[Long, Seq[Long]] =
      cands.map { case (node, nbrs) =>
        node -> nbrs.toSeq
          .map(b => (b, cos(byId(node), byId(b))))
          .sortBy { case (b, c) => (-c, b) }.take(5).map(_._1)
      }
    val seedCand = vs.map { case (id, _) =>
      id -> vs.map(_._1).filter(o => o != id && blkOf(o) == blkOf(id)).toSet
    }.toMap
    val seed = topk(seedCand)
    val undirected = seed.toSeq.flatMap { case (a, bs) =>
      bs.flatMap(b => Seq(a -> b, b -> a)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val twoHop = undirected.map { case (a, bs) =>
      a -> (bs.flatMap(b => undirected.getOrElse(b, Set.empty)) - a)
    }
    val refined = topk(vs.map { case (id, _) =>
      id -> (seed(id).toSet ++ twoHop.getOrElse(id, Set.empty))
    }.toMap)
    val gt = topk(vs.map { case (id, _) =>
      id -> (vs.map(_._1).toSet - id) }.toMap)
    val probes = vs.map(_._1).filter(_ < 40)
    def recall(g: Map[Long, Seq[Long]]): Double = {
      val hits = probes.map(p => (g(p).toSet & gt(p).toSet).size).sum
      BigDecimal(hits.toDouble / (5.0 * probes.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // a node can only keep min(5, blockSize-1) seed edges — a fixture
    // size with n % 64 in 1..5 leaves the trailing block short
    // (ADVICE r7 #4), so the expected count is block-size-aware
    val expectedSeed = order.indices.groupBy(_ / 64).values
      .map(b => b.size.toLong * math.min(5, b.size - 1)).sum
    assert(rows("a_seed").getLong(1) == expectedSeed,
      "every node keeps min(5, blockSize-1) seed edges")
    assert(rows("b_refined").getLong(1) >= expectedSeed &&
      rows("b_refined").getLong(1) <= 5L * n,
      "refinement can only add candidates, capped at 5 per node")
    assert(rows("a_seed").getDouble(2) == recall(seed), "seed recall")
    assert(rows("b_refined").getDouble(2) == recall(refined), "refined recall")
    assert(rows("b_refined").getDouble(2) >= rows("a_seed").getDouble(2),
      "keeping top-5 of old ∪ new can never lose recall under the shared tie order")
  }

  test("q254 descent converges: recall monotone, n_new decays, salts differ") {
    val rows = Q.byName("q254_nn_descent_converged").fn(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("r0_seed", "r1_descent", "r2_descent"))
    val rec = Seq("r0_seed", "r1_descent", "r2_descent")
      .map(p => rows(p).getDouble(3))
    assert(rec == rec.sorted,
      "keeping top-5 of old ∪ new can never lose recall under the shared tie order")
    val nNew = Seq("r0_seed", "r1_descent", "r2_descent")
      .map(p => rows(p).getLong(2))
    // the convergence signature on the deterministic fixtures: each
    // round changes FEWER edges than the last, and descent actually
    // finds cross-salt candidates (a single-salt seed is closed under
    // 2-hop and would leave n_new at 0 — the q244 design note)
    assert(nNew(1) > 0, "two-salt seed must leave room for descent")
    assert(nNew(2) < nNew(1), s"n_new must decay: $nNew")
    assert(rec(2) > rec(0), s"descent must gain recall over the seed: $rec")
    // edge count can only grow (nodes with short seed candidate
    // lists gain edges; nobody loses one)
    val ne = Seq("r0_seed", "r1_descent", "r2_descent")
      .map(p => rows(p).getLong(1))
    assert(ne == ne.sorted && ne.last <= 5L * vecs().length)
  }

  test("q247 sign words, hamming pre-rank, and recall match the driver") {
    val rows = Q.byName("q247_binary_sign_retrieval").fn(spark, sf()).collect()
    val vs = vecs()
    val byId = vs.toMap
    def words(v: Array[Float]): (Long, Long) = {
      def w(off: Int) = (0 to 31).map(b =>
        if (v(b + off) >= 0) 1L << b else 0L).sum
      (w(0), w(32))
    }
    val qs = vs.filter(_._1 < 10)
    val corpus = vs.filter(_._1 >= 10)
    val expected = qs.flatMap { case (qid, qv) =>
      val (q0, q1) = words(qv)
      val cand = corpus.map { case (cid, cv) =>
        val (c0, c1) = words(cv)
        (cid, java.lang.Long.bitCount(c0 ^ q0) + java.lang.Long.bitCount(c1 ^ q1))
      }.sortBy { case (cid, hd) => (hd, cid) }.take(32)
      val rr = cand.map { case (cid, hd) => (cid, hd, cos(qv, byId(cid))) }
        .sortBy { case (cid, _, c) => (-c, cid) }.take(5)
      val gt = corpus.map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(5).map(_._1).toSet
      val recall = rr.count(t => gt(t._1)).toDouble / 5.0
      rr.zipWithIndex.map { case ((cid, hd, c), i) =>
        (qid, i + 1, cid, hd, c, recall) }
    }
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (qid, rank, cid, hd, c, rec)) =>
      assert(r.getLong(0) == qid && r.getInt(1) == rank &&
        r.getLong(2) == cid, s"row order for q$qid rank $rank")
      assert(r.getInt(r.fieldIndex("hamming")) == hd)
      assert(r.getDouble(r.fieldIndex("cos")) == c)
      assert(r.getDouble(r.fieldIndex("recall5")) == rec)
    }
  }

  test("q263 MaxSim equals a driver recompute in exact scaled integers") {
    val rows = Q.byName("q263_late_interaction_maxsim").fn(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val vs = vecs()
    def sub(v: Array[Float], t: Int): Array[Float] =
      v.slice(t * 8, t * 8 + 8)
    def e6(a: Array[Float], b: Array[Float]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val c = BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (c * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val byId = vs.toMap
    val want = vs.map(_._1).filter(_ < 8).flatMap { q =>
      val scores = vs.filter(_._1 != q).map { case (d, dv) =>
        val ms = (0 to 7).map(t =>
          (0 to 7).map(u => e6(sub(byId(q), t), sub(dv, u))).max).sum
        (d, ms)
      }.sortBy { case (d, ms) => (-ms, d) }.take(5)
      scores.zipWithIndex.map { case ((d, ms), i) => (q, i + 1, d, ms) }
    }
    assert(rows.toSeq == want.toSeq,
      s"MaxSim diverged: got ${rows.take(3).toSeq} want ${want.take(3).toSeq}")
  }

  test("q265 cascade: candidates, ranks, and recall equal the driver") {
    val rows = Q.byName("q265_cascade_ann_maxsim").fn(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val vs = vecs()
    val byId = vs.toMap
    def sub(v: Array[Float], t: Int): Array[Float] =
      v.slice(t * 8, t * 8 + 8)
    def e6(a: Array[Float], b: Array[Float]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val c = BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (c * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    def maxsim(q: Array[Float], d: Array[Float]): Long =
      (0 to 7).map(t => (0 to 7).map(u => e6(sub(q, t), sub(d, u))).max).sum
    // tokBucket twin: 8 md5 "tp:" planes over the 8 sub-vector dims
    val planes = (0 to 7).map { p =>
      (1 to 8).map(d => (h60(s"tp:$p:$d") % 2001 - 1000) / 1000.0).toArray
    }
    def buckets(v: Array[Float]): Set[Long] =
      (0 to 7).map { t =>
        val sv = sub(v, t)
        planes.zipWithIndex.map { case (w, p) =>
          var s = 0.0; var i = 0
          while (i < 8) { s += sv(i).toDouble * w(i); i += 1 }
          if (s >= 0) 1L << p else 0L
        }.sum
      }.toSet
    val want = vs.map(_._1).filter(_ < 8).sorted.flatMap { q =>
      val qb = buckets(byId(q))
      val cand = vs.filter { case (d, dv) =>
        d != q && buckets(dv).exists(qb) }.map(_._1)
      val exactTop = vs.filter(_._1 != q)
        .map { case (d, dv) => (d, maxsim(byId(q), dv)) }
        .sortBy { case (d, ms) => (-ms, d) }.take(5).map(_._1).toSet
      val atop = cand.map(d => (d, maxsim(byId(q), byId(d))))
        .sortBy { case (d, ms) => (-ms, d) }.take(5)
      val recall = atop.count { case (d, _) => exactTop(d) } / 5.0
      atop.zipWithIndex.map { case ((d, ms), i) =>
        (q, i + 1, d, ms, cand.length.toLong, recall) }
    }
    assert(rows.toSeq == want.toSeq,
      s"cascade diverged: got ${rows.take(3).toSeq} want ${want.take(3).toSeq}")
    // the audit must be live: the index finds some of the true top-5
    // but (being an 8-bit token filter) not everything everywhere
    assert(rows.map(_._6).sum > 0, "cascade recall must be non-zero")
    assert(rows.forall(r => r._5 < vs.length - 1),
      "candidate stage must actually filter the corpus")
  }
}
