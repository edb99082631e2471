package graft

import org.apache.spark.sql.functions._

/** Driver recomputes for the round-7 warehouse-internals wave
  * (q242/q243/q245/q246).
  */
class WarehouseOpsSpec extends SparkSpec {

  private def h60(s: String): Long =
    graft.functions.Md5Long60.hashBytes(s.getBytes("UTF-8"))

  test("q242 zone map: driver recompute exact; clustered never scans more than shuffled") {
    val rows = Q.byName("q242_zone_map_pruning_audit").fn(spark, sf()).collect()
    assert(rows.length == 6, "2 layouts x 3 predicates")
    val li = Tables.t(spark, sf(), "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("l_linenumber")).toLong,
        r.getAs[java.time.LocalDateTime](2).toLocalDate))
    val n = li.length.toLong
    // NOTE (l_orderkey, l_linenumber) is NOT unique in these fixtures
    // (4599 distinct of 6000 rows at sf0.001) — zone stats must be
    // computed positionally over the sorted sequence, never through a
    // keyed map. Duplicate (shipdate, orderkey, linenumber) triples are
    // interchangeable under the rank's order, so per-zone min/max/count
    // stay engine-deterministic even though row_number itself isn't a
    // total order over them.
    val sorted = li.sortBy(t => (t._3.toEpochDay, t._1, t._2))
    val preds = Seq(
      ("p1_quarter", "1997-01-01", "1997-03-31"),
      ("p2_month", "1998-06-01", "1998-06-30"),
      ("p3_wide", "1995-07-01", "2000-12-31"))
      .map { case (p, lo, hi) =>
        (p, java.time.LocalDate.parse(lo), java.time.LocalDate.parse(hi)) }
    def zstats(assigned: Seq[(Long, java.time.LocalDate)]) =
      assigned.groupBy(_._1).map { case (z, rs) =>
        z -> (rs.map(_._2).min(Ordering.by((d: java.time.LocalDate) =>
          d.toEpochDay)),
          rs.map(_._2).max(Ordering.by((d: java.time.LocalDate) =>
            d.toEpochDay)),
          rs.length.toLong) }
    val layouts = Map(
      "clustered" -> zstats(sorted.zipWithIndex.map { case (t, i) =>
        (i.toLong * 64 / n, t._3) }.toSeq),
      "shuffled" -> zstats(li.map(t =>
        (math.floorMod(h60(s"zm:${t._1}:${t._2}"), 64L), t._3)).toSeq))
    for (r <- rows) {
      val (layout, pred) = (r.getString(0), r.getString(1))
      val (_, lo, hi) = preds.find(_._1 == pred).get
      val touched = layouts(layout).filter { case (_, (zlo, zhi, _)) =>
        !zlo.isAfter(hi) && !zhi.isBefore(lo) }
      val scanned = touched.values.map(_._3).sum
      val qual = li.count(t => !t._3.isBefore(lo) && !t._3.isAfter(hi)).toLong
      assert(r.getLong(r.fieldIndex("zones_touched")) == touched.size.toLong,
        s"$layout/$pred zones")
      assert(r.getLong(r.fieldIndex("rows_scanned")) == scanned, s"$layout/$pred scanned")
      assert(r.getLong(r.fieldIndex("rows_qual")) == qual, s"$layout/$pred qual")
      assert(scanned >= qual, "zone scan must cover all qualifying rows")
    }
    for ((_, lo, hi) <- preds) {
      def scanned(layout: String) = rows.find(r =>
        r.getString(0) == layout && r.getString(1) == preds.find(p =>
          p._2 == lo && p._3 == hi).get._1).get.getLong(3)
      assert(scanned("clustered") <= scanned("shuffled"),
        "sort clustering can only improve skipping on the sort key")
    }
  }

  test("q243 cascade: driver recompute exact; after + deleted == before; no orphans in fixture") {
    val rows = Q.byName("q243_cascade_delete_audit").fn(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    val cust = Tables.t(spark, sf(), "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    val orders = Tables.t(spark, sf(), "orders").select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lis = Tables.t(spark, sf(), "lineitem").select("l_orderkey")
      .collect().map(_.getLong(0))
    val forget = cust.filter(k => math.floorMod(h60(s"forget:$k"), 97L) == 0L).toSet
    val delOrders = orders.filter(o => forget(o._2)).map(_._1).toSet
    assert(forget.nonEmpty, "the ~1% cohort must be non-empty at sf0.001")
    assert(rows("1_customer").getLong(2) == forget.size.toLong)
    assert(rows("2_orders").getLong(2) == delOrders.size.toLong)
    assert(rows("3_lineitem").getLong(2) == lis.count(delOrders).toLong)
    rows.values.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), "before == deleted + after")
      assert(r.getLong(r.fieldIndex("orphans_before")) == 0L,
        "TPC-H fixtures are referentially intact")
    }
  }

  test("q245 sketch estimate is one-sided (est >= exact) and exact matches the driver") {
    val rows = Q.byName("q245_join_size_sketch").fn(spark, sf()).collect()
    assert(rows.length == 3)
    def keyCounts(t: String, k: String): Map[Long, Long] =
      Tables.t(spark, sf(), t).groupBy(col(k)).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Map(
      "lineitem_part" -> (keyCounts("lineitem", "l_partkey"),
        keyCounts("part", "p_partkey")),
      "lineitem_supplier" -> (keyCounts("lineitem", "l_suppkey"),
        keyCounts("supplier", "s_suppkey")),
      "orders_customer" -> (keyCounts("orders", "o_custkey"),
        keyCounts("customer", "c_custkey")))
    for (r <- rows) {
      val (a, b) = exact(r.getString(0))
      val truth = a.map { case (k, ca) => ca * b.getOrElse(k, 0L) }.sum
      assert(r.getLong(r.fieldIndex("exact")) == truth, s"${r.getString(0)} exact")
      assert(r.getLong(r.fieldIndex("est")) >= truth,
        "count-min inner product never underestimates")
      assert(r.getDouble(r.fieldIndex("rel_err")) >= 0.0)
    }
  }

  test("q246 hybrid routing never changes the answer: totals match the plain join") {
    val rows = Q.byName("q246_hybrid_skew_join").fn(spark, sf()).collect()
    val plain = Tables.t(spark, sf(), "orders")
      .join(Tables.t(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        graft.functions.Portable.moneySum(col("o_totalprice")).as("spend"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bySeg = rows.groupBy(_.getString(0))
    assert(bySeg.keySet == plain.keySet)
    for ((seg, rs) <- bySeg) {
      assert(rs.map(_.getLong(2)).sum == plain(seg)._1, s"$seg order count")
      val spend = rs.map(r => BigDecimal(r.getDouble(3))).sum
      assert((spend - BigDecimal(plain(seg)._2)).abs <= BigDecimal("0.02"),
        s"$seg spend (two independently rounded route totals vs one)")
    }
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("hot", "cold")))
  }

  test("q259 HRW moves only the new shard's wins; modulo moves most docs") {
    val rows = Q.byName("q259_shard_rebalance_audit").fn(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a_mod", "b_hrw"))
    val n = rows("a_mod").getLong(1).toDouble
    // the whole point of rendezvous hashing: ~1/9 moves vs ~8/9
    assert(rows("b_hrw").getLong(2) < rows("a_mod").getLong(2) / 4,
      "HRW must move far fewer docs than modulo")
    assert(math.abs(rows("b_hrw").getLong(2) / n - 1.0 / 9) < 0.05,
      "HRW moved fraction must sit near 1/9")
    // driver recompute: a doc moves under HRW iff shard 8 wins the
    // 9-way argmax — and then its new home IS shard 8
    val ids = Tables.docs(spark, sf()).select("doc_id").collect()
      .map(_.getLong(0))
    def h60(s: String): Long =
      graft.functions.Md5Long60.hashBytes(s.getBytes("UTF-8"))
    val moved = ids.count { id =>
      (0 to 8).maxBy(s => (h60(s"hrw:$s:$id"), s)) == 8
    }
    assert(rows("b_hrw").getLong(2) == moved.toLong,
      "HRW moved count must equal the argmax-wins recompute")
  }
}
