package graft

import org.apache.spark.sql.functions._

/** Driver recomputes for the round-7 sketch wave (q250/q251/q252). */
class SketchOpsSpec extends SparkSpec {

  test("q250 join-order: exact costs recompute; CMS estimate is one-sided") {
    val out = Q.byName("q250_join_order_from_sketches").fn(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4)))
    assert(out.length == 6)
    val li = Tables.t(spark, sf(), "lineitem")
      .select("l_partkey", "l_suppkey", "l_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pk = Tables.t(spark, sf(), "part").filter(col("p_size") < 15)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val sk = Tables.t(spark, sf(), "supplier").filter(col("s_nationkey") < 10)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val ok = Tables.t(spark, sf(), "orders")
      .filter(col("o_orderpriority") < "4")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    def c1(d: Char): Long = li.count { case (p, s, o) =>
      d match { case 'p' => pk(p); case 's' => sk(s); case _ => ok(o) } }
    def c2(d1: Char, d2: Char): Long = li.count { case (p, s, o) =>
      Seq(d1, d2).forall {
        case 'p' => pk(p); case 's' => sk(s); case _ => ok(o) } }
    val dimOf = Map("part" -> 'p', "supplier" -> 's', "orders" -> 'o')
    for ((order, est, exact, _, _) <- out) {
      val Array(d1, d2, _) = order.split(">").map(dimOf)
      assert(exact == c1(d1) + c2(d1, d2), order)
      // Cormode-Muthukrishnan inner product over-estimates, never under
      assert(est >= c1(d1), s"$order est1 one-sided")
    }
    // exact_rank column really ranks exact_cost
    val byExact = out.sortBy(t => (t._3, t._1)).map(_._1)
    for ((o, i) <- byExact.zipWithIndex)
      assert(out.find(_._1 == o).get._5 == i + 1, s"$o exact_rank")
  }

  test("q251 rolling HLL: exact side recomputes; every estimate in band") {
    val out = Q.byName("q251_rolling_distinct_hll").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val act = Tables.events(spark, sf())
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val days = act.map(_._2)
    for ((d, wau, okFlag) <- out) {
      val exact = act.filter { case (_, day) => day >= d - 6 && day <= d }
        .map(_._1).size
      assert(wau == exact.toLong, s"day $d")
      assert(okFlag, s"day $d estimate out of band")
    }
    assert(out.map(_._1).toSet == days)
  }

  test("q252 vocab overlap: exact intersections recompute; estimates in band") {
    val out = Q.byName("q252_vocab_overlap_hll").fn(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val st = Tables.t(spark, sf(), "documents").select("source", "text")
      .collect()
      .flatMap { r =>
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (r.getString(0), t))
      }.toSet
    val vocab = st.groupBy(_._1).map { case (s, ts) => s -> ts.size.toLong }
    val sources = vocab.keys.toSeq.sorted
    val pairs = for {
      i <- sources.indices; j <- i + 1 until sources.length
    } yield (sources(i), sources(j))
    assert(out.keySet == pairs.toSet)
    for ((a, b) <- pairs) {
      val (va, vb, inter, okFlag) = out((a, b))
      assert(va == vocab(a) && vb == vocab(b), s"$a/$b vocab")
      val ex = st.filter(_._1 == a).map(_._2)
        .intersect(st.filter(_._1 == b).map(_._2)).size.toLong
      assert(inter == ex, s"$a/$b intersection")
      assert(okFlag, s"$a/$b estimate out of band")
    }
  }

  test("q255 IVM: both sketch paths in band, merge tracks recompute within 2%") {
    val rows = Q.byName("q255_hll_view_maintenance").fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    // r11 revision: estimate EQUALITY across merge topologies is not
    // a DataSketches invariant past sparse mode (see the q255
    // scaladoc), so the hash-gated columns bound each path against
    // exact, and the TIGHT cross-path agreement is pinned here with
    // a tolerance the hash gate cannot express
    assert(rows.forall(_.getBoolean(4)), "merged estimate out of the 8% band")
    assert(rows.forall(_.getBoolean(5)), "full estimate out of the 8% band")
    val cut = to_date(lit("1997-07-01"))
    val keyed = Tables.t(spark, sf(), "orders")
      .select(col("o_custkey"), col("o_orderdate"))
      .join(Tables.t(spark, sf(), "customer")
        .join(Tables.t(spark, sf(), "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("o_year"),
        col("o_custkey"), (col("o_orderdate") < cut).as("is_snap"))
    val est = keyed.groupBy("n_name", "o_year", "is_snap")
      .agg(expr("hll_sketch_agg(o_custkey, 12)").as("sk"))
      .groupBy("n_name", "o_year")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("m"))
      .join(keyed.groupBy("n_name", "o_year")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))").as("f"),
          countDistinct(col("o_custkey")).as("ex")),
        Seq("n_name", "o_year"))
      .collect()
    for (r <- est) {
      val (m, f, ex) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.abs(m - f) <= math.max(math.round(ex * 0.02), 3L),
        s"${r.getString(0)}/${r.getInt(1)}: merged $m vs full $f drifted >2% of $ex")
    }
    val parts = rows.map(_.getInt(3)).toSet
    assert(parts == Set(1, 2),
      "fixture must contain snapshot-only/delta-only keys AND spanning keys " +
        s"or the merge path is untested (got n_parts values $parts)")
    // exact distinct per key matches a driver recompute
    val want = {
      val nat = Tables.t(spark, sf(), "customer")
        .join(Tables.t(spark, sf(), "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      Tables.t(spark, sf(), "orders").select("o_custkey", "o_orderdate")
        .collect()
        .map(r => ((nat(r.getLong(0)), r.get(1) match {
          case d: java.time.LocalDateTime => d.getYear
          case d: java.time.LocalDate => d.getYear
          case d: java.sql.Date => d.toLocalDate.getYear
        }), r.getLong(0)))
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.length }
    }
    for (r <- rows)
      assert(r.getLong(2) == want((r.getString(0), r.getInt(1))),
        s"exact distinct for ${r.getString(0)}/${r.getInt(1)}")
  }
}
