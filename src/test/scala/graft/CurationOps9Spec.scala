package graft

import org.apache.spark.sql.functions._

/** Driver recomputes for the round-7 second wave (q238/q239/q240). */
class CurationOps9Spec extends SparkSpec {

  test("q238 pairs straddle splits and are a subset of brute-force cross-split near-dups") {
    val rows = Q.byName("q238_cross_split_contamination").fn(spark, sf()).collect()
    rows.foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      assert(lo != hi, s"pair ($lo,$hi) must straddle the split")
      assert(Set("train", "valid", "test")(lo) && Set("train", "valid", "test")(hi))
      assert(r.getLong(r.fieldIndex("n_contaminated")) <=
        r.getLong(r.fieldIndex("n_pairs")))
    }
    // brute force: every doc pair's exact token-set Jaccard; the LSH
    // operator's per-split-pair totals can never exceed what exists
    val docs = Tables.docs(spark, sf()).filter(col("lang") === "en")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "\\s+".r.split(r.getString(1)).filter(_.nonEmpty).toSet)
    def stage(id: Long): Int = {
      val b = graft.functions.Md5Long60.hashBytes(s"split:$id".getBytes("UTF-8")) % 10
      if (b < 8) 0 else if (b == 8) 1 else 2
    }
    val brute = (for {
      (a, ta) <- docs; (bid, tb) <- docs
      if a < bid && stage(a) != stage(bid)
      c = (ta & tb).size.toDouble
      if c / (ta.size + tb.size - c) >= 0.8
    } yield (stage(a) min stage(bid), stage(a) max stage(bid)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val names = Vector("train", "valid", "test")
    rows.foreach { r =>
      val k = (names.indexOf(r.getString(0)), names.indexOf(r.getString(1)))
      assert(r.getLong(r.fieldIndex("n_pairs")) <= brute.getOrElse(k, 0L),
        s"LSH-verified pairs for $k must be a subset of brute force")
    }
  }

  test("q239 padding recomputes exactly in the driver; length-sorting never pads more") {
    val rows = Q.byName("q239_padding_waste_audit").fn(spark, sf()).collect()
      .map(r => r.getString(r.fieldIndex("strategy")) -> r).toMap
    val lens = Tables.docs(spark, sf()).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        "\\s+".r.split(r.getString(1)).count(_.nonEmpty).toLong,
        graft.functions.Md5Long60.hashBytes(s"pack:${r.getLong(0)}".getBytes("UTF-8"))))
    def audit(ordered: Seq[Long]): (Long, Long, Long) = {
      val byId = lens.map(t => t._1 -> t._2).toMap
      val batches = ordered.grouped(16).toSeq
      (batches.size.toLong,
        batches.map(_.map(byId).sum).sum,
        batches.map(b => b.size * b.map(byId).max).sum)
    }
    val hash = audit(lens.sortBy(t => (t._3, t._1)).map(_._1))
    val srt = audit(lens.sortBy(t => (-t._2, t._1)).map(_._1))
    for ((name, want) <- Seq("hash_order" -> hash, "length_sorted" -> srt)) {
      val r = rows(name)
      assert(r.getLong(r.fieldIndex("n_batches")) == want._1)
      assert(r.getLong(r.fieldIndex("real_tokens")) == want._2)
      assert(r.getLong(r.fieldIndex("padded_tokens")) == want._3)
    }
    assert(rows("length_sorted").getLong(rows("length_sorted").fieldIndex("padded_tokens"))
      <= rows("hash_order").getLong(rows("hash_order").fieldIndex("padded_tokens")),
      "length bucketing must not pad more than the shuffle baseline")
  }

  test("q240 quotas are an exact Hamilton apportionment and selections fill them") {
    val rows = Q.byName("q240_quota_sample_largest_remainder").fn(spark, sf()).collect()
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    val budget = total / 4
    assert(rows.map(_.getLong(rows.head.fieldIndex("quota"))).sum == budget,
      "largest-remainder quotas must sum exactly to the budget")
    rows.foreach { r =>
      val (n, q) = (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("quota")))
      val base = budget * n / total
      assert(q == base || q == base + 1,
        s"quota $q must be base $base or base+1 (Hamilton bound)")
      assert(r.getLong(r.fieldIndex("sel_docs")) == q,
        "every source must fill its quota exactly")
    }
  }
}
