package graft

import graft.pipeline.KMeans
import org.apache.spark.sql.functions._

/** Semantics bounds for the round-5 curation operators (q182–q185)
  * beyond the oracle hash-gate: Lloyd iterations must actually
  * improve the clustering, temperature sampling must be
  * downsample-only and favor low-resource languages, classifier
  * scores must respect the weight bounds, and the snapshot diff must
  * partition the union of both versions.
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  private def emb = Tables.t(spark, dir, "embeddings")
    .select("vec_id", "embedding")

  test("q182: clusters partition all vectors and inertia falls with iterations") {
    val out = Q.byName("q182_kmeans_lloyd").fn(spark, dir).collect()
    val total = emb.count()
    assert(out.map(_.getLong(1)).sum === total)
    def inertia(iters: Int): Double =
      KMeans.fit(emb, k = 8, iters = iters)
        .agg(sum(col("d2r").cast("decimal(28,6)")).cast("double"))
        .head().getDouble(0)
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 < i1, s"3 Lloyd rounds ($i3) should beat 1 ($i1)")
  }

  test("q183: rates in (0,1], downsample-only, inverse to language size") {
    val rows = Q.byName("q183_temperature_mix").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, rate, kept) =>
      assert(rate > 0 && rate <= 1.0, s"$lang rate $rate")
      assert(kept <= n, s"$lang kept $kept of $n")
    }
    // rate ∝ 1/sqrt(n): strictly larger languages get strictly
    // smaller rates (no ties in the fixture language sizes)
    rows.sortBy(_._2).sliding(2).foreach { case Array(lo, hi) =>
      if (lo._2 < hi._2)
        assert(lo._3 >= hi._3, s"rate must not grow with corpus share: $lo vs $hi")
    case _ => ()
    }
  }

  test("q184: scores bounded by the weight range and keep mirrors sign") {
    val rows = Q.byName("q184_quality_classifier").fn(spark, dir).collect()
    assert(rows.length === Tables.docs(spark, dir).count())
    val bound = 48.0 / 97.0
    rows.foreach { r =>
      val score = r.getDouble(r.fieldIndex("score"))
      val keep = r.getInt(r.fieldIndex("keep"))
      assert(math.abs(score) <= bound + 1e-9)
      assert(keep === (if (score > 0) 1 else 0))
    }
  }

  test("q186: PQ recall@10 is a valid per-query fraction") {
    val rows = Q.byName("q186_pq_adc_recall").fn(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val rec = r.getDouble(r.fieldIndex("recall10"))
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("q187: narrower bands strictly grow candidate volume (the S-curve)") {
    val rows = Q.byName("q187_lsh_band_sensitivity").fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(r.fieldIndex("cand_pairs")),
        r.getLong(r.fieldIndex("docs_in_cand"))))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(2, 4, 8)))
    val enDocs = Tables.docs(spark, dir).filter(col("lang") === "en").count()
    rows.sliding(2).foreach { case Array(wide, narrow) =>
      assert(wide._2 < narrow._2,
        s"more bands must produce more candidate pairs: $wide vs $narrow")
    case _ => ()
    }
    rows.foreach { case (_, _, dic) => assert(dic <= enDocs) }
  }

  test("q188: purity report partitions the vectors and bounds purity") {
    val rows = Q.byName("q188_cluster_purity").fn(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === emb.count())
    rows.foreach { r =>
      val n = r.getLong(1)
      val majN = r.getLong(3)
      val purity = r.getDouble(4)
      assert(majN <= n)
      assert(purity > 0.0 && purity <= 1.0)
    }
  }

  test("q189: coverage thresholds are ordered and bounded by vocab size") {
    val rows = Q.byName("q189_vocab_coverage_curve").fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vocab = r.getLong(r.fieldIndex("vocab_size"))
      val Seq(v90, v95, v99) = Seq("v90", "v95", "v99")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(v90 <= v95 && v95 <= v99 && v99 <= vocab,
        s"coverage curve must be monotone: $r")
      assert(v90 >= 1)
    }
  }

  test("q190: delta-only report — no base vector is ever dropped") {
    import graft.functions.Portable
    val rows = Q.byName("q190_incremental_ann_maintenance").fn(spark, dir).collect()
    val deltaIds = emb
      .filter(Portable.md5Long(
        concat(lit("b:"), col("vec_id").cast("string"))) % 10 >= 9)
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val dropped = r.getLong(r.fieldIndex("dropped"))
      val keeper = r.getLong(r.fieldIndex("keeper"))
      assert(deltaIds.contains(dropped), s"dropped $dropped must be a delta vector")
      assert(keeper != dropped)
      val cos = r.getDouble(r.fieldIndex("max_cos"))
      assert(cos >= 0.35 && cos <= 1.000001)
    }
  }

  test("q185: statuses partition the union of both snapshot versions") {
    val rows = Q.byName("q185_corpus_diff").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet === Set("added", "removed", "changed", "unchanged"))
    rows.values.foreach(n => assert(n > 0))
    val total = Tables.docs(spark, dir).count()
    val union = rows.values.sum
    // both versions keep ~90% of the corpus, so the union covers most
    // of it but never exceeds it (ids come from the same key space)
    assert(union <= total && union >= (total * 8) / 10)
  }
}
