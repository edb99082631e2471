package graft

import org.apache.spark.sql.functions._

/** Driver recomputations for the q226-q230 round-6 wave. */
class CurationOps7Spec extends SparkSpec {

  private def vecs: Map[Long, Array[Float]] =
    Tables.t(spark, sf(), "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("q226 equals a driver greedy MMR (lambda=0.7, 6-dp ranking)") {
    val out = Q.byName("q226_mmr_select").fn(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    val v = vecs
    val q0 = v(0L)
    val rel = v.collect { case (id, e) if id > 0 => id -> r6(cos(e, q0)) }
    var selected = Vector.empty[Long]
    val want = (1 to 5).map { r =>
      val scored = rel.filter { case (id, _) => !selected.contains(id) }
        .map { case (id, rl) =>
          val pen = if (selected.isEmpty) 0.0
            else selected.map(s => r6(cos(v(id), v(s)))).max
          // (1 - 0.7) NOT a 0.3 literal: the query computes the
          // complement in IEEE double (0.30000000000000004) and the
          // 6-dp rounding must see identical products
          val score = if (r == 1) r6(rl * 0.7) else r6(rl * 0.7 - pen * (1 - 0.7))
          (id, score)
        }
      val (id, score) = scored.toSeq.minBy { case (i, sc) => (-sc, i) }
      selected :+= id
      (r, id, score)
    }
    assert(out.toSeq == want, s"spark ${out.toSeq} vs driver $want")
  }

  test("q227 drift rows are sane: bounded cosines, doc counts partition corpus") {
    val rows = Q.byName("q227_source_embedding_drift").fn(spark, sf()).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.t(spark, sf(), "documents").count())
    rows.foreach { r =>
      val cc = r.getAs[Double]("centroid_cos")
      val disp = r.getAs[Double]("dispersion")
      assert(cc >= -1.0 - 1e-9 && cc <= 1.0 + 1e-9)
      assert(disp >= -1.0 - 1e-9 && disp <= 1.0 + 1e-9)
    }
    // source centroids hug the global centroid far more than random
    // vectors would — a drift table where every source reads ~0
    // would mean the join or centroid math is broken
    assert(rows.map(_.getAs[Double]("centroid_cos")).max > 0.5)
  }

  test("q228 confirmed hits equal an exact 5-gram recompute; bloom admits no misses") {
    val rows = Q.byName("q228_bloom_decontaminate").fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_confirmed")))
    // driver: exact distinct word-5-gram sets
    val grams = Tables.docs(spark, sf()).collect().map { r =>
      val toks = r.getAs[String]("text").split("\\s+").filter(_.nonEmpty)
      r.getAs[Long]("doc_id") -> toks.sliding(5).filter(_.length == 5)
        .map(_.mkString(" ")).toSet
    }.toMap
    val evalSet = grams.collect { case (id, g) if id % 10 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    rows.foreach { case (id, nsh, ncand, nconf) =>
      assert(id % 10 != 0, "eval docs never appear in the train report")
      val g = grams(id)
      assert(nsh == g.size, s"doc $id shingle count")
      val exactHits = g.count(evalSet.contains)
      assert(nconf == exactHits, s"doc $id confirmed=$nconf exact=$exactHits")
      // a bloom filter has false positives but NEVER false negatives
      assert(ncand >= nconf && ncand <= nsh)
    }
    // every train doc with >= 5 tokens reports
    assert(rows.length == grams.count { case (id, g) => id % 10 != 0 && g.nonEmpty })
  }

  test("q230 streamed HLL estimate equals the batch estimate") {
    val row = Q.byName("q230_stream_distinct_parity").fn(spark, sf()).head()
    assert(row.getAs[Boolean]("stream_eq_batch"),
      "HLL register-max merge must make arrival order irrelevant")
    assert(row.getAs[Boolean]("within_5pct"))
    assert(row.getAs[Long]("n_exact") > 0)
  }
}
