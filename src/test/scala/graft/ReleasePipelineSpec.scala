package graft

import org.apache.spark.sql.functions._

/** Driver-side recomputation of the q217 release manifest. */
class ReleasePipelineSpec extends SparkSpec {

  test("q217 manifest equals a driver recompute and balances exactly") {
    val out = Q.byName("q217_release_manifest").fn(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // stage counts must balance: raw = contam + dup + final
    out.foreach { case (split, (raw, contam, dup, fin, _)) =>
      assert(raw == contam + dup + fin, s"$split unbalanced")
      if (split != "train") assert(contam == 0 && dup == 0)
    }
    // driver recompute
    val docs = Tables.docs(spark, sf())
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5mod10(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val split = docs.map { case (id, _, _) =>
      val b = md5mod10(id)
      id -> (if (b < 8) "train" else if (b == 8) "valid" else "test")
    }.toMap
    def shingles(t: String): Set[String] =
      if (t.length < 24) Set.empty
      else (0 to t.length - 24).map(i => t.substring(i, i + 24)).toSet
    val evalSh = docs.filter(d => split(d._1) != "train")
      .flatMap(d => shingles(d._2)).toSet
    val train = docs.filter(d => split(d._1) == "train")
    val contamIds = train.filter { d =>
      val sh = shingles(d._2)
      sh.nonEmpty && sh.count(evalSh.contains).toDouble / sh.size >= 0.6
    }.map(_._1).toSet
    val clean = train.filterNot(d => contamIds.contains(d._1))
    val keep = clean.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val fin = clean.filter(d => keep.contains(d._1))
    assert(out("train") == ((train.length.toLong, contamIds.size.toLong,
      (clean.length - fin.length).toLong, fin.length.toLong,
      fin.map(_._3).sum)), s"train row diverges: ${out("train")}")
    for (sp <- Seq("valid", "test")) {
      val ds = docs.filter(d => split(d._1) == sp)
      assert(out(sp) == ((ds.length.toLong, 0L, 0L, ds.length.toLong,
        ds.map(_._3).sum)), s"$sp row diverges")
    }
  }
}
