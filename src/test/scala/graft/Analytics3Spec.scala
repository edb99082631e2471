package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Independent recomputations for q214-q216. */
class Analytics3Spec extends SparkSpec {

  test("q214 sweep-line peaks equal the naive single-window cumsum") {
    val fast = Q.byName("q214_concurrency_sweep").fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: same boundaries through one global window (the
    // formulation Dist.globalCumsumBy replaces at scale)
    val sess = Tables.events(spark, sf())
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("session_window.start")).as("sstart"),
        unix_timestamp(col("session_window.end")).as("send"))
    val bounds = sess.select(col("sstart").as("t"), lit(1L).as("d"))
      .unionAll(sess.select(col("send").as("t"), lit(-1L).as("d")))
      .groupBy("t", "d").agg(sum("d").as("delta"))
    val slow = bounds
      .withColumn("conc", sum("delta").over(
        Window.orderBy("t", "d").rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(floor(col("t") / 86400).cast("long").as("day"))
      .agg(max("conc").cast("long").as("peak"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("q215 confidence and lift recompute from raw counts") {
    val rows = Q.byName("q215_association_rules").fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    val li = Tables.t(spark, sf(), "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = li.map(_._1).distinct.length.toDouble
    val itemN = li.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val pairN = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val np = pairN((a, b))
      assert(r.getLong(2) == np && np >= 2)
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      assert(r.getDouble(3) == r6(np / itemN(a)))
      assert(r.getDouble(4) == r6(np * nOrders / (itemN(a) * itemN(b))))
    }
  }

  test("q216 merge table equals a driver BPE trainer, frequencies monotone") {
    val out = Q.byName("q216_bpe_train").fn(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == (1 to 5))
    out.map(_._3).sliding(2).foreach(w =>
      assert(w(1) <= w(0), "merge frequency increased across rounds"))
    // driver-side Sennrich loop on symbol vectors
    var corpus = Tables.docs(spark, sf())
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("t"))
      .collect().map(_.getString(0).toSeq.map(_.toString).toVector)
    val merges = collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to 5) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { syms =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
      merges += ((r, s"$a $b", n))
      corpus = corpus.map { syms =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
    }
    assert(out.toSeq == merges.toSeq, s"spark ${out.toSeq} vs driver $merges")
  }

  test("q216 rotates its corpus checkpoints: no corpus-sized copy stays pinned") {
    val sc = spark.sparkContext
    // reference size: ONE checkpointed corpus copy at this SF
    val probe = Tables.docs(spark, sf("sf0.01"))
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("tok"))
      .select(concat(lit(" "),
        regexp_replace(col("tok"), "(.)", "$1 ")).as("sy"))
      .localCheckpoint(true)
    val preIds = sc.getPersistentRDDs.keySet.toSet
    val corpusBytes = sc.getRDDStorageInfo
      .filter(i => preIds.contains(i.id))
      .map(i => i.memSize + i.diskSize).max
    org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(probe, blocking = true)

    val before = sc.getPersistentRDDs.keySet.toSet
    Q.byName("q216_bpe_train").fn(spark, sf("sf0.01")).collect()
    val added = sc.getRDDStorageInfo
      .filter(i => !before.contains(i.id) && i.isCached)
    // what survives the run is the five pinned 1-row merge rules;
    // every corpus-sized round checkpoint must have been rotated out
    // (pre-fix, four spaced-corpus copies — each >= corpusBytes —
    // stayed pinned until the ContextCleaner got to them)
    assert(added.length <= 5, added.mkString("\n"))
    val total = added.map(i => i.memSize + i.diskSize).sum
    assert(corpusBytes > 0, "probe checkpoint did not materialize")
    assert(total < corpusBytes / 2,
      s"corpus-sized checkpoints left pinned: kept=$total bytes, " +
        s"one corpus copy=$corpusBytes bytes\n${added.mkString("\n")}")
  }
}
