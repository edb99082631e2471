package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds.
  *
  * Methodology: a warmup pass (cheap scan + one full query) absorbs
  * JVM/codegen/session start-up so per-query numbers measure the
  * query, not the first-run tax; queries run in sorted name order for
  * stable attribution; results are materialized through the noop sink
  * so sorts/projections are NOT optimized away the way a bare count()
  * would allow.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: touch every fixture file + run one representative query.
    // Guarded: a broken fixture must not prevent the contract JSON
    // line from being printed.
    try {
      Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
      materialize("q01_pricing_summary")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    // Best of 2 runs per query: single-JVM timings on a shared host
    // carry scheduler/GC jitter; the min reflects steady-state cost.
    // The per-query relative spread (max/min - 1) is emitted alongside
    // so co-tenant noise is distinguishable from plan regression in
    // the artifact itself: a slow query with a large spread was
    // interfered with; a slow query with a tight spread got slower.
    // SPARK_GRAFT_BENCH_RUNS (default 2) exists for the big scale-up
    // fixtures, where a second pass of an hour-long sweep buys little.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(2)
    val names = Q.registry.filter(_.bench).map(_.name).sorted
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // Queries are self-contained, so their pinned blocks (cache +
    // localCheckpoint RDDs) are dead weight once timed; dropping them
    // BETWEEN timed runs keeps a 179-query sweep's storage footprint
    // flat instead of letting earlier queries' blocks squeeze later
    // queries' execution memory (q142 OOM'd mid-sweep at sf10).
    // Outside the timed region: block bookkeeping isn't query cost.
    def dropPinned(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val results = names.map { name =>
      val times = (1 to runs).map { _ =>
        dropPinned()
        val t0 = System.nanoTime()
        try materialize(name)
        catch { case e: Throwable =>
          if (failed.add(name))
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // -1 sentinel: a crashed query must not report its (near-zero)
      // failure time as if it ran.
      if (failed.contains(name)) (name, -1.0, -1.0)
      else (name, times.min, math.rint((times.max / times.min - 1) * 1000) / 1000)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, sp) => "\"" + k + "\":" + sp }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
