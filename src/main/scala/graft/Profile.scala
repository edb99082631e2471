package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: time named registry queries (all if no names)
  * after a warmup, optionally dumping the formatted physical plan.
  *
  *   sbt "runMain graft.Profile q43_ngram_jaccard --explain --runs=6"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    // a bad or non-positive --runs would otherwise time ZERO runs per
    // query and print an empty profile with no hint why
    val runs = args.collectFirst { case a if a.startsWith("--runs=") =>
      a.stripPrefix("--runs=").toIntOption.filter(_ >= 1).getOrElse {
        System.err.println(s"[prof] ignoring invalid $a (need --runs=N, N>=1); using 2")
        2
      }
    }.getOrElse(2)
    val names0 = args.filterNot(_.startsWith("--")).toSeq
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

    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val names = if (names0.nonEmpty) names0 else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      if (explain) {
        println(s"==== $name plan ====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      // build INSIDE the timer: eager queries (the CC loop, the
      // streaming twins) do their work during construction, so
      // timing only the final write would understate them wildly
      val ts = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name run$i: $t%.2f s")
        t
      }
      if (runs > 2)
        println(f"[prof] $name best(after-warm)=${ts.drop(1).min}%.3f s")
    }
    spark.stop()
  }
}
