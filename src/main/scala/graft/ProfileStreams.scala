package graft

import org.apache.spark.sql.SparkSession

/** Fixed-overhead profile of the streaming registry queries
  * (VERDICT r4 #8): times each stream query end-to-end (plan + run +
  * state commit + stop) N times in one warmed JVM, so the steady-state
  * minimum IS the per-run fixed cost the registry pays. Prints one
  * JSON line; the README "streaming floor" note cites it.
  */
object ProfileStreams {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Vector(
      "q56_stream_tumbling_counts", "q57_stateful_sessionize",
      "q80_stream_sliding_counts", "q91_stream_enriched_counts",
      "q124_stream_stream_join")

    def time(name: String): Double = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.rint(ts.min * 1000) / 1000
    }

    // warmup: batch scan + one full stream run absorbs session start-up
    Tables.t(spark, sfDir, "events").count()
    time("q56_stream_tumbling_counts")

    val rows = names.map(n => "\"" + n + "\":" + time(n))
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_floor","runs":$runs,"queries":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
