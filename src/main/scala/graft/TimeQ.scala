package graft

/** Ad-hoc per-query timing harness: `runMain graft.TimeQ <q1,q2,...>
  * [sfDir]` — warms the fixture cache, then reports best-of-5 (first
  * run dropped) per query through the same noop-sink materialization
  * Bench uses. For plan iteration; Bench.scala remains the driver's
  * perf contract.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n best=${ts.drop(1).min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
