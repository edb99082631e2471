package graft

import org.apache.spark.sql.SparkSession

/** A/B probe: does AQE with a high initialPartitionNum fix the sf10
  * spill tail? (throwaway diagnostics)
  */
object ProfileShufflePartitions {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val init = args(1)
    val names = args(2).split(',')
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    names.foreach { name =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[ab] init=$init $name ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    spark.stop()
  }
}
