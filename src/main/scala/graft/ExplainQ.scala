package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-audit main: run named registry queries on a small SF and
  * print the AQE-final executed plan — the ".explain and iterate
  * until it's the plan you'd want" loop as a one-liner, without
  * spinning up a test suite.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     tools/runjava.sh graft.ExplainQ q286_personalized_pagerank
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQ <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"########## $name @ $sfDir")
      val df = Q.byName(name).fn(spark, sfDir)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p                        => p.toString
      }
      println(plan)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
