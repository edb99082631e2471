package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPrep

/** Stage-level profile of the q107 corpus-prep pipeline (VERDICT r4 #3).
  *
  * Times each cumulative prefix of the composition on SPARK_GRAFT_SF_DIR
  * so the per-stage increments attribute q107's cost to gate / exact
  * dedup / LSH signatures / connected components / keep-join / pack.
  * Prints one JSON line; the README "q107 decomposition" table cites it.
  *
  * Methodology matches Bench: noop-sink materialization, warmup pass,
  * best-of-N (SPARK_GRAFT_BENCH_RUNS, default 3) per stage. Stages are
  * cumulative prefixes of one lazy plan, so increment = stage cost
  * including everything the stage forces that earlier prefixes didn't.
  */
object ProfileCorpusPrep {
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

    val docs = Tables.docs(spark, sfDir)

    import graft.functions.{MinHashBands, Portable}
    import org.apache.spark.sql.expressions.Window
    // Re-state the pipeline's prefixes with the same constructions
    // CorpusPrep uses, so each increment is attributable. The full
    // pipeline itself is timed via the real entry points (prepare/
    // pack) — the prefixes exist only to split the total.
    def gated = docs
      .select(col("doc_id"), col("text"),
        size(Portable.tokens(col("text"))).cast("long").as("nt"))
      .filter(col("nt") >= 5)
    def exact = gated
      .withColumn("__th", Portable.md5Long(col("text")))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("__th").orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__th", "__rn")
    def sigs = exact
      .select(col("doc_id"), col("nt"),
        org.apache.spark.sql.GraftSqlBridge.column(MinHashBands(
          org.apache.spark.sql.GraftSqlBridge.expression(
            Portable.tokenSet(col("text"))), 2, 8)).as("bs"))
      .select(col("doc_id"), col("nt"),
        col("bs").getItem(0).as("b0"), col("bs").getItem(1).as("b1"))
    // the real pipeline's clustering stage (bypass + CC + assignment)
    def cc = graft.graph.BandCluster.assign(sigs)

    def time(df: => DataFrame): Double = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.rint(ts.min * 1000) / 1000
    }

    // warmup: JVM + codegen + file listing
    docs.count(); time(gated)

    val stages = Vector(
      "gate"       -> time(gated),
      "exact"      -> time(exact),
      "sigs"       -> time(sigs),
      "cc"         -> time(cc),
      "prepare"    -> time(CorpusPrep.prepare(docs, 5)),
      "prepare_pack" -> time(CorpusPrep.pack(CorpusPrep.prepare(docs, 5), 512)))
    val js = stages.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"q107_stages","runs":$runs,"stages":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
