package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Portable => P}

/** Stage-level profile of q249 entity resolution (VERDICT r9 #7 asked
  * for a second blocking key against "hot dollar bands"; the round-10
  * lossless prefilters left sf10 wall flat once canary-normalized, so
  * before touching blocking again this attributes where the ~47 s
  * actually goes). Prefix methodology = ProfileCorpusPrep: cumulative
  * noop-sink materializations, warmup, best-of-N increments.
  *
  * The staged pipeline below DELIBERATELY preserves the superseded
  * round-9 shape (distinct → payload joins → rank window): it is the
  * attribution evidence that motivated the one-pass rewrite shipped
  * in Analytics5.q249 (no distinct — the argmax is duplicate-
  * insensitive; no payload joins — key rows carry the scoring
  * payload; no window sort — min(struct(-sc, lev, a_id)) partial-
  * aggregates; banded levenshtein). The final `shipped_one_pass`
  * timing runs the registry query itself for the A/B on the same
  * host state.
  */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "fixtures/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def a = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").as("a_id"), col("c_name").as("a_name"),
        col("c_nationkey").as("a_nat"), col("c_mktsegment").as("a_seg"),
        col("c_acctbal").as("a_bal"))
    def bPlan = Tables.t(spark, sfDir, "customer")
      .withColumn("h1", P.md5Long(concat(lit("erd:"), col("c_custkey").cast("string"))))
      .withColumn("h2", P.md5Long(concat(lit("erb:"), col("c_custkey").cast("string"))))
      .withColumn("h3", P.md5Long(concat(lit("ers:"), col("c_custkey").cast("string"))))
      .withColumn("cls", when(pmod(col("h1"), lit(5)) <= 2, "0_clean")
        .when(pmod(col("h1"), lit(5)) === 3, "1_lower").otherwise("2_chardrop"))
      .withColumn("p", expr("CAST((h1 div 5) % length(c_name) + 1 AS INT)"))
      .withColumn("b_name", when(col("cls") === "0_clean", col("c_name"))
        .when(col("cls") === "1_lower", lower(col("c_name")))
        .otherwise(expr("concat(substring(c_name, 1, p - 1), substring(c_name, p + 1))")))
      .withColumn("b_bal", when(pmod(col("h2"), lit(2)) === 0,
        col("c_acctbal") + expr("((h2 div 2) % 11 - 5) / 100.0"))
        .otherwise(col("c_acctbal")))
      .withColumn("b_seg", when(pmod(col("h3"), lit(5)) === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")))
      .select((col("c_custkey") + 10000000L).as("b_id"), col("b_name"),
        col("c_nationkey").as("b_nat"), col("b_seg"), col("b_bal"), col("cls"))

    def keys(df: DataFrame, id: String, nat: String, bal: String,
        name: String, seg: String): DataFrame =
      df.select(col(id), col(bal).as(s"${id}_bal"),
        length(col(name)).as(s"${id}_len"), col(seg).as(s"${id}_seg"),
        explode(array(
          concat_ws(":", lit("g1"), col(nat), floor(col(bal))),
          concat_ws(":", lit("g2"), col(nat), floor(col(bal) + 0.5)))).as("bk"))

    def time(label: String)(mk: => DataFrame): Double = {
      val ts = (1 to runs).map { _ =>
        // clearCache only: the held `b` checkpoint must survive runs
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val v = ts.min
      println(f"[er] $label%-28s ${v}%8.2f s  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
      v
    }

    // warmup
    a.agg(count(lit(1))).write.format("noop").mode("overwrite").save()

    time("b_build+checkpoint") { bPlan.localCheckpoint(true); spark.range(1).toDF() }
    val b = bPlan.localCheckpoint(true)
    time("keygen_a") { keys(a, "a_id", "a_nat", "a_bal", "a_name", "a_seg") }
    time("keygen_b") { keys(b, "b_id", "b_nat", "b_bal", "b_name", "b_seg") }
    val ak = keys(a, "a_id", "a_nat", "a_bal", "a_name", "a_seg")
    val big = ak.groupBy("bk").agg(count(lit(1)).as("ac"))
      .filter(col("ac") > 256).select("bk")
    time("big_blocks") { big }
    def joined = ak.join(big, Seq("bk"), "left_anti")
      .join(keys(b, "b_id", "b_nat", "b_bal", "b_name", "b_seg"), "bk")
    time("cand_join_raw") { joined.select("a_id", "b_id") }
    def filtered = joined
      .filter(abs(col("a_id_bal") - col("b_id_bal")) <= 0.0501 &&
        abs(col("a_id_len") - col("b_id_len")) <= 1 &&
        (col("b_id_seg") === "UNKNOWN" || col("a_id_seg") === col("b_id_seg")))
    time("cand_join_filtered") { filtered.select("a_id", "b_id") }
    def cand = filtered.select("a_id", "b_id").distinct()
    time("cand_distinct") { cand }
    def scored = cand
      .join(a, "a_id").join(b, "b_id")
      .withColumn("lev", levenshtein(lower(col("a_name")), lower(col("b_name"))))
      .withColumn("sc",
        when(col("lev") === 0, 4).when(col("lev") === 1, 2)
          .when(col("lev") === 2, 0).otherwise(-99)
        + when(col("b_seg") === "UNKNOWN", 0)
          .when(col("a_seg") === col("b_seg"), 1).otherwise(-3)
        + when(abs(col("a_bal") - col("b_bal")) <= 0.0501, 3).otherwise(-3))
    time("scored") { scored }
    time("best_rank") {
      scored.withColumn("rn", row_number().over(Window.partitionBy("b_id")
        .orderBy(col("sc").desc, col("lev"), col("a_id"))))
        .filter(col("rn") === 1 && col("sc") >= 5)
    }
    time("shipped_one_pass") {
      Q.registry.find(_.name == "q249_entity_resolution_golden").get
        .fn(spark, sfDir)
    }
    println("[er] candidate counts:")
    println("  raw pairs:      " + joined.count())
    println("  filtered pairs: " + filtered.count())
    println("  distinct cand:  " + cand.count())
    spark.stop()
  }
}
