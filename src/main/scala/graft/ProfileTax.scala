package graft

import org.apache.spark.sql.SparkSession

/** Phase-split profiler for the fixed per-query cost (VERDICT r9 #1).
  *
  * BASELINE.md's controlled experiment showed the 34 sub-0.35 s
  * headline queries each gained ≈ +26 ms of FIXED cost between the
  * r5-era and r9 classes, with the prose attributing it to "the
  * analyzer/planner walking a larger injected expression surface".
  * This main verifies that attribution empirically instead of
  * trusting it: for each cheap headline query it separates
  *
  *   build — `SparkEntry.queries(name)(spark, sfDir)`: registry map
  *           construction, per-query kernel `register(...)` calls,
  *           `Tables.t` parquet reads, DataFrame plan assembly
  *   plan  — forcing `queryExecution.executedPlan`: analyzer +
  *           optimizer + physical planning of the built frame
  *   exec  — the noop write of the planned frame (run + re-planning
  *           of the write wrapper; dominated by execution)
  *
  * plus micro-benchmarks of the standing suspects (registry map
  * build, kernel registration, fixture `spark.read.parquet`), so the
  * +26 ms can be pinned to a phase and then to a cause.
  *
  * Usage: tools/runjava.sh graft.ProfileTax [--runs=N]
  */
object ProfileTax {

  /** The 34 sub-0.35 s headline queries of BASELINE.md's decomposition:
    * every headline query whose r9 isolated best-of-4 was < 0.35 s.
    */
  val cheap: Seq[String] = Seq(
    "q02_filter_predicates", "q05_left_join_customer_orders",
    "q06_full_outer_nation_counts", "q07_semi_join_parts_sold",
    "q08_anti_join_idle_customers", "q09_cross_join_regions",
    "q10_nonequi_nation_pairs", "q12_set_operations",
    "q15_grouping_sets_customer", "q17_having_brand_share",
    "q18_collect_set_segments", "q21_window_rank_top_customers",
    "q25_topk_orders", "q26_topk_parts_per_brand", "q28_string_functions",
    "q29_datetime_functions", "q30_math_functions",
    "q31_conditional_buckets", "q33_hash_functions", "q36_session_window",
    "q39_dedup_exact", "q44_token_stats_by_lang", "q45_lang_id_profile",
    "q46_quality_score", "q47_fingerprint_shingles", "q49_label_centroids",
    "q53_schema_preview_documents", "q58_map_functions",
    "q61_limit_offset", "q62_from_json_struct", "q63_pivot_status",
    "q64_correlated_subquery", "q65_lateral_view_explode",
    "q69_window_nth_value")

  def main(args: Array[String]): Unit = {
    val runs = args.collectFirst { case a if a.startsWith("--runs=") =>
      a.stripPrefix("--runs=").toInt }.getOrElse(5)
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

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // warmup identical to Bench
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    // ---- micro-benchmarks of the suspects --------------------------
    def micro(label: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"[micro] $label%-38s ${sec(t0) / n * 1000}%9.3f ms/op (n=$n)")
    }
    micro("SparkEntry.queries map build", 50) { SparkEntry.queries; () }
    micro("Q.registry vector build", 200) { Q.registry; () }
    micro("Tables.t(lineitem) read", 50) {
      Tables.t(spark, sfDir, "lineitem"); () }
    micro("Tables.events read+retype", 50) {
      Tables.events(spark, sfDir); () }
    micro("TextKernels.register", 50) {
      graft.functions.TextKernels.register(spark) }
    micro("Md5Long60.register", 50) {
      graft.functions.Md5Long60.register(spark) }

    // ---- phase split per cheap headline query ----------------------
    println(f"${"query"}%-34s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    var (sb, sp, se) = (0.0, 0.0, 0.0)
    cheap.foreach { name =>
      val trip = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val b = sec(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val p = sec(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val e = sec(t2)
        (b, p, e)
      }
      val b = trip.map(_._1).min; val p = trip.map(_._2).min
      val e = trip.map(_._3).min
      sb += b; sp += p; se += e
      println(f"$name%-34s ${b * 1000}%7.1f ${p * 1000}%7.1f ${e * 1000}%7.1f ${(b + p + e) * 1000}%7.1f  (ms)")
    }
    println(f"${"TOTAL(34)"}%-34s ${sb}%7.2f ${sp}%7.2f ${se}%7.2f ${sb + sp + se}%7.2f  (s)")
    spark.stop()
  }
}
