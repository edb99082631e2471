package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/** Sweep-JVM-state profiler (VERDICT r12 #2): the sub-second tail
  * crept +~40 ms/query between r11 and r12 on a COOLER host while
  * ProfileTax's build/plan phases held — so the fixed cost moved into
  * execution, or into state the 289×2-query sweep JVM accumulates
  * (the q138 observation: 5.08 s in-sweep vs 1.03 s isolated).
  * This main measures that attribution directly. For each probe query
  * it records the ProfileTax build/plan/exec split
  *
  *   1. FRESH    — after the standard warmup only (the isolated
  *                 artifact's conditions);
  *   2. POSTSWEEP — same JVM after one full registry sweep (the
  *                 in-sweep conditions);
  *   3. NEWSESSION — a `spark.newSession()` after the sweep: same
  *                 JVM, same SparkContext, fresh SQL conf/registry/
  *                 temp functions. If POSTSWEEP is slow and
  *                 NEWSESSION recovers, the tax lives in session
  *                 state; if NEWSESSION stays slow, it lives in the
  *                 JVM/context (JIT, code cache, listener bus,
  *                 status store).
  *
  * JIT compilation time and code-cache occupancy are sampled at each
  * phase boundary: a full code cache (flushing hot methods) is the
  * classic cause of diffuse post-sweep slowdowns and is visible as
  * occupancy near the pool max plus renewed compilation during the
  * POSTSWEEP re-measures.
  *
  * Usage: tools/runjava.sh graft.ProfileSweepTax [q... names]
  */
object ProfileSweepTax {

  val defaultProbes: Seq[String] = Seq(
    "q165_anomaly_days", "q166_sessionized_conversion",
    "q167_spend_gini", "q226_mmr_select",
    "q272_l_diversity_audit")

  def main(args: Array[String]): Unit = {
    val probes = if (args.nonEmpty) args.toSeq else defaultProbes
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
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def codeCache: String = {
      import scala.jdk.CollectionConverters._
      ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => f"${p.getName}=${p.getUsage.getUsed / (1024 * 1024)}%d/${p.getUsage.getMax / (1024 * 1024)}%dMB")
        .mkString(" ")
    }

    def dropPinned(s: SparkSession): Unit = {
      s.sharedState.cacheManager.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    /** best-of-4 (build, plan, exec) triple for one query. */
    def measure(s: SparkSession, name: String): (Double, Double, Double) = {
      val trip = (1 to 4).map { _ =>
        dropPinned(s)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(s, sfDir)
        val b = sec(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val p = sec(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (b, p, sec(t2))
      }
      (trip.map(_._1).min, trip.map(_._2).min, trip.map(_._3).min)
    }

    def phase(label: String, s: SparkSession): Map[String, (Double, Double, Double)] = {
      println(s"[sweeptax] phase=$label jit_ms=$jitMs codecache: $codeCache")
      val rows = probes.map(n => n -> measure(s, n)).toMap
      rows.toSeq.sortBy(_._1).foreach { case (n, (b, p, e)) =>
        println(f"[sweeptax] $label%-10s $n%-34s build=${b * 1000}%7.1f plan=${p * 1000}%7.1f exec=${e * 1000}%7.1f total=${(b + p + e) * 1000}%7.1f ms")
      }
      rows
    }

    // standard Bench warmup
    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val fresh = phase("FRESH", spark)

    // one full registry sweep — the state the r12 sweep artifact saw
    println(s"[sweeptax] running full registry sweep (${Q.registry.count(_.bench)} queries)...")
    val t0 = System.nanoTime()
    Q.registry.filter(_.bench).map(_.name).sorted.foreach { n =>
      dropPinned(spark)
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[sweeptax] sweep $n failed: ${e.getMessage}")
      }
    }
    println(f"[sweeptax] sweep done in ${sec(t0)}%.1f s")

    val post = phase("POSTSWEEP", spark)
    val ns = spark.newSession()
    val fresh2 = phase("NEWSESSION", ns)

    println(f"${"query"}%-34s ${"fresh"}%8s ${"post"}%8s ${"newsess"}%8s ${"post-fresh"}%11s (total ms)")
    probes.sorted.foreach { n =>
      def t(m: Map[String, (Double, Double, Double)]) = {
        val (b, p, e) = m(n); (b + p + e) * 1000
      }
      println(f"$n%-34s ${t(fresh)}%8.1f ${t(post)}%8.1f ${t(fresh2)}%8.1f ${t(post) - t(fresh)}%+11.1f")
    }
    spark.stop()
  }
}
