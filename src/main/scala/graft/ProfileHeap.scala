package graft

import java.lang.management.ManagementFactory

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorMetricsUpdate, SparkListenerStageExecutorMetrics}
import org.apache.spark.sql.SparkSession

/** Heap-floor profiler (VERDICT r10 #7): run named registry queries
  * and record, per query,
  *
  *   - `heap_peak_mb`     — the HEADLINE number: peak sampled
  *     JVMHeapMemory from Spark's executor-metrics poller (250 ms),
  *     a real point-in-time heap reading — the floor `-Xmx` must
  *     cover, GC headroom excluded;
  *   - `heap_pool_sum_mb` — the sum of per-pool MemoryPoolMXBean
  *     peaks (reset before each query). Kept as an UPPER BOUND only:
  *     per-pool peaks need not occur simultaneously (eden peaks
  *     before a collection, old-gen after), so the sum can overstate
  *     the true simultaneous footprint (ADVICE r11 #4 — earlier
  *     rounds reported this as the headline);
  *   - `exec_peak_mb` / `storage_peak_mb` / `unified_peak_mb` —
  *     Spark's own executor-metric peaks (OnHeapExecutionMemory /
  *     OnHeapStorageMemory / OnHeapUnifiedMemory) from the metrics
  *     poller, i.e. how much of the peak is tracked operator memory
  *     (joins/aggs/sorts) vs pinned blocks vs untracked garbage.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=fixtures/sf10 SPARK_DRIVER_MEM=48g \
  *     sbt "runMain graft.ProfileHeap q221_kcore_peel q264_cc_delete_maintenance"
  *
  * Pinned blocks are dropped between queries (the Bench contract) so
  * each row is the query's own footprint, not the sweep's residue.
  * One JSON line per query on stdout, prefixed `[heap]`.
  */
object ProfileHeap {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q100_dedup_cc_clusters", "q221_kcore_peel",
        "q264_cc_delete_maintenance")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // tighten the executor-metrics poll AND the heartbeat that
      // ships it to the listener bus (default 10 s — longer than
      // many whole queries)
      .config("spark.executor.metrics.pollingInterval", "250ms")
      .config("spark.executor.heartbeatInterval", "500ms")
      .config("spark.network.timeout", "120s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tracked = Seq("OnHeapExecutionMemory", "OnHeapStorageMemory",
      "OnHeapUnifiedMemory", "JVMHeapMemory")
    // Listener peaks are EPOCH-KEYED like the storage sampler below
    // (ADVICE r12 #4): a late executor heartbeat carrying the PREVIOUS
    // query's JVMHeapMemory peak can land after the between-query
    // reset (the post-query sleep is 1000 ms but the settle before the
    // next query is only the 500 ms GC sleep), and with a shared map
    // it would re-publish the old peak into the next query's headline.
    // Capturing the epoch at bump() time routes stragglers into the
    // old slot instead.
    val epoch = new java.util.concurrent.atomic.AtomicLong(0L)
    val peaks = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    def bump(metrics: org.apache.spark.executor.ExecutorMetrics): Unit = {
      val e = epoch.get()
      tracked.foreach { k =>
        peaks.merge(s"$e:$k", Long.box(metrics.getMetricValue(k)),
          (a, b) => Long.box(math.max(a, b)))
      }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorMetricsUpdate(
          e: SparkListenerExecutorMetricsUpdate): Unit =
        e.executorUpdates.values.foreach(bump)
      override def onStageExecutorMetrics(
          s: SparkListenerStageExecutorMetrics): Unit =
        bump(s.executorMetrics)
    })

    // belt-and-braces: a 100 ms sampler over the public storage-info
    // API, for the pinned-block peak even if no heartbeat lands.
    // Peaks are keyed by the same EPOCH the main loop bumps after the
    // between-query reset — a sampler iteration that started before
    // the reset publishes into the OLD epoch's slot instead of
    // racing the shared peak back up (ADVICE r11 #4: the previous
    // `@volatile var` could be re-published right after zeroing).
    val sampledPeaks = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    val sampler = new Thread(() => {
      while (true) {
        // tolerate the race with spark.stop() at process exit — the
        // daemon thread may sample a stopped context once
        try {
          val e = Long.box(epoch.get())
          val s = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
          sampledPeaks.merge(e, Long.box(s), (a, b) => Long.box(math.max(a, b)))
        } catch { case _: Exception => () }
        Thread.sleep(100)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val pools = ManagementFactory.getMemoryPoolMXBeans
    import scala.jdk.CollectionConverters._
    def heapPools = pools.asScala.filter(
      _.getType == java.lang.management.MemoryType.HEAP)
    def mb(b: Long): Long = b / (1024 * 1024)

    Tables.all.foreach(n => Tables.t(spark, sfDir, n).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc(); Thread.sleep(500)
      heapPools.foreach(_.resetPeakUsage())
      // one bump isolates BOTH the storage sampler and the listener
      // peaks: straggling heartbeats from the previous query carry the
      // old epoch key and can no longer inflate this query's row
      epoch.incrementAndGet()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // let the last poll land before reading the Spark-side peaks
      Thread.sleep(1000)
      val poolSum = heapPools.map(p => Option(p.getPeakUsage).map(_.getUsed)
        .getOrElse(0L)).sum
      val storageSampledPeak = Option(sampledPeaks.get(Long.box(epoch.get())))
        .map(_.longValue).getOrElse(0L)
      def p(k: String): Long =
        mb(Option(peaks.get(s"${epoch.get()}:$k")).map(_.longValue).getOrElse(0L))
      println(f"""[heap] {"query":"$name","sec":$sec%.1f,"heap_peak_mb":${p("JVMHeapMemory")},"heap_pool_sum_mb":${mb(poolSum)},"exec_peak_mb":${p("OnHeapExecutionMemory")},"storage_peak_mb":${p("OnHeapStorageMemory")},"storage_sampled_peak_mb":${mb(storageSampledPeak)},"unified_peak_mb":${p("OnHeapUnifiedMemory")},"xmx_mb":${mb(Runtime.getRuntime.maxMemory)}}""")
    }
    spark.stop()
  }
}
