package graft

import scala.jdk.CollectionConverters._
import scala.sys.process._

/** Gated production-mode proof: runs HiveDemo — the SAME Warehouse
  * facade against a REAL Hive metastore (enableHiveSupport + embedded
  * Derby) — as a forked JVM from the suite, so the metastore path
  * cannot silently rot between rounds. Forked because
  * catalogImplementation is frozen at the first SparkSession of a
  * process; the fork inherits this JVM's --add-opens set (sbt put it
  * there for the same Spark-on-JDK17 reason).
  */
class HiveDemoSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("HiveDemo round-trips DDL + query through a Derby metastore") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), "graft.HiveDemo")
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'), _ => ())
    val rc = Process(cmd).!(logger)
    val o = out.toString
    assert(rc == 0, s"HiveDemo exited $rc:\n${o.takeRight(4000)}")
    assert(o.contains("catalogImplementation=hive"), o.takeRight(2000))
    assert(o.contains("healthy=true"), o.takeRight(2000))
    assert(o.contains("rows=3 external=true"), o.takeRight(2000))
    assert(o.contains("csv still present=true"), o.takeRight(2000))
    // S6 on the production path: Hive-managed partitions are invisible
    // until MSCK REPAIR registers them, then both show up
    assert(o.contains(
      "partitioned: rows before msck=0 after=4 partitions=region=asia,region=eu"),
      o.takeRight(2000))
    assert(o.contains("partitioned dropped; part file still present=true"),
      o.takeRight(2000))
    // the deploy smoke probe runs green against the real metastore
    assert(o.contains("selftest ok=true"), o.takeRight(2000))
  }
}
