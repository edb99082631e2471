package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Restart fidelity: a file-source stream with a checkpoint, stopped
  * and restarted after new data lands, must process every input row
  * EXACTLY once across the restart — the property that makes a
  * 100 TB streaming ingest resumable after any crash or deploy. The
  * checkpoint (source offsets + sink commit log) is what carries the
  * guarantee; this spec kills the query between two file arrivals and
  * counts rows seen by the sink.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("restarted stream resumes from the checkpoint, each row exactly once") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val srcDir = base.resolve("src").toString
    val ckDir = base.resolve("ck").toString

    val events = Tables.events(spark, sf())
    val half1 = events.filter(col("event_id") % 2 === 0)
    val half2 = events.filter(col("event_id") % 2 === 1)
    val n1 = half1.count()
    val n2 = half2.count()
    half1.write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    val seen = new AtomicLong(0)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen.addAndGet(batch.count()): Unit
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    runOnce() // processes half 1
    assert(seen.get() == n1, s"first run must see exactly half 1 (${n1})")

    half2.write.mode("append").parquet(srcDir) // new data lands while down
    runOnce() // restart from the same checkpoint

    // exactly once: half 1 was NOT reprocessed, half 2 arrived whole
    assert(seen.get() == n1 + n2,
      s"expected ${n1 + n2} total rows across restart, saw ${seen.get()}")
  }
}
