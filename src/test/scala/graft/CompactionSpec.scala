package graft

import graft.layout.Compaction

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

  test("compaction collapses small files to the byte-target count, losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    spark.range(0, 10000).toDF("id")
      .repartition(64)
      .write.mode("overwrite").parquet(dir)
    val before = parquetFiles(dir)
    // non-degenerate setup (the ZOrder lesson: assert the baseline is
    // actually bad before asserting the fix improved it)
    assert(before >= 32, s"expected many small files, got $before")

    val totalBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = totalBytes / 4 // aim for ~4 files
    val (b, a) = Compaction.compact(spark, dir, targetBytes = target)

    assert(b == before)
    assert(parquetFiles(dir) == a)
    assert(a <= 5 && a < before, s"after=$a before=$before")
    val out = spark.read.parquet(dir)
    assert(out.count() == 10000)
    assert(out.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == 10000L * 9999 / 2)
  }
}
