package graft

import graft.pipeline.TrainingExport
import org.apache.spark.sql.functions._

class TrainingExportSpec extends SparkSpec {

  private def outDir(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-export-spec-$tag"

  test("JSONL export roundtrips every document and balances shards") {
    val docs = Tables.docs(spark, sf())
    val dir = outDir("roundtrip")
    val manifest = TrainingExport.exportJsonl(docs, dir, shards = 8).collect()

    // every document accounted for, across a non-degenerate shard set
    assert(manifest.map(_.getLong(1)).sum == docs.count())
    assert(manifest.length == 8, "500 docs over 8 content-hashed shards " +
      "should leave no shard empty")

    // readback equals source row-for-row (id + text), not just counts
    val back = spark.read.schema(docs.schema).json(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val src = docs.select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "JSONL roundtrip must preserve every row byte-for-byte")

    // files are laid out one dir per shard
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 8)
  }

  test("shard assignment is content-addressed: re-export is identical") {
    val docs = Tables.docs(spark, sf())
    val a = TrainingExport.exportJsonl(docs, outDir("det-a"), shards = 4)
      .collect().toSeq
    // scan-order independence: a shuffled copy of the corpus exports
    // the same manifest (same membership, same checksums)
    val b = TrainingExport.exportJsonl(
        docs.repartition(7, col("lang")), outDir("det-b"), shards = 4)
      .collect().toSeq
    assert(a == b, "manifest must not depend on scan order or layout")
  }

  test("manifest detects a lost shard") {
    val docs = Tables.docs(spark, sf())
    val dir = outDir("tamper")
    val full = TrainingExport.exportJsonl(docs, dir, shards = 4).collect()
    // drop one shard directory wholesale
    val victim = new java.io.File(dir, "shard=2")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(victim)
    val after = TrainingExport
      .manifest(spark, dir, docs.schema).collect()
    assert(after.length == full.length - 1,
      "a lost shard must vanish from the manifest, not silently zero")
  }
}
