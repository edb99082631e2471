package graft

import graft.pipeline.CorpusPrep
import org.apache.spark.sql.functions._

/** Invariants of the end-to-end corpus-prep composition (the oracle
  * equality of the full pipeline is q107's driver check; these pin
  * the properties a training run depends on).
  */
class CorpusPrepSpec extends SparkSpec {

  private lazy val docs = Tables.docs(spark, sf())
  private lazy val prepared = CorpusPrep.prepare(docs, minTokens = 5).cache()

  test("prepare only drops rows, keeps no duplicate text, ids from input") {
    val nIn = docs.count()
    val nOut = prepared.count()
    assert(nOut > 0 && nOut <= nIn)
    assert(prepared.select("text").distinct().count() == nOut,
      "exact dedup must leave texts unique")
    assert(prepared.join(docs, Seq("doc_id"), "left_anti").isEmpty,
      "kept ids must come from the input")
    val minToks = prepared.agg(min("nt")).head.getLong(0)
    assert(minToks >= 5, s"gate floor violated: $minToks")
  }

  test("prepare is deterministic") {
    val again = CorpusPrep.prepare(docs, minTokens = 5)
    assert(prepared.select("doc_id").except(again.select("doc_id")).isEmpty)
    assert(again.select("doc_id").except(prepared.select("doc_id")).isEmpty)
  }

  test("pack plans over the pinned sizing frame, never re-running dedup") {
    // VERDICT r4 #3: globalCumsum consumes its input twice; without the
    // localCheckpoint in pack() the whole gate→dedup→LSH→CC subtree
    // (and its parquet scans) would appear — and execute — twice. The
    // pin: pack's executed plan reads ONLY the checkpointed RDDs, with
    // zero file scans left below the cumsum.
    val packed = CorpusPrep.pack(CorpusPrep.prepare(docs, minTokens = 5), seqLen = 512)
    packed.write.format("noop").mode("overwrite").save()
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      s"pack must read the pinned frame, not re-scan files:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan rdd"),
      s"expected a checkpoint scan in pack's plan:\n$plan")
  }

  test("pack covers every kept token exactly once, in-bound sequences") {
    val packed = CorpusPrep.pack(prepared, seqLen = 512).cache()
    val totalPacked = packed.agg(sum("n_tokens")).head.getLong(0)
    val totalKept = prepared.agg(sum("nt")).head.getLong(0)
    assert(totalPacked == totalKept,
      s"packed $totalPacked tokens, kept corpus has $totalKept")
    val bad = packed.filter(col("n_tokens") > 512 || col("n_tokens") < 1).count()
    assert(bad == 0, "every sequence holds 1..512 tokens")
    // all but the tail sequence are exactly full
    val underfull = packed.filter(col("n_tokens") < 512).count()
    assert(underfull <= 1, s"only the tail may be short, got $underfull")
  }
}
