package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Sharded JSONL corpus export — the sink a training run reads.
  *
  * Tokenizer/trainer pipelines consume line-delimited JSON shards
  * (one document per line, shard files sized for one loader worker
  * each), not parquet: every major open-data corpus release ships
  * this layout. The export must be DETERMINISTIC — re-running over
  * the same corpus yields byte-identical shard membership — so that
  * resumed/partial exports and cross-site reproductions agree.
  *
  * Shard assignment is therefore content-addressed, not positional:
  * `md5(doc_id) % shards` (the same portable 60-bit MD5 prefix the
  * dedup operators use, [[Portable.md5Long]]) — never
  * `monotonically_increasing_id` or `spark_partition_id`, which
  * depend on scan order and cluster layout. At 100 TB the export is
  * one hash-partitioned write: no global sort, no driver
  * materialization, each task streams one shard.
  *
  * The returned manifest is computed from a READBACK of the written
  * files — shard id, document count, whitespace-token count, and an
  * order-independent 60-bit XOR checksum over `doc_id|text` — so a
  * lost row, a mangled JSON escape, or a truncated file shows up as
  * a manifest diff against the source-side oracle, which computes
  * the identical aggregate straight from the corpus table (q177).
  */
object TrainingExport {

  val ShardCol = "shard"

  /** Content-addressed shard id in [0, shards). */
  def shardId(key: Column, shards: Int): Column =
    (Portable.md5Long(key.cast("string")) % shards).cast("int")

  /** DuckDB-dialect twin of [[shardId]] for oracle SQL. */
  def shardIdSql(expr: String, shards: Int): String =
    s"CAST(${Portable.md5LongSql(s"CAST($expr AS VARCHAR)")} % $shards AS INTEGER)"

  /** Write `df` as `shards` JSONL shard directories under `dir`
    * (`shard=K/part-*.json`, one JSON document per line) and return
    * the readback manifest: one row per non-empty shard with
    * `(shard, n_docs, n_tokens, checksum)`, ordered by shard.
    *
    * `keyCol` must be a stable document key; `textCol` feeds the
    * token count and the roundtrip checksum.
    */
  def exportJsonl(
      df: DataFrame, dir: String, shards: Int,
      keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(shards >= 1, s"shard count must be positive, got $shards")
    val spark = df.sparkSession
    val withShard = df.withColumn(ShardCol, shardId(col(keyCol), shards))
    // repartition ON the shard id: each write task holds whole shards,
    // so a shard is one file (plus hash collisions), not #tasks files
    withShard
      .repartition(shards, col(ShardCol))
      .write.mode("overwrite").partitionBy(ShardCol).json(dir)
    manifest(spark, dir, df.drop(ShardCol).schema, keyCol, textCol)
  }

  /** Manifest of an existing JSONL export: read the shards back with
    * the corpus schema (shard id re-derived from the partition dirs)
    * and aggregate per shard. Runs one scan; the checksum is
    * XOR-aggregated so it is independent of row order within a shard.
    */
  def manifest(
      spark: SparkSession, dir: String,
      dataSchema: org.apache.spark.sql.types.StructType,
      keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    spark.read.schema(dataSchema).json(dir)
      .groupBy(col(ShardCol).cast("int").as(ShardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(Portable.tokens(col(textCol)))).as("n_tokens"),
        bit_xor(Portable.md5Long(
          concat_ws("|", col(keyCol).cast("string"), col(textCol))))
          .as("checksum"))
      .orderBy(ShardCol)
  }

  /** Source-side manifest oracle (DuckDB dialect) over `table` —
    * what [[exportJsonl]]'s readback manifest must equal when the
    * write lost or mangled nothing.
    */
  def manifestOracleSql(table: String, shards: Int,
      keyCol: String = "doc_id", textCol: String = "text"): String =
    s"""SELECT ${shardIdSql(keyCol, shards)} AS $ShardCol,
       |  count(*) AS n_docs,
       |  CAST(sum(len(${Portable.tokensSql(textCol)})) AS BIGINT) AS n_tokens,
       |  bit_xor(${Portable.md5LongSql(s"concat_ws('|', $keyCol, $textCol)")}) AS checksum
       |FROM $table
       |GROUP BY 1
       |ORDER BY $ShardCol""".stripMargin
}
