package graft.queries

import graft.{Q, Tables}
import graft.multimodal.MediaPipeline
import graft.stats.SchemaPreview
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.13 L5 + §3.3 — schema preview on the documents table
  * and the multimodal binary-column pipeline. q54/q54b/q55 keep
  * Spark's side in real `binary` (unhex → BinaryType → hex) while
  * the oracle mirrors the arithmetic in the hex-string domain
  * (DuckDB 1.0 has no blob substring). The typed mapPartitions
  * decode stub lives in MediaPipeline and is spec-pinned equal to
  * the q55 expression form.
  */
object MultimodalOps {

  private val statCols = Seq("doc_id", "n_chars")

  val q53 = Q(
    "q53_schema_preview_documents",
    (s, dir) => SchemaPreview.columnStats(Tables.t(s, dir, "documents"), statCols),
    Some(SchemaPreview.columnStatsSql("documents", statCols)))

  /** Binary payload metadata: byte length, 4-byte hex prefix, and a
    * 4-point stride sample — computed on a real BinaryType column.
    */
  val q54 = Q(
    "q54_media_metadata",
    (s, dir) => {
      MediaPipeline.withPayload(Tables.t(s, dir, "documents"))
        .withColumn("hexp", hex(col("payload")))
        .select(
          col("doc_id"), col("kind"),
          length(col("payload")).as("byte_len"),
          substring(col("hexp"), 1, 8).as("prefix4"),
          concat(
            substring(col("hexp"), 1, 2), substring(col("hexp"), 17, 2),
            substring(col("hexp"), 33, 2), substring(col("hexp"), 49, 2)).as("stride_sample"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      |  CASE WHEN n_chars % 3 = 0 THEN 'image'
      |       WHEN n_chars % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CAST(length(hexp) / 2 AS INTEGER) AS byte_len,
      |  substr(hexp, 1, 8) AS prefix4,
      |  substr(hexp, 1, 2) || substr(hexp, 17, 2) ||
      |    substr(hexp, 33, 2) || substr(hexp, 49, 2) AS stride_sample
      |FROM (SELECT doc_id, n_chars,
      |        upper(md5(text) || md5(text || '1')) AS hexp
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin))

  /** Decode-stub features (byte length, mean byte "brightness",
    * frame count, header checksum) computed as codegen'd expressions
    * over the BinaryType payload, with the oracle mirroring the byte
    * arithmetic in the hex domain (nibble values via instr on the hex
    * alphabet — DuckDB has no conv). The typed mapPartitions decoder
    * (MediaPipeline.decodeFeatures — where a real codec would drop
    * in) is pinned EQUAL to this expression form by
    * MediaPipelineSpec, so the registry entry is fully oracle-checked
    * while the Pandas-UDF-shaped plumbing stays covered.
    *
    * brightness = bytesum/32 is exact in binary AND ≤6 decimal
    * digits (1/32 = 0.03125), so round(·,6) is the identity on both
    * engines — no float-rounding hazard in the hash compare.
    */
  val q55 = Q(
    "q55_media_decode_features",
    (s, dir) => {
      val byteSum = (n: Int) => expr(
        s"""aggregate(sequence(1, $n), 0L,
           |  (acc, i) -> acc + cast(conv(substring(hexp, i*2-1, 2), 16, 10) AS bigint))""".stripMargin)
      MediaPipeline.withPayload(Tables.t(s, dir, "documents"))
        .withColumn("hexp", hex(col("payload")))
        .withColumn("bytesum", byteSum(32))
        .select(
          col("doc_id"), col("kind"),
          length(col("payload")).as("byte_len"),
          round(col("bytesum") / 32.0, 6).as("brightness"),
          (length(col("payload")) / 8).cast("int").as("n_frames"),
          byteSum(8).as("header_checksum"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      |  CASE WHEN n_chars % 3 = 0 THEN 'image'
      |       WHEN n_chars % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  CAST(length(hexp) / 2 AS INTEGER) AS byte_len,
      |  round(list_sum(
      |    [(instr('0123456789ABCDEF', substr(hexp, i*2-1, 1)) - 1) * 16
      |     + instr('0123456789ABCDEF', substr(hexp, i*2, 1)) - 1
      |     for i in generate_series(1, 32)]) / 32.0, 6) AS brightness,
      |  CAST(length(hexp) / 2 / 8 AS INTEGER) AS n_frames,
      |  CAST(list_sum(
      |    [(instr('0123456789ABCDEF', substr(hexp, i*2-1, 1)) - 1) * 16
      |     + instr('0123456789ABCDEF', substr(hexp, i*2, 1)) - 1
      |     for i in generate_series(1, 8)]) AS BIGINT) AS header_checksum
      |FROM (SELECT doc_id, n_chars,
      |        upper(md5(text) || md5(text || '1')) AS hexp
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin))

  /** Frame sampling over the binary payload: treat the 32-byte
    * payload as 4 8-byte "frames" and sample frames 1 and 3 (stride
    * 2) — the resize/frame-sample plumbing of a video pipeline, with
    * the oracle mirroring the byte arithmetic in the hex domain.
    */
  val q54b = Q(
    "q54b_media_frame_sample",
    (s, dir) => {
      MediaPipeline.withPayload(Tables.t(s, dir, "documents"))
        .withColumn("hexp", hex(col("payload")))
        .select(
          col("doc_id"), col("kind"),
          (length(col("payload")) / 8).cast("int").as("n_frames"),
          substring(col("hexp"), 1, 16).as("frame0"),
          substring(col("hexp"), 33, 16).as("frame2"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      |  CASE WHEN n_chars % 3 = 0 THEN 'image'
      |       WHEN n_chars % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS kind,
      |  4 AS n_frames,
      |  substr(hexp, 1, 16) AS frame0,
      |  substr(hexp, 33, 16) AS frame2
      |FROM (SELECT doc_id, n_chars,
      |        upper(md5(text) || md5(text || '1')) AS hexp
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin))

  val all: Vector[Q] = Vector(q53, q54, q54b, q55)
}
