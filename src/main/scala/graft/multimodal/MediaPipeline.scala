package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.13 L5 / builder north
  * star): media payloads ride through the engine as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs
  * partition-local over the typed Dataset — the Scala analogue of a
  * Pandas-UDF batch pipeline.
  *
  * The decode step is a STUB: image/audio codecs are not available in
  * this environment, so [[decodeFeatures]] computes deterministic
  * fake features from the raw bytes. Everything around it — schema,
  * binary column handling, partition-local iteration, typed output —
  * is the real plumbing a codec would drop into.
  */
object MediaPipeline {

  /** A multimodal row: id + media kind + opaque payload. */
  final case class Media(doc_id: Long, kind: String, payload: Array[Byte])

  /** Features the (stub) decoder extracts per payload. */
  final case class MediaFeatures(
      doc_id: Long, kind: String, byte_len: Int,
      brightness: Double, n_frames: Int, header_checksum: Long)

  /** Attach a synthetic 32-byte payload + kind metadata to documents.
    * (Deterministic: payload bytes derive from md5 of the text, kind
    * from n_chars — a stand-in for real object-store media refs.)
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("n_chars") % 3 === 0, "image")
        .when(col("n_chars") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("1"))))).as("payload"))

  /** STUB decode: partition-local feature extraction over the binary
    * payload. A real implementation would decode image/audio frames
    * here; the Spark-side shape (mapPartitions over a typed Dataset,
    * no collect, no shuffle) is what matters at 100 TB.
    */
  def decodeFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload.map(_ & 0xff)
        val len = bytes.length
        MediaFeatures(
          m.doc_id, m.kind, len,
          if (len == 0) 0.0 else math.round(bytes.sum.toDouble / len * 1e6) / 1e6,
          len / 8,
          bytes.take(8).map(_.toLong).sum)
      }
    }
  }
}
