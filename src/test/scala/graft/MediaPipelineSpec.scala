package graft

import graft.multimodal.MediaPipeline

class MediaPipelineSpec extends SparkSpec {

  test("payload is 32 deterministic bytes with kind metadata") {
    val df = MediaPipeline.withPayload(Tables.t(spark, sf(), "documents"))
    val row = df.orderBy("doc_id").head()
    assert(row.getAs[Array[Byte]]("payload").length == 32)
    assert(Set("image", "audio", "video").contains(row.getAs[String]("kind")))
    // determinism: same input → same payload
    val again = MediaPipeline.withPayload(Tables.t(spark, sf(), "documents"))
      .orderBy("doc_id").head().getAs[Array[Byte]]("payload")
    assert(row.getAs[Array[Byte]]("payload").sameElements(again))
  }

  test("decode stub extracts partition-local features") {
    import spark.implicits._
    val media = MediaPipeline.withPayload(Tables.t(spark, sf(), "documents"))
      .as[MediaPipeline.Media]
    val feats = MediaPipeline.decodeFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.byte_len == 32))
    assert(feats.forall(_.n_frames == 4))
    assert(feats.forall(f => f.brightness >= 0 && f.brightness <= 255))
    // checksum is the sum of the first 8 unsigned bytes
    assert(feats.forall(f => f.header_checksum >= 0 && f.header_checksum <= 8 * 255))
  }
}
