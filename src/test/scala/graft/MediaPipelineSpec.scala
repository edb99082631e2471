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

  test("typed mapPartitions decoder equals the q55 expression form") {
    import spark.implicits._
    // the registry's q55 is the oracle-checked expression version;
    // this pins the mapPartitions twin (where a real codec would go)
    // to the exact same features, so both stay correct together
    val media = MediaPipeline.withPayload(Tables.t(spark, sf(), "documents"))
      .as[MediaPipeline.Media]
    val typed = MediaPipeline.decodeFeatures(media).toDF()
    val exprForm = Q.registry.find(_.name == "q55_media_decode_features").get
      .fn(spark, sf())
      .select(typed.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    assert(typed.exceptAll(exprForm).isEmpty && exprForm.exceptAll(typed).isEmpty,
      "decode stub and expression form must produce identical features")
  }
}
