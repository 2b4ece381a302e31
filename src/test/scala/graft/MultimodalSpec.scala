package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.synthesize(
    spark.range(0, 20).toDF("id"), "id")

  test("synthesize produces deterministic binary payloads with media schema") {
    val a = media.orderBy("media_id").collect()
    val b = media.orderBy("media_id").collect()
    assert(a.length === 20)
    assert(a.map(_.getAs[Array[Byte]]("payload").toSeq) ===
      b.map(_.getAs[Array[Byte]]("payload").toSeq))
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("decodeMeta fills the typed metadata struct per partition") {
    val out = Multimodal.decodeMeta(media)
    assert(out.schema("decoded_meta").dataType === Multimodal.mediaMetaType)
    val m = out.select("decoded_meta.*").collect()
    assert(m.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64))
    assert(m.forall(r => Set("image/jpeg", "image/png", "audio/wav", "video/mp4")
      .contains(r.getString(0))))
  }

  test("extractFeatures emits fixed-width float vectors") {
    val out = Multimodal.extractFeatures(media)
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length === 16))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(feats.toSeq === again.toSeq)
  }

  test("decodeAndFeaturize (fused) matches the decodeMeta→extractFeatures chain") {
    val fused = Multimodal.decodeAndFeaturize(media).orderBy("media_id")
    val chained = Multimodal.extractFeatures(Multimodal.decodeMeta(media)).orderBy("media_id")
    assert(fused.schema === chained.schema)
    val f = fused.select("media_id", "decoded_meta", "features").collect()
    val c = chained.select("media_id", "decoded_meta", "features").collect()
    assert(f.toSeq === c.toSeq)
    // odd partial batch exercised (20 rows, batchSize 7)
    val partial = Multimodal.decodeAndFeaturize(media, batchSize = 7)
    assert(partial.count() === 20)
  }

  test("resize rewrites payloads to the target size budget") {
    val out = Multimodal.resize(media, 128, 128)
    val sizes = out.select("payload").collect().map(_.getAs[Array[Byte]](0).length).distinct
    assert(sizes.toSeq === Seq((128 * 128) / 64))
  }

  test("sampleFrames flat-maps one row per frame with frame index") {
    val withMeta = Multimodal.decodeMeta(media)
      .withColumnRenamed("meta", "meta_orig").withColumnRenamed("decoded_meta", "meta")
    val frames = Multimodal.sampleFrames(withMeta, everyMs = 16)
    assert(frames.count() > media.count()) // fan-out happened
    assert(frames.schema.fieldNames.contains("frame_idx"))
    val perDoc = frames.groupBy("media_id").count().select(min("count")).first().getLong(0)
    assert(perDoc >= 1)
  }
}
