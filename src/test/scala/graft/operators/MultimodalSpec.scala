package graft.operators

import graft.SparkSpec

/** Drives the multimodal plumbing end-to-end on the sf0.001 testdata. */
class MultimodalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaFromDocuments(spark, dir).collect()
    assert(m.nonEmpty)
    assert(m.forall(r => r.bytes.nonEmpty && r.width >= 16 && r.height >= 16))
    assert(m.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and fixed-width") {
    val f1 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    assert(f1.forall(_.features.length == 16))
    val m1 = f1.map(r => r.media_id -> r.features.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.features.toSeq).toMap
    assert(m1 == m2)
  }

  test("resize re-shapes the payload") {
    val r = Multimodal.resize(
      Multimodal.mediaFromDocuments(spark, dir).limit(5), 32, 32).collect()
    assert(r.forall(m => m.width == 32 && m.height == 32 &&
      m.bytes.length == 32 * 32))
  }

  test("frame sampling fans out only video rows") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaFromDocuments(spark, dir)).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    val perMedia = frames.groupBy(_.media_id)
    assert(perMedia.values.exists(_.length > 1)) // real fan-out happened
  }
}
