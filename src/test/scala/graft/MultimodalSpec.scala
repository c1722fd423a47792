package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures produces fixed-dim deterministic features") {
    val media = Seq(
      (1L, "image", "hello".getBytes("UTF-8"), 10, 10, 0),
      (2L, "audio", Array[Byte](), 0, 0, 100))
      .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms")
    val got = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f1 = got(0).getSeq[Double](2)
    assert(f1.length == Multimodal.FeatureDim)
    assert(f1.head == 5.0) // byte length
    // deterministic: same bytes → same features
    val again = Multimodal.extractFeatures(media).orderBy("media_id")
      .collect()(0).getSeq[Double](2)
    assert(f1 == again)
    // empty payload doesn't crash the decoder
    assert(got(1).getSeq[Double](2).head == 0.0)
  }

  test("sampleFrames multiplies video rows by duration/step") {
    val media = Seq(
      (1L, "video", "0123456789abcdef0123".getBytes("UTF-8"), 0, 0, 1200),
      (2L, "image", "xx".getBytes("UTF-8"), 0, 0, 0))
      .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms")
    val frames = Multimodal.sampleFrames(media, 500)
    val got = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L)) // frames at 0, 500, 1000; image dropped
  }

  test("resizeImages fits aspect-preserving with 1-pixel floor") {
    val bytes = Array.fill[Byte](1000)(7)
    val media = Seq(
      (1L, "image", bytes, 448, 224, 0),   // landscape 2:1 → 224×112
      (2L, "image", bytes, 10000, 10, 0),  // extreme aspect → 224×1 (floor)
      (3L, "video", bytes, 448, 224, 0))   // non-image dropped
      .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms")
    val got = Multimodal.resizeImages(media, 224).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).length))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 224 && got(1L)._2 == 112)
    // payload shrinks by the exact pixel ratio (integer ceil)
    assert(got(1L)._3 == (1000L * 224 * 112 + 448L * 224 - 1) / (448L * 224))
    assert(got(2L)._1 == 224 && got(2L)._2 == 1)
  }
}
