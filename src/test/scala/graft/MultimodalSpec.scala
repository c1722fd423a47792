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
}
