package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "image/png", Array[Byte](1, 2, 3, 4, 5), Row(64, 48, null)),
      Row(2L, "image", "image/png", Array[Byte](1, 2, 3, 4, 5), Row(64, 48, null)),
      Row(3L, "audio", "audio/wav", Array[Byte](9, 9, 9), Row(null, null, 4000L)),
      Row(4L, "video", "video/mp4", Array[Byte](7), Row(320, 240, 3500L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractFeatures: fixed-dim vectors, deterministic on same payload") {
    val f = Multimodal.extractFeatures(media, dim = 32).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](2)).toMap
    assert(f.size == 4)
    assert(f.values.forall(_.length == 32))
    assert(f(1L) == f(2L))   // same payload -> same features
    assert(f(1L) != f(3L))
  }

  test("mediaStats: size, md5, magic bytes without decode") {
    val s = Multimodal.mediaStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(s(1L).getAs[Int]("n_bytes") == 5)
    assert(s(1L).getAs[String]("payload_md5") == s(2L).getAs[String]("payload_md5"))
    assert(s(1L).getAs[String]("magic") == "01020304")
  }

  test("sampleFramePlan expands video durations at step") {
    val frames = Multimodal.sampleFramePlan(media, stepMs = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.map(_._1).distinct.sameElements(Array(4L)))
    assert(frames.map(_._2).sameElements(Array(0L, 1000L, 2000L, 3000L)))
  }
}
