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

  test("HeaderDecoder parses synthetic PNG/JPEG/GIF dimensions") {
    assert(HeaderDecoder.probe(SyntheticMedia.png(640, 480))
      .contains(MediaDecoder.Info("png", 640, 480)))
    assert(HeaderDecoder.probe(SyntheticMedia.jpeg(123, 45))
      .contains(MediaDecoder.Info("jpeg", 123, 45)))
    assert(HeaderDecoder.probe(SyntheticMedia.gif(70000 % 65536, 2))
      .contains(MediaDecoder.Info("gif", 70000 % 65536, 2)))
    // wide dims exercise high bytes on both endiannesses
    assert(HeaderDecoder.probe(SyntheticMedia.png(65537, 300))
      .contains(MediaDecoder.Info("png", 65537, 300)))
    assert(HeaderDecoder.probe(SyntheticMedia.gif(513, 1027))
      .contains(MediaDecoder.Info("gif", 513, 1027)))
  }

  test("HeaderDecoder rejects junk, truncation, and SOF-less JPEG") {
    assert(HeaderDecoder.probe(null).isEmpty)
    assert(HeaderDecoder.probe(Array[Byte]()).isEmpty)
    assert(HeaderDecoder.probe("not an image at all".getBytes).isEmpty)
    assert(HeaderDecoder.probe(SyntheticMedia.png(10, 10).take(20)).isEmpty)
    // SOI + APP0 only, then EOI: walker must not read past the end
    val noSof = Array(0xff, 0xd8).map(_.toByte) ++
      SyntheticMedia.jpeg(1, 1).slice(2, 20) ++ Array(0xff, 0xd9).map(_.toByte)
    assert(HeaderDecoder.probe(noSof).isEmpty)
  }

  test("probeHeaders appends format/dims distributed, null on non-media") {
    val withImages = media.union(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, "image", "image/png",
          SyntheticMedia.png(320, 200), Row(null, null, null)))),
      Multimodal.mediaSchema))
    val out = Multimodal.probeHeaders(withImages).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getAs[String]("format") == "png")
    assert(out(10L).getAs[Int]("img_width") == 320)
    assert(out(10L).getAs[Int]("img_height") == 200)
    assert(out(1L).getAs[String]("format") == null) // 5 junk bytes
  }

  test("sampleFramePlan expands video durations at step") {
    val frames = Multimodal.sampleFramePlan(media, stepMs = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.map(_._1).distinct.sameElements(Array(4L)))
    assert(frames.map(_._2).sameElements(Array(0L, 1000L, 2000L, 3000L)))
  }
}
