package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Mp4ProbeSpec extends AnyFunSuite {

  test("mvhd v0/v1 duration and tkhd fixed-point dims parse exactly") {
    for (v1 <- Seq(false, true)) {
      val p = SyntheticVideo.mp4Of(90000, 90000L * 12 + 4500, Seq((1920, 1080)), v1)
      val info = Mp4Probe.probe(p).getOrElse(fail(s"probe failed v1=$v1"))
      assert(info.durationMs == 12050L) // 12.05 s at timescale 90000
      assert(info.width == 1920 && info.height == 1080 && info.nTracks == 1)
    }
  }

  test("non-visual tracks are skipped; track count includes them") {
    val p = SyntheticVideo.mp4Of(1000, 5000, Seq((0, 0), (640, 360), (848, 480)))
    val info = Mp4Probe.probe(p).get
    assert(info.width == 640 && info.height == 360) // first SIZED track wins
    assert(info.nTracks == 3)
    // sound-only movie: duration still parses, dims stay 0
    val audio = Mp4Probe.probe(SyntheticVideo.mp4Of(600, 1234, Seq((0, 0)))).get
    assert(audio.durationMs == 1234L * 1000 / 600 && audio.width == 0)
  }

  test("64-bit largesize and size-0 (to-end) box forms both walk") {
    val base = SyntheticVideo.mp4Of(1000, 7000, Seq((100, 50)))
    val ftypLen = ((base(0) & 0xff) << 24) | ((base(1) & 0xff) << 16) |
      ((base(2) & 0xff) << 8) | (base(3) & 0xff)
    val moov = base.drop(ftypLen)
    // largesize form: size=1, type, then u64 size (+8 for the wider header)
    val wide = base.take(ftypLen) ++
      Array[Byte](0, 0, 0, 1) ++ moov.slice(4, 8) ++
      Array[Byte](0, 0, 0, 0) ++ {
        val n = moov.length + 8
        Array(((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
          ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
      } ++ moov.drop(8)
    assert(Mp4Probe.probe(wide).contains(Mp4Probe.Info(7000, 100, 50, 1)))
    // size-0 form: moov extends to end of file
    val zero = base.clone()
    for (k <- 0 until 4) zero(ftypLen + k) = 0
    assert(Mp4Probe.probe(zero).contains(Mp4Probe.Info(7000, 100, 50, 1)))
  }

  test("rejects: truncation, bad sizes, junk, null") {
    val full = SyntheticVideo.mp4Of(1000, 3000, Seq((64, 48)))
    assert(Mp4Probe.probe(full).isDefined)
    for (keep <- Seq(4, 12, full.length / 2, full.length - 3))
      assert(Mp4Probe.probe(full.take(keep)).isEmpty, s"keep=$keep")
    // a box size smaller than its header must fail, not loop
    val bad = full.clone()
    bad(0) = 0; bad(1) = 0; bad(2) = 0; bad(3) = 4
    assert(Mp4Probe.probe(bad).isEmpty)
    assert(Mp4Probe.probe(SyntheticMedia.png(4, 4)).isEmpty)
    assert(Mp4Probe.probe(SyntheticAudio.wavFull(8000, 1, 8, 1)).isEmpty)
    assert(Mp4Probe.probe(null).isEmpty)
    assert(Mp4Probe.probe("RIFFnotanmp4file".getBytes).isEmpty)
  }

  test("fuzz: mutations and truncations never throw") {
    val rnd = new scala.util.Random(13)
    val full = SyntheticVideo.mp4Of(48000, 480007, Seq((12, 34), (0, 0)), mvhdV1 = true)
    for (_ <- 0 until 300) {
      val mut = full.clone()
      val i = rnd.nextInt(mut.length)
      mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      Mp4Probe.probe(mut)
      Mp4Probe.probe(mut.take(rnd.nextInt(mut.length)))
    }
  }
}
