package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  private def grayPlane(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(k => f(k % w, k / w))

  test("gray tile-constant rasters round-trip EXACTLY (incl. crop + restarts)") {
    // dims off the 8-grid exercise edge replication + decoder crop;
    // odd seeds add restart markers every 4 MCUs
    for ((w, h, seed) <- Seq((25, 16, 189), (9, 7, 40), (16, 16, 7), (33, 26, 254))) {
      val img = JpegCodec.decode(SyntheticMedia.jpegFullGray(w, h, seed))
        .getOrElse(fail(s"decode failed ${w}x$h seed=$seed"))
      assert(img.width == w && img.height == h && img.channels == 1)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = (x / 8 * 5 + y / 8 * 11 + seed) % 256
        val got = img.pixels(y * w + x) & 0xff
        assert(got == expect, s"(${x},$y) seed=$seed: $got != $expect")
      }
    }
  }

  test("4:2:0 neutral-chroma color round-trips EXACTLY through MCU interleave") {
    for ((w, h, seed) <- Seq((23, 23, 125), (32, 10, 148), (14, 23, 16))) {
      val img = JpegCodec.decode(SyntheticMedia.jpegFullColor(w, h, seed))
        .getOrElse(fail(s"decode failed ${w}x$h"))
      assert(img.width == w && img.height == h && img.channels == 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val expect = (x / 16 * 5 + y / 16 * 11 + seed) % 256
        val got = img.pixels((y * w + x) * 3 + c) & 0xff
        assert(got == expect, s"($x,$y,$c) seed=$seed: $got != $expect")
      }
    }
  }

  test("4:2:2 neutral-chroma round-trips exactly (mixed sampling factors)") {
    // Y at (2,1), chroma at (1,1): MCUs are 16x8, luma tiles 16-wide/8-tall
    val (w, h) = (35, 19) // off both MCU grids: pad + crop both axes
    val y = grayPlane(w, h)((x, yy) => (x / 16 * 7 + yy / 8 * 13 + 31) % 256)
    val neutral = Array.fill(w * h)(128)
    val img = JpegCodec.decode(JpegEncoder.encode(w, h,
      Array(y, neutral, neutral), Array((2, 1), (1, 1), (1, 1))))
      .getOrElse(fail("4:2:2 decode failed"))
    assert(img.width == w && img.height == h && img.channels == 3)
    for (yy <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert((img.pixels((yy * w + x) * 3 + c) & 0xff) == y(yy * w + x),
        s"($x,$yy,$c)")
  }

  test("4:4:4 non-neutral chroma matches the JFIF transform of the coded YCbCr") {
    val (w, h) = (16, 8)
    // tile-constant planes so the YCbCr values survive the DCT exactly;
    // then the decoder's RGB must equal the same double-math transform
    val y = grayPlane(w, h)((x, yy) => (x / 8 * 50 + yy / 8 * 30 + 60) % 256)
    val cb = grayPlane(w, h)((x, yy) => (x / 8 * 40 + 90) % 256)
    val cr = grayPlane(w, h)((x, yy) => (yy / 8 * 70 + 140) % 256)
    val img = JpegCodec.decode(
      JpegEncoder.encodeYcc(w, h, y, cb, cr, subsample420 = false))
      .getOrElse(fail("decode failed"))
    def clamp(v: Long) = math.max(0L, math.min(255L, v)).toInt
    for (yy <- 0 until h; x <- 0 until w) {
      val k = yy * w + x
      val o = k * 3
      val (yv, cbv, crv) = (y(k), cb(k) - 128, cr(k) - 128)
      assert((img.pixels(o) & 0xff) == clamp(math.round(yv + 1.402 * crv)))
      assert((img.pixels(o + 1) & 0xff) ==
        clamp(math.round(yv - 0.344136 * cbv - 0.714136 * crv)))
      assert((img.pixels(o + 2) & 0xff) == clamp(math.round(yv + 1.772 * cbv)))
    }
  }

  test("random gray images round-trip within the unit-quant error bound") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val (w, h) = (24 + trial * 7, 17 + trial * 5)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      // random noise floods the AC path: every run/size symbol class,
      // ZRL, EOB, and multi-bit DC diffs all get exercised
      val img = JpegCodec.decode(JpegEncoder.encodeGray(w, h, px))
        .getOrElse(fail("decode failed"))
      assert(img.width == w && img.height == h)
      var maxErr = 0
      for (k <- 0 until w * h)
        maxErr = math.max(maxErr, math.abs((img.pixels(k) & 0xff) - px(k)))
      assert(maxErr <= 3, s"round-trip error $maxErr exceeds unit-quant bound")
    }
  }

  test("16-bit DQT (Pq=1) decodes identically to the 8-bit table") {
    val y = grayPlane(24, 16)((x, yy) => (x / 8 * 31 + yy / 8 * 17 + 5) % 256)
    val narrow = JpegCodec.decode(JpegEncoder.encodeGray(24, 16, y))
      .getOrElse(fail("8-bit DQT decode failed"))
    val wide = JpegCodec.decode(JpegEncoder.encodeGray(24, 16, y, wideDqt = true))
      .getOrElse(fail("16-bit DQT decode failed"))
    assert(narrow.pixels.sameElements(wide.pixels))
  }

  test("restart markers every MCU: DC predictors reset, stream stays aligned") {
    val y = grayPlane(40, 8)((x, yy) => (x / 8 * 43 + 3) % 256)
    val img = JpegCodec.decode(JpegEncoder.encodeGray(40, 8, y, restartInterval = 1))
      .getOrElse(fail("decode failed"))
    for (k <- 0 until 40 * 8)
      assert((img.pixels(k) & 0xff) == y(k))
  }

  test("gray scans are non-interleaved: declared sampling factors don't shape blocks") {
    val y = grayPlane(24, 16)((x, yy) => (x / 8 * 31 + yy / 8 * 17 + 5) % 256)
    val base = JpegEncoder.encodeGray(24, 16, y)
    val want = JpegCodec.decode(base).get.pixels
    // patch SOF0's sampling byte (1,1)→(2,2): T.81 A.2 says a single-
    // component scan ignores the factors (MCU = one data unit), so the
    // decode must be byte-identical — grayscale files converted from
    // color commonly keep their 2x2 luma factors
    val patched = base.clone()
    val sof = patched.indices.find(i => (patched(i) & 0xff) == 0xff &&
      i + 1 < patched.length && (patched(i + 1) & 0xff) == 0xc0).get
    assert((patched(sof + 11) & 0xff) == 0x11) // len(2) P(1) Y(2) X(2) Nf(1) C1(1) HV
    patched(sof + 11) = 0x22.toByte
    val got = JpegCodec.decode(patched).getOrElse(fail("2x2 gray decode failed"))
    assert(got.pixels.sameElements(want))
  }

  test("rejects: truncation, header-only, progressive, junk, null") {
    val full = SyntheticMedia.jpegFullGray(17, 12, 33)
    assert(JpegCodec.decode(full).isDefined)
    // cuts in headers and inside the scan fail closed (losing only the
    // trailing EOI still decodes — all MCUs are present, like libjpeg)
    for (keep <- Seq(3, 10, full.length / 2))
      assert(JpegCodec.decode(full.take(keep)).isEmpty, s"keep=$keep")
    assert(JpegCodec.decode(full.dropRight(2)).isDefined)
    assert(JpegCodec.decode(SyntheticMedia.jpeg(8, 8)).isEmpty) // SOF but no scan
    // flip SOF0 to SOF2 (progressive): decoder must refuse, not misparse
    val prog = full.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    assert(JpegCodec.decode(SyntheticMedia.png(8, 8)).isEmpty)
    assert(JpegCodec.decode(SyntheticMedia.gifFull(8, 8, 1)).isEmpty)
    assert(JpegCodec.decode(null).isEmpty)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    // PixelDecoder chains JPEG: decoded-sample features differ from the
    // raw-byte fingerprint, proving the decode path actually ran
    assert(!PixelDecoder.features(full, 16)
      .sameElements(Multimodal.decodeStub(full, 16)))
  }

  test("fuzz: bit-flipped and truncated streams never crash, only None/valid") {
    val rnd = new scala.util.Random(7)
    val full = SyntheticMedia.jpegFullColor(32, 26, 148)
    for (_ <- 0 until 300) {
      val mut = full.clone()
      val i = rnd.nextInt(mut.length)
      mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      JpegCodec.decode(mut) // any Option outcome is fine; throwing is not
      JpegCodec.decode(mut.take(rnd.nextInt(mut.length)))
    }
  }
}
