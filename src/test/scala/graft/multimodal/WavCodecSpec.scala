package graft.multimodal

class WavCodecSpec extends graft.SparkSpec {

  test("16-bit PCM round-trips exactly, mono and multichannel") {
    for (ch <- Seq(1, 2, 6)) {
      val samples = Array.tabulate(120 * ch)(k => ((k * 37 + 11) % 4096) - 2048)
      val a = WavCodec.decode(SyntheticAudio.wavPcm(8000, ch, 16, samples))
        .getOrElse(fail(s"decode failed ch=$ch"))
      assert(a.sampleRate == 8000 && a.channels == ch && a.bitsPerSample == 16)
      assert(a.frames == 120)
      assert(a.samples.sameElements(samples))
    }
    // negative extremes survive the sign extension
    val ext = Array(-32768, 32767, -1, 0, 1, -2048)
    assert(WavCodec.decode(SyntheticAudio.wavPcm(44100, 2, 16, ext))
      .get.samples.sameElements(ext))
  }

  test("8-bit PCM re-centers to signed around 0") {
    val raw = Array(0, 128, 255, 64) // unsigned on disk
    val a = WavCodec.decode(SyntheticAudio.wavPcm(22050, 1, 8, raw)).get
    assert(a.samples.sameElements(Array(-128, 0, 127, -64)))
    assert(a.durationMs == 4 * 1000L / 22050) // 0 — still well-defined
  }

  test("duration and rms derive from frames, not interleaved length") {
    val a = WavCodec.decode(SyntheticAudio.wavFull(1000, 2, 500, 7)).get
    assert(a.frames == 500 && a.durationMs == 500L)
    val expected = math.sqrt(
      (0 until 1000).map(k => math.pow(((k * 37 + 7) % 4096) - 2048, 2)).sum / 1000)
    assert(math.abs(a.rms - expected) < 1e-9)
  }

  test("unknown chunks are skipped; odd-length chunks honor RIFF padding") {
    val base = SyntheticAudio.wavPcm(8000, 1, 16, Array(5, -5, 9))
    // splice a 3-byte junk chunk (padded to 4) between WAVE and fmt
    val junk = "cue ".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF size field
    val total = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((total >> (8 * i)) & 0xff).toByte
    val a = WavCodec.decode(spliced).getOrElse(fail("spliced decode failed"))
    assert(a.samples.sameElements(Array(5, -5, 9)))
  }

  test("hostile chunk length near Int.MaxValue rejects instead of allocating") {
    val evil = SyntheticAudio.wavPcm(8000, 1, 16, Array(1, 2, 3)).clone()
    // data chunk header sits at 36; its length field at 40, little-endian
    evil(40) = 0xf0.toByte; evil(41) = 0xff.toByte
    evil(42) = 0xff.toByte; evil(43) = 0x7f.toByte
    // the overflow-prone bound `i + 8 + len` must trip, not wrap negative
    assert(WavCodec.decode(evil).isEmpty)
  }

  test("rejects: non-PCM, truncation, junk, null") {
    val full = SyntheticAudio.wavFull(8000, 1, 64, 3)
    assert(WavCodec.decode(full).isDefined)
    // float PCM (format 3) refused
    val nonPcm = full.clone()
    nonPcm(20) = 3
    assert(WavCodec.decode(nonPcm).isEmpty)
    // truncations: inside header, inside data (chunk len now overruns)
    for (keep <- Seq(10, 30, full.length - 5))
      assert(WavCodec.decode(full.take(keep)).isEmpty, s"keep=$keep")
    assert(WavCodec.decode(SyntheticMedia.png(4, 4)).isEmpty)
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("audioStats decodes distributed; non-WAV rows yield nulls") {
    import spark.implicits._
    val media = Seq(
      (1L, SyntheticAudio.wavFull(16000, 2, 800, 5)),
      (2L, SyntheticMedia.pngFull(6, 6, 1)),
      (3L, SyntheticAudio.wavPcm(8000, 1, 8, Array(0, 128, 255))))
      .toDF("media_id", "payload")
    val out = Multimodal.audioStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 16000 && out(1L).getInt(2) == 2)
    assert(out(1L).getLong(3) == 800L && out(1L).getLong(4) == 50L)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(5))
    assert(out(3L).getInt(1) == 8000 && out(3L).getLong(3) == 3L)
  }
}
