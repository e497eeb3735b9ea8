package graft.multimodal

/** Pure-JVM WAV/RIFF PCM decoder — the audio leg of full-frame media
  * decoding (PNG/GIF/JPEG are the image legs): RIFF chunk walk with
  * even-byte padding, `fmt ` parsing, and sample decoding for integer
  * PCM (8-bit unsigned, 16-bit signed little-endian), any channel
  * count. Non-PCM encodings (float, ADPCM, extensible) return None —
  * they need real codec tables; the container walk is still exercised.
  *
  * Reference behavior: tabsketchfm treats media as opaque payloads
  * (multimodal brief); this decoder is the engine-side audio extension
  * behind the same [[MediaDecoder]]-style seam.
  */
object WavCodec {

  /** Decoded clip: interleaved samples normalized to signed Int
    * (8-bit input is re-centered by −128 so silence is 0 for both
    * widths). `frames` = samples per channel. */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                         samples: Array[Int]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else frames.toLong * 1000L / sampleRate
    /** Root-mean-square amplitude over all interleaved samples. */
    def rms: Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
  }

  private def u8(b: Byte): Int = b & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)
  private def le32(p: Array[Byte], i: Int): Int =
    u8(p(i)) | (u8(p(i + 1)) << 8) | (u8(p(i + 2)) << 16) | (u8(p(i + 3)) << 24)
  private def tag(p: Array[Byte], i: Int): String = new String(p, i, 4, "US-ASCII")

  def decode(p: Array[Byte]): Option[Audio] = {
    if (p == null || p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE")
      return None
    try {
      var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var i = 12
      while (i + 8 <= p.length && (dataOff < 0 || fmtTag < 0)) {
        val id = tag(p, i)
        val len = le32(p, i + 4)
        // Long arithmetic: a hostile length near Int.MaxValue must trip
        // this bound, not overflow past it into a multi-GB allocation
        if (len < 0 || i.toLong + 8 + len > p.length) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            fmtTag = le16(p, i + 8)
            channels = le16(p, i + 10)
            rate = le32(p, i + 12)
            bits = le16(p, i + 22)
          case "data" =>
            dataOff = i + 8; dataLen = len
          case _ => () // LIST/fact/cue/… skipped
        }
        i += 8 + len + (len & 1) // RIFF chunks pad to even byte counts
      }
      if (fmtTag != 1 || dataOff < 0) return None // integer PCM only
      if (channels < 1 || channels > 64 || rate <= 0) return None
      val out = bits match {
        case 8 =>
          val n = dataLen
          val s = new Array[Int](n)
          var k = 0
          while (k < n) { s(k) = u8(p(dataOff + k)) - 128; k += 1 }
          s
        case 16 =>
          val n = dataLen / 2
          val s = new Array[Int](n)
          var k = 0
          while (k < n) { s(k) = le16(p, dataOff + 2 * k).toShort.toInt; k += 1 }
          s
        case _ => return None
      }
      // drop a trailing partial frame rather than misalign channels
      val whole = (out.length / channels) * channels
      Some(Audio(rate, channels, bits,
        if (whole == out.length) out else java.util.Arrays.copyOf(out, whole)))
    } catch {
      case _: IndexOutOfBoundsException => None
    }
  }
}

/** Minimal valid WAV containers for fixtures and specs — real RIFF
  * layout any standards-compliant reader parses. */
object SyntheticAudio {

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Assemble a PCM WAV from interleaved signed samples (16-bit) or
    * 0–255 unsigned (8-bit). */
  def wavPcm(sampleRate: Int, channels: Int, bits: Int,
             samples: Array[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16, s"PCM 8/16-bit only: $bits")
    require(channels >= 1 && samples.length % channels == 0,
      "interleaved samples must cover whole frames")
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * channels * bytesPer)) // byte rate
    out.write(le16(channels * bytesPer))              // block align
    out.write(le16(bits))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    samples.foreach { s =>
      if (bits == 8) out.write(s & 0xff) else { out.write(s & 0xff); out.write((s >> 8) & 0xff) }
    }
    if ((dataLen & 1) == 1) out.write(0) // RIFF even padding
    out.toByteArray
  }

  /** Deterministic 16-bit PCM fixture: interleaved sample
    * `k → ((k * 37 + seed) % 4096) − 2048` — integer formula an
    * independent engine (or SQL oracle) replays exactly, which makes
    * audio decode oracle-verifiable like the image codecs. */
  def wavFull(sampleRate: Int, channels: Int, frames: Int, seed: Int): Array[Byte] =
    wavPcm(sampleRate, channels, 16,
      Array.tabulate(frames * channels)(k => ((k * 37 + seed) % 4096) - 2048))
}
