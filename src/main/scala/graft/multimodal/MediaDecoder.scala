package graft.multimodal

/** Pluggable media decoding seam — the multimodal analogue of the ML
  * scorer seam: the Spark-side plumbing (binary columns, batched
  * `mapPartitions`, schema) is fixed; what varies is the decoder. The
  * default [[HeaderDecoder]] does REAL byte parsing (PNG/JPEG/GIF header
  * dimensions) with no codec dependency; full-frame decoding slots in by
  * implementing this trait with an imaging library.
  */
trait MediaDecoder extends Serializable {

  /** Parse container headers only: format + pixel dimensions. None when
    * the payload is not a recognized image container. */
  def probe(payload: Array[Byte]): Option[MediaDecoder.Info]

  /** Fixed-width feature vector for a payload. Implementations without a
    * codec may fall back to [[Multimodal.decodeStub]]'s deterministic
    * byte fingerprint. */
  def features(payload: Array[Byte], dim: Int): Array[Float]
}

object MediaDecoder {
  /** Header-probe result: container format and pixel dimensions. */
  final case class Info(format: String, width: Int, height: Int)
}

/** Pure-JVM header parser: PNG IHDR, JPEG SOF segment walk, GIF logical
  * screen descriptor. Real byte parsing (big/little-endian fields, marker
  * walking) without any codec dependency; pixel decoding falls back to the
  * deterministic fingerprint so the feature pipeline stays total.
  */
object HeaderDecoder extends MediaDecoder {
  import MediaDecoder.Info

  def probe(p: Array[Byte]): Option[Info] =
    if (p == null) None
    else pngDims(p).orElse(jpegDims(p)).orElse(gifDims(p))

  def features(payload: Array[Byte], dim: Int): Array[Float] =
    Multimodal.decodeStub(payload, dim)

  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], i: Int): Int =
    (u8(p(i)) << 24) | (u8(p(i + 1)) << 16) | (u8(p(i + 2)) << 8) | u8(p(i + 3))
  private def be16(p: Array[Byte], i: Int): Int = (u8(p(i)) << 8) | u8(p(i + 1))
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (len, "IHDR", width BE32,
    * height BE32) must come first per the spec. */
  private def pngDims(p: Array[Byte]): Option[Info] =
    if (p.length >= 24 && p.startsWith(PngSig) &&
      p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      Some(Info("png", be32(p, 16), be32(p, 20)))
    else None

  /** JPEG: walk marker segments from SOI until a frame header (SOF0-15,
    * minus the DHT/JPG/DAC markers that share the range); dimensions sit
    * at fixed offsets inside the SOF payload (precision u8, height u16,
    * width u16). */
  private def jpegDims(p: Array[Byte]): Option[Info] = {
    if (p.length < 4 || u8(p(0)) != 0xff || u8(p(1)) != 0xd8) return None
    var i = 2
    while (i + 3 < p.length) {
      if (u8(p(i)) != 0xff) return None // desynced: not a marker boundary
      var j = i
      while (j + 1 < p.length && u8(p(j + 1)) == 0xff) j += 1 // fill bytes
      val marker = u8(p(j + 1))
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return if (j + 8 < p.length)
          Some(Info("jpeg", be16(p, j + 7), be16(p, j + 5)))
        else None
      } else if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 2 // standalone marker, no length field
      } else if (marker == 0xd9) {
        return None // EOI before any SOF
      } else {
        if (j + 3 >= p.length) return None
        i = j + 2 + be16(p, j + 2)
      }
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a" then the logical screen width/height LE16. */
  private def gifDims(p: Array[Byte]): Option[Info] =
    if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      Some(Info("gif", le16(p, 6), le16(p, 8)))
    else None
}

/** Pure-JVM PNG pixel decoder — REAL full-frame decoding for the one
  * mainstream image format whose compression ships with the JDK
  * (zlib/Inflater): chunk walk, concatenated-IDAT inflate, and scanline
  * unfiltering for all five PNG filter types, over 8-bit gray / gray+α /
  * RGB / RGBA, non-interlaced. CRCs are not verified (decoding serves
  * feature extraction, not integrity checking). JPEG/GIF pixel decoding
  * stays behind the [[MediaDecoder]] seam — their entropy coders need a
  * codec library this container doesn't ship.
  */
object PngCodec {

  /** Decoded frame: unfiltered samples, row-major, `channels`
    * interleaved bytes per pixel. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte]) {
    /** Per-channel mean sample value (0–255). */
    def channelMeans: Array[Double] = {
      val sums = new Array[Double](channels)
      var i = 0
      while (i < pixels.length) { sums(i % channels) += (pixels(i) & 0xff); i += 1 }
      sums.map(_ / (width.toLong * height))
    }
  }

  private[multimodal] val Sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], i: Int): Int =
    (u8(p(i)) << 24) | (u8(p(i + 1)) << 16) | (u8(p(i + 2)) << 8) | u8(p(i + 3))

  /** PNG Paeth predictor (spec §9.4). */
  private[multimodal] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG payload to raw pixels; None for anything outside the
    * supported profile (or any malformed/truncated stream). */
  def decode(p: Array[Byte]): Option[Image] = {
    if (p == null || p.length < 45 || !p.startsWith(Sig)) return None
    try {
      var i = 8
      var w = 0; var h = 0; var channels = 0; var sawIhdr = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && i + 12 <= p.length) {
        val len = be32(p, i)
        if (len < 0 || i + 12 + len > p.length) return None
        val typ = new String(p, i + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            w = be32(p, i + 8); h = be32(p, i + 12)
            val bitDepth = u8(p(i + 16)); val colorType = u8(p(i + 17))
            val interlace = u8(p(i + 20))
            channels = colorType match {
              case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 0
            }
            sawIhdr = bitDepth == 8 && channels > 0 && interlace == 0 &&
              w > 0 && h > 0 && w.toLong * h * channels < (1L << 30)
            if (!sawIhdr) return None
          case "IDAT" => idat.write(p, i + 8, len)
          case "IEND" => done = true
          case _      => () // ancillary chunks skipped
        }
        i += 12 + len
      }
      if (!sawIhdr || idat.size == 0) return None
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val rowLen = w * channels
      val expect = h * (1 + rowLen)
      val data = new Array[Byte](expect)
      var got = 0
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(data, got, expect - got)
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None // truncated/underfull stream
        got += n
      }
      inflater.end()
      if (got < expect) return None
      val pixels = new Array[Byte](h * rowLen)
      val bpp = channels
      var y = 0
      while (y < h) {
        val ft = u8(data(y * (1 + rowLen)))
        val src = y * (1 + rowLen) + 1
        val dst = y * rowLen
        var j = 0
        while (j < rowLen) {
          val f = u8(data(src + j))
          val a = if (j >= bpp) u8(pixels(dst + j - bpp)) else 0
          val b = if (y > 0) u8(pixels(dst - rowLen + j)) else 0
          val c = if (y > 0 && j >= bpp) u8(pixels(dst - rowLen + j - bpp)) else 0
          val v = ft match {
            case 0 => f
            case 1 => f + a
            case 2 => f + b
            case 3 => f + (a + b) / 2
            case 4 => f + paeth(a, b, c)
            case _ => return None // invalid filter type
          }
          pixels(dst + j) = (v & 0xff).toByte
          j += 1
        }
        y += 1
      }
      Some(Image(w, h, channels, pixels))
    } catch { case _: java.util.zip.DataFormatException => None }
  }
}

/** [[MediaDecoder]] with REAL pixel decoding for PNG payloads: features
  * hash the DECODED samples (so two encodings of the same image agree);
  * non-PNG containers keep the deterministic byte fingerprint. */
object PixelDecoder extends MediaDecoder {
  def probe(p: Array[Byte]): Option[MediaDecoder.Info] = HeaderDecoder.probe(p)
  def features(payload: Array[Byte], dim: Int): Array[Float] =
    PngCodec.decode(payload) match {
      case Some(img) => Multimodal.decodeStub(img.pixels, dim)
      case None      => Multimodal.decodeStub(payload, dim)
    }
}

/** Minimal VALID image containers built from dimensions — synthetic
  * payloads for fixtures and specs: real headers [[HeaderDecoder]] (or any
  * standards-compliant parser) reads back. Sizes are deterministic
  * constants per format (png 33 B, jpeg 35 B, gif 14 B).
  */
object SyntheticMedia {

  private def be32(v: Int) =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def checkDims(w: Int, h: Int, max: Int, fmt: String): Unit =
    require(w > 0 && h > 0 && w <= max && h <= max,
      s"$fmt dimensions out of range (1..$max): ${w}x$h")

  /** Signature + IHDR chunk (crc left zeroed — header parsers don't verify
    * it; a full decoder would). 33 bytes. */
  def png(w: Int, h: Int): Array[Byte] = {
    checkDims(w, h, Int.MaxValue, "png")
    pngBytes(w, h)
  }
  private def pngBytes(w: Int, h: Int): Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)

  /** A COMPLETE standards-valid PNG with real pixel data: 8-bit samples,
    * per-row filters cycling through ALL FIVE types (any compliant
    * encoder may pick filters per row), zlib IDAT, real CRCs. Pixel
    * (x, y) channel c = `(x*3 + y*7 + c*11 + seed) % 256` — a
    * deterministic ramp an independent engine recomputes from the
    * formula, which is what makes full-frame decoding oracle-verifiable.
    * `channels`: 1 = gray, 2 = gray+alpha, 3 = RGB, 4 = RGBA.
    */
  def pngFull(w: Int, h: Int, seed: Int, channels: Int = 3): Array[Byte] = {
    checkDims(w, h, 4096, "png")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"pngFull: $n channels")
    }
    val rowLen = w * channels
    val raw = Array.tabulate(h, rowLen) { (y, i) =>
      val x = i / channels; val c = i % channels
      ((x * 3 + y * 7 + c * 11 + seed) % 256).toByte
    }
    val filtered = new Array[Byte](h * (1 + rowLen))
    var o = 0
    var prev = new Array[Byte](rowLen)
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered(o) = ft.toByte; o += 1
      val row = raw(y)
      var i = 0
      while (i < rowLen) {
        val x = row(i) & 0xff
        val a = if (i >= channels) row(i - channels) & 0xff else 0
        val b = prev(i) & 0xff
        val cc = if (i >= channels) prev(i - channels) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - PngCodec.paeth(a, b, cc)
        }
        filtered(o) = (f & 0xff).toByte; o += 1
        i += 1
      }
      prev = row; y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(data.length) ++ tb ++ data ++ be32(crc.getValue.toInt)
    }
    PngCodec.Sig ++
      chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
      chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** SOI + APP0/JFIF + SOF0 (1 grayscale component) + EOI — the SOF walk
    * has to skip a real APP segment to find the dimensions. 35 bytes.
    * JPEG dimension fields are u16. */
  def jpeg(w: Int, h: Int): Array[Byte] = {
    checkDims(w, h, 65535, "jpeg")
    Array(0xff, 0xd8).map(_.toByte) ++
      (Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      (Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
        be16(h) ++ be16(w) ++ Array[Byte](1) ++ Array[Byte](1, 0x11, 0)) ++
      Array(0xff, 0xd9).map(_.toByte)
  }

  /** Header + logical screen descriptor + trailer. 14 bytes. GIF
    * dimension fields are u16. */
  def gif(w: Int, h: Int): Array[Byte] = {
    checkDims(w, h, 65535, "gif")
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0) ++ Array(';'.toByte)
  }
}
