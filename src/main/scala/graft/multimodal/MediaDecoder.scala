package graft.multimodal

/** Pluggable media decoding seam — the multimodal analogue of the ML
  * scorer seam: the Spark-side plumbing (binary columns, batched
  * `mapPartitions`, schema) is fixed; what varies is the decoder.
  * [[HeaderDecoder]] does REAL byte parsing (PNG/JPEG/GIF header
  * dimensions) with no codec dependency and is the probe/metadata
  * default; [[PixelDecoder]] — the feature-extraction default — adds
  * real full-frame decode via the pure-JVM codecs, and codec-library
  * backends slot in by implementing this trait.
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
  * feature extraction, not integrity checking). GIF pixel decoding lives
  * in [[GifCodec]], baseline JPEG in [[JpegCodec]].
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
        // Long arithmetic: a hostile length near Int.MaxValue must trip
        // the bound, not overflow past it
        if (len < 0 || i.toLong + 12 + len > p.length) return None
        val typ = new String(p, i + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            if (len < 13) return None // IHDR body is 13 bytes by spec
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
    } catch {
      case _: java.util.zip.DataFormatException => None
      case _: IndexOutOfBoundsException => None // truncated/malformed chunk walk
    }
  }
}

/** Pure-JVM GIF pixel decoder — full-frame decoding for the second
  * codec-free format: GIF's image data is LZW, a dictionary coder with
  * no entropy tables, implemented here from the public GIF87a/89a spec
  * (variable code width 3–12 bits LSB-first, clear/end codes, the
  * KwKwK case). First frame only, non-interlaced, global or local
  * palette; output is palette-resolved RGB. With PNG (zlib) and GIF
  * (LZW), and baseline JPEG (Huffman+DCT, [[JpegCodec]]) all really
  * decoded, only video/audio codecs remain behind the [[MediaDecoder]]
  * seam.
  */
object GifCodec {
  import PngCodec.Image

  private def u8(b: Byte): Int = b & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)

  def decode(p: Array[Byte]): Option[Image] = {
    if (p == null || p.length < 14 ||
      !(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return None
    try {
      var i = 6
      val flags = u8(p(i + 4))
      i += 7 // logical screen descriptor
      var palette: Array[Array[Byte]] = null
      if ((flags & 0x80) != 0) { // global color table
        val n = 2 << (flags & 7)
        palette = Array.tabulate(n)(k => Array(p(i + 3 * k), p(i + 3 * k + 1), p(i + 3 * k + 2)))
        i += 3 * n
      }
      while (i < p.length) {
        u8(p(i)) match {
          case 0x21 => // extension: label + sub-blocks
            i += 2
            while (u8(p(i)) != 0) i += 1 + u8(p(i))
            i += 1
          case 0x2c => // image descriptor
            val iw = le16(p, i + 5); val ih = le16(p, i + 7)
            // u16×u16×3 overflows Int (65535² ≈ 1.3e10): bound BEFORE any
            // allocation, same decoded-size guard as PngCodec
            if (iw.toLong * ih * 3 >= (1L << 30)) return None
            val iflags = u8(p(i + 9))
            i += 10
            if ((iflags & 0x40) != 0) return None // interlaced: unsupported
            if ((iflags & 0x80) != 0) { // local color table wins
              val n = 2 << (iflags & 7)
              palette = Array.tabulate(n)(k =>
                Array(p(i + 3 * k), p(i + 3 * k + 1), p(i + 3 * k + 2)))
              i += 3 * n
            }
            if (palette == null || iw <= 0 || ih <= 0) return None
            val minCode = u8(p(i)); i += 1
            // concatenate data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while (u8(p(i)) != 0) { val n = u8(p(i)); data.write(p, i + 1, n); i += 1 + n }
            val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
              .getOrElse(return None)
            val px = new Array[Byte](iw * ih * 3)
            var k = 0
            while (k < idx.length) {
              val e = palette(idx(k) % palette.length)
              px(3 * k) = e(0); px(3 * k + 1) = e(1); px(3 * k + 2) = e(2)
              k += 1
            }
            return Some(Image(iw, ih, 3, px))
          case 0x3b => return None // trailer before any image
          case _    => return None
        }
      }
      None
      // IndexOutOfBounds (not just the Array subclass): a truncated
      // payload can die inside the sub-block copy's range check too
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** General GIF-LZW decode (spec appendix F): variable width from
    * `minCode`+1 up to 12 bits, clear resets, KwKwK handling. Stops
    * after `nPixels` outputs (trailing codes ignored like real viewers). */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Int]] = {
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Int](nPixels)
    var outN = 0
    // dictionary as prefix links: suffix byte + prefix code per entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = end + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var nBits = 0; var bi = 0
    val stack = new Array[Int](4096); var sp = 0
    def emit(code: Int): Boolean = { // expand a code to output, root-first
      var c = code
      sp = 0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c; sp += 1
      while (sp > 0 && outN < nPixels) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      true
    }
    def firstOf(code: Int): Int = { var c = code; while (c >= clear) c = prefix(c); c }
    while (outN < nPixels) {
      while (nBits < width) {
        if (bi >= data.length) return None // truncated stream
        acc |= (data(bi) & 0xffL) << nBits; nBits += 8; bi += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nBits -= width
      if (code == clear) {
        next = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        return if (outN == nPixels) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        emit(code); prev = code
      } else {
        if (code > next || (code == next && prev < 0)) return None
        if (code == next) { // KwKwK: prev ++ first(prev)
          if (next >= 4096) return None
          prefix(next) = prev; suffix(next) = firstOf(prev); next += 1
          emit(code)
        } else {
          emit(code)
          if (next < 4096) { prefix(next) = prev; suffix(next) = firstOf(code); next += 1 }
        }
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    Some(out)
  }
}

/** [[MediaDecoder]] with REAL pixel decoding for PNG, GIF, and baseline
  * JPEG payloads: features hash the DECODED samples (so two encodings of
  * the same image agree); anything outside the decodable profiles keeps
  * the byte fingerprint. */
object PixelDecoder extends MediaDecoder {
  def probe(p: Array[Byte]): Option[MediaDecoder.Info] = HeaderDecoder.probe(p)
  def features(payload: Array[Byte], dim: Int): Array[Float] =
    PngCodec.decode(payload).orElse(GifCodec.decode(payload))
      .orElse(JpegCodec.decode(payload)) match {
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
  def pngFull(w: Int, h: Int, seed: Int, channels: Int = 3): Array[Byte] =
    pngOf(w, h, channels, Array.tabulate(w * h * channels) { i =>
      val x = (i / channels) % w; val y = i / (channels * w); val c = i % channels
      ((x * 3 + y * 7 + c * 11 + seed) % 256).toByte
    })

  /** Assemble a complete standards-valid PNG (real zlib, real CRCs,
    * per-row filters cycling all five types) from an EXPLICIT row-major
    * interleaved raster — lets fixtures encode the SAME raster that a
    * GIF palette or JPEG tile formula produces, for cross-format
    * decoded-content dedup. */
  def pngOf(w: Int, h: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    checkDims(w, h, 4096, "png")
    require(pixels.length == w * h * channels, "raster must be w*h*channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"pngOf: $n channels")
    }
    val rowLen = w * channels
    val raw = Array.tabulate(h, rowLen)((y, i) => pixels(y * rowLen + i))
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

  /** Tile-constant luma raster `((x/tile)*5 + (y/tile)*11 + seed) % 256`
    * replicated over `ch` channels — THE single source of the raster
    * [[jpegFullGray]] (tile 8) and [[jpegFullColor]] (tile 16, neutral
    * chroma → R=G=B=luma) encode; exported so fixtures can re-encode
    * the same raster in other formats for cross-format dedup. */
  def tileRaster(w: Int, h: Int, tile: Int, seed: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch)(i =>
      (((i / ch) % w) / tile * 5 + (i / ch / w) / tile * 11 + seed).%(256).toByte)

  /** A COMPLETE baseline grayscale JPEG with real Huffman+DCT
    * compression over [[tileRaster]] (tile 8). A constant block carries
    * a single DC coefficient, which unit quantization preserves
    * bit-exactly through the codec — so full-frame JPEG decode is
    * oracle-verifiable from the tile formula (restart markers every 4
    * MCUs when the seed is odd). */
  def jpegFullGray(w: Int, h: Int, seed: Int): Array[Byte] = {
    checkDims(w, h, 65535, "jpeg")
    JpegEncoder.encodeGray(w, h, tileRaster(w, h, 8, seed, 1).map(_ & 0xff),
      if (seed % 2 == 1) 4 else 0)
  }

  /** A COMPLETE baseline 4:2:0 YCbCr JPEG: [[tileRaster]] (tile 16)
    * luma — tiles align with full MCUs so the subsampled chroma stays
    * constant — and neutral chroma (128 → the JFIF transform returns
    * R=G=B=Y exactly). Exercises interleaved-MCU decode, chroma
    * upsampling, and color conversion end to end, exactly. */
  def jpegFullColor(w: Int, h: Int, seed: Int): Array[Byte] = {
    checkDims(w, h, 65535, "jpeg")
    val neutral = Array.fill(w * h)(128)
    JpegEncoder.encodeYcc(w, h, tileRaster(w, h, 16, seed, 1).map(_ & 0xff),
      neutral, neutral, subsample420 = true, if (seed % 2 == 0) 3 else 0)
  }

  /** A COMPLETE GIF87a with REAL LZW-compressed image data: 64-entry
    * palette `i → ((i*5+13)%256, (i*9+7)%256, (i*11+3)%256)`, pixel
    * index `(x,y) → (x*3 + y*7 + seed) % 64` — both formulas an
    * independent engine replays, making GIF full-frame decode
    * oracle-verifiable. The encoder is genuine LZW (dictionary builds,
    * code width grows 7→12 bits, clear-code reset on a full table), so
    * the decoder's general path is what gets exercised. */
  def gifFull(w: Int, h: Int, seed: Int): Array[Byte] = {
    checkDims(w, h, 65535, "gif")
    gifOf(w, h, gifIndices(w, h, seed), gifPalette64)
  }

  // THE single source of gifFull's palette and index formulas
  private def gifPalette64: Array[Array[Byte]] = Array.tabulate(64)(i => Array(
    ((i * 5 + 13) % 256).toByte, ((i * 9 + 7) % 256).toByte,
    ((i * 11 + 3) % 256).toByte))
  private def gifIndices(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(k => ((k % w) * 3 + (k / w) * 7 + seed) % 64)

  /** The palette-resolved RGB raster [[gifFull]] decodes to — exported
    * so fixtures can encode the SAME raster in other formats for
    * cross-format decoded-content dedup. */
  def gifRaster(w: Int, h: Int, seed: Int): Array[Byte] = {
    val pal = gifPalette64
    val idx = gifIndices(w, h, seed)
    Array.tabulate(w * h * 3)(i => pal(idx(i / 3))(i % 3))
  }

  /** Assemble a GIF87a from explicit palette indices (palette size must
    * be a power of two in [4, 256]). */
  def gifOf(w: Int, h: Int, idx: Array[Int], palette: Array[Array[Byte]]): Array[Byte] = {
    val nPal = palette.length
    require(nPal >= 4 && nPal <= 256 && (nPal & (nPal - 1)) == 0,
      s"palette size must be a power of two in [4,256]: $nPal")
    require(idx.length == w * h && idx.forall(i => i >= 0 && i < nPal),
      "index raster must be w*h entries within the palette")
    val palBits = 31 - Integer.numberOfLeadingZeros(nPal)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(le16(w)); out.write(le16(h))
    out.write(0x80 | ((palBits - 1) << 4) | (palBits - 1)) // GCT present, size
    out.write(0); out.write(0) // background, aspect
    palette.foreach(out.write)
    out.write(0x2c) // image descriptor
    out.write(le16(0)); out.write(le16(0)); out.write(le16(w)); out.write(le16(h))
    out.write(0) // no local table, not interlaced
    val minCode = math.max(2, palBits)
    out.write(minCode)
    val lzw = lzwEncode(idx, minCode)
    var o = 0
    while (o < lzw.length) { // ≤255-byte data sub-blocks
      val n = math.min(255, lzw.length - o)
      out.write(n); out.write(lzw, o, n); o += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Real GIF-LZW compression: dictionary of (prefix code, symbol)
    * pairs, LSB-first variable-width output, width bump one step AHEAD
    * of the decoder's table (the decoder lags one entry), clear-reset
    * when the 4096-entry table fills. */
  private def lzwEncode(idx: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    var next = end + 1
    var width = minCode + 1
    val dict = new java.util.HashMap[Long, Integer]()
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits; nBits += width
      while (nBits >= 8) { bytes.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    put(clear)
    var cur = idx(0)
    var i = 1
    while (i < idx.length) {
      val k = idx(i)
      val key = (cur.toLong << 16) | k
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        put(cur)
        if (next == 4096) { // table full: reset (decoder mirrors)
          put(clear); dict.clear(); next = end + 1; width = minCode + 1
        } else {
          dict.put(key, Integer.valueOf(next)); next += 1
          // decoder adds entries one code behind: bump width when OUR
          // table passes 2^width so the next emission still fits ITS width
          if (next == (1 << width) + 1 && width < 12) width += 1
        }
        cur = k
      }
      i += 1
    }
    put(cur); put(end)
    if (nBits > 0) bytes.write((acc & 0xff).toInt)
    bytes.toByteArray
  }

  /** Header + logical screen descriptor + trailer. 14 bytes. GIF
    * dimension fields are u16. */
  def gif(w: Int, h: Int): Array[Byte] = {
    checkDims(w, h, 65535, "gif")
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0) ++ Array(';'.toByte)
  }
}
