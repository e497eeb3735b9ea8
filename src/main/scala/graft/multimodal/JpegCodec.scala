package graft.multimodal

/** Pure-JVM baseline JPEG decoder — full-frame decoding for the third
  * mainstream image format, implemented from the public ITU T.81 spec
  * with no codec library: marker/segment walk, DQT (8- and 16-bit) and
  * DHT parsing, canonical Huffman entropy decoding (spec F.2.2.3),
  * run-length AC expansion, dequantization, separable floating-point
  * IDCT, restart markers, byte unstuffing, and JFIF YCbCr→RGB
  * conversion. Supported profile: baseline sequential DCT (SOF0/SOF1),
  * 8-bit precision, 1 or 3 components in one interleaved scan, sampling
  * factors where the max divides each component's (covers 4:4:4, 4:2:2,
  * 4:2:0, grayscale); progressive/arithmetic/hierarchical streams
  * return None. The IDCT is the exact separable definition rather than
  * a fast integer approximation — decode feeds feature extraction, and
  * exactness is what makes the oracle row possible (see [[JpegEncoder]]).
  *
  * Reference behavior: tabsketchfm treats media as opaque payloads
  * (multimodal brief); this codec is the engine-side decode extension
  * alongside [[PngCodec]] and [[GifCodec]].
  */
object JpegCodec {
  import PngCodec.Image

  /** Natural (row-major v*8+u) index of zigzag position k (T.81 fig. 5). */
  private[multimodal] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Shared 1-D DCT basis: CosT(x)(u) = C(u)·cos((2x+1)uπ/16). */
  private[multimodal] val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) * (if (u == 0) 1 / math.sqrt(2) else 1.0)
  }

  private object Fail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def u8(b: Byte): Int = b & 0xff
  private def be16(p: Array[Byte], i: Int): Int = (u8(p(i)) << 8) | u8(p(i + 1))

  /** Canonical Huffman table from a DHT (bits, vals) pair; decode is the
    * spec's mincode/maxcode/valptr walk (T.81 F.2.2.3). */
  private[multimodal] final class Huff(bits: Array[Int], vals: Array[Int]) {
    private val mincode = new Array[Int](17)
    private val maxcode = Array.fill(17)(-1)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k; mincode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var l = 1
      var code = r.nextBit()
      while (maxcode(l) < 0 || code > maxcode(l)) {
        l += 1
        if (l > 16) throw Fail
        code = (code << 1) | r.nextBit()
      }
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00 and
    * fails on any bare marker (restart markers are consumed byte-aligned
    * by the MCU loop, never here). */
  private[multimodal] final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def nextBit(): Int = {
      if (n == 0) {
        if (pos >= p.length) throw Fail
        val b = u8(p(pos)); pos += 1
        if (b == 0xff) {
          if (pos >= p.length) throw Fail
          if (u8(p(pos)) != 0x00) throw Fail // marker inside entropy data
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def alignByte(): Unit = n = 0
  }

  /** EXTEND (T.81 F.2.2.1): received s-bit magnitude to signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline JPEG to raw pixels (gray 1-channel or RGB);
    * None for anything outside the supported profile or malformed. */
  def decode(p: Array[Byte]): Option[Image] = {
    if (p == null || p.length < 4 || u8(p(0)) != 0xff || u8(p(1)) != 0xd8) return None
    try {
      val qt = new Array[Array[Int]](4)
      val dcTab = new Array[Huff](4)
      val acTab = new Array[Huff](4)
      var restart = 0
      var w = 0; var h = 0
      var comps: Array[Comp] = null
      var i = 2
      while (i + 1 < p.length) {
        if (u8(p(i)) != 0xff) return None
        while (i + 1 < p.length && u8(p(i + 1)) == 0xff) i += 1 // fill bytes
        if (i + 1 >= p.length) return None
        val m = u8(p(i + 1))
        i += 2
        m match {
          case 0xd8 | 0xd9 => return None // stray SOI / EOI before a scan
          case 0x01 => ()                 // TEM standalone
          case x if x >= 0xd0 && x <= 0xd7 => () // stray RST between segments
          case 0xc0 | 0xc1 =>             // baseline sequential SOF
            val len = be16(p, i)
            if (len < 8 || u8(p(i + 2)) != 8) return None // 8-bit only
            h = be16(p, i + 3); w = be16(p, i + 5)
            val nf = u8(p(i + 7))
            if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) return None
            if (len < 8 + 3 * nf) return None // specs must fit the segment
            if (w.toLong * h * nf > (1L << 28)) return None // decoded-size guard
            comps = Array.tabulate(nf) { c =>
              val o = i + 8 + 3 * c
              Comp(u8(p(o)), u8(p(o + 1)) >> 4, u8(p(o + 1)) & 15, u8(p(o + 2)))
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3))
              return None
            i += len
          case x if x >= 0xc2 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
            return None                   // progressive / arithmetic / lossless
          case 0xc4 =>                    // DHT: one or more tables
            val len = be16(p, i)
            var o = i + 2
            while (o < i + len) {
              val tc = u8(p(o)) >> 4; val th = u8(p(o)) & 15
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(k => u8(p(o + 1 + k)))
              val total = bits.sum
              // vals must sit inside THIS segment, not bleed into the next
              if (total > 256 || o + 17 + total > i + len) return None
              val vals = Array.tabulate(total)(k => u8(p(o + 17 + k)))
              if (tc == 0) dcTab(th) = new Huff(bits, vals)
              else acTab(th) = new Huff(bits, vals)
              o += 17 + total
            }
            i += len
          case 0xdb =>                    // DQT: one or more tables
            val len = be16(p, i)
            var o = i + 2
            while (o < i + len) {
              val pq = u8(p(o)) >> 4; val tq = u8(p(o)) & 15
              if (pq > 1 || tq > 3) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) = if (pq == 0) u8(p(o + 1 + k)) else be16(p, o + 1 + 2 * k)
                k += 1
              }
              qt(tq) = t
              o += 1 + (if (pq == 0) 64 else 128)
            }
            i += len
          case 0xdd =>
            if (be16(p, i) != 4) return None
            restart = be16(p, i + 2); i += 4
          case 0xda =>                    // SOS: decode and return
            if (comps == null) return None
            val len = be16(p, i)
            val ns = u8(p(i + 2))
            if (ns != comps.length) return None // one interleaved scan only
            val scanDc = new Array[Huff](ns)
            val scanAc = new Array[Huff](ns)
            var c = 0
            while (c < ns) {
              val ci = comps.indexWhere(_.id == u8(p(i + 3 + 2 * c)))
              if (ci < 0) return None
              scanDc(ci) = dcTab(u8(p(i + 4 + 2 * c)) >> 4)
              scanAc(ci) = acTab(u8(p(i + 4 + 2 * c)) & 15)
              c += 1
            }
            return decodeScan(p, i + len, w, h, comps, qt, scanDc, scanAc, restart)
          case _ =>                       // APPn / COM / unknown: skip
            val len = be16(p, i)
            if (len < 2) return None
            i += len
        }
      }
      None // no scan found
    } catch {
      case Fail                         => None
      case _: IndexOutOfBoundsException => None
    }
  }

  private def decodeScan(p: Array[Byte], pos0: Int, w: Int, h: Int,
                         comps0: Array[Comp], qt: Array[Array[Int]],
                         scanDc: Array[Huff], scanAc: Array[Huff],
                         restart: Int): Option[Image] = {
    val nc = comps0.length
    // T.81 A.2: a single-component scan is NON-interleaved — the MCU is
    // one data unit and blocks raster the ceil(w/8)×ceil(h/8) grid, so
    // the declared sampling factors do not shape the scan (real-world:
    // grayscale files often keep 2x2 luma factors; treating them as
    // interleaved would scramble block placement)
    val comps = if (nc == 1) comps0.map(_.copy(h = 1, v = 1)) else comps0
    var c = 0
    while (c < nc) {
      if (scanDc(c) == null || scanAc(c) == null || qt(comps(c).tq) == null) return None
      c += 1
    }
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    if (comps.exists(cc => hmax % cc.h != 0 || vmax % cc.v != 0)) return None
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val cw = Array.tabulate(nc)(ci => mcusX * 8 * comps(ci).h)
    val chh = Array.tabulate(nc)(ci => mcusY * 8 * comps(ci).v)
    val planes = Array.tabulate(nc)(ci => new Array[Byte](cw(ci) * chh(ci)))
    val r = new BitReader(p, pos0)
    val dcPred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val nMcu = mcusX * mcusY
    var mcu = 0
    while (mcu < nMcu) {
      if (restart > 0 && mcu > 0 && mcu % restart == 0) {
        r.alignByte()
        var q = r.pos // skip a stuffed pad byte (FF00) and marker fill (FF FF)
        while (q + 1 < p.length && u8(p(q)) == 0xff &&
          (u8(p(q + 1)) == 0x00 || u8(p(q + 1)) == 0xff)) {
          q += (if (u8(p(q + 1)) == 0x00) 2 else 1)
        }
        if (q + 1 >= p.length || u8(p(q)) != 0xff) throw Fail
        val m = u8(p(q + 1))
        if (m < 0xd0 || m > 0xd7) throw Fail
        r.pos = q + 2
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val cc = comps(ci)
        val q = qt(cc.tq)
        var by = 0
        while (by < cc.v) {
          var bx = 0
          while (bx < cc.h) {
            val acCount = decodeBlock(r, scanDc(ci), scanAc(ci), q, dcPred, ci, coef)
            idctInto(coef, acCount, tmp, planes(ci), cw(ci),
              (mx * cc.h + bx) * 8, (my * cc.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    if (nc == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) { System.arraycopy(planes(0), y * cw(0), out, y * w, w); y += 1 }
      Some(Image(w, h, 1, out))
    } else {
      // sample-replication upsample + crop + JFIF YCbCr→RGB
      val out = new Array[Byte](w * h * 3)
      val py = planes(0); val pcb = planes(1); val pcr = planes(2)
      var y = 0
      while (y < h) {
        val ry0 = (y * comps(0).v / vmax) * cw(0)
        val ry1 = (y * comps(1).v / vmax) * cw(1)
        val ry2 = (y * comps(2).v / vmax) * cw(2)
        var x = 0
        while (x < w) {
          val yy = u8(py(ry0 + x * comps(0).h / hmax))
          val cb = u8(pcb(ry1 + x * comps(1).h / hmax)) - 128
          val cr = u8(pcr(ry2 + x * comps(2).h / hmax)) - 128
          val o = (y * w + x) * 3
          out(o) = clamp8(math.round(yy + 1.402 * cr))
          out(o + 1) = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr))
          out(o + 2) = clamp8(math.round(yy + 1.772 * cb))
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, 3, out))
    }
  }

  private def clamp8(v: Long): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v.toInt).toByte

  /** Decode one block's coefficients; returns the count of nonzero AC
    * terms so the IDCT can take the flat-block shortcut. */
  private def decodeBlock(r: BitReader, dc: Huff, ac: Huff, q: Array[Int],
                          dcPred: Array[Int], ci: Int, coef: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    val t = dc.decode(r)
    if (t > 15) throw Fail
    dcPred(ci) += extend(r.receive(t), t)
    coef(0) = dcPred(ci) * q(0)
    var k = 1
    var acCount = 0
    var done = false
    while (!done && k < 64) {
      val rs = ac.decode(r)
      val run = rs >> 4; val s = rs & 15
      if (s == 0) {
        if (run == 15) k += 16 else done = true // ZRL / EOB
      } else {
        k += run
        if (k > 63) throw Fail
        coef(ZigZag(k)) = extend(r.receive(s), s) * q(k)
        acCount += 1
        k += 1
      }
    }
    acCount
  }

  /** Separable exact IDCT of one dequantized block into a plane. A
    * DC-only block (smooth regions — the dominant case in natural
    * images) short-circuits to a constant fill, the same population-
    * based dispatch production decoders use. */
  private def idctInto(coef: Array[Int], acCount: Int, tmp: Array[Array[Double]],
                       plane: Array[Byte], stride: Int, x0: Int, y0: Int): Unit = {
    if (acCount == 0) {
      // out = 0.25·DC·C0·C0 = DC/8 everywhere — computed in the general
      // path's exact operation order so both paths round identically
      val t0 = coef(0) * CosT(0)(0)
      val v = clamp8(math.round(0.25 * (t0 * CosT(0)(0)) + 128))
      var y = 0
      while (y < 8) {
        java.util.Arrays.fill(plane, (y0 + y) * stride + x0,
          (y0 + y) * stride + x0 + 8, v)
        y += 1
      }
      return
    }
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * CosT(x)(u); u += 1 }
        tmp(v)(x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv)(x) * CosT(y)(vv); vv += 1 }
        plane((y0 + y) * stride + x0 + x) = clamp8(math.round(0.25 * s + 128))
        x += 1
      }
      y += 1
    }
  }
}

/** Baseline JPEG ENCODER, for fixtures and specs: real forward DCT,
  * canonical Huffman coding with self-describing DHT segments (compact
  * single-length layouts — DC categories 0–11 as 4-bit codes, the 178
  * possible AC (run,size≤11) symbols plus EOB/ZRL as 8-bit codes — any
  * spec-compliant decoder reads them from the DHT like the Annex K
  * defaults), unit quantization, byte stuffing, optional restart
  * markers, and grayscale / 4:4:4 / 4:2:0 sampling. Unit quantization
  * means a tile-constant raster survives the round trip EXACTLY (a
  * constant 8×8 block carries a single DC coefficient, preserved
  * bit-for-bit), which is what makes full-frame JPEG decoding
  * oracle-verifiable without shipping a codec library.
  */
object JpegEncoder {
  import JpegCodec.{CosT, ZigZag}

  private val DcBits = { val b = new Array[Int](16); b(3) = 12; b }
  private val DcVals = Array.tabulate(12)(identity)
  private val AcBits = { val b = new Array[Int](16); b(7) = 178; b }
  private val AcVals: Array[Int] =
    Array(0x00, 0xf0) ++ (for (run <- 0 to 15; s <- 1 to 11) yield (run << 4) | s)

  private def codesFor(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m += vals(k) -> ((code, l)); code += 1; k += 1 }
      code <<= 1
    }
    m.result()
  }
  private val DcCodes = codesFor(DcBits, DcVals)
  private val AcCodes = codesFor(AcBits, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n) // pad with 1s
  }

  private def size(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Forward DCT + unit quantization of one 0–255 spatial block, output
    * in zigzag order. */
  private def fdctQuant(spatial: Array[Int], tmp: Array[Array[Double]],
                        out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (spatial(y * 8 + x) - 128) * CosT(x)(u); x += 1 }
        tmp(y)(u) = s
        u += 1
      }
      y += 1
    }
    var k = 0
    while (k < 64) {
      val nat = ZigZag(k); val v = nat / 8; val u = nat % 8
      var s = 0.0
      var yy = 0
      while (yy < 8) { s += tmp(yy)(u) * CosT(yy)(v); yy += 1 }
      out(k) = math.round(0.25 * s).toInt
      k += 1
    }
  }

  private def encodeBlock(bw: BitWriter, q: Array[Int], dcPred: Array[Int],
                          ci: Int): Unit = {
    val diff = q(0) - dcPred(ci); dcPred(ci) = q(0)
    val s = size(diff)
    val (dcC, dcL) = DcCodes(s)
    bw.put(dcC, dcL)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var k = 1; var run = 0
    while (k < 64) {
      val v = q(k)
      if (v == 0) run += 1
      else {
        while (run > 15) { val (c, l) = AcCodes(0xf0); bw.put(c, l); run -= 16 }
        val ss = size(v)
        val (c, l) = AcCodes((run << 4) | ss)
        bw.put(c, l)
        bw.put(if (v < 0) v + (1 << ss) - 1 else v, ss)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = AcCodes(0x00); bw.put(c, l) } // EOB
  }

  /** Encode full-resolution 0–255 sample planes (1 = gray, 3 = YCbCr) as
    * a baseline JFIF stream. `sampling` gives per-component (h, v)
    * factors; lower-sampled components are box-downsampled and every
    * plane is edge-replicated out to the MCU grid. `wideDqt` writes the
    * (still all-ones) quant table with 16-bit precision, to exercise a
    * decoder's Pq=1 path. */
  def encode(w: Int, h: Int, planes: Array[Array[Int]],
             sampling: Array[(Int, Int)], restartInterval: Int = 0,
             wideDqt: Boolean = false): Array[Byte] = {
    val nc = planes.length
    require(nc == 1 || nc == 3, s"1 or 3 components, got $nc")
    require(sampling.length == nc && planes.forall(_.length == w * h),
      "per-component sampling and full-resolution planes required")
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, s"bad dims ${w}x$h")
    val hmax = sampling.map(_._1).max
    val vmax = sampling.map(_._2).max
    require(sampling.forall { case (sh, sv) =>
      sh >= 1 && sv >= 1 && hmax % sh == 0 && vmax % sv == 0 }, "bad sampling")
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val comp = Array.tabulate(nc) { ci =>
      val (sh, sv) = sampling(ci)
      val fx = hmax / sh; val fy = vmax / sv
      val dw = (w + fx - 1) / fx; val dh = (h + fy - 1) / fy
      val pw = mcusX * 8 * sh; val ph = mcusY * 8 * sv
      val plane = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          val dx = math.min(x, dw - 1); val dy = math.min(y, dh - 1)
          var s = 0; var n = 0 // box mean over the source cell, edge-clamped
          var yy = dy * fy
          while (yy < math.min((dy + 1) * fy, h)) {
            var xx = dx * fx
            while (xx < math.min((dx + 1) * fx, w)) {
              s += planes(ci)(yy * w + xx); n += 1; xx += 1
            }
            yy += 1
          }
          plane(y * pw + x) = (s + n / 2) / n
          x += 1
        }
        y += 1
      }
      (plane, pw)
    }
    val out = new java.io.ByteArrayOutputStream()
    def wr(bs: Int*): Unit = bs.foreach(b => out.write(b & 0xff))
    def seg(marker: Int, body: Seq[Int]): Unit = {
      wr(0xff, marker, (body.length + 2) >> 8, (body.length + 2) & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    wr(0xff, 0xd8)
    if (wideDqt) seg(0xdb, 0x10 +: Seq.fill(64)(Seq(0, 1)).flatten)
    else seg(0xdb, 0x00 +: Seq.fill(64)(1))
    seg(0xc0, Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      (0 until nc).flatMap(ci => Seq(ci + 1, (sampling(ci)._1 << 4) | sampling(ci)._2, 0)))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals).toSeq)
    seg(0xc4, 0x10 +: (AcBits ++ AcVals).toSeq)
    if (restartInterval > 0)
      seg(0xdd, Seq(restartInterval >> 8, restartInterval & 0xff))
    seg(0xda, nc +: ((0 until nc).flatMap(ci => Seq(ci + 1, 0x00)) ++ Seq(0, 63, 0)))
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nc)
    val spatial = new Array[Int](64)
    val qcoef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val nMcu = mcusX * mcusY
    var mcu = 0; var rstIdx = 0
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        wr(0xff, 0xd0 + (rstIdx & 7)); rstIdx += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val (plane, pw) = comp(ci)
        val (sh, sv) = sampling(ci)
        var by = 0
        while (by < sv) {
          var bx = 0
          while (bx < sh) {
            val x0 = (mx * sh + bx) * 8; val y0 = (my * sv + by) * 8
            var k = 0
            while (k < 64) { spatial(k) = plane((y0 + k / 8) * pw + x0 + k % 8); k += 1 }
            fdctQuant(spatial, tmp, qcoef)
            encodeBlock(bw, qcoef, dcPred, ci)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    wr(0xff, 0xd9)
    out.toByteArray
  }

  def encodeGray(w: Int, h: Int, yPlane: Array[Int], restartInterval: Int = 0,
                 wideDqt: Boolean = false): Array[Byte] =
    encode(w, h, Array(yPlane), Array((1, 1)), restartInterval, wideDqt)

  def encodeYcc(w: Int, h: Int, y: Array[Int], cb: Array[Int], cr: Array[Int],
                subsample420: Boolean, restartInterval: Int = 0): Array[Byte] =
    encode(w, h, Array(y, cb, cr),
      if (subsample420) Array((2, 2), (1, 1), (1, 1))
      else Array((1, 1), (1, 1), (1, 1)),
      restartInterval)
}
