package graft.multimodal

/** Pure-JVM MP4 / ISO base-media (ISO/IEC 14496-12) container prober —
  * the video leg of media decoding: real nested box walking (u32 and
  * u64 `largesize` forms, size-0 "to end of file"), `moov/mvhd`
  * movie-level timescale+duration (version 0 and 1), and `trak/tkhd`
  * track dimensions (16.16 fixed point). Frame DECODING genuinely
  * requires video codec libraries and stays behind the
  * [[MediaDecoder]] seam; the container metadata a frame-sampling plan
  * needs (duration, dimensions, track count) is parsed from real bytes
  * here, same as [[HeaderDecoder]] does for images.
  */
object Mp4Probe {

  /** Movie-level metadata: duration in ms (from mvhd timescale), the
    * first sized track's pixel dimensions (0 when no visual track),
    * and the number of tracks. */
  final case class Info(durationMs: Long, width: Int, height: Int, nTracks: Int)

  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], i: Int): Long =
    ((u8(p(i)).toLong << 24) | (u8(p(i + 1)) << 16) | (u8(p(i + 2)) << 8) | u8(p(i + 3))) & 0xffffffffL
  private def be64(p: Array[Byte], i: Int): Long = (be32(p, i) << 32) | be32(p, i + 4)
  private def tag(p: Array[Byte], i: Int): String = new String(p, i, 4, "US-ASCII")

  /** Walk the boxes in p[from, to) invoking f(type, payloadFrom,
    * payloadTo); returns false on any malformed size. */
  private def walk(p: Array[Byte], from: Long, to: Long)
                  (f: (String, Long, Long) => Unit): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val size0 = be32(p, i.toInt)
      val typ = tag(p, i.toInt + 4)
      var payload = i + 8
      val end =
        if (size0 == 0) to                       // box extends to the end
        else if (size0 == 1) {                   // 64-bit largesize
          if (i + 16 > to) return false
          payload = i + 16
          i + be64(p, i.toInt + 8)
        } else i + size0
      // end >= payload >= i + 8 also guarantees forward progress
      if (end < payload || end > to) return false
      f(typ, payload, end)
      i = end
    }
    i == to
  }

  def probe(p: Array[Byte]): Option[Info] = {
    if (p == null || p.length < 16) return None
    try {
      // an ISO-BMFF stream opens with a box whose type is ftyp (or the
      // legacy moov-first layout); anything else is not MP4
      val head = tag(p, 4)
      if (head != "ftyp" && head != "moov") return None
      var durationMs = -1L
      var width = 0; var height = 0; var nTracks = 0
      val ok = walk(p, 0, p.length) { (typ, from, to) =>
        if (typ == "moov") {
          walk(p, from, to) { (t2, f2, t2end) =>
            if (t2 == "mvhd" &&
              t2end - f2 >= (if (u8(p(f2.toInt)) == 1) 32 else 24)) {
              val ver = u8(p(f2.toInt))
              val (ts, dur) =
                if (ver == 1) (be32(p, f2.toInt + 20), be64(p, f2.toInt + 24))
                else (be32(p, f2.toInt + 12), be32(p, f2.toInt + 16))
              if (ts > 0) durationMs = dur * 1000L / ts
            } else if (t2 == "trak") {
              nTracks += 1
              walk(p, f2, t2end) { (t3, f3, t3end) =>
                if (t3 == "tkhd" &&
                  t3end - f3 >= (if (u8(p(f3.toInt)) == 1) 96 else 84)) {
                  val ver = u8(p(f3.toInt))
                  val dimOff = f3.toInt + (if (ver == 1) 88 else 76)
                  val w = (be32(p, dimOff) >> 16).toInt      // 16.16 fixed
                  val h = (be32(p, dimOff + 4) >> 16).toInt
                  if (width == 0 && w > 0 && h > 0) { width = w; height = h }
                }
              }
              ()
            }
          }
          ()
        }
      }
      if (ok && durationMs >= 0) Some(Info(durationMs, width, height, nTracks))
      else None
    } catch {
      case _: IndexOutOfBoundsException => None
    }
  }
}

/** Minimal valid ISO-BMFF containers for fixtures and specs. */
object SyntheticVideo {

  private def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  /** ftyp + moov{mvhd, trak{tkhd}×n} with the given movie timescale /
    * duration and per-track pixel dimensions ((0,0) = non-visual). */
  def mp4Of(timescale: Long, duration: Long,
            tracks: Seq[(Int, Int)], mvhdV1: Boolean = false): Array[Byte] = {
    require(timescale > 0 && duration >= 0)
    require(mvhdV1 || duration <= 0xffffffffL,
      "v0 mvhd stores a u32 duration — use mvhdV1 for longer movies")
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      if (mvhdV1)
        Array[Byte](1, 0, 0, 0) ++ Array.fill(16)(0.toByte) ++ be32(timescale) ++
          be32(duration >> 32) ++ be32(duration & 0xffffffffL) ++
          Array.fill(80)(0.toByte)
      else
        Array.fill(12)(0.toByte) ++ be32(timescale) ++ be32(duration) ++
          Array.fill(80)(0.toByte))
    val traks = tracks.map { case (w, h) =>
      box("trak", box("tkhd",
        Array.fill(76)(0.toByte) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16)))
    }
    ftyp ++ box("moov", mvhd ++ traks.flatten.toArray)
  }
}
