package graft.ingest

import java.nio.charset.StandardCharsets.UTF_16LE

/** Fixture-grade BIFF8 `.xls` writer — the counterpart of [[XlsRead]]
  * that lets specs and oracle queries round-trip real legacy workbooks
  * without shipping binary fixtures ([MS-CFB]/[MS-XLS] layouts, same as
  * the reader). NOT an engine sink: `.xls` is a bounded interchange
  * format; engine output goes to parquet/CSV.
  *
  * `forceRegularFat = true` pads the Workbook stream past the 4096-byte
  * mini cutoff so it is stored in regular FAT sectors; `false` keeps it
  * small and stored via the MiniFAT/ministream — the two container
  * layouts [[XlsRead.workbookStream]] must both decode.
  */
object XlsWrite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xffff) ++ le16(v >>> 16)
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(payload.length) ++ payload
  /** XLUnicodeRichExtendedString — compressed (latin-1) when every char
    * fits a byte, UTF-16 otherwise, like Excel itself writes. */
  private def ucs(s: String): Array[Byte] =
    if (s.forall(_ < 0x100))
      le16(s.length) ++ Array(0x00.toByte) ++ s.map(_.toByte).toArray
    else le16(s.length) ++ Array(0x01.toByte) ++ s.getBytes(UTF_16LE)
  private def bof(dt: Int): Array[Byte] = rec(0x0809,
    le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le32(0xC1) ++ le32(0x06))

  /** Write `header` + `rows` as the first worksheet. Cell encoding by
    * value type: String → SST + LABELSST, Int/small Long → RK (integer
    * mode), Long/Double → NUMBER, Boolean → BOOLERR, null → omitted.
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]],
            forceRegularFat: Boolean = true): Unit = {
    val strings = (header ++ rows.flatten.collect { case s: String => s }).distinct.toIndexedSeq
    val sidx = strings.zipWithIndex.toMap
    var nRefs = 0
    def cell(r: Int, c: Int, v: Any): Array[Byte] = v match {
      case s: String =>
        nRefs += 1
        rec(0x00FD, le16(r) ++ le16(c) ++ le16(15) ++ le32(sidx(s)))
      case i: Int if i >= -(1 << 29) && i < (1 << 29) =>
        rec(0x027E, le16(r) ++ le16(c) ++ le16(15) ++ le32((i << 2) | 2))
      case i: Int => number(r, c, i.toDouble)
      case l: Long if l >= -(1L << 29) && l < (1L << 29) =>
        rec(0x027E, le16(r) ++ le16(c) ++ le16(15) ++ le32(((l.toInt) << 2) | 2))
      case l: Long => number(r, c, l.toDouble)
      case d: Double => number(r, c, d)
      case b: Boolean =>
        rec(0x0205, le16(r) ++ le16(c) ++ le16(15) ++
          Array((if (b) 1 else 0).toByte, 0.toByte))
      case null => Array.emptyByteArray
      case other => sys.error(s"unsupported .xls fixture cell: $other")
    }
    def number(r: Int, c: Int, d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      rec(0x0203, le16(r) ++ le16(c) ++ le16(15) ++
        (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray)
    }
    val cellRecs = (header.zipWithIndex.map { case (h, c) => cell(0, c, h) } ++
      rows.zipWithIndex.flatMap { case (row, i) =>
        row.zipWithIndex.map { case (v, c) => cell(i + 1, c, v) }
      }).reduce(_ ++ _)
    val sheet = bof(0x0010) ++ cellRecs ++ rec(0x000A, Array.emptyByteArray)
    val sst = rec(0x00FC,
      le32(nRefs) ++ le32(strings.length) ++
        strings.map(ucs).foldLeft(Array.emptyByteArray)(_ ++ _))
    // BOUNDSHEET carries the sheet BOF's absolute stream offset — fixed
    // payload width, so globals length is known before the offset is
    val bsPayload = (pos: Int) =>
      le32(pos) ++ le16(0) ++ Array(2.toByte, 0.toByte) ++ "S1".getBytes("US-ASCII")
    val globalsLen = bof(0).length + rec(0x0085, bsPayload(0)).length +
      sst.length + rec(0x000A, Array.emptyByteArray).length
    val globals = bof(0x0005) ++ rec(0x0085, bsPayload(globalsLen)) ++ sst ++
      rec(0x000A, Array.emptyByteArray)
    val stream = globals ++ sheet
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      cfb(stream, forceRegularFat))
  }

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF
  private val FatSect = 0xFFFFFFFD

  /** Minimal single-FAT-sector CFB container around one Workbook stream. */
  private def cfb(stream: Array[Byte], forceRegularFat: Boolean): Array[Byte] = {
    val useMini = !forceRegularFat && stream.length < 4096
    require(!useMini || stream.length <= 128 * 64,
      "ministream fixture writer caps at one MiniFAT sector (8 KiB)")

    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val out = new Array[Byte](128)
      java.util.Arrays.fill(out, 0.toByte)
      val nb = name.getBytes(UTF_16LE)
      System.arraycopy(nb, 0, out, 0, nb.length)
      copy(out, 64, le16(if (name.isEmpty) 0 else nb.length + 2))
      out(66) = typ.toByte
      out(67) = 1 // black
      copy(out, 68, le32(FreeSect)) // left sibling: NOSTREAM
      copy(out, 72, le32(FreeSect)) // right sibling
      copy(out, 76, le32(child))
      copy(out, 116, le32(start))
      copy(out, 120, le32(size))
      out
    }
    def copy(dst: Array[Byte], off: Int, src: Array[Byte]): Unit =
      System.arraycopy(src, 0, dst, off, src.length)
    def pad(b: Array[Byte], to: Int): Array[Byte] = {
      val rem = b.length % to
      if (rem == 0 && b.length > 0) b
      else b ++ new Array[Byte](if (rem == 0) to else to - rem)
    }

    val (sectors, dirSector, firstMiniFat, nMiniFat) =
      if (!useMini) {
        val body = pad(if (stream.length >= 4096) stream
          else stream ++ new Array[Byte](4096 - stream.length), 512)
        val n = body.length / 512 // stream sectors 1..n, dir at n+1
        require(n + 2 <= 128, "single-FAT-sector fixture writer caps at ~63 KiB")
        val dir =
          dirEntry("Root Entry", 5, 1, EndOfChain, 0) ++
          dirEntry("Workbook", 2, FreeSect, 1, body.length) ++
          new Array[Byte](256)
        val fat = new Array[Byte](512)
        copy(fat, 0, le32(FatSect))
        for (i <- 1 to n) copy(fat, 4 * i, le32(if (i == n) EndOfChain else i + 1))
        copy(fat, 4 * (n + 1), le32(EndOfChain)) // directory
        for (i <- n + 2 until 128) copy(fat, 4 * i, le32(FreeSect))
        (fat ++ body ++ dir, n + 1, EndOfChain, 0)
      } else {
        // sectors: 0 FAT, 1 dir, 2 MiniFAT, 3.. ministream
        val mini = pad(stream, 64)
        val nMiniSect = mini.length / 64
        val miniBody = pad(mini, 512)
        val nBody = miniBody.length / 512
        val miniFat = new Array[Byte](512)
        for (i <- 0 until nMiniSect)
          copy(miniFat, 4 * i, le32(if (i == nMiniSect - 1) EndOfChain else i + 1))
        for (i <- nMiniSect until 128) copy(miniFat, 4 * i, le32(FreeSect))
        val dir =
          dirEntry("Root Entry", 5, 1, 3, mini.length) ++
          dirEntry("Workbook", 2, FreeSect, 0, stream.length) ++
          new Array[Byte](256)
        val fat = new Array[Byte](512)
        copy(fat, 0, le32(FatSect))
        copy(fat, 4, le32(EndOfChain)) // directory
        copy(fat, 8, le32(EndOfChain)) // MiniFAT
        for (i <- 0 until nBody)
          copy(fat, 4 * (3 + i), le32(if (i == nBody - 1) EndOfChain else 3 + i + 1))
        for (i <- 3 + nBody until 128) copy(fat, 4 * i, le32(FreeSect))
        (fat ++ dir ++ miniFat ++ miniBody, 1, 2, 1)
      }

    val header = new Array[Byte](512)
    copy(header, 0, Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    copy(header, 24, le16(0x003E)) // minor version
    copy(header, 26, le16(0x0003)) // major version 3 (512-byte sectors)
    copy(header, 28, le16(0xFFFE)) // little-endian marker
    copy(header, 30, le16(0x0009)) // sector shift: 512
    copy(header, 32, le16(0x0006)) // mini sector shift: 64
    copy(header, 44, le32(1)) // one FAT sector
    copy(header, 48, le32(dirSector))
    copy(header, 56, le32(4096)) // mini cutoff
    copy(header, 60, le32(firstMiniFat))
    copy(header, 64, le32(nMiniFat))
    copy(header, 68, le32(EndOfChain)) // no DIFAT chain
    copy(header, 72, le32(0))
    copy(header, 76, le32(0)) // DIFAT[0]: FAT at sector 0
    for (i <- 1 until 109) copy(header, 76 + 4 * i, le32(FreeSect))
    header ++ sectors
  }
}
