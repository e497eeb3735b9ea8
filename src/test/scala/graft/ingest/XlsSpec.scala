package graft.ingest

import graft.SparkSpec
import java.nio.file.Files

class XlsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_xls").resolve(name).toString

  private val header = Seq("id", "name", "city")
  private val rows: Seq[Seq[Any]] = Seq(
    Seq(1L, "café", "paris"),
    Seq(2L, "jürgen", "münchen"),
    Seq(3L, "北京烤鸭", "北京"), // forces a UTF-16 SST string
    Seq(4L, 2.5, "nice"),       // double cell in a long column → double column
    Seq(5L, null, "oslo"),
    Seq(6L, "åsa", "umeå"))

  test("round-trip via regular FAT: schema, typing, unicode") {
    val p = tmp("a.xls")
    XlsWrite.write(p, header, rows, forceRegularFat = true)
    val df = XlsRead.read(spark, p).get
    assert(df.columns.toSeq == Seq("id", "name", "city"))
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("city").dataType.typeName == "string")
    val got = df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
      r.getAs[String]("city"))).sortBy(_._1)
    assert(got(0) == ((1L, "café", "paris")))
    assert(got(2) == ((3L, "北京烤鸭", "北京")))
    assert(got(4) == ((5L, null, "oslo")))
  }

  test("round-trip via ministream equals regular FAT") {
    val pr = tmp("r.xls"); val pm = tmp("m.xls")
    XlsWrite.write(pr, header, rows, forceRegularFat = true)
    XlsWrite.write(pm, header, rows, forceRegularFat = false)
    // the small container really did take the ministream path
    assert(Files.size(java.nio.file.Paths.get(pm)) <
      Files.size(java.nio.file.Paths.get(pr)))
    val a = XlsRead.read(spark, pr).get.orderBy("id").collect().map(_.toSeq)
    val b = XlsRead.read(spark, pm).get.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("RK decode: all four modes") {
    assert(XlsRead.rkValue((42 << 2) | 2) == 42.0)
    assert(XlsRead.rkValue((-7 << 2) | 2) == -7.0)
    assert(XlsRead.rkValue((12345 << 2) | 3) == 123.45) // int / 100
    val bits = java.lang.Double.doubleToLongBits(1.5) // low 34 bits are zero
    val rk = ((bits >>> 32) & 0xFFFFFFFCL).toInt
    assert(XlsRead.rkValue(rk) == 1.5)
    assert(XlsRead.rkValue(rk | 1) == 0.015) // double / 100
  }

  test("hand-crafted stream: SST CONTINUE split mid-string, MULRK, inline LABEL, BOOLERR") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    def rec(id: Int, p: Array[Byte]) = le16(id) ++ le16(p.length) ++ p
    def bof(dt: Int) = rec(0x0809, le16(0x0600) ++ le16(dt) ++ new Array[Byte](12))
    // SST: 2 strings; the second ("continued") splits after 4 chars, the
    // CONTINUE segment restarting with its own compressed-flag byte
    val s1 = "alpha"; val s2 = "continued"
    val sstP = le32(3) ++ le32(2) ++
      (le16(s1.length) :+ 0x00.toByte) ++ s1.getBytes("ISO-8859-1") ++
      (le16(s2.length) :+ 0x00.toByte) ++ s2.take(4).getBytes("ISO-8859-1")
    val contP = 0x00.toByte +: s2.drop(4).getBytes("ISO-8859-1")
    val eof = rec(0x000A, Array.emptyByteArray)
    def bsPayload(pos: Int) =
      le32(pos) ++ le16(0) ++ Array(1.toByte, 0.toByte) ++ "S".getBytes("US-ASCII")
    val globalsLen = bof(5).length + rec(0x0085, bsPayload(0)).length +
      rec(0x00FC, sstP).length + rec(0x003C, contP).length + eof.length
    val globals = bof(0x0005) ++ rec(0x0085, bsPayload(globalsLen)) ++
      rec(0x00FC, sstP) ++ rec(0x003C, contP) ++ eof
    // sheet: header via LABELSST ("alpha", "continued"), then one row with
    // MULRK pair (10, 20), an inline LABEL, a BOOLERR, a formula w/ number
    def inlineLbl(r: Int, c: Int, s: String) =
      rec(0x0204, le16(r) ++ le16(c) ++ le16(15) ++
        (le16(s.length) :+ 0x00.toByte) ++ s.getBytes("ISO-8859-1"))
    val cells =
      rec(0x00FD, le16(0) ++ le16(0) ++ le16(15) ++ le32(0)) ++
      rec(0x00FD, le16(0) ++ le16(1) ++ le16(15) ++ le32(1)) ++
      inlineLbl(0, 2, "c2") ++
      inlineLbl(0, 3, "c3") ++
      rec(0x00BD, le16(1) ++ le16(0) ++ // MULRK row 1 cols 0-1
        le16(15) ++ le32((10 << 2) | 2) ++ le16(15) ++ le32((20 << 2) | 2) ++ le16(1)) ++
      inlineLbl(1, 2, "inline") ++
      rec(0x0205, le16(1) ++ le16(3) ++ le16(15) ++ Array(1.toByte, 0.toByte))
    val wb = globals ++ bof(0x0010) ++ cells ++ eof
    val df = XlsRead.parseWorkbook(spark, wb, Int.MaxValue).get
    assert(df.columns.toSeq == Seq("alpha", "continued", "c2", "c3"))
    val r = df.collect()(0)
    assert(r.getAs[Long]("alpha") == 10L && r.getAs[Long]("continued") == 20L)
    assert(r.getString(2) == "inline" && r.getString(3) == "TRUE")
  }

  test("RobustCsv routes CFB magic to the xls reader") {
    val p = tmp("via_chain.xls")
    XlsWrite.write(p, header, rows, forceRegularFat = false)
    val df = RobustCsv.read(spark, p).get
    assert(df.count() == 6 && df.columns.length == 3)
  }

  test("rejects non-workbook input") {
    assert(XlsRead.workbookStream("not a cfb file at all".getBytes).isEmpty)
    val p = tmp("junk.xls")
    Files.write(java.nio.file.Paths.get(p), Array.fill[Byte](600)(0x5A))
    assert(XlsRead.read(spark, p).isEmpty)
  }
}
