package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.RobustCsv
import graft.profile.Profiler

/** The executor-side CSV decoder must be BIT-IDENTICAL to the driver
  * chain (`RobustCsv.read` + per-table profile) for every file it
  * accepts, and must ROUTE to the driver chain (reject) for every file
  * where that equivalence is not certain. These specs pin both halves.
  */
class CsvScanSpec extends SparkSpec {

  private def write(dir: java.nio.file.Path, name: String, content: String,
                    charset: String = "UTF-8"): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, content.getBytes(charset))
    p.toString
  }

  private def gzWrite(dir: java.nio.file.Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(p))
    out.write(content.getBytes("UTF-8")); out.close()
    p.toString
  }

  // canonical render; mean/std are order-dependent double sums → 6 dp
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.withColumn("mean", round(col("mean"), 6))
      .withColumn("std", round(col("std"), 6))
      .orderBy("table_name", "col_idx").toJSON.collect().toSeq

  private def assertParity(unified: org.apache.spark.sql.DataFrame,
                           loop: org.apache.spark.sql.DataFrame): Unit = {
    val (cu, cl) = (canon(unified), canon(loop))
    if (cu != cl) {
      val diffs = cu.zipAll(cl, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }.take(3)
      fail(s"csv-unified != driver chain (${cu.size} vs ${cl.size} rows); first diffs:\n" +
        diffs.map { case (a, b) => s"U: $a\nL: $b" }.mkString("\n---\n"))
    }
  }

  private lazy val lakeDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_csvlake")
    // every supported inference shape in one table: int, double (incl.
    // whitespace + exponent forms), long, bool (mixed case), date with a
    // null, timestamps in all strict grammars, strings with quoted
    // delimiters/escaped quotes/empties, and a promoted yyyy/MM/dd column
    write(d, "alpha.csv",
      "id,amount,big,flag,day,seen,note,when\n" +
      "1,1.5,3000000000,true,2021-01-15,2021-01-15 10:30:00,hello,2021/01/15\n" +
      "2,2.5,4000000000,false,2021-02-20,2021-02-20 11:45:30.123,\"with,comma\",2021/02/20\n" +
      "3,3.75,5000000000,True,2021-03-25,2021-03-25T12:00:00,,2021/03/25\n" +
      "4, 4,6000000000,false,,2021-04-01 09:15,world,2021/04/30\n" +
      "5,5e2,7000000000,true,2021-05-05,2021-05-05 00:00:00,x y,2021/05/31\n" +
      "6,6.25,8000000000,false,2021-06-15,2021-06-15 23:59:59,\"quoted \"\"q\"\"\",2021/06/01\n")
    write(d, "beta.csv", // semicolon-sniffed delimiter
      """k;v;w
        |1;one;0.5
        |2;two;1.5
        |3;three;2.5
        |4;four;3.5
        |5;five;4.5
        |""".stripMargin)
    gzWrite(d, "gamma.csv.gz",
      """x,y
        |10,a
        |20,b
        |30,c
        |40,d
        |50,e
        |""".stripMargin)
    write(d, "rowidx.csv", // S4 synthetic column drop + messy header
      """row_index," Name ","V,al"
        |0,aa,1
        |1,bb,2
        |2,cc,3
        |3,dd,4
        |4,ee,5
        |""".stripMargin)
    // reject triggers: non-UTF8 bytes, malformed row, decimal-inferring
    // huge ints, UTF-8 BOM, lenient-gray-zone dates
    write(d, "lat.csv", "name,city\nJosé,París\nRené,Lyon\nAimé,Nice\nNoé,Metz\nZoé,Albi\n",
      "ISO-8859-1")
    write(d, "bad.csv", "a,b\n1,x\n2,y,EXTRA\n3,z\n4,w\n5,v\n")
    write(d, "dec.csv", "id,huge\n1,12345678901234567890123\n2,22345678901234567890123\n3,3234567890123456789\n4,1\n5,2\n")
    write(d, "bom.csv", "﻿a,b\n1,x\n2,y\n3,z\n4,w\n5,v\n")
    write(d, "gray.csv", "id,d\n1,2021-1-5\n2,2021-2-6\n3,2021-3-7\n4,2021-4-8\n5,2021-5-9\n")
    // classic-Mac lone-CR line endings: Hadoop's LineReader reads these
    // fine, the strict \n split cannot — must REJECT, never vanish
    write(d, "cr.csv", "a,b\r1,x\r2,y\r3,z\r4,w\r5,v\r")
    // Spark's positiveInf/negativeInf literals infer double; Java's
    // parseDouble refuses them — schema would diverge, so reject
    write(d, "inf.csv", "id,v\n1,Inf\n2,-Inf\n3,1.5\n4,2.5\n5,3.5\n")
    write(d, "tiny.csv", "a,b\n1,x\n2,y\n3,z\n") // P4: <5 rows → skipped
    d
  }

  private lazy val files = RobustCsv.listTables(spark, lakeDir.toString)
  private lazy val names = CsvScan.tableNames(files)
  private lazy val scan = CsvScan.scanLake(spark, names, RobustCsv.RowCap)

  test("reject routing: exactly the non-strict files fall back, tiny is skipped") {
    val rejectedNames = scan.rejected.map(names).toSet
    assert(rejectedNames == Set("lat", "bad", "dec", "bom", "gray", "cr", "inf"),
      s"rejected: $rejectedNames")
    val cellTables = scan.cells.select("table_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(cellTables == Set("alpha", "beta", "gamma", "rowidx"),
      s"accepted: $cellTables")
    // the fallback leg still reads every rejected file
    scan.rejected.foreach { p =>
      assert(RobustCsv.read(spark, p).isDefined, s"fallback failed for $p")
    }
  }

  test("accepted files: profile parity with the driver chain, bit for bit") {
    val unified = Profiler.profileFromLong(LakeScan.renderLong(scan.cells))
    Seq("alpha", "beta", "gamma", "rowidx").foreach { n =>
      val path = files.find(f => names(f) == n).get
      val loop = Profiler.profile(RobustCsv.read(spark, path).get, n)
      assertParity(unified.filter(col("table_name") === n), loop)
    }
  }

  test("accepted files: content-snapshot parity with the driver chain") {
    val unified = LakeScan.snapshotFromRaw(scan.cells)
    val loop = Seq("alpha", "beta", "gamma", "rowidx").map { n =>
      val path = files.find(f => names(f) == n).get
      Profiler.contentSnapshot(RobustCsv.read(spark, path).get, n)
    }.reduce(_ unionByName _)
    def c(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("table_name").toJSON.collect().toSeq
    assert(c(unified) == c(loop))
  }

  test("date promotion replay: 'when' classified date, when_DATE appended last") {
    val prof = Profiler.profileFromLong(LakeScan.renderLong(scan.cells))
      .filter(col("table_name") === "alpha")
      .select("col_idx", "col_name", "col_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(prof.map(_._2).toSeq ==
      Seq("id", "amount", "big", "flag", "day", "seen", "note", "when", "when_DATE"))
    val byName = prof.map(p => p._2 -> p._3).toMap
    assert(byName("when") == "date" && byName("when_DATE") == "date")
    assert(byName("flag") == "string") // pandas bool→string classification
  }

  test("row cap applies in file order like the driver chain's limit") {
    val d = java.nio.file.Files.createTempDirectory("graft_csvcap")
    val content = "a,b\n" + (1 to 50).map(i => s"$i,v$i").mkString("\n") + "\n"
    val p = write(d, "capped.csv", content)
    val sc = CsvScan.scanLake(spark, Map(p -> "capped"), rowCap = 10)
    assert(sc.rejected.isEmpty)
    val prof = Profiler.profileFromLong(LakeScan.renderLong(sc.cells))
    val loop = Profiler.profile(
      RobustCsv.read(spark, p).get.limit(10), "capped")
    assertParity(prof, loop)
    assert(prof.filter(col("col_name") === "a").select("rows")
      .collect()(0).getLong(0) == 10L)
  }

  test("date-like PREFIXES in text stay strings; bare gray-zone dates reject") {
    import graft.profile.Profiler
    val d = java.nio.file.Files.createTempDirectory("graft_csvgray")
    // "2021-12 report": date-shaped prefix + arbitrary text — Spark never
    // parses this as a date/timestamp, so the file must be ACCEPTED and
    // bit-parity must hold; scores like "5-3" are ambiguous (Spark's
    // lenient stringToDate can take year-month forms) → reject
    val pOk = write(d, "notes.csv",
      "id,note\n1,2021-12 report\n2,2022-01 report\n3,plain\n4,2023-03 recap\n5,x\n")
    val pBad = write(d, "scores.csv",
      "id,score\n1,5-3\n2,2-1\n3,0-0\n4,4-2\n5,1-1\n")
    // grammar-valid but calendar-invalid timestamps: reject, never crash
    val pBadTs = write(d, "badts.csv",
      "id,t\n1,2021-13-45 10:30:00\n2,2021-01-15 25:99:00\n" +
        "3,2021-02-30 10:00:00\n4,2021-01-01 10:00:00\n5,2021-01-02 10:00:00\n")
    val sc = CsvScan.scanLake(spark,
      Map(pOk -> "notes", pBad -> "scores", pBadTs -> "badts"), RobustCsv.RowCap)
    assert(sc.rejected == Seq(pBadTs, pBad).sorted, s"rejected: ${sc.rejected}")
    assertParity(
      Profiler.profileFromLong(LakeScan.renderLong(sc.cells)),
      Profiler.profile(RobustCsv.read(spark, pOk).get, "notes"))
  }

  test("unified CSV plan: one aggregate subtree, zero per-file unions") {
    // the structural property that makes 40k-file ingest one job: the
    // profile over decoded cells must not grow per-file plan branches
    val plan = Profiler.profileFromLong(LakeScan.renderLong(scan.cells))
      .queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }.size
    assert(unions == 0, s"unified CSV profile plan contains $unions unions")
  }

  test("tableNames dedups basename collisions deterministically") {
    val m = CsvScan.tableNames(Seq("/lake/x/a.csv", "/lake/y/a.csv", "/lake/a.csv.gz", "/lake/b.csv"))
    assert(m.values.toSet.size == 4, s"collision survived: $m")
    assert(m("/lake/b.csv") == "b")
    // deterministic: sorted-path order fixes which file keeps the bare name
    assert(m == CsvScan.tableNames(Seq("/lake/b.csv", "/lake/a.csv.gz", "/lake/y/a.csv", "/lake/x/a.csv")))
    // suffixing never collides with a LITERAL __2 basename: the real
    // a__2.csv keeps its name and the duplicate `a` skips to __3
    val lit = CsvScan.tableNames(Seq("/x/a.csv", "/y/a.csv", "/z/a__2.csv"))
    assert(lit == Map("/x/a.csv" -> "a", "/y/a.csv" -> "a__3",
      "/z/a__2.csv" -> "a__2"), s"suffix collided with literal: $lit")
  }

  test("fuzz: 24 generated CSVs — every accepted file bit-matches the driver chain") {
    // deterministic seed → deterministic accept/reject partition; the
    // generator mixes every value pool (ints with +/0-padding, doubles
    // with whitespace/exponent/NaN, bools in mixed case, strict and
    // gray-zone dates, quoted delimiters, unicode, empties) across random
    // widths, row counts, and delimiters
    val rnd = new scala.util.Random(20260813L)
    val pools: Seq[Seq[String]] = Seq(
      Seq("0", "7", "-12", "007", "+5", "2147483648", "42"),
      Seq("1.5", "2e3", " 4", "6.25", "-0.5", "1000000.25"),
      Seq("true", "false", "True", "FALSE"),
      Seq("2021-01-15", "1999-12-31", "2024-02-29", "2021-06-07"),
      Seq("2021-01-15 10:30:00", "2021-06-07T23:59:59", "2020-02-02 02:02",
        "2021-01-15 10:30:00.125"),
      Seq("plain", "two words", "\"with,comma\"", "naïve", "2021-12 report", "x"),
      Seq("2021-1-5", "5-3", " 2021-01-15"), // gray zone → must reject
      Seq("12345678901234567890123", "22345678901234567890123")) // decimal → reject
    val d = java.nio.file.Files.createTempDirectory("graft_csvfuzz")
    val delims = Seq(",", ";", "|")
    val paths = (0 until 24).map { fi =>
      val delim = delims(rnd.nextInt(delims.length))
      val nCols = 2 + rnd.nextInt(4)
      val nRows = 6 + rnd.nextInt(40)
      val colPools = Seq.fill(nCols)(pools(rnd.nextInt(pools.length)))
      val header = (0 until nCols).map(i => s"c$i").mkString(delim)
      val rows = (0 until nRows).map { _ =>
        colPools.map { pool =>
          if (rnd.nextInt(8) == 0) "" // null cell
          else {
            val v = pool(rnd.nextInt(pool.length))
            if (v.contains(delim) && !v.startsWith("\"")) "\"" + v + "\"" else v
          }
        }.mkString(delim)
      }
      write(d, f"fz$fi%02d.csv", (header +: rows).mkString("", "\n", "\n"))
    }
    val nm = CsvScan.tableNames(paths)
    val sc = CsvScan.scanLake(spark, nm, RobustCsv.RowCap)
    val accepted = sc.cells.select("table_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(accepted.nonEmpty, "fuzz produced no accepted files — generator broken")
    val unified = Profiler.profileFromLong(LakeScan.renderLong(sc.cells))
    accepted.foreach { n =>
      val path = paths.find(p => nm(p) == n).get
      assertParity(unified.filter(col("table_name") === n),
        Profiler.profile(RobustCsv.read(spark, path).get, n))
    }
    // every rejected file must still go through the driver chain cleanly
    sc.rejected.foreach(p => RobustCsv.read(spark, p)) // None is fine; no throw
    sc.release()
  }

  test("bz2 decompression matches the driver chain") {
    val d = java.nio.file.Files.createTempDirectory("graft_csvbz2")
    val content = "m,n\n1,aa\n2,bb\n3,cc\n4,dd\n5,ee\n"
    val p = d.resolve("zed.csv.bz2")
    val out = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
      java.nio.file.Files.newOutputStream(p))
    out.write(content.getBytes("UTF-8")); out.close()
    val sc = CsvScan.scanLake(spark, Map(p.toString -> "zed"), RobustCsv.RowCap)
    assert(sc.rejected.isEmpty)
    assertParity(
      Profiler.profileFromLong(LakeScan.renderLong(sc.cells)),
      Profiler.profile(RobustCsv.read(spark, p.toString).get, "zed"))
  }
}
