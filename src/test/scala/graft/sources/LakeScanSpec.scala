package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.profile.Profiler

/** The unified single-job lake profiler must be BIT-IDENTICAL to the
  * per-table loop path on every stat, digest, and quantile — the loop
  * path is oracle-verified against DuckDB, so parity transfers that
  * verification to the unified path. Plus the planning property that
  * motivates it: ONE aggregate subtree regardless of table count.
  */
class LakeScanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical row renders. `mean`/`std` ride ORDER-DEPENDENT double
    * summation (different partitionings → last-ulp drift, which is why
    * every oracle query derives them from the exact decimal sums) — those
    * two compare at 6 dp; everything else (counts, exact decimal sums,
    * quantile vectors, digests) compares bit-exactly.
    */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val rounded = df
      .withColumn("mean", round(col("mean"), 6))
      .withColumn("std", round(col("std"), 6))
    rounded.orderBy("table_name", "col_idx").toJSON.collect().toSeq
  }

  private def assertParity(unified: org.apache.spark.sql.DataFrame,
                           loop: org.apache.spark.sql.DataFrame): Unit = {
    val (cu, cl) = (canon(unified), canon(loop))
    if (cu != cl) {
      val diffs = cu.zipAll(cl, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }.take(3)
      fail(s"unified != loop (${cu.size} vs ${cl.size} rows); first diffs:\n" +
        diffs.map { case (a, b) => s"U: $a\nL: $b" }.mkString("\n---\n"))
    }
  }

  test("profileLakeUnified == profileLake on the full driver lake (sketches, cap)") {
    val loop = Profiler.profileLake(spark, dir, tables, rowCap = Some(10000))
    val unified = Profiler.profileLakeUnified(spark, dir, tables, rowCap = Some(10000))
    assertParity(unified, loop)
  }

  test("profileLakeUnified == profileLake without sketches or cap") {
    val sub = Seq("nation", "orders", "events", "embeddings")
    val loop = Profiler.profileLake(spark, dir, sub, withSketches = false)
    val unified = Profiler.profileLakeUnified(spark, dir, sub, withSketches = false)
    assertParity(unified, loop)
  }

  test("keyed row cap selects the same rows on a file-shuffled table") {
    // Write nation DELIBERATELY shuffled on disk: first-N-file-rows and
    // first-N-by-key now differ, so this catches a cap that trusts file
    // order. Lake.read's keyed cap (TakeOrdered) is the contract.
    val tmp = java.nio.file.Files.createTempDirectory("graft_shuffled").toString
    Lake.read(spark, dir, "nation")
      .orderBy(expr("hash(n_nationkey)")).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    val loop = Profiler.profileLake(spark, tmp, Seq("nation"), rowCap = Some(10))
    val unified = Profiler.profileLakeUnified(spark, tmp, Seq("nation"), rowCap = Some(10))
    assertParity(unified, loop)
  }

  test("edge schemas: bools, real DATE columns, empty strings, all-null column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_edge").toString
    Seq(
      (1L, "a", true, java.sql.Date.valueOf("2024-01-02"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), Option.empty[String]),
      (2L, "", false, java.sql.Date.valueOf("2024-02-03"),
        java.sql.Timestamp.valueOf("2024-02-03 04:05:06.123"), Option.empty[String]),
      (3L, null, true, null, null, Option.empty[String]))
      .toDF("id", "s", "b", "d", "ts", "dead")
      .write.mode("overwrite").parquet(s"$tmp/edge.parquet")
    val loop = Profiler.profileLake(spark, tmp, Seq("edge"))
    val unified = Profiler.profileLakeUnified(spark, tmp, Seq("edge"))
    assertParity(unified, loop)
  }

  test("snapshotLakeUnified matches per-table contentSnapshot digests") {
    val snapTables = Seq("region", "nation", "supplier", "orders")
    val loop = snapTables.map(t =>
        Profiler.contentSnapshot(Lake.read(spark, dir, t, Some(10000)), t))
      .reduce(_ unionByName _)
    val unified = LakeScan.snapshotLakeUnified(spark, dir, snapTables, Some(10000))
    def c(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("table_name").toJSON.collect().toSeq
    assert(c(unified) == c(loop))
  }

  test("unified plan: ONE aggregate subtree and zero unions regardless of table count") {
    def planOf(ts: Seq[String]) =
      Profiler.profileLakeUnified(spark, dir, ts, rowCap = Some(10000))
        .queryExecution.optimizedPlan
    def aggCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.size
    def unionCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }.size
    val p3 = planOf(tables.take(3))
    val p10 = planOf(tables)
    assert(unionCount(p3) == 0 && unionCount(p10) == 0,
      "unified profile plan must not union per-table branches")
    assert(aggCount(p3) == aggCount(p10),
      s"aggregate count grew with table count: ${aggCount(p3)} -> ${aggCount(p10)}")
    // the loop path, by contrast, grows linearly — the structural gap this
    // operator removes
    val loop10 = Profiler.profileLake(spark, dir, tables, rowCap = Some(10000))
      .queryExecution.optimizedPlan
    assert(unionCount(loop10) > 0 && aggCount(loop10) > aggCount(p10))
  }

  test("multi-part keyed table: global cap parity with the per-table path") {
    // customer split over 3 shuffled part files, cap WELL below the table
    // size: the per-file heap alone would keep 3x the cap — the global
    // re-selection must reduce to exactly Lake.read's ORDER BY key LIMIT n
    val tmp = java.nio.file.Files.createTempDirectory("graft_parts").toString
    Lake.read(spark, dir, "customer")
      .orderBy(expr("hash(c_custkey)")).repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val loop = Profiler.profileLake(spark, tmp, Seq("customer"), rowCap = Some(40))
    val unified = Profiler.profileLakeUnified(spark, tmp, Seq("customer"), rowCap = Some(40))
    assertParity(unified, loop)
  }

  test("date-promoted staging parquet keeps its 'date' classification") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_promoted").toString
    val staged = graft.ingest.RobustCsv.promoteDates(
      Seq((1L, "2021-01-15", "x"), (2L, "2021-02-20", "y"),
        (3L, "2021-03-25", null), (4L, null, "z"), (5L, "2021-05-05", "w"))
        .toDF("id", "when_str", "note"))
    assert(Profiler.logicalType(staged.schema("when_str")) == "date") // fixture sane
    staged.write.mode("overwrite").parquet(s"$tmp/dated.parquet")
    val loop = Profiler.profileLake(spark, tmp, Seq("dated"))
    val unified = Profiler.profileLakeUnified(spark, tmp, Seq("dated"))
    // the promoted column must be CLASSIFIED date while its values stay
    // strings (P2 applied) — and the whole profile must stay bit-identical
    val ct = unified.filter(col("col_name") === "when_str")
      .select("col_type").collect().map(_.getString(0)).toSeq
    assert(ct == Seq("date"), s"promoted column classified $ct")
    assertParity(unified, loop)
  }

  test("lake directory itself named *.parquet resolves table names correctly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_lakedir").toString
    val lakeDir = s"$base/export.parquet"
    Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w"), (5L, "v"))
      .toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$lakeDir/a.parquet")
    Seq((10L, 1.5), (20L, 2.5), (30L, 3.5))
      .toDF("k", "x").coalesce(1)
      .write.mode("overwrite").parquet(s"$lakeDir/b.parquet")
    val prof = Profiler.profileLakeUnified(spark, lakeDir, Seq("a", "b"))
    val rows = prof.select("table_name", "rows").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 5L, "b" -> 3L),
      s"tables merged or misnamed: $rows")
  }

  test("empty table still yields one snapshot row (sentinel-fed aggregate)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_emptysnap").toString
    Seq.empty[(Long, String)].toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/hollow.parquet")
    val perTable = Profiler.contentSnapshot(
      spark.read.parquet(s"$tmp/hollow.parquet"), "hollow")
    val unified = LakeScan.snapshotLakeUnified(spark, tmp, Seq("hollow"), Some(10000))
    def c(df: org.apache.spark.sql.DataFrame) = df.toJSON.collect().toSeq
    assert(unified.count() == 1, "empty table dropped from unified snapshots")
    assert(c(unified) == c(perTable))
  }

  test("multi-part table named like a keyed table but WITHOUT key columns is not emptied") {
    // 'orders' is in Lake.TableKeys, but this user table lacks o_orderkey:
    // the decoder falls back to per-file capping; the global re-selection
    // must gate on key rows actually existing instead of dropping every
    // row against an empty keep set
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_keyless").toString
    (1 to 30).map(i => (s"n$i", i * 1.0)).toDF("name", "amount")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val prof = Profiler.profileLakeUnified(spark, tmp, Seq("orders"), rowCap = Some(100))
    val rows = prof.select("rows").distinct().collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(30L), s"key-less multi-part table lost rows: $rows")
  }

  test("mixed multi-part keyed table: key-less part files survive the global cap") {
    // 'orders' stored as TWO part files — one WITH o_orderkey, one without:
    // only the keyed file's rows enter the global re-selection; the
    // key-less file must keep its per-file file-order cap instead of being
    // silently dropped by a table-level has-keys gate
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mixedparts").toString
    (1 to 20).map(i => (i.toLong, s"v$i")).toDF("o_orderkey", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    (1 to 15).map(i => (s"n$i", i * 1.0)).toDF("name", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/aside")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/aside"))
      .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(s"$tmp/orders.parquet/part-keyless.parquet"))
    val prof = Profiler.profileLakeUnified(spark, tmp, Seq("orders"), rowCap = Some(10))
    val rows = prof.select("col_name", "rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("o_orderkey") == 10L && rows("v") == 10L,
      s"keyed part file mis-capped: $rows")
    assert(rows("name") == 10L && rows("amount") == 10L,
      s"key-less part file dropped or mis-capped: $rows")
  }

  test("Graft.profileLake routes unsupported-type tables through the per-table path") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mixedtypes").toString
    Seq((1L, BigDecimal("1.23")), (2L, BigDecimal("4.56"))).toDF("id", "dec")
      .write.mode("overwrite").parquet(s"$tmp/money.parquet")
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/plain.parquet")
    assert(LakeScan.unsupportedTables(spark, tmp, Seq("money", "plain")) == Seq("money"))
    val prof = graft.Graft.profileLake(spark, tmp, Seq("money", "plain"))
    val byTable = prof.groupBy("table_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable == Map("money" -> 2L, "plain" -> 2L),
      s"mixed lake lost tables: $byTable")
    // the fallback leg is the ordinary per-table profile, bit-identical
    val direct = Profiler.profile(Lake.read(spark, tmp, "money"), "money")
    assertParity(prof.filter(col("table_name") === "money"), direct)
  }

  test("columnar decode survives multi-row-group files and the 64k chunk boundary") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rgs").toString
    // 150k rows (crosses two 65,536-row decode chunks) written with a
    // tiny parquet block size so the file carries MANY row groups — the
    // per-group reader/cap state machine must hand over cleanly, with
    // nulls striding every 7th row to exercise def-levels in every group
    val n = 150000
    (1 to n).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"v$i",
        if (i % 11 == 0) Option.empty[Double] else Some(i * 0.5))
    }.toDF("id", "s", "x")
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$tmp/big.parquet")
    val nGroups = {
      val f = new java.io.File(s"$tmp/big.parquet").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration))
      try r.getRowGroups.size finally r.close()
    }
    assert(nGroups > 3, s"fixture must span several row groups, got $nGroups")
    // uncapped: every cell must round-trip (counts + null counts + sum)
    val cells = LakeScan.renderLong(
      LakeScan.rawCells(spark, tmp, Seq("big"), None))
    val got = cells.filter(col("present") && col("col_name") === "x")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value_str").isNull, 1L).otherwise(0L)).as("nulls"),
        sum(col("value_num")).as("s"))
      .collect()(0)
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == n / 11)
    val expectedSum = (1 to n).filter(_ % 11 != 0).map(_ * 0.5).sum
    assert(math.abs(got.getDouble(2) - expectedSum) < 1e-3)
    // keyed cap across groups == ORDER BY key LIMIT cap
    val capped = LakeScan.renderLong(
        LakeScan.rawCells(spark, tmp, Seq("big"), Some(1000)))
      .filter(col("present") && col("col_name") === "id")
    assert(capped.count() == 1000)
    // "big" has no TableKeys entry → unkeyed first-N file-order cap;
    // with one part file that is ids 1..1000 exactly
    val maxId = capped.agg(max(col("value_num"))).collect()(0).getDouble(0)
    assert(maxId == 1000.0, s"unkeyed cap must take the first rows, got max $maxId")
    // string nulls stride groups too
    val sNulls = cells.filter(col("present") && col("col_name") === "s" &&
      col("value_str").isNull).count()
    assert(sNulls == n / 7)
  }

  test("unsupported parquet types fail loudly, pointing at the per-table path") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_unsup").toString
    Seq((1L, BigDecimal("1.23"))).toDF("id", "dec")
      .write.mode("overwrite").parquet(s"$tmp/dec.parquet")
    val e = intercept[org.apache.spark.SparkException] {
      Profiler.profileLakeUnified(spark, tmp, Seq("dec")).collect()
    }
    // the DOCUMENTED error contract (README "Mixed lakes"): name the
    // column and table, and point at the per-table fallback path
    val msgs = (Iterator.single(e.getMessage) ++
      Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage)).mkString("\n")
    assert(msgs.contains("LakeScan: unsupported"))
    assert(msgs.contains("'dec'") && msgs.contains("column 'dec'") ||
      msgs.contains("of table 'dec'"))
    assert(msgs.contains("profile it through the per-table Lake.read path"))
  }
}
