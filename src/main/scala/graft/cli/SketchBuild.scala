package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.{Augment, RobustCsv}
import graft.profile.Profiler
import graft.store.SketchStore

/** E1 entry point — the reference's sketch-build batch
  * (`/root/reference/tabsketchfm/batch_fastdata_opendata.py` +
  * `data_prep.py:prep_data`) as one Spark job:
  *
  *   enumerate CSVs → robust read (fallback chain, 10k cap, date
  *   promotion) → profile (stats + sketches) → content snapshot →
  *   parquet catalog (+ optional json.bz2 parity docs).
  *
  * Usage: sbt "runMain graft.cli.SketchBuild <inputDir> <outputDir> [--json]"
  * Accepts a directory of CSVs or of parquet tables.
  */
object SketchBuild {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SketchBuild <inputDir> <outputDir> [--json]")
    val (inDir, outDir) = (args(0), args(1))
    val writeJson = args.contains("--json")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-sketch-build")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Profiling always runs the UNIFIED single-job path (one scan + one
    // keyed aggregate subtree — planning cost constant in table count,
    // the E1 shape at the reference's 40k-table corpus scale). CSV lakes
    // decode ON THE EXECUTORS inside that same scan (CsvScan's strict
    // in-task parse); only files the strict parser rejects — exotic
    // charsets, malformed rows, gray-zone types, the expected minority —
    // pay a driver-side RobustCsv fallback read. Table names come from
    // CsvScan.tableNames, which suffixes basename collisions instead of
    // letting same-named files in different subdirs overwrite each other.
    val csvs = RobustCsv.listTables(spark, inDir)
    val (profiles, snapshots) =
      if (csvs.nonEmpty) {
        val names = graft.sources.CsvScan.tableNames(csvs)
        val scan = graft.sources.CsvScan.scanLake(spark, names, RobustCsv.RowCap)
        val fallback = scan.rejected.flatMap { p =>
          RobustCsv.read(spark, p).map(df => names(p) -> df.persist())
        }
        // loud failure when NOTHING decoded: every file sub-5-row or
        // unreadable — an empty catalog written with exit 0 would look
        // like success on a misconfigured input dir
        require(fallback.nonEmpty || scan.cells.limit(1).count() > 0,
          s"no readable tables under $inDir (all files skipped or unreadable)")
        val pro = (Profiler.profileFromLong(
            graft.sources.LakeScan.renderLong(scan.cells)) +:
          fallback.map { case (n, df) => Profiler.profile(df, n) })
          .reduce(_ unionByName _)
        val snap = (graft.sources.LakeScan.snapshotFromRaw(scan.cells) +:
          fallback.map { case (n, df) => Profiler.contentSnapshot(df, n) })
          .reduce(_ unionByName _)
        (pro, snap)
      } else { // parquet lake directory
        val tableNames = new java.io.File(inDir)
          .listFiles((_, n) => n.endsWith(".parquet"))
          .toSeq.map(_.getName.stripSuffix(".parquet")).sorted
        require(tableNames.nonEmpty, s"no readable tables under $inDir")
        (Profiler.profileLakeUnified(
            spark, inDir, tableNames, rowCap = Some(RobustCsv.RowCap)),
          graft.sources.LakeScan.snapshotLakeUnified(
            spark, inDir, tableNames, Some(RobustCsv.RowCap)))
      }

    SketchStore.writeParquet(profiles, s"$outDir/profiles")
    snapshots.write.mode("overwrite").parquet(s"$outDir/snapshots")
    if (writeJson) SketchStore.writeJsonBz2(
      SketchStore.readParquet(spark, s"$outDir/profiles"),
      spark.read.parquet(s"$outDir/snapshots"), s"$outDir/docs_json")

    val written = spark.read.parquet(s"$outDir/profiles")
    val nTables = written.select("table_name").distinct().count()
    println(s"[sketch-build] $nTables tables, ${written.count()} column profiles -> $outDir")
    spark.stop()
  }
}
