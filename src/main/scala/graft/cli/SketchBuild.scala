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
    // first stage through the robust reader into capped parquet — the
    // fallback-chain parse is inherently per-file engine logic, but it
    // runs ONCE at ingest; the (re-runnable, expensive) profiling is a
    // single job either way.
    val csvs = RobustCsv.listTables(spark, inDir)
    val (lakeDir, tableNames) =
      if (csvs.nonEmpty) {
        val staging = s"$outDir/staging"
        val names = csvs.flatMap { p =>
          val name = p.split('/').last.replaceAll("\\.csv(\\.bz2|\\.gz)?$", "")
          RobustCsv.read(spark, p).map { df =>
            df.limit(RobustCsv.RowCap).write.mode("overwrite")
              .parquet(s"$staging/$name.parquet")
            name
          }
        }
        (staging, names)
      } else // parquet lake directory
        (inDir, new java.io.File(inDir).listFiles((_, n) => n.endsWith(".parquet"))
          .toSeq.map(_.getName.stripSuffix(".parquet")).sorted)

    require(tableNames.nonEmpty, s"no readable tables under $inDir")
    val profiles = Profiler.profileLakeUnified(
      spark, lakeDir, tableNames, rowCap = Some(RobustCsv.RowCap))
    val snapshots = graft.sources.LakeScan.snapshotLakeUnified(
      spark, lakeDir, tableNames, Some(RobustCsv.RowCap))

    SketchStore.writeParquet(profiles, s"$outDir/profiles")
    snapshots.write.mode("overwrite").parquet(s"$outDir/snapshots")
    if (writeJson) SketchStore.writeJsonBz2(
      SketchStore.readParquet(spark, s"$outDir/profiles"),
      spark.read.parquet(s"$outDir/snapshots"), s"$outDir/docs_json")

    val n = spark.read.parquet(s"$outDir/profiles").count()
    println(s"[sketch-build] ${tableNames.length} tables, $n column profiles -> $outDir")
    spark.stop()
  }
}
