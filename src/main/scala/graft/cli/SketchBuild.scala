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

    val csvs = RobustCsv.listTables(spark, inDir)
    val tables: Seq[(String, org.apache.spark.sql.DataFrame)] =
      if (csvs.nonEmpty)
        csvs.flatMap { p =>
          val name = p.split('/').last.replaceAll("\\.csv(\\.bz2|\\.gz)?$", "")
          RobustCsv.read(spark, p).map(name -> _)
        }
      else // parquet lake directory
        new java.io.File(inDir).listFiles((_, n) => n.endsWith(".parquet"))
          .toSeq.map(_.getName.stripSuffix(".parquet")).sorted
          .map(n => n -> graft.sources.Lake.read(spark, inDir, n))

    require(tables.nonEmpty, s"no readable tables under $inDir")
    val capped = tables.map { case (n, df) => n -> df.limit(RobustCsv.RowCap) }

    val profiles = capped.map { case (n, df) => Profiler.profile(df, n) }
      .reduce(_ unionByName _)
    val snapshots = capped.map { case (n, df) => Profiler.contentSnapshot(df, n) }
      .reduce(_ unionByName _)

    SketchStore.writeParquet(profiles, s"$outDir/profiles")
    snapshots.write.mode("overwrite").parquet(s"$outDir/snapshots")
    if (writeJson) SketchStore.writeJsonBz2(
      SketchStore.readParquet(spark, s"$outDir/profiles"),
      spark.read.parquet(s"$outDir/snapshots"), s"$outDir/docs_json")

    val n = spark.read.parquet(s"$outDir/profiles").count()
    println(s"[sketch-build] ${tables.length} tables, $n column profiles -> $outDir")
    spark.stop()
  }
}
