package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: how does the unified lake profiler's task-binary size
  * scale with table count? Finding (round 8): at 400 tables the unified
  * path emits NO large-task-binary warning (binaries stay < 1 MiB —
  * Spark only logs them past that threshold); the 10+ MiB binaries in the
  * full bench log come from the RETAINED per-table-loop comparison arm
  * (`lakePlanBench`/`csvPlanBench` `loop_40`), whose 40-branch union plan
  * is exactly the driver-side cost the unified path exists to remove.
  * Usage: sbt "runMain graft.tools.TaskBinProbe 50 100 200 400"
  */
object TaskBinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO") // DAGScheduler logs every binary size
    val dir = "/tmp/graft_bench_microlake"
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50, 100, 200, 400)
    val names = (0 until counts.max).map(i => f"t$i%04d")
    // reuse the bench's micro lake
    require(new java.io.File(s"$dir/t0000.parquet").exists(),
      s"micro lake missing — run graft.Bench once first ($dir)")
    counts.foreach { n =>
      println(s"=== tables: $n ===")
      graft.profile.Profiler.profileLakeUnified(spark, dir, names.take(n))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
