package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch piecewise timing of e2e_lake_search components. */
object TimeE2e {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tables = graft.SparkEntry.LakeTables
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-30s ${ts.min}%8.3f s")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val store = "/tmp/graft_fixtures/e2e_store_probe"
    time("profileLakeUnified(cap)") {
      run(graft.profile.Profiler.profileLakeUnified(spark, dir, tables, rowCap = Some(10000)))
    }
    time("  same, no quantiles") {
      run(graft.profile.Profiler.profileLakeUnified(spark, dir, tables,
        rowCap = Some(10000), withQuantiles = false))
    }
    val catalog = graft.profile.Profiler.profileLakeUnified(spark, dir, tables, rowCap = Some(10000))
    time("store write") { graft.store.SketchStore.writeParquet(catalog, store) }
    time("store read + search") {
      run(graft.search.Discovery.searchUnionable(
        graft.store.SketchStore.readParquet(spark, store), "supplier", k = 10))
    }
    spark.stop()
  }
}
