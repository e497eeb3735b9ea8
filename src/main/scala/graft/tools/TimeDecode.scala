package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: where does the unified profile spend — raw decode
  * (binaryFile → cell rows), render, or the aggregate? */
object TimeDecode {
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
      println(f"$label%-34s ${ts.min}%8.3f s")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.sources.LakeScan
    time("rawCells(cap=10k) noop") {
      run(LakeScan.rawCells(spark, dir, tables, Some(10000)))
    }
    time("  lineitem only") {
      run(LakeScan.rawCells(spark, dir, Seq("lineitem"), Some(10000)))
    }
    time("  lineitem uncapped") {
      run(LakeScan.rawCells(spark, dir, Seq("lineitem"), None))
    }
    time("renderLong over rawCells") {
      run(LakeScan.renderLong(LakeScan.rawCells(spark, dir, tables, Some(10000))))
    }
    spark.stop()
  }
}
