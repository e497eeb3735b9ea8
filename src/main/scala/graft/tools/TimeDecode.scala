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

    // ---- encoding-coverage fixtures --------------------------------
    // Three single-table lakes in /tmp probing the decoder's page-level
    // regimes (the sf tables are mostly high-entropy plain-encoded):
    //  - dictheavy: low-cardinality string/int cols → every data page is
    //    dictionary-encoded; flat primitives, so the COLUMNAR path runs.
    //  - plainwide: same shape, unique strings → dictionary overflows to
    //    plain encoding; columnar path, the bytes/s contrast to dict.
    //  - listcol: an array<float> column → ColPlan.fromCap is null for
    //    lists, so the WHOLE FILE takes the example-Group fallback (the
    //    explicit non-columnar regime, LakeScan.fileRows).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fixDir = "/tmp/graft_decode_fixtures"
    def ensure(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val p = java.nio.file.Paths.get(s"$fixDir/$name.parquet")
      if (!java.nio.file.Files.exists(p))
        df.write.mode("overwrite").parquet(p.toString)
    }
    val nBig = 600000L
    ensure("dictheavy", spark.range(nBig).select(col("id"),
      concat(lit("category_value_"), pmod(col("id"), lit(20))).as("cat"),
      pmod(col("id") * 7, lit(100)).cast("int").as("code"),
      concat(lit("grp_"), pmod(col("id"), lit(5))).as("grp")))
    ensure("plainwide", spark.range(nBig).select(col("id"),
      md5(col("id").cast("string")).as("h1"),
      sha1(col("id").cast("string")).as("h2"),
      (col("id") * 2654435761L % 1000000007L).as("mixed")))
    ensure("listcol", spark.range(nBig / 6).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        i => (pmod(col("id") * 31 + i * 7, lit(97)) / 97).cast("float")).as("emb"),
      concat(lit("tag_"), pmod(col("id"), lit(50))).as("tag")))
    def dirBytes(name: String): Long = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(s"$fixDir/$name.parquet")
      java.nio.file.Files.walk(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
    }
    def timeTp(label: String, name: String, cells: Long): Unit = {
      val mb = dirBytes(name) / 1e6
      def f(): Unit = run(LakeScan.rawCells(spark, fixDir, Seq(name), None))
      f()
      val s = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-34s $s%8.3f s  ${mb / s}%7.1f MB/s  ${cells / s / 1e6}%7.1f Mcell/s  (${mb}%.1f MB)")
    }
    println("== encoding-coverage fixtures (uncapped decode) ==")
    timeTp("dictheavy (columnar, dict pages)", "dictheavy", nBig * 4)
    timeTp("plainwide (columnar, plain pages)", "plainwide", nBig * 4)
    timeTp("listcol (Group fallback: array)", "listcol", nBig / 6 * 3)
    spark.stop()
  }
}
