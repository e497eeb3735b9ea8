package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Uses the noop sink so Catalyst cannot prune the
  * computed columns a bare count() would skip — each query is fully
  * materialized.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // pin the JSON decimal separator — f"%.3f" is default-locale dependent,
    // and a comma-decimal locale would emit unparseable "0,993"
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warm-up (JIT, page cache, shared catalog persist) then
    // min-of-3 timed runs per query: two consecutive bench invocations on
    // this noisy shared box must agree, or the round-over-round perf
    // signal is meaningless
    // optional comma-separated subset for local iteration (driver sets none)
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // stderr marker so Spark warnings in the log attribute to a query
      System.err.println(s"[bench] running $name")
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up, untimed
      // force a collection BETWEEN queries, outside the timed window: a
      // composite 70+-query run accumulates enough heap that a full GC
      // pause lands inside some query's all-three samples and misreports
      // it at a multiple of its isolated cost (round-5 postmortem:
      // ann_cosine_topk read 6x its isolated time)
      System.gc()
      name -> (1 to 3).map(_ => once()).min
    }
    val total = results.map(_._2).sum
    // the structural lake/CSV sections take minutes; a filtered run is
    // single-query iteration, where they are dead time — skip them
    val lp = if (only.isDefined) "{}" else lakePlanBench(spark)
    val cp = if (only.isDefined) "{}" else csvPlanBench(spark)
    def entry(kv: (String, Double)): String = "\"" + kv._1 + f"""\":${kv._2}%.3f"""
    val fullQs = results.map(entry).mkString("{", ",", "}")
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$fullQs,"lake_plan":$lp,"csv_plan":$cp,"sf":"$sfDir"}"""
    // Full per-query detail goes to a FILE: the harness that collects this
    // run keeps only the last ~2000 chars of stdout, and at 90+ queries the
    // full line no longer fits (round-6 postmortem: the recorded line was
    // truncated mid-JSON and unparseable). stdout gets a compact line —
    // the slowest queries first, cut to a hard length budget — so the
    // one-line contract always parses; the file carries everything.
    // a filtered (SPARK_GRAFT_QUERIES) iteration run must not clobber the
    // full-run detail file that earlier compact lines point to
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.props("user.dir"),
        if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    val slowestFirst = results.sortBy(-_._2).map(entry)
    // chars for the queries map: overhead + lake/csv sections + the
    // collector's trailing sbt status line still fit inside 2000.
    // Stop at the FIRST entry that doesn't fit so `kept` is a strict
    // slowest-first prefix and "omitted_fastest" labels what it claims.
    val budget = 1200
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 2 // braces
    var full_ = false
    for (e <- slowestFirst) {
      if (!full_ && used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
      else full_ = true
    }
    val qs = kept.mkString("{", ",", "}")
    val omitted = results.size - kept.size
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","nq":${results.size},"omitted_fastest":$omitted,"detail":"BENCH_FULL.json","queries":$qs,"lake_plan":$lp,"csv_plan":$cp,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Structural benchmark for the unified lake profiler: planning +
    * scheduling cost vs table count. The per-table loop pays an N-branch
    * union plan and ≥2 jobs per table; the unified path plans ONE
    * fixed-shape job. Tables are tiny (50 rows), so the measured time IS
    * driver overhead — the dimension that kills the loop at the
    * reference's 40k-table corpora. Reported separately from `queries`
    * (not part of the round-over-round total).
    *
    * The LOOP arms deliberately measure the anti-pattern (a 40-branch
    * union plan serialized per task → 10+ MiB task binaries); their
    * known "broadcasting large task binary" warnings are suppressed via
    * [[quietly]] so the bench log's warning stream speaks only about the
    * ENGINE's plans — which stay under Spark's 1 MiB warning threshold
    * even at 400 tables (tools/TaskBinProbe).
    */
  private def lakePlanBench(spark: SparkSession): String = {
    val dir = "/tmp/graft_bench_microlake"
    val nBig = 400
    val nSmall = 40
    val names = (0 until nBig).map(i => f"t$i%04d")
    ensureMicroLake(spark, dir, names)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.profile.Profiler
    // warm both paths on a 3-table slice (JIT, codegen cache)
    run(Profiler.profileLake(spark, dir, names.take(3)))
    run(Profiler.profileLakeUnified(spark, dir, names.take(3)))
    // this section runs AFTER the 70-query bench in the same JVM: force a
    // collection first and take min-of-2 on the cheap unified runs, or a
    // full-heap GC pause lands inside one timed run and reads as a 15×
    // "regression" (observed: 33 s for a 2 s measurement)
    def timed2(f: => Unit): Double = { System.gc(); math.min(time(f), time(f)) }
    val loop40 = { System.gc();
      quietly(spark)(time(run(Profiler.profileLake(spark, dir, names.take(nSmall))))) }
    val uni40 = timed2(run(Profiler.profileLakeUnified(spark, dir, names.take(nSmall))))
    val uni400 = timed2(run(Profiler.profileLakeUnified(spark, dir, names)))
    f"""{"tables_small":$nSmall,"tables_big":$nBig,"loop_${nSmall}":$loop40%.3f,"unified_${nSmall}":$uni40%.3f,"unified_${nBig}":$uni400%.3f}"""
  }

  /** Run `f` with Spark logging at ERROR, restoring WARN after — used
    * ONLY around the deliberate per-table-LOOP comparison arms, whose
    * 10+ MiB task binaries are the measured anti-pattern, not an engine
    * plan defect worth a warning line per stage. */
  private def quietly[A](spark: SparkSession)(f: => A): A = {
    spark.sparkContext.setLogLevel("ERROR")
    try f finally spark.sparkContext.setLogLevel("WARN")
  }

  /** Structural benchmark for the CSV ingest arm: per-file driver loop
    * (robust read + profile per file — the pre-round-6 SketchBuild shape)
    * vs the single-job executor-side decode, at 40 and 400 files. Same
    * rationale as [[lakePlanBench]]: tiny files, so the measurement IS
    * driver/scheduling cost — the dimension that makes a 40k-file CSV
    * lake a ~80k-sequential-job ingest under the loop.
    */
  private def csvPlanBench(spark: SparkSession): String = {
    import graft.sources.{CsvScan, LakeScan}
    import graft.profile.Profiler
    import graft.ingest.RobustCsv
    val dir = "/tmp/graft_bench_microcsvlake"
    val nBig = 400
    val nSmall = 40
    val files = ensureCsvMicroLake(dir, nBig)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def loop(fs: Seq[String]): Unit =
      run(fs.map { p =>
        val n = p.split('/').last.stripSuffix(".csv")
        Profiler.profile(RobustCsv.read(spark, p).get, n)
      }.reduce(_ unionByName _))
    def unified(fs: Seq[String]): Unit = {
      val scan = CsvScan.scanLake(spark, CsvScan.tableNames(fs))
      run(Profiler.profileFromLong(LakeScan.renderLong(scan.cells)))
      scan.release()
    }
    // warm both paths (JIT, codegen cache) on a 3-file slice
    loop(files.take(3)); unified(files.take(3))
    def timed2(f: => Unit): Double = { System.gc(); math.min(time(f), time(f)) }
    val loop40 = { System.gc(); quietly(spark)(time(loop(files.take(nSmall)))) }
    val uni40 = timed2(unified(files.take(nSmall)))
    val uni400 = timed2(unified(files))
    f"""{"files_small":$nSmall,"files_big":$nBig,"loop_${nSmall}":$loop40%.3f,"unified_${nSmall}":$uni40%.3f,"unified_${nBig}":$uni400%.3f}"""
  }

  /** 50-row 4-column CSVs, one template copied N times (content is
    * irrelevant — this measures per-file DRIVER cost). */
  private def ensureCsvMicroLake(dir: String, n: Int): Seq[String] = {
    import java.nio.file._
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val content = ("id,name,val,flag" +:
      (0 until 50).map(i => s"$i,name$i,${i * 1.5},${if (i % 2 == 0) "y" else "n"}"))
      .mkString("", "\n", "\n")
    val paths = (0 until n).map(i => d.resolve(f"c$i%04d.csv"))
    paths.foreach { p =>
      if (!Files.exists(p)) Files.write(p, content.getBytes("UTF-8"))
    }
    paths.map(_.toString)
  }

  /** 50-row 4-column tables: one Spark-written template file, copied N
    * times (content is irrelevant — this measures per-table DRIVER cost).
    */
  private def ensureMicroLake(spark: SparkSession, dir: String,
                              names: Seq[String]): Unit = {
    import java.nio.file._
    val d = Paths.get(dir)
    if (Files.isDirectory(d) &&
      names.forall(n => Files.exists(d.resolve(s"$n.parquet")))) return
    import spark.implicits._
    val tpl = s"$dir/_template"
    (0 until 50).map(i => (i.toLong, s"name$i", i * 1.5, if (i % 2 == 0) "y" else "n"))
      .toDF("id", "name", "val", "flag")
      .coalesce(1).write.mode("overwrite").parquet(tpl)
    val part = Files.list(Paths.get(tpl)).iterator()
    val src = {
      var p: Path = null
      while (part.hasNext) { val f = part.next(); if (f.toString.endsWith(".parquet")) p = f }
      p
    }
    names.foreach { n =>
      Files.copy(src, d.resolve(s"$n.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
