package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch piecewise timing of d_line_dedup. */
object TimeLineDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.sources.Lake.read(spark, dir, "documents", None)
    val words = split(trim(col("text")), "\\s+")
    val lined = docs.select(col("doc_id"),
      array_join(transform(
        sequence(lit(0), (ceil(size(words) / lit(3.0)) - 1).cast("int")),
        i => array_join(slice(words, i * 3 + 1, lit(3)), " ")), "\n").as("text"))
    def time(label: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); val n = f; ((System.nanoTime()-t0)/1e9, n) }
      println(f"$label%-26s ${ts.map(_._1).min}%7.3f s (rows=${ts.head._2})")
    }
    val lines = lined.select(col("doc_id").as("id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("key", lower(trim(col("line"))))
    time("lined") { lined.count() }
    time("lines explode") { lines.count() }
    val keyStats = lines.groupBy("key")
      .agg(countDistinct(col("id")).as("n_docs"), min(col("id")).as("first_id"))
    time("keyStats") { keyStats.count() }
    val kept = lines.join(keyStats, "key")
      .filter(col("n_docs") <= 1 || col("id") === col("first_id"))
    time("kept join") { kept.count() }
    time("full lineDedup") {
      graft.operators.Dedup.lineDedup(lined, maxDocsPerLine = 1).count()
    }
    spark.stop()
  }
}
