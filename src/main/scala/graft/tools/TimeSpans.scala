package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.word_shingles

/** A/B probe for the duplicateSpans physical shape (verdict round-14
  * task: d_dup_spans holds ≥4 s isolated at sf0.1 — find where it goes).
  *
  * A = the shipped shape: gram explode feeds BOTH a groupBy(gh) stats
  *     aggregate and the stats join — the explode runs twice (the agg
  *     exchange is map-side-combined; the join exchange ships full
  *     grams).
  * B = one-exchange window variant: count + min(struct) as window
  *     functions over partitionBy(gh) — single full-gram exchange plus
  *     an in-partition sort, explode runs once.
  * C = shape A with the gram relation localCheckpointed (explode once,
  *     both consumers read the materialized relation).
  *
  * Usage: graft.tools.TimeSpans [sfDir] — min-of-3 per arm, plus a
  * row-count probe of the gram relation so volume is on record.
  */
object TimeSpans {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val minTokens = 8

    def grams(d: DataFrame) = d.filter(trim(col("text")) =!= "")
      .filter(size(split(trim(col("text")), "\\s+")) >= minTokens)
      .select(col("doc_id").cast("long").as("id"),
        posexplode(word_shingles(col("text"), minTokens)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), xxhash64(col("gram")).as("gh"))

    def islands(dupPos: DataFrame): DataFrame = {
      val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
      dupPos
        .withColumn("prev", lag(col("pos"), 1).over(wDoc))
        .withColumn("brk", when(col("prev").isNull || col("pos") > col("prev") + 1, 1L)
          .otherwise(0L))
        .withColumn("isl", sum(col("brk")).over(wDoc))
        .groupBy(col("id"), col("isl"))
        .agg(min(col("pos")).cast("long").as("start_tok"),
          (max(col("pos")) + minTokens - 1).cast("long").as("end_tok"))
        .withColumn("span_tokens", col("end_tok") - col("start_tok") + 1)
        .select("id", "start_tok", "end_tok", "span_tokens")
    }

    def shapeA(): DataFrame = graft.operators.Dedup.duplicateSpans(docs)

    def shapeB(): DataFrame = {
      val g = grams(docs)
      val wGh = Window.partitionBy(col("gh"))
      val dupPos = g
        .withColumn("occ", count(lit(1)).over(wGh))
        .withColumn("first", min(struct(col("id"), col("pos"))).over(wGh))
        .filter(col("occ") > 1 &&
          !(col("id") === col("first.id") && col("pos") === col("first.pos")))
        .select("id", "pos")
      islands(dupPos)
    }

    def shapeC(): DataFrame = {
      val g = grams(docs).localCheckpoint(eager = true)
      val stats = g.groupBy("gh").agg(count(lit(1)).as("occ"),
        min(struct(col("id"), col("pos"))).as("first"))
      val dupPos = g.join(stats, "gh")
        .filter(col("occ") > 1 &&
          !(col("id") === col("first.id") && col("pos") === col("first.pos")))
        .select("id", "pos")
      islands(dupPos)
    }

    def time(f: => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val nGrams = grams(docs).count()
    // warm all three plan families
    time(shapeA()); time(shapeB()); time(shapeC())
    val a = (1 to 3).map(_ => time(shapeA())).min
    val b = (1 to 3).map(_ => time(shapeB())).min
    val c = (1 to 3).map(_ => time(shapeC())).min
    // equality audit: all shapes must produce identical span sets
    val sa = shapeA().collect().map(_.toSeq).toSet
    val sb = shapeB().collect().map(_.toSeq).toSet
    val sc = shapeC().collect().map(_.toSeq).toSet
    println(f"""{"n_grams":$nGrams,"agg_join":$a%.3f,"window":$b%.3f,"checkpointed":$c%.3f,"b_equal":${sa == sb},"c_equal":${sa == sc}}""")
    spark.stop()
  }
}
