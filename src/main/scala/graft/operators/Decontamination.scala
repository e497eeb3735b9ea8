package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.word_shingles

/** Benchmark decontamination — flag training documents that share long
  * n-grams with an evaluation set (the standard leakage guard run before
  * any pretraining mix ships).
  *
  * Shape at scale: explode both sides to distinct (id, shingle), equi-join
  * on the shingle, count matches per doc — the join shuffles only
  * (id, shingle-hash)-sized rows and the benchmark side is tiny next to
  * the corpus, so Catalyst broadcasts it. Nothing here is quadratic in
  * the corpus.
  */
object Decontamination {

  /** Per-document overlap report against `benchmark`:
    * (id, n_shingles, n_overlap, overlap_frac, contaminated). A document
    * with fewer than `n` words has zero `n`-shingles and is clean by
    * construction.
    */
  def overlapReport(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    threshold: Double = 0.05,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def shingleSet(df: DataFrame, out: String) =
      df.select(col(idCol).as(out),
        explode(array_distinct(word_shingles(col(textCol), n))).as("sh"))
    val docSh = shingleSet(docs, "id")
    val benchSh = shingleSet(benchmark, "bench_id").select("sh").distinct()
    val counts = docSh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val overlaps = docSh.join(benchSh, "sh")
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
    counts.join(overlaps, Seq("id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("overlap_frac",
        round(col("n_overlap") / col("n_shingles"), 6))
      .withColumn("contaminated", col("overlap_frac") >= threshold)
  }

  /** Drop contaminated documents (anti-join on the tiny flagged set). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    threshold: Double = 0.05,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val flagged = overlapReport(docs, benchmark, n, threshold, idCol, textCol)
      .filter(col("contaminated")).select(col("id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
