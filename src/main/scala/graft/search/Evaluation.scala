package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J3: search-results vs ground-truth evaluation join
  * (`/root/reference/tabsketchfm/embedding_search.py:115-186`): explode the
  * expected candidate lists, equi-join with ranked results, report
  * precision@k / recall@k per query and macro-averaged.
  */
object Evaluation {

  /** `results`: (query, candidate, rank); `groundTruth`: (query,
    * expected: array<string>). */
  def precisionAtK(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame = {
    val expected = groundTruth.select(col("query"),
      explode(col("expected")).as("candidate"))
    val hits = results.filter(col("rank") <= k)
      .join(expected, Seq("query", "candidate"), "left_semi")
      .groupBy(col("query")).agg(count(lit(1)).as("n_hits"))
    val expectedCounts = expected.groupBy(col("query"))
      .agg(count(lit(1)).as("n_expected"))
    expectedCounts.join(hits, Seq("query"), "left")
      .na.fill(0, Seq("n_hits"))
      .select(col("query"),
        round(col("n_hits") / lit(k), 6).as("precision_at_k"),
        round(col("n_hits") / col("n_expected"), 6).as("recall_at_k"))
  }

  /** nDCG@k with binary relevance: DCG = Σ hit_i / log2(i+1) over result
    * ranks i ≤ k, IDCG = the same sum over the first min(k, n_expected)
    * ideal positions. Per-position gains are quantized to integer
    * micro-gains `floor(1e6 / round(log2(i+1), 6))` and summed in
    * integer space (the engine's order-independent-sum discipline); the
    * final nDCG is one double division, 6-dp rounded. Queries whose
    * results hit nothing score 0.
    */
  def ndcgAtK(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def gainMicro(pos: org.apache.spark.sql.Column) =
      floor(lit(1000000.0) / round(log2(pos.cast("double") + lit(1.0)), 6)).cast("long")
    val expected = groundTruth.select(col("query"),
      explode(col("expected")).as("candidate"))
    val dcg = results.filter(col("rank") <= k)
      .join(expected, Seq("query", "candidate"), "left_semi")
      .select(col("query"), gainMicro(col("rank")).as("gm"))
      .groupBy("query").agg(sum(col("gm")).as("dcg_micro"))
    val idealW = Window.partitionBy(col("query")).orderBy(col("candidate"))
    val idcg = expected
      .withColumn("pos", row_number().over(idealW))
      .filter(col("pos") <= k)
      .select(col("query"), gainMicro(col("pos")).as("gm"))
      .groupBy("query").agg(sum(col("gm")).as("idcg_micro"))
    idcg.join(dcg, Seq("query"), "left")
      .na.fill(0L, Seq("dcg_micro"))
      .select(col("query"),
        round(col("dcg_micro").cast("double") / col("idcg_micro").cast("double"), 6)
          .as("ndcg_at_k"))
  }

  def macroAverage(perQuery: DataFrame): DataFrame =
    perQuery.agg(round(avg(col("precision_at_k")), 6).as("macro_precision"),
      round(avg(col("recall_at_k")), 6).as("macro_recall"),
      count(lit(1)).as("n_queries"))
}
