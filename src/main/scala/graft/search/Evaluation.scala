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

  def macroAverage(perQuery: DataFrame): DataFrame =
    perQuery.agg(round(avg(col("precision_at_k")), 6).as("macro_precision"),
      round(avg(col("recall_at_k")), 6).as("macro_recall"),
      count(lit(1)).as("n_queries"))
}
