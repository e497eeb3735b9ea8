package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape guards for the round-8 scale fixes: the exact-distance
  * search must not window the full distinct-values relation, and the
  * BM25 top-k must be a distributed partial top-k (TakeOrdered), not a
  * global-window rank. String-matching the executed plan is crude but
  * catches exactly the regression class that crept in across rounds 5-7.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  test("columnDistancesExact plans without any window") {
    val values = Seq(
      ("q", 0, "a"), ("q", 0, "b"), ("q", 1, "x"),
      ("t1", 0, "a"), ("t1", 0, "c"), ("t2", 1, "x"), ("t2", 1, "y"))
      .toDF("table_name", "col_idx", "value_str")
    val d = Discovery.columnDistancesExact(values, "q")
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
  }

  test("bm25 top-k ranks window-free via the zipWithIndex path") {
    val docs = Seq(
      (1L, "spark scales out on clusters"),
      (2L, "duckdb runs on one node"),
      (3L, "spark and duckdb agree on results"))
      .toDF("doc_id", "text")
    val r = TextSearch.bm25TopK(docs, Seq("spark", "clusters"), k = 2)
    r.collect()
    // Ranking.withPosition rebuilds the frame from the sorted RDD, so the
    // outer plan is an ExistingRDD scan (the TakeOrdered lives inside the
    // RDD lineage) — crucially, NO WindowExec anywhere
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"unexpected window exec in plan:\n$plan")
    assert(plan.contains("ExistingRDD"), s"expected the zipWithIndex scan:\n$plan")
    // and the underlying top-k precursor does plan as TakeOrdered
    val precursor = docs.orderBy(col("doc_id")).limit(2)
    precursor.collect()
    assert(precursor.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }
}
