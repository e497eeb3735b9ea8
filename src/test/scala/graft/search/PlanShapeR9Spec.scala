package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape guards for the round-9 operators: the blocked cosine
  * kernel must keep one task per block pair (no cartesian product of
  * docs, no AQE-coalesced serial kernel), the exact-search distinct-skip
  * must actually remove the per-query distinct shuffle, and the
  * checkpointed graph loops must return lineage-truncated plans whose
  * exchange count does not grow with the iteration count.
  */
class PlanShapeR9Spec extends SparkSpec {
  import spark.implicits._

  private def docs = (1 to 60).map(i =>
    (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} shared common")).toDF("doc_id", "text")

  test("blocked cosine kernel runs one partition per block pair, no cartesian of docs") {
    val b = 5
    val out = TextSearch.cosineSelfJoin(docs, 0.5, numBlocks = b)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"docs must never cross-join as rows:\n$plan")
    // the explicit repartition pins the kernel's parallelism to the
    // B(B+1)/2 block pairs — AQE must not coalesce the byte-small rows
    assert(out.rdd.getNumPartitions == b * (b + 1) / 2,
      s"expected ${b * (b + 1) / 2} kernel partitions, got ${out.rdd.getNumPartitions}")
  }

  test("columnDistancesExact(valuesDistinct=true) skips the per-query distinct shuffle") {
    val values = Seq(("t1", 0, "a"), ("t1", 0, "b"), ("t2", 0, "a"), ("t2", 0, "c"))
      .toDF("table_name", "col_idx", "value_str")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    }
    val withDistinct = exchanges(Discovery.columnDistancesExact(values, "t1"))
    val preDistinct = exchanges(
      Discovery.columnDistancesExact(values, "t1", valuesDistinct = true))
    assert(preDistinct < withDistinct,
      s"distinct-skip must remove shuffles: $preDistinct !< $withDistinct")
  }

  test("pagerank lineage is truncated: exchange count does not grow with iterations") {
    val edges = (1 to 40).map(i => (i.toLong, ((i % 7) + 1).toLong)).toDF("src", "dst")
    def exchanges(n: Int): Int = {
      val r = graft.operators.Graph.pagerankInt(edges, nIter = n)
      r.collect()
      "Exchange".r.findAllIn(r.queryExecution.executedPlan.toString).length
    }
    val e2 = exchanges(2)
    val e5 = exchanges(5)
    assert(e5 <= e2,
      s"per-round localCheckpoint must keep the FINAL plan constant-size: " +
        s"nIter=5 has $e5 exchanges vs nIter=2's $e2")
  }
}
