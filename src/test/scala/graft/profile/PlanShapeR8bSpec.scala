package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape guards for the round-8 second-session operators: the
  * quality-check runner must fold every row-local rule into ONE
  * aggregation pass (no per-rule scans), semantic decontamination must
  * broadcast the eval set (no shuffled cross join), and the ungrouped
  * KMV/weighted-sample top-k paths must plan as TakeOrdered — never an
  * unpartitioned window.
  */
class PlanShapeR8bSpec extends SparkSpec {
  import spark.implicits._

  test("Checks.run row-local rules scan the table once") {
    import Checks._
    val df = (1 to 100).map(i => (i, s"s$i", i * 1.0)).toDF("id", "s", "v")
    val rep = Checks.run(df, Seq(NotNull("id"), InRange("v", 0, 50),
      InSet("s", Seq("s1")), MatchesRegex("s", "^s")))
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
    // one shared base aggregate feeding 4 report rows: the scan-ish
    // leaves must not multiply per rule (union of projections over ONE
    // aggregated row, ReusedExchange/Subquery reuse allowed)
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs <= 4, s"expected one shared aggregation (<=4 nodes incl. partial), got $aggs:\n$plan")
  }

  test("semanticOverlapReport broadcasts the benchmark side") {
    import graft.operators.Decontamination
    val corpus = (1L to 50L).map(i => (i, Array(i.toFloat, 1f))).toDF("vec_id", "embedding")
    val bench = (100L to 102L).map(i => (i, Array(i.toFloat, 1f))).toDF("vec_id", "embedding")
    val rep = Decontamination.semanticOverlapReport(corpus, bench, 0.9)
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join for the eval set:\n$plan")
  }

  test("ungrouped KMV sketch and weighted sample plan as TakeOrdered, no global window") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i", i.toLong)).toDF("id", "v", "w")
    val sk = Kmv.sketch(df, "v", Kmv.KmvSpec(k = 16))
    sk.collect()
    val skPlan = sk.queryExecution.executedPlan.toString
    assert(skPlan.contains("TakeOrderedAndProject"), s"KMV plan:\n$skPlan")
    assert(!skPlan.contains("WindowExec"), s"KMV plan has a window:\n$skPlan")
    val ws = graft.operators.Sampling.weightedSample(df, "id", "w", k = 8)
    ws.collect()
    val wsPlan = ws.queryExecution.executedPlan.toString
    assert(wsPlan.contains("TakeOrderedAndProject"), s"weightedSample plan:\n$wsPlan")
    assert(!wsPlan.contains("WindowExec"), s"weightedSample plan has a window:\n$wsPlan")
  }
}
