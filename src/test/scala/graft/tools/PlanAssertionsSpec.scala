package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-plan property pins — the scale contract as executable tests.
  * These fail if a refactor silently loses pushdown, pruning, a
  * broadcast, or whole-stage codegen on representative shapes.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filter and projection reach the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"),
      s"filter not pushed: $scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:") &&
      !scan.contains("l_comment") && !scan.contains("l_shipdate"),
      s"projection not pruned: $scan")
  }

  test("dimension joins broadcast the small side") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val joined = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("aggregation pipeline stays inside whole-stage codegen") {
    val agg = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val codegen = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen span:\n$codegen")
    // both partial and final HashAggregate present (map-side combine)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2)
  }

  test("profile histogram aggregation is partial before the shuffle") {
    val prof = graft.profile.Profiler.profile(
      spark.read.parquet(s"$dir/region.parquet"), "region", withSketches = false)
    val plan = prof.queryExecution.executedPlan.toString
    // stage-1 histogram: partial_count before Exchange, merge after
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no map-side combine in profile plan:\n$plan")
  }

  test("winnowing fingerprints: one doc-key shuffle, no UDF, codegen'd hash") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fp = graft.operators.TextAnalysis.winnowFingerprints(docs)
    val plan = fp.queryExecution.executedPlan.toString
    // the window shuffle by doc key is the ONLY exchange: the downstream
    // distinct on (id, fp) must reuse HashPartitioning(id), not re-shuffle
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one exchange (doc-key window):\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"winnowing must be UDF-free:\n$plan")
    val codegen = fp.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen span:\n$codegen")
  }

  test("skew diagnostic is one job: total broadcast back, exchange reused") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val prof = graft.operators.Skew.keySkewProfile(li, "l_returnflag", topN = 5)
    prof.collect() // AQE's ReuseExchange applies in the FINAL adaptive plan
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected the 1-row total to broadcast:\n$plan")
    // the total must come from the grouped relation's exchange (reuse),
    // not a second scan-and-aggregate of the input or an eager count() job
    assert(plan.contains("ReusedExchange") ||
      plan.linesIterator.count(_.contains("FileScan")) <= 1,
      s"expected exchange reuse over a re-scan:\n$plan")
  }
}
