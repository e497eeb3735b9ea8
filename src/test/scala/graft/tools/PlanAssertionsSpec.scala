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
}
