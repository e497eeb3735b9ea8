package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      val plan = SparkEntry.queries(q)(s, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val cart = "CartesianProduct".r.findAllIn(plan).size
      val bnl = "BroadcastNestedLoop".r.findAllIn(plan).size
      val wsc = "WholeStageCodegen".r.findAllIn(plan).size
      println(s"[audit] $q bhj=$bhj smj=$smj cartesian=$cart bnl=$bnl codegen_spans=$wsc")
    }
    s.stop()
  }
}
