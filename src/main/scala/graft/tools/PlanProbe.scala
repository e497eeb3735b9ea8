package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: inspect the profileFromLong executed plan. Round 8 asked
  * "does AQE reuse the stage-1 exchange across the stats and decile
  * branches?"; since round 16 the answer is moot — stage-1 is a single
  * materialized leaf (Profiler.cpBarrier) that every branch reads, so
  * the interesting output is now the leaf scans and remaining
  * exchanges. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 37, i.toDouble % 101, s"s$i")).toDF("a", "b", "c")
    val prof = graft.profile.Profiler.profile(df, "t", withSketches = false)
    prof.collect()
    val plan = prof.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).length
    println(s"== ShuffleQueryStage: ${n("ShuffleQueryStage")}  ReusedExchange/Stage: ${n("Reused")}  Exchange: ${n("Exchange")}")
    println(plan.linesIterator.filter(l => l.contains("QueryStage") || l.contains("Reused")).take(30).mkString("\n"))
    spark.stop()
  }
}
