package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: does AQE reuse the stage-1 histogram exchange across the
  * stats and decile branches of profileFromLong at runtime? */
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
