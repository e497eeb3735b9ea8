package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: runs entry() plus selected queries and prints
  * formatted physical plans, for verifying pushdown / broadcast / codegen.
  * Usage: sbt "runMain graft.tools.PlanCheck [queryName ...]"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    if (args.isEmpty) {
      println("== entry() smoke ==")
      val e = graft.SparkEntry.entry(spark)
      val rows = e.collect()
      println(s"entry rows: ${rows.length}")
      rows.foreach(println)
    } else args.foreach { q =>
      println(s"==== $q ====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
