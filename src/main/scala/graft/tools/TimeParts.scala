package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing harness for profiling hot queries piecewise.
  * Usage: sbt "runMain graft.tools.TimeParts /root/testdata/sf0.1"
  */
object TimeParts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$label%-30s ${times.map(_._1).min}%8.3f s  (rows=${times.head._2})")
    }
    // collect-based sink: count() lets Catalyst eliminate provably-unique
    // joins and agg functions — it under-reports real query cost
    def run(df: => org.apache.spark.sql.DataFrame): Long = df.collect().length.toLong

    val numeric = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = graft.sources.Lake.read(spark, dir, "lineitem", None)
      .select(numeric.map(col): _*)

    val long = graft.profile.Profiler.longFormat(
      graft.sources.Lake.balance(li), renderNumerics = false)
    val hist = long.groupBy(col("col_idx"), col("value_str"), col("value_num"))
      .agg(count(lit(1)).as("freq"))

    time("long format only") { long.count() }
    time("stage-1 histogram") { hist.count() }
    time("deciles from hist") {
      run(graft.profile.Profiler.decilesFromHist(hist, graft.profile.Profiler.QuantileProbs))
    }
    time("full profile") {
      run(graft.profile.Profiler.profile(li, "lineitem", withSketches = false))
    }
    time("a4 query end-to-end") {
      run(graft.SparkEntry.queries("a4_quantiles")(spark, dir))
    }
    spark.stop()
  }
}
