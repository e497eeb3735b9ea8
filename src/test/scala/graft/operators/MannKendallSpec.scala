package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MannKendallSpec extends SparkSpec {
  import spark.implicits._

  // event volume per day: `count` events on each listed day
  private def series(key: String, countsByDay: Seq[Int]) =
    countsByDay.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i => (key, f"2024-01-${d + 1}%02d 0$i:00:00"))
    }

  test("monotone series hit tau = ±1; flat series tau = 0") {
    val rows = series("up", Seq(1, 2, 3, 4)) ++
      series("down", Seq(4, 3, 2, 1)) ++
      series("flat", Seq(2, 2, 2, 2))
    val df = rows.toDF("event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Events.mannKendall(df).collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"), r.getAs[Double]("tau")))
      .toMap
    // 4 days → 6 pairs
    assert(out("up") == ((4L, 6L, 1.0)))
    assert(out("down") == ((4L, -6L, -1.0)))
    assert(out("flat") == ((4L, 0L, 0.0)))
  }

  test("mixed series: S counts concordant minus discordant day pairs") {
    // counts 1,3,2 → pairs: (1,3)+1, (1,2)+1, (3,2)−1 → S = 1
    val df = series("m", Seq(1, 3, 2)).toDF("event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Events.mannKendall(df).collect()
    assert(out.head.getAs[Long]("s_stat") == 1L)
    assert(out.head.getAs[Double]("tau") == 0.333333)
  }
}
