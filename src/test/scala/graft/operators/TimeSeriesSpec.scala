package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def series(key: String, countsByDay: Seq[Int]) =
    countsByDay.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i =>
        (key, f"2024-01-${d + 1}%02d 10:${i / 60}%02d:${i % 60}%02d"))
    }

  private def toDf(rows: Seq[(String, String)]) =
    rows.toDF("event_type", "ts").withColumn("ts", col("ts").cast("timestamp"))

  test("acf: alternating series anti-correlates at lag 1, correlates at lag 2") {
    // x = 2,4,2,4: deviations ±c alternate → acf1 = −(n−1)/n = −0.75,
    // acf2 = (n−2)/n = 0.5 (integer-exact numerators over the n-term den)
    val out = Events.autocorrelation(toDf(series("alt", Seq(2, 4, 2, 4))), 2)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    assert(out(1L) == -0.75)
    assert(out(2L) == 0.5)
  }

  test("acf: linear ramp keeps strong positive lag-1 correlation") {
    // x = 1..5: dv = (-10,-5,0,5,10) → acf1 = 100/250
    val out = Events.autocorrelation(toDf(series("ramp", Seq(1, 2, 3, 4, 5))), 1)
      .collect()
    assert(out.head.getAs[Double]("acf") == 0.4)
    assert(out.head.getAs[Long]("n_days") == 5L)
  }

  test("acf: constant series reports 0 (no variance), not NaN") {
    val out = Events.autocorrelation(toDf(series("c", Seq(3, 3, 3))), 1).collect()
    assert(out.head.getAs[Double]("acf") == 0.0)
  }

  test("theil-sen: median slope shrugs off a single outlier day") {
    // 1,2,3,100,5 — 8 of 10 pairwise slopes are exactly 1
    val out = Events.theilSen(toDf(series("o", Seq(1, 2, 3, 100, 5)))).collect()
    assert(out.head.getAs[Double]("slope") == 1.0)
    assert(out.head.getAs[Long]("n_pairs") == 10L)
    assert(out.head.getAs[Long]("n_days") == 5L)
  }

  test("theil-sen: clean downward trend reports the exact negative slope") {
    val out = Events.theilSen(toDf(series("d", Seq(9, 7, 5, 3)))).collect()
    assert(out.head.getAs[Double]("slope") == -2.0)
  }

  test("changepoint lands on a clean level shift with exact means") {
    // 1,1,1,9,9,9 → split after day 3: gain (18−90)²/(6·3·3) = 96
    val out = Events.changepoint(toDf(series("s", Seq(1, 1, 1, 9, 9, 9))))
      .collect().head
    assert(out.getAs[java.sql.Date]("cp_day").toString == "2024-01-03")
    assert(out.getAs[Double]("gain") == 96.0)
    assert(out.getAs[Double]("mean_left") == 1.0)
    assert(out.getAs[Double]("mean_right") == 9.0)
    assert(out.getAs[Long]("n_days") == 6L)
  }

  test("changepoint ties break on the earlier day") {
    // symmetric 2,8,2: splits p=1 and p=2 tie on gain → day 1 wins
    val out = Events.changepoint(toDf(series("t", Seq(2, 8, 2))))
      .collect().head
    assert(out.getAs[java.sql.Date]("cp_day").toString == "2024-01-01")
  }
}
