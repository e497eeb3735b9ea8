package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("funnel: strict ordering per user, stage clocks chain") {
    val events = ev(
      (1L, "2024-01-01 00:01:00", "view"),
      (1L, "2024-01-01 00:02:00", "click"),
      (1L, "2024-01-01 00:03:00", "purchase"),
      (2L, "2024-01-01 00:04:00", "click"),    // click BEFORE view: no stage 2
      (2L, "2024-01-01 00:05:00", "view"),
      (3L, "2024-01-01 00:06:00", "view"),
      (4L, "2024-01-01 00:07:00", "click"),    // no view at all: never enters
      (4L, "2024-01-01 00:08:00", "purchase"))
    val out = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getAs[Long]("n_users") == 3L)
    assert(out(2).getAs[Long]("n_users") == 1L)
    assert(out(3).getAs[Long]("n_users") == 1L)
    assert(out(1).getAs[Double]("conv_total") == 1.0 &&
      out(1).getAs[Double]("conv_prev") == 1.0)
    assert(out(2).getAs[Double]("conv_total") == 0.333333)
    assert(out(3).getAs[Double]("conv_prev") == 1.0)
  }

  test("funnel: same-timestamp later stage does NOT count (strict >)") {
    val events = ev(
      (1L, "2024-01-01 00:01:00", "view"),
      (1L, "2024-01-01 00:01:00", "click"))
    val out = Events.funnel(events, Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n_users")).toMap
    assert(out(1) == 1L && out(2) == 0L)
  }

  test("cohortRetention: offsets and rates per ISO-week cohort") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"), // W1 cohort
      (1L, "2024-01-16 10:00:00", "view"), // W3 → offset 2
      (2L, "2024-01-03 10:00:00", "view"), // W1 cohort, W1 only
      (3L, "2024-01-09 10:00:00", "view"), // W2 cohort
      (3L, "2024-01-15 10:00:00", "view")) // W3 → offset 1
    val out = Events.cohortRetention(events).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r).toMap
    assert(out(("2024-01-01", 0)).getAs[Long]("n_active") == 2L)
    assert(out(("2024-01-01", 0)).getAs[Double]("retention") == 1.0)
    assert(out(("2024-01-01", 2)).getAs[Long]("n_active") == 1L)
    assert(out(("2024-01-01", 2)).getAs[Double]("retention") == 0.5)
    assert(out(("2024-01-08", 1)).getAs[Double]("retention") == 1.0)
    assert(out.size == 4)
  }

  test("resampleLocf: hourly grid, nulls before first obs, carry between") {
    val obs = Seq(
      (1L, "2024-01-01 00:10:00", 1.0),
      (1L, "2024-01-01 02:30:00", 5.0))
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Events.resampleLocf(obs, "user_id", "ts", "value")
      .orderBy("ts").collect()
    assert(out.length == 3) // 00:00, 01:00, 02:00
    assert(out(0).isNullAt(2))                       // before any obs
    assert(out(1).getAs[Double]("asof_value") == 1.0) // carried
    assert(out(2).getAs[Double]("asof_value") == 1.0) // 02:30 obs is later
  }

  test("linearAttribution: credit splits 1/n over in-horizon clicks only") {
    val events = Seq(
      // user 1: two clicks inside the hour before the purchase → 0.5 each
      (1L, "2024-01-01 08:10:00", "click", 10L),
      (1L, "2024-01-01 08:50:00", "click", 11L),
      (1L, "2024-01-01 09:05:00", "purchase", 12L),
      // user 1: click >1h before the purchase → no credit
      (1L, "2024-01-01 07:00:00", "click", 13L),
      // user 2: click AFTER the purchase → no credit
      (2L, "2024-01-01 10:30:00", "purchase", 20L),
      (2L, "2024-01-01 10:40:00", "click", 21L),
      // user 3: single click, full credit at hour 11
      (3L, "2024-01-01 11:00:00", "click", 30L),
      (3L, "2024-01-01 11:30:00", "purchase", 31L))
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Events.linearAttribution(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((8L, 2L, 1.0), (11L, 1L, 1.0)),
      "hours 8 (two half-credits) and 11 (one full) only; out-of-horizon " +
        "and post-purchase clicks earn nothing")
  }
}
