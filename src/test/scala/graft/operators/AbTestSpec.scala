package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "event_type")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))

  test("conversion is user-level (repeat purchases count once)") {
    // variant 0: users 0,2 (user 0 converts twice → once); variant 1: 1,3 (both convert)
    val out = Events.abTest(ev(
      (0L, 1L, "purchase"), (0L, 2L, "purchase"), (2L, 3L, "view"),
      (1L, 4L, "purchase"), (3L, 5L, "purchase"))).collect().head
    assert(out.getAs[Long]("n_a") == 2L && out.getAs[Long]("conv_a") == 1L)
    assert(out.getAs[Long]("n_b") == 2L && out.getAs[Long]("conv_b") == 2L)
    assert(out.getAs[Double]("rate_a") == 0.5 && out.getAs[Double]("rate_b") == 1.0)
    assert(out.getAs[Double]("lift") == 0.5)
    // pooled p = 3/4 → z = 0.5 / sqrt(.75·.25·(1/2+1/2)) = 1.154701
    assert(out.getAs[Double]("z") == 1.154701)
  }

  test("zero-variance pools report z = 0, not NaN") {
    val none = Events.abTest(ev((0L, 1L, "view"), (1L, 2L, "view")))
      .collect().head
    assert(none.getAs[Double]("z") == 0.0)
    val all = Events.abTest(ev((0L, 1L, "purchase"), (1L, 2L, "purchase")))
      .collect().head
    assert(all.getAs[Double]("z") == 0.0)
  }

  test("transition matrix: per-user next-event pairs, rows sum to 1") {
    val events = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (1L, 2L, "2024-01-01 00:01:00", "click"),
      (1L, 3L, "2024-01-01 00:02:00", "view"),
      (2L, 4L, "2024-01-01 00:00:00", "view"),
      (2L, 5L, "2024-01-01 00:01:00", "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Events.transitionMatrix(events).collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(m(("view", "click")) == ((2L, 1.0)))
    assert(m(("click", "view")) == ((1L, 1.0)))
    assert(out.length == 2) // no cross-user pair (user 2's click has no next)
  }
}
