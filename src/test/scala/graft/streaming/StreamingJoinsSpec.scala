package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-mode semantics of the stream-static / stream-stream join
  * pipelines (watermarks are no-ops on batch relations, so the same
  * code path runs; streamed==batch equality is pinned by the
  * `st_stream_enrich` / `st_stream_attrib` oracle rows).
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("attribution join matches only in-horizon, same-user, click-first pairs") {
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (1L, 2L, "2024-01-01 10:30:00", "purchase"), // in horizon → match
      (1L, 3L, "2024-01-01 12:30:00", "purchase"), // 2.5h after click → no
      (2L, 4L, "2024-01-01 10:00:00", "click"),    // other user's purchase → no
      (3L, 5L, "2024-01-01 10:00:00", "purchase"),
      (3L, 6L, "2024-01-01 10:10:00", "click"))    // click AFTER purchase → no
    val out = StreamingProfile.attributionJoin(events, "click", "purchase")
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("t_id") == 1L &&
      out.head.getAs[Long]("c_id") == 2L)
  }

  test("attribution boundary: exactly at the horizon edge still matches") {
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (1L, 2L, "2024-01-01 11:00:00", "purchase")) // t_ts == c_ts − 1h
    assert(StreamingProfile.attributionJoin(events, "click", "purchase")
      .count() == 1L)
  }

  test("enriched counts: broadcast dim join + decimal rollup") {
    val facts = Seq((1L, 10.5), (1L, 2.25), (2L, 1.0))
      .toDF("user_id", "value")
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("c_custkey", "c_mktsegment")
    val out = StreamingProfile.enrichedCounts(
        facts, dim, "user_id", "c_custkey", "c_mktsegment", "value")
      .orderBy("c_mktsegment").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n"),
      r.getDecimal(2).doubleValue)).toSeq ==
      Seq(("A", 2L, 12.75), ("B", 1L, 1.0))) // segment C has no facts
  }

  test("time-to-convert: exact positional order statistics") {
    // latencies (min): user1 → 10, user2 → 20, user3 → 40; no convert for 4
    val events = ev(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (1L, 2L, "2024-01-01 10:10:00", "purchase"),
      (1L, 3L, "2024-01-01 10:20:00", "purchase"), // later convert ignored
      (2L, 4L, "2024-01-01 10:00:00", "view"),
      (2L, 5L, "2024-01-01 10:20:00", "purchase"),
      (3L, 6L, "2024-01-01 10:00:00", "view"),
      (3L, 7L, "2024-01-01 10:40:00", "purchase"),
      (4L, 8L, "2024-01-01 10:00:00", "view"))
    val out = graft.operators.Events.timeToConvert(events).collect().head
    assert(out.getAs[Long]("n_users") == 3L)
    assert(out.getAs[Long]("min_us") == 10L * 60 * 1000000)
    assert(out.getAs[Long]("max_us") == 40L * 60 * 1000000)
    assert(out.getAs[Double]("median_us") == 20.0 * 60 * 1000000)
    assert(out.getAs[Long]("p90_us") == 40L * 60 * 1000000) // rank ⌈27/10⌉ = 3
  }
}
