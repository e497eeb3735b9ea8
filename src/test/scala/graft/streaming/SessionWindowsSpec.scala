package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-mode semantics of the session_window pipeline backing
  * `st_stream_sessions` (withWatermark is a no-op on batch relations,
  * so the same code path runs; streamed==batch equality itself is
  * pinned by the oracle row).
  */
class SessionWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("a gap of >= 30 minutes splits sessions; session carries count and span") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:20:00", "click"),   // 20 min — same session
      (1L, "2024-01-01 01:00:00", "view"),    // 40 min gap — new session
      (2L, "2024-01-01 00:00:00", "view"))
    val out = StreamingProfile.sessionWindows(events, "30 minutes", "1 hour")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    // session end = last event + gap
    assert(u1(0).getAs[java.sql.Timestamp]("session_start").toString
      .startsWith("2024-01-01 00:00:00"))
    assert(u1(0).getAs[java.sql.Timestamp]("session_end").toString
      .startsWith("2024-01-01 00:50:00"))
  }
}
