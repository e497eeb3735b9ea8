package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeHistorySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("consecutive equal values collapse to one effective-dated version") {
    val events = ev(
      (1L, 1L, "2024-01-01 00:00:00", "A"),
      (1L, 2L, "2024-01-01 01:00:00", "A"),
      (1L, 3L, "2024-01-01 02:00:00", "B"),
      (1L, 4L, "2024-01-01 03:00:00", "A"), // A returns: NEW version, not merged
      (2L, 5L, "2024-01-01 00:30:00", "X"))
    val out = Events.changeHistory(events, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "version").collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(r => (r.getAs[Long]("version"), r.getAs[String]("event_type"),
      r.getAs[Long]("n_events"))).toSeq ==
      Seq((1L, "A", 2L), (2L, "B", 1L), (3L, "A", 1L)))
    // versions chain: each eff_to equals the NEXT version's eff_from
    assert(u1(0).getAs[java.sql.Timestamp]("eff_to") ==
      u1(1).getAs[java.sql.Timestamp]("eff_from"))
    assert(u1(1).getAs[java.sql.Timestamp]("eff_to") ==
      u1(2).getAs[java.sql.Timestamp]("eff_from"))
    // the current version is open-ended
    assert(u1(2).getAs[java.sql.Timestamp]("eff_to") == null)
    // a never-changing key is one open version
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2(0).getAs[Long]("version") == 1L &&
      u2(0).getAs[java.sql.Timestamp]("eff_to") == null)
  }

  test("equal timestamps order by the tie column") {
    val events = ev(
      (1L, 2L, "2024-01-01 00:00:00", "B"),
      (1L, 1L, "2024-01-01 00:00:00", "A"))
    val out = Events.changeHistory(events, "user_id", "ts", "event_type", "event_id")
      .orderBy("version").collect()
    assert(out.map(_.getAs[String]("event_type")).toSeq == Seq("A", "B"))
  }
}
