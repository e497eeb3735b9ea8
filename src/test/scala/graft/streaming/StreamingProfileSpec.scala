package graft.streaming

import graft.SparkSpec
import graft.core.MinHash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  test("streamed profile equals batch profile over same data (sketch algebra)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val updates = StreamingProfile.profileStream(input.toDF().toDF("col_name", "value"))
    val q = updates.writeStream.format("memory").queryName("prof")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("c1", "a"), ("c1", "b"), ("c2", "x"))
      q.processAllAvailable()
      input.addData(("c1", "c"), ("c2", null))
      q.processAllAvailable()
      val rows = spark.table("prof").collect()
        .groupBy(_.getString(0)).view.mapValues(_.maxBy(_.getLong(1))).toMap
      assert(rows("c1").getLong(1) == 3 && rows("c1").getLong(2) == 0)
      assert(rows("c2").getLong(1) == 2 && rows("c2").getLong(2) == 1)
      val d1 = rows("c1").getAs[scala.collection.Seq[Long]](3).toArray
      assert(d1.sameElements(MinHash.sketch(Seq("a", "b", "c"))))
    } finally q.stop()
  }

  test("streamed quantile sketch equals batch sketch across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, Double)]
    val sdf = input.toDF().toDF("table_name", "col_idx", "value_num")
    val q = StreamingProfile.quantileSketchStream(sdf)
      .writeStream.format("memory").queryName("qsk")
      .outputMode(OutputMode.Complete()).start()
    try {
      val b1 = (1 to 500).map(i => ("t", 0, i * 1.5))
      val b2 = (1 to 400).map(i => ("t", 0, -i * 0.01))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("qsk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      val batch = graft.profile.QuantileSketch.sketchLong(
        (b1 ++ b2).toDF("table_name", "col_idx", "value_num"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamed CMS and HLL sketches equal their batch builds across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val sdf = input.toDF().toDF("v")
    val cmsQ = StreamingProfile.cmsStream(sdf, "v")
      .writeStream.format("memory").queryName("cms_s")
      .outputMode(OutputMode.Complete()).start()
    val hllQ = StreamingProfile.hllStream(sdf, "v")
      .writeStream.format("memory").queryName("hll_s")
      .outputMode(OutputMode.Complete()).start()
    try {
      val b1 = (1 to 300).map(i => s"tok${i % 11}")
      val b2 = (1 to 200).map(i => s"tok${i % 23}")
      input.addData(b1: _*); cmsQ.processAllAvailable(); hllQ.processAllAvailable()
      input.addData(b2: _*); cmsQ.processAllAvailable(); hllQ.processAllAvailable()
      val all = (b1 ++ b2).toDF("v")
      val cmsStreamed = spark.table("cms_s").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
      val cmsBatch = graft.profile.CountMin.build(all, "v").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
      assert(cmsStreamed == cmsBatch)
      val hllStreamed = spark.table("hll_s").collect()
        .map(r => r.getLong(0) -> r.getAs[Int]("rho")).toMap
      val hllBatch = graft.profile.Hll.registers(all, "v").collect()
        .map(r => r.getLong(0) -> r.getAs[Int]("rho")).toMap
      assert(hllStreamed == hllBatch)
    } finally { cmsQ.stop(); hllQ.stop() }
  }

  test("hourly windowed rollup runs on a stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "event_type", "user_id")
    val q = StreamingProfile.hourlyEventCounts(df)
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2L),
        (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view", 1L))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
      assert(rows.exists(r => r.getString(0) == "click" && r.getLong(2) == 2))
    } finally q.stop()
  }
}

class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  test("gap-based session windows close after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamingProfile.sessionWindows(df, gap = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      val t = (hm: String) => java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")
      // user 1: two events 5 min apart (one session), then a 30-min gap
      input.addData((t("10:00"), 1L, "click"), (t("10:05"), 1L, "view"),
        (t("10:40"), 1L, "click"))
      q.processAllAvailable()
      // advance watermark far enough to close every session
      input.addData((t("12:00"), 2L, "click"))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .filter(_.getLong(0) == 1L).sortBy(_.getTimestamp(1).getTime)
      assert(rows.length == 2, s"expected 2 closed sessions, got ${rows.toSeq}")
      assert(rows(0).getLong(3) == 2) // first session merged both events
      assert(rows(1).getLong(3) == 1)
    } finally q.stop()
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark: repeats within horizon are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingDedup.dedupStream(df, "ts", "10 minutes",
      keyCols = Seq("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val t = (m: String) => java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
      input.addData((t("00"), "d1", "hello"), (t("01"), "d2", "world"))
      q.processAllAvailable()
      // same content re-delivered in a later batch, inside the watermark
      input.addData((t("02"), "d1", "hello"), (t("03"), "d3", "fresh"))
      q.processAllAvailable()
      val rows = spark.table("dedup").collect()
      assert(rows.length == 3)
      assert(rows.map(_.getString(1)).sorted.toSeq == Seq("d1", "d2", "d3"))
      // null-safe fingerprint distinguishes null from empty string
      val fp = Seq(("a", null: String), ("a", "")).toDF("x", "y")
        .select(StreamingDedup.fingerprint(Seq("x", "y")).as("fp"))
        .collect().map(_.getString(0))
      assert(fp(0) != fp(1))
    } finally q.stop()
  }
}
