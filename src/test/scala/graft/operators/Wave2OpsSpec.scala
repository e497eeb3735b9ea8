package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pins the round-14 second-session operators: box-filter resize over
  * real decoded pixels, weekday seasonality, soft-dedup weights, and
  * the mutual-kNN health report.
  */
class Wave2OpsSpec extends SparkSpec {
  import spark.implicits._

  test("resizeStats: hand-checked truncating box average, ragged edge") {
    // 3x3 single-channel raster, factor 2 → 2x2 output with ragged
    // right/bottom blocks
    val px = Array[Byte](10, 20, 30,
                         40, 50, 60,
                         70, 80, 90)
    val payload = graft.multimodal.SyntheticMedia.pngOf(3, 3, 1, px)
    val out = graft.multimodal.Multimodal
      .resizeStats(Seq((1L, payload)).toDF("media_id", "payload"), factor = 2)
      .collect().head
    assert(out.getAs[Int]("rs_width") == 2 && out.getAs[Int]("rs_height") == 2)
    // blocks: {10,20,40,50}→30, {30,60}→45, {70,80}→75, {90}→90
    assert(out.getAs[Long]("checksum") == 30L + 45 + 75 + 90)
    val mean = out.getAs[Seq[Double]]("channel_means").head
    assert(mean == (30.0 + 45 + 75 + 90) / 4)
  }

  test("resizeStats factor 1 is identity on the raster") {
    val px = Array.tabulate(12)(i => (i * 7 % 256).toByte)
    val payload = graft.multimodal.SyntheticMedia.pngOf(4, 3, 1, px)
    val out = graft.multimodal.Multimodal
      .resizeStats(Seq((1L, payload)).toDF("media_id", "payload"), factor = 1)
      .collect().head
    assert(out.getAs[Long]("checksum") == px.map(_ & 0xff).map(_.toLong).sum)
  }

  test("weekdaySeasonality: exact ppm index and Monday-0 mapping") {
    // 2026-08-10 was a Monday
    def ts(day: Int) = Timestamp.valueOf(f"2026-08-$day%02d 12:00:00")
    val ev = Seq(
      ("a", ts(10)), ("a", ts(10)), ("a", ts(10)), // Mon x3
      ("a", ts(11)),                               // Tue x1
      ("b", ts(16))                                // Sun x1
    ).toDF("event_type", "ts")
    val out = Events.weekdaySeasonality(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("seasonality_idx"))).toMap
    assert(out(("a", 0L)) == ((3L, 5.25)))    // 3*7*1e6 div 4 = 5250000
    assert(out(("a", 1L)) == ((1L, 1.75)))
    assert(out(("b", 6L)) == ((1L, 7.0)))     // all mass on Sunday
  }

  test("softDedupWeights: 1/|cluster| ppm, singletons at 1e6") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.softDedupWeights(docs, pairs)
      .select("doc_id", "cl_size", "weight_ppm").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 333333L)))
    assert(out(2L) == ((3L, 333333L)))
    assert(out(3L) == ((3L, 333333L)))
    assert(out(4L) == ((1L, 1000000L)))
  }

  test("labelAgreement: clean clusters agree, the planted mislabel is a suspect") {
    // two tight label clusters + one vector carrying the WRONG label
    val embs = (
      (1 to 4).map(i => (i.toLong, Array(1.0f, 0.001f * i, 0.0f), 0)) ++
      (5 to 8).map(i => (i.toLong, Array(0.001f * i, 1.0f, 0.0f), 1)) :+
      ((9L, Array(1.0f, 0.0035f, 0.0f), 1)) // sits in cluster 0, labeled 1
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.labelAgreement(embs, k = 3).collect()
      .map(r => r.getInt(0) -> r).toMap
    // label-1 rollup contains the mislabeled vector: zero agreeing
    // neighbors → one suspect; label 0's vectors now see vec 9 among
    // their neighbors but still mostly agree
    assert(out(1).getAs[Long]("n_suspects") == 1, out(1).toString)
    assert(out(0).getAs[Long]("n_suspects") == 0)
    assert(out(0).getAs[Double]("agreement") > 0.6)
  }

  test("mrrAtK: first-relevant reciprocal, zero when missed") {
    val results = Seq(
      ("q1", "a", 1L), ("q1", "x", 2L),
      ("q2", "x", 1L), ("q2", "b", 2L), ("q2", "c", 3L),
      ("q3", "x", 1L), ("q3", "y", 2L)
    ).toDF("query", "candidate", "rank")
    val truth = Seq(
      ("q1", Seq("a")), ("q2", Seq("c", "b")), ("q3", Seq("z"))
    ).toDF("query", "expected")
    val out = graft.search.Evaluation.mrrAtK(results, truth, 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("q1") == ((1L, 1.0)))
    assert(out("q2") == ((2L, 0.5)))
    assert(out("q3") == ((0L, 0.0)))
  }

  test("averagePrecisionAtK: hand-checked table, truncating convention") {
    val results = Seq(
      ("q1", "a", 1L), ("q1", "x", 2L), ("q1", "b", 3L),
      ("q2", "x", 1L), ("q2", "y", 2L)
    ).toDF("query", "candidate", "rank")
    val truth = Seq(
      ("q1", Seq("a", "b", "c")), // hits at ranks 1, 3 → (1/1 + 2/3) / 3
      ("q2", Seq("z"))            // no hits → 0
    ).toDF("query", "expected")
    val out = graft.search.Evaluation.averagePrecisionAtK(results, truth, 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // prec_micro: 1000000 div 1 = 1000000; 2000000 div 3 = 666666
    // ap = (1666666 div 3) / 1e6 = 0.555555
    assert(out("q1") == ((2L, 0.555555)))
    assert(out("q2") == ((0L, 0.0)))
  }

  test("knnGraphReport: mutual pair, hub, and orphan on a planted layout") {
    // two tight pairs far apart + one outlier that points somewhere but
    // is nobody's nearest (k=1)
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.1f, 0.99f, 0.0f)),
      (5L, Array(0.6f, 0.6f, 0.5f))
    ).toDF("vec_id", "embedding")
    val r = Ann.knnGraphReport(embs, k = 1).collect().head
    assert(r.getAs[Long]("n_nodes") == 5 && r.getAs[Long]("n_edges") == 5)
    // 1↔2 and 3↔4 mutual; 5 points at one of them but nobody points at 5
    assert(r.getAs[Long]("mutual_pairs") == 2)
    assert(r.getAs[Double]("mutual_fraction") == 0.8)
    assert(r.getAs[Long]("n_orphans") == 1)
  }
}
