package graft.operators

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("madOutlierReport: planted spike flagged, clean group silent") {
    // group a: 1..9 plus a spike of 100; group b: constant-ish, no spikes
    val rows = (1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 100.0)
    val clean = (1 to 10).map(v => ("b", 5.0 + (v % 2) * 0.02))
    val df = (rows ++ clean).toDF("grp", "value")
    val out = Anomaly.madOutlierReport(df, "value", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 10L)
    assert(a.getAs[Double]("median") == 5.5) // (5+6)/2
    assert(a.getAs[Double]("mad") == 2.5)    // devs sorted → (250+250)/2 cents
    assert(a.getAs[Long]("n_outliers") == 1L) // only the 100.0 spike
    val b = out("b")
    assert(b.getAs[Long]("n_outliers") == 0L)
    assert(b.getAs[Double]("median") == 5.01)
  }

  test("madOutlierReport: zero MAD flags every off-median value") {
    val df = (Seq.fill(9)(2.0) :+ 3.0).map(("g", _)).toDF("grp", "value")
    val r = Anomaly.madOutlierReport(df, "value", Seq("grp")).collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }
}
