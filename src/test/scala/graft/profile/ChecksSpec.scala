package graft.profile

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._
  import Checks._

  private lazy val df = Seq[(Integer, String, java.lang.Double)](
    (1, "ok", 10.0), (2, "ok", 20.0), (2, "bad!", 999.0),
    (null, "ok", -5.0), (4, "ok", null)
  ).toDF("id", "status", "score")

  test("row-local rules share one pass; exact violation counts") {
    val rep = Checks.run(df, Seq(
      NotNull("id"), InRange("score", 0.0, 100.0),
      InSet("status", Seq("ok", "meh")), MatchesRegex("status", "^[a-z]+$")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep("not_null").getAs[Long]("n_violations") == 1L)
    assert(!rep("not_null").getAs[Boolean]("pass"))
    assert(rep("in_range").getAs[Long]("n_violations") == 2L) // 999, -5; null exempt
    assert(rep("in_set").getAs[Long]("n_violations") == 1L)   // "bad!"
    assert(rep("matches_regex").getAs[Long]("n_violations") == 1L)
    assert(rep.values.forall(_.getAs[Long]("n_rows") == 5L))
  }

  test("unique counts every member of a duplicated group; FK anti-join") {
    val ref = Seq(1, 2, 3).toDF("k")
    val rep = Checks.run(df, Seq(
      Unique("id"), RefIntegrity("id", ref, "k")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep("unique").getAs[Long]("n_violations") == 2L) // both id=2 rows
    assert(rep("ref_integrity").getAs[Long]("n_violations") == 1L) // id=4
  }

  test("a clean table passes everything") {
    val clean = Seq((1, "ok", 1.0), (2, "ok", 2.0)).toDF("id", "status", "score")
    val rep = Checks.run(clean, Seq(NotNull("id"), Unique("id"),
      InRange("score", 0.0, 10.0)))
    assert(rep.collect().forall(_.getAs[Boolean]("pass")))
  }
}

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions give ~zero PSI; shifted give large PSI") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = (1 to 1000).map(i => ((i * 7) % 100).toDouble).toDF("v")
    val shifted = (1 to 1000).map(i => 80.0 + (i % 20)).toDF("v")
    val stable = Drift.psiReport(base, same, "v").collect().head
    assert(stable.getAs[Double]("psi") < 0.05, s"stable psi ${stable.getAs[Double]("psi")}")
    assert(!stable.getAs[Boolean]("drifted"))
    val moved = Drift.psiReport(base, shifted, "v").collect().head
    assert(moved.getAs[Double]("psi") > 0.5, s"shifted psi ${moved.getAs[Double]("psi")}")
    assert(moved.getAs[Boolean]("drifted"))
    assert(moved.getAs[Long]("n_base") == 1000L && moved.getAs[Long]("n_current") == 1000L)
  }

  test("current values outside the baseline range clamp to edge buckets") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val wild = Seq(-50.0, 500.0).toDF("v")
    val r = Drift.psiReport(base, wild, "v").collect().head
    assert(r.getAs[Long]("n_current") == 2L) // nothing dropped
  }
}
