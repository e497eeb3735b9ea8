package graft.profile

import graft.SparkSpec

class KsSpec extends SparkSpec {
  import spark.implicits._

  test("identical samples: D = 0; disjoint samples: D = 1") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    assert(Drift.ksTest(a, a, "v").collect().head.getAs[Double]("d_stat") == 0.0)
    val lo = Seq(1.0, 2.0).toDF("v")
    val hi = Seq(10.0, 11.0).toDF("v")
    val d = Drift.ksTest(lo, hi, "v").collect().head
    assert(d.getAs[Double]("d_stat") == 1.0)
    assert(d.getAs[Long]("at_cents") == 200L) // full separation from a's max
  }

  test("overlapping samples: exact integer ECDF gap, min-value tie-break") {
    // a = {1,2}, b = {2,3}: |F_a−F_b| = 0.5 at v=1 and v=2 → report v=1
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val out = Drift.ksTest(a, b, "v").collect().head
    assert(out.getAs[Double]("d_stat") == 0.5)
    assert(out.getAs[Long]("at_cents") == 100L)
    assert(out.getAs[Long]("n_a") == 2L && out.getAs[Long]("n_b") == 2L)
  }

  test("unbalanced sample sizes stay exact (cross-product rule)") {
    // a = {1,1,1}, b = {1,2}: at v=1 |3·2 − 1·3| / 6 = 0.5
    val a = Seq(1.0, 1.0, 1.0).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    val out = Drift.ksTest(a, b, "v").collect().head
    assert(out.getAs[Double]("d_stat") == 0.5)
  }
}
