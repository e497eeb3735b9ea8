package graft.operators

import graft.SparkSpec

class LshBandPlanSpec extends SparkSpec {

  test("divisor pairs, closed-form fixed points, s-curve monotonicity") {
    val rows = Dedup.lshBandPlan(spark, nHashes = 16).collect()
    // divisors of 16: 1,2,4,8,16 → 5 plans × 19 grid points
    assert(rows.length == 5 * 19)
    assert(rows.forall(r =>
      r.getAs[Long]("bands") * r.getAs[Long]("rows_per_band") == 16L))
    val key = rows.map(r => ((r.getAs[Long]("bands"), r.getAs[Long]("sim_pct")), r)).toMap
    // b=16, r=1: threshold* = 1/16; p(s) = 1-(1-s)^16 at s=0.50
    assert(key((16L, 50L)).getAs[Double]("threshold_star") == 0.0625)
    val p16 = key((16L, 50L)).getAs[Double]("p_candidate")
    assert(math.abs(p16 - (1.0 - math.pow(0.5, 16))) < 1e-6)
    // b=1, r=16: threshold* = 1; p(s) = s^16
    assert(key((1L, 50L)).getAs[Double]("threshold_star") == 1.0)
    assert(math.abs(key((1L, 50L)).getAs[Double]("p_candidate") -
      math.pow(0.5, 16)) < 1e-6)
    // p_candidate strictly non-decreasing in similarity for every plan
    rows.groupBy(_.getAs[Long]("bands")).values.foreach { g =>
      val ps = g.sortBy(_.getAs[Long]("sim_pct")).map(_.getAs[Double]("p_candidate"))
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    }
  }
}
