package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Hll.HllSpec(p = 8)

  test("estimate tracks exact cardinality within the 3-sigma band") {
    val values = (1 to 5000).map(i => s"value-$i").toDF("v")
    val est = Hll.estimate(Hll.registers(values, "v", spec), spec)
      .collect().head.getAs[Double]("hll_estimate")
    // sigma = 1.04/sqrt(256) ~ 6.5%
    assert(math.abs(est - 5000) / 5000.0 < 0.20, s"estimate $est too far from 5000")
  }

  test("small sets take the linear-counting path and stay accurate") {
    val values = (1 to 30).map(i => s"tiny-$i").toDF("v")
    val est = Hll.estimate(Hll.registers(values, "v", spec), spec)
      .collect().head.getAs[Double]("hll_estimate")
    assert(math.abs(est - 30) < 6, s"linear-counting estimate $est too far from 30")
  }

  test("duplicates do not move the estimate; registers stay bounded") {
    val base = (1 to 400).map(i => s"dup-$i")
    val once = base.toDF("v")
    val thrice = (base ++ base ++ base).toDF("v")
    val e1 = Hll.estimate(Hll.registers(once, "v", spec), spec)
      .collect().head.getAs[Double]("hll_estimate")
    val e3 = Hll.estimate(Hll.registers(thrice, "v", spec), spec)
      .collect().head.getAs[Double]("hll_estimate")
    assert(e1 == e3)
    assert(Hll.registers(thrice, "v", spec).count() <= 256)
  }

  test("merge equals whole-corpus build, grouped") {
    val a = (1 to 800).map(i => (if (i % 2 == 0) "x" else "y", s"item-$i")).toDF("g", "v")
    val b = (500 to 1200).map(i => (if (i % 2 == 0) "x" else "y", s"item-$i")).toDF("g", "v")
    val merged = Hll.merge(
      Hll.registers(a, "v", spec, Seq("g")),
      Hll.registers(b, "v", spec, Seq("g")), Seq("g"))
    val whole = Hll.registers(a.union(b), "v", spec, Seq("g"))
    val mEst = Hll.estimate(merged, spec, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_estimate")).toMap
    val wEst = Hll.estimate(whole, spec, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_estimate")).toMap
    assert(mEst == wEst)
  }
}
