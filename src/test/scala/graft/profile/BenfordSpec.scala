package graft.profile

import graft.SparkSpec

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("digits come from the cent string; nonpositives counted separately") {
    val df = Seq(123.45, 0.07, 900.0, 0.0, -5.0).toDF("v")
    val out = Drift.benfordReport(df, "v").collect()
    assert(out.length == 9) // full digit domain, zero-filled
    val byDigit = out.map(r => r.getAs[Long]("digit") ->
      r.getAs[Long]("n")).toMap
    assert(byDigit(1L) == 1L) // 12345 cents
    assert(byDigit(7L) == 1L) // 7 cents
    assert(byDigit(9L) == 1L) // 90000 cents
    assert(byDigit.values.sum == 3L)
    assert(out.head.getAs[Long]("n_pos") == 3L)
    assert(out.head.getAs[Long]("n_nonpos") == 2L)
  }

  test("a Benford-conforming sample scores a small MAD; uniform does not") {
    // counts proportional to log10(1+1/d) out of 1000
    val conforming = (1 to 9).flatMap { d =>
      val n = math.round(math.log10(1.0 + 1.0 / d) * 1000).toInt
      Seq.fill(n)(d * 1.11)
    }.toDF("v")
    val uniform = (1 to 9).flatMap(d => Seq.fill(100)(d * 1.11)).toDF("v")
    val madC = Drift.benfordReport(conforming, "v")
      .collect().head.getAs[Double]("mad")
    val madU = Drift.benfordReport(uniform, "v")
      .collect().head.getAs[Double]("mad")
    assert(madC < 0.002) // Nigrini close-conformity band
    assert(madU > 0.02)
    assert(madU > madC * 5)
  }
}
