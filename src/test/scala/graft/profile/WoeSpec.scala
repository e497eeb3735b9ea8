package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WoeSpec extends SparkSpec {
  import spark.implicits._

  // perfectly separating feature: low values all good, high all bad
  private def df = ((1 to 8).map(i => (i * 1.0, "G")) ++
    (93 to 100).map(i => (i * 1.0, "B"))).toDF("v", "status")

  test("separating feature: positive WOE in the good bucket, negative in the bad") {
    val out = Woe.report(df, "v", col("status") === "B", buckets = 2)
      .orderBy("bucket").collect()
    assert(out.length == 2)
    val lo = out(0); val hi = out(1)
    assert(lo.getAs[Long]("n_good") == 8L && lo.getAs[Long]("n_bad") == 0L)
    assert(hi.getAs[Long]("n_good") == 0L && hi.getAs[Long]("n_bad") == 8L)
    assert(lo.getAs[Double]("woe") > 0 && hi.getAs[Double]("woe") < 0)
    // add-one smoothing keeps empty cells finite
    assert(!lo.getAs[Double]("woe").isInfinite && !hi.getAs[Double]("woe").isInfinite)
    // symmetric construction → symmetric WOE
    assert(lo.getAs[Double]("woe") == -hi.getAs[Double]("woe"))
  }

  test("iv_total is the exact micro-sum of the contributions") {
    val out = Woe.report(df, "v", col("status") === "B", buckets = 2).collect()
    val micros = out.map(r => Math.round(r.getAs[Double]("iv_contrib") * 1e6)).sum
    assert(out.forall(r =>
      r.getAs[Double]("iv_total") == micros.toDouble / 1e6))
    assert(out.head.getAs[Double]("iv_total") > 1.0) // strong separator
  }

  test("uninformative feature has near-zero WOE everywhere") {
    val flat = (1 to 100).map(i => (i * 1.0, if (i % 2 == 0) "B" else "G"))
      .toDF("v", "status")
    val out = Woe.report(flat, "v", col("status") === "B", buckets = 4).collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("woe")) < 0.2))
    assert(out.head.getAs[Double]("iv_total") < 0.02)
  }
}
