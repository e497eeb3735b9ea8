package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val spec = CountMin.CmsSpec(depth = 3, width = 8)

  private lazy val values =
    (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++ Seq("cold")).toDF("v")

  test("estimates never undercount and exact-match absent from collisions") {
    val cms = CountMin.build(values, "v", spec)
    assert(cms.count() <= 3 * 8)
    val est = CountMin.estimate(cms, Seq("hot", "warm", "cold").toDF("v"), "v", spec)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_n")).toMap
    assert(est("hot") >= 50 && est("warm") >= 7 && est("cold") >= 1)
    // depth-3 cells over width 8 with 3 distinct keys: min cell can pick
    // up at most the OTHER keys' mass
    assert(est("cold") <= 1 + 50 + 7)
  }

  test("never-seen values estimate 0 unless every cell collides") {
    val cms = CountMin.build(values, "v", spec)
    val est = CountMin.estimate(cms, Seq("absent-value-xyz").toDF("v"), "v", spec)
      .collect().head.getAs[Long]("est_n")
    assert(est >= 0 && est <= 58) // bounded by total mass; usually 0
  }

  test("merge is additive: split build equals whole build") {
    val (a, b) = (values.limit(20), values.exceptAll(values.limit(20)))
    val merged = CountMin.merge(
        CountMin.build(a, "v", spec), CountMin.build(b, "v", spec))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    val whole = CountMin.build(values, "v", spec)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(merged == whole)
  }
}
