package graft.profile

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("perfect linear relation recovers slope/intercept exactly, r2 = 1") {
    // y-cents = 300·x + 500 exactly (y dollars = 3x + 5)
    val df = (1 to 50).map(x => ("g", x.toDouble, 3.0 * x + 5.0))
      .toDF("grp", "x", "y")
    val out = Regression.groupedOls(df, "grp", "x", "y").collect().head
    assert(out.getAs[Double]("slope") == 300.0)
    assert(out.getAs[Double]("intercept") == 500.0)
    assert(out.getAs[Double]("r2") == 1.0)
    assert(out.getAs[Long]("n") == 50L)
  }

  test("constant x reports zeros instead of dividing by zero") {
    val df = Seq(("g", 2.0, 1.0), ("g", 2.0, 9.0)).toDF("grp", "x", "y")
    val out = Regression.groupedOls(df, "grp", "x", "y").collect().head
    assert(out.getAs[Double]("slope") == 0.0 && out.getAs[Double]("r2") == 0.0)
  }

  test("groups fit independently and results are partitioning-invariant") {
    val df = ((1 to 30).map(x => ("up", x.toDouble, 2.0 * x)) ++
      (1 to 30).map(x => ("down", x.toDouble, -2.0 * x)))
      .toDF("grp", "x", "y")
    val fit = (d: org.apache.spark.sql.DataFrame) =>
      Regression.groupedOls(d, "grp", "x", "y").collect()
        .map(r => r.getAs[String]("group") -> r.getAs[Double]("slope")).toMap
    val a = fit(df)
    assert(a("up") == 200.0 && a("down") == -200.0)
    assert(a == fit(df.repartition(7)))
  }
}
