package graft.profile

import graft.SparkSpec

class Chi2Spec extends SparkSpec {
  import spark.implicits._

  test("independent columns: zero chi-square, zero V") {
    // perfectly proportional 2×2 table (all margins balanced)
    val df = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val out = InfoTheory.chiSquareAssociation(df, "a", "b").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("contrib") == 0.0))
    assert(out.head.getAs[Double]("chi2") == 0.0)
    assert(out.head.getAs[Double]("cramers_v") == 0.0)
    assert(out.head.getAs[Long]("dof") == 1L)
  }

  test("perfect association: Cramér's V = 1") {
    val df = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val out = InfoTheory.chiSquareAssociation(df, "a", "b").collect()
    // the FULL 2×2 grid including the two zero cells; chi2 = n = 4 for
    // a perfect association, every cell contributing exactly 1
    assert(out.length == 4)
    assert(out.count(_.getAs[Long]("observed") == 0L) == 2)
    assert(out.forall(_.getAs[Double]("contrib") == 1.0))
    assert(out.head.getAs[Double]("chi2") == 4.0)
    assert(out.head.getAs[Double]("cramers_v") == 1.0)
  }

  test("degenerate single-category column reports V = 0, dof = 0") {
    val df = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val out = InfoTheory.chiSquareAssociation(df, "a", "b").collect()
    assert(out.head.getAs[Long]("dof") == 0L)
    assert(out.head.getAs[Double]("cramers_v") == 0.0)
  }
}
