package graft.search

import graft.SparkSpec

class SpearmanSpec extends SparkSpec {
  import spark.implicits._

  test("identical rankings: rho = 1; reversed: rho = -1") {
    val same = Seq((1L, 30.0, 300L), (2L, 20.0, 200L), (3L, 10.0, 100L))
      .toDF("id", "a", "b")
    assert(Evaluation.spearman(same, "id", "a", "b")
      .collect().head.getAs[Double]("rho") == 1.0)
    val rev = Seq((1L, 30.0, 100L), (2L, 20.0, 200L), (3L, 10.0, 300L))
      .toDF("id", "a", "b")
    val r = Evaluation.spearman(rev, "id", "a", "b").collect().head
    assert(r.getAs[Double]("rho") == -1.0)
    assert(r.getAs[Long]("sum_d2") == 8L) // (1−3)²+(2−2)²+(3−1)²
  }

  test("score ties break by id, keeping sum_d2 an exact integer") {
    val tied = Seq((1L, 5.0, 5L), (2L, 5.0, 5L), (3L, 1.0, 9L))
      .toDF("id", "a", "b")
    val out = Evaluation.spearman(tied, "id", "a", "b").collect().head
    // a-ranks: 1,2,3 (tie → id); b-ranks: 3→1, then ids 1,2 → 2,3
    // d = (1−2, 2−3, 3−1) → sum_d2 = 1+1+4
    assert(out.getAs[Long]("sum_d2") == 6L)
    assert(out.getAs[Double]("rho") == -0.5)
  }

  test("single item reports rho = 0 (degenerate denominator)") {
    val one = Seq((1L, 5.0, 5L)).toDF("id", "a", "b")
    assert(Evaluation.spearman(one, "id", "a", "b")
      .collect().head.getAs[Double]("rho") == 0.0)
  }
}
