package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TextSearch.dirichletQlTopK]] ordering invariants and
  * [[Evaluation.rankBiasedOverlap]] against hand-computed tail
  * weights. */
class QlRboSpec extends SparkSpec {
  import spark.implicits._

  test("dirichletQlTopK: term presence and tf order the ranking") {
    val docs = Seq(
      (1L, "apple apple pear plum"), // tf=2
      (2L, "apple pear plum fig"), // tf=1
      (3L, "pear plum fig date")) // tf=0 (smoothing floor only)
      .toDF("doc_id", "text")
    val out = TextSearch.dirichletQlTopK(docs, Seq("apple"), k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id"))
    assert(out.toSeq == Seq(1L, 2L, 3L), out.toSeq)
  }

  test("rboTailMicro: hand-computed k=3 p=0.9 coefficients") {
    // w = [100000, 90000, 81000]; c = w_d div d = [100000, 45000, 27000]
    assert(Evaluation.rboTailMicro(3).toSeq == Seq(172000L, 72000L, 27000L))
  }

  test("rankBiasedOverlap: identical = 1-p^k, disjoint = 0") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((40L, 1L), (50L, 2L), (60L, 3L)).toDF("doc_id", "rank")
    val same = Evaluation.rankBiasedOverlap(a, a, k = 3).collect()(0)
    assert(same.getAs[Long]("n_common") == 3L)
    assert(same.getAs[Long]("rbo_micro") == 271000L) // 1 - 0.9^3
    val disj = Evaluation.rankBiasedOverlap(a, b, k = 3).collect()(0)
    assert(disj.getAs[Long]("n_common") == 0L)
    assert(disj.getAs[Long]("rbo_micro") == 0L)
  }
}
