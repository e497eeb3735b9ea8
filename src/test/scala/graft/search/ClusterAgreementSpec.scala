package graft.search

import graft.SparkSpec

/** Pins [[Evaluation.clusterAgreement]]: identical partitions score
  * (1, 1), independent partitions score (-0.5, 0) on the classic 2×2
  * case, and degenerate trivial partitions define (1, 1). */
class ClusterAgreementSpec extends SparkSpec {
  import spark.implicits._

  private def agree(a: Seq[(Long, Long)], b: Seq[(Long, Long)]) = {
    val r = Evaluation.clusterAgreement(
      a.toDF("id", "ca"), b.toDF("id", "cb")).collect()(0)
    (r.getAs[Double]("ari"), r.getAs[Double]("nmi"),
      r.getAs[Long]("n_items"), r.getAs[Long]("ka"), r.getAs[Long]("kb"))
  }

  test("identical partitions: ARI = NMI = 1") {
    val p = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L)
    val (ari, nmi, n, ka, kb) = agree(p, p)
    assert(ari == 1.0 && nmi == 1.0 && n == 5L && ka == 2L && kb == 2L)
  }

  test("independent 2x2 partitions: ARI = -0.5, NMI = 0") {
    // A={12|34}, B={13|24}: every contingency cell is 1 → sum_idx=0,
    // E=2/3, max=2 → ARI=-(2/3)/(4/3); every ln term is ln(1)=0 → I=0
    val a = Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L)
    val b = Seq(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L)
    val (ari, nmi, _, _, _) = agree(a, b)
    assert(ari == -0.5 && nmi == 0.0)
  }

  test("both partitions trivial: the degenerate cases define 1") {
    val one = Seq(1L -> 7L, 2L -> 7L, 3L -> 7L)
    val (ari, nmi, _, ka, kb) = agree(one, one.map { case (i, _) => i -> 9L })
    assert(ka == 1L && kb == 1L && ari == 1.0 && nmi == 1.0)
  }
}
