package graft.operators

import graft.SparkSpec

/** Pins [[Ann.ivfPqTopK]]: with every vector a codebook seed the
  * residual codes are exact, so duplicates score ADC 0 and rank
  * first; routing keeps neighbors same-cluster. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("ivfPqTopK: duplicate scores ADC 0, neighbors stay in-cluster") {
    // two orthogonal clusters of 4 (ids 1-4 on axis 0, 11-14 on axis 32);
    // each cluster holds one exact duplicate pair (1,2) and (11,12)
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until 64).map(j => (if (j == axis) 1f else 0f) +
        (if (j == axis + 1) eps else 0f))
    val embs = Seq(
      (1L, v(0, 0f)), (2L, v(0, 0f)), (3L, v(0, 0.1f)), (4L, v(0, 0.2f)),
      (11L, v(32, 0f)), (12L, v(32, 0f)), (13L, v(32, 0.1f)), (14L, v(32, 0.2f)))
      .toDF("vec_id", "embedding")
    val out = Ann.ivfPqTopK(embs, embs, k = 3, kCells = 2, nProbe = 1,
        nSub = 8, nCodes = 16)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist"))).toMap
    // duplicate is rank 1 at ADC 0
    assert(out((1L, 1L)) == (2L, 0L), out)
    assert(out((11L, 1L)) == (12L, 0L), out)
    // all neighbors come from the query's own cluster
    out.foreach { case ((q, _), (n, _)) =>
      assert((q < 10L) == (n < 10L), s"$q -> $n crossed clusters")
    }
  }
}
