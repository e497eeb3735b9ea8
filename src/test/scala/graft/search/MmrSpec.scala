package graft.search

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query 0 = (1,0,0); candidates 1..3 all have rel = cos 45° ≈ 0.707107:
  // 1 and 3 are the SAME direction (near-dups of each other), 2 is the
  // mirror direction (orthogonal to 1/3 in the yz sense: cos(1,2) = 0)
  private def embs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(1f, 1f, 0f)),
    (2L, Array(1f, -1f, 0f)),
    (3L, Array(2f, 2f, 0f))).toDF("vec_id", "embedding")

  test("rank 1 is the relevance argmax; near-dup demoted below diverse hit") {
    val out = Mmr.rerank(embs, embs.filter($"vec_id" === 0),
        nCandidates = 10, k = 3, lambda = 0.7)
      .orderBy("rank").collect()
    // all three candidates tie on rel 0.707107 → id tie-break picks 1
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L))
    val r1 = out(0)
    assert(r1.getAs[Double]("rel") == 0.707107)
    // rank-1 score is λ·rel with NO penalty: 7·707107 / 1e7
    assert(r1.getAs[Double]("mmr") == 0.4949749)
    // rank 2: vec 2 is orthogonal to vec 1 (maxSim 0) → keeps λ·rel;
    // vec 3 is IDENTICAL in direction to vec 1 (sim 1) → 0.7·rel − 0.3
    assert(out(1).getAs[Double]("mmr") == 0.4949749)
    assert(out(2).getAs[Double]("mmr") ==
      (7L * 707107L - 3L * 1000000L).toDouble / 1e7)
  }

  test("query vector itself is excluded; k caps at candidate count") {
    val out = Mmr.rerank(embs, embs.filter($"vec_id" === 0),
        nCandidates = 10, k = 99, lambda = 0.7).collect()
    assert(!out.map(_.getAs[Long]("vec_id")).contains(0L))
    assert(out.length == 3) // only 3 non-self candidates exist
  }

  test("negative max-sim raises the marginal score (no clamp at zero)") {
    // query (1,0): A=(1,1) rel .707107; B=(-1,1): rel -.707107 BUT
    // sim(B,A)=0; C=(-2,-2): rel -.707107, sim(C,A) = -1 → C's penalty
    // term SUBTRACTS a negative: 0.7·(−.707107) − 0.3·(−1) betters B's
    // 0.7·(−.707107) − 0.3·0 by +0.3 → C must rank ahead of B
    val e2 = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 1f)),
      (2L, Array(-1f, 1f)),
      (3L, Array(-2f, -2f))).toDF("vec_id", "embedding")
    val out = Mmr.rerank(e2, e2.filter($"vec_id" === 0),
        nCandidates = 10, k = 3, lambda = 0.7)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(1).getAs[Double]("mmr") ==
      (7L * -707107L - 3L * -1000000L).toDouble / 1e7)
  }

  test("lambda must quantize to tenths") {
    intercept[IllegalArgumentException] {
      Mmr.rerank(embs, embs.limit(1), nCandidates = 5, k = 2, lambda = 0.75)
    }
  }
}
