package graft.operators

import graft.SparkSpec

/** Pins [[Dedup.weightedJaccardPairs]]: the tf-multiset semantics
  * (repeats count — distinct from set Jaccard on the same pair),
  * identity, and disjoint pairs. */
class WeightedJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def wj(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)]) =
    Dedup.weightedJaccardPairs(docs.toDF("doc_id", "text"),
      pairs.toDF("id_a", "id_b")).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("wjaccard")).toMap

  test("tf weights count repeats: 0.4 where set Jaccard reads 2/3") {
    // tf₁ = {a:2, b:1}, tf₂ = {a:1, b:2, c:1} → Σmin = 2, Σmax = 5
    val r = wj(Seq(1L -> "a a b", 2L -> "a b b c"), Seq(1L -> 2L))
    assert(r(1L -> 2L) == 0.4)
  }

  test("identical multisets score 1; disjoint score 0") {
    val r = wj(Seq(1L -> "a a b", 2L -> "a a b", 3L -> "z z"),
      Seq(1L -> 2L, 1L -> 3L))
    assert(r(1L -> 2L) == 1.0 && r(1L -> 3L) == 0.0)
  }
}
