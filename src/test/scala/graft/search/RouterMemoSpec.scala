package graft.search

import graft.SparkSpec

class RouterMemoSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma delta"),
    (3L, "alpha beta gamma epsilon"),
    (4L, "zeta eta theta iota"),
    (5L, "alpha alpha alpha beta"),
    (6L, "beta gamma delta epsilon zeta")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      BigDecimal(r.getDouble(2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

  test("re-probing thresholds hits the router memo and stays exact") {
    val d = docs
    val hits0 = TextSearch.routerMemoHits
    val at09 = rows(TextSearch.cosineSimilarityJoin(d, 0.9))
    val afterFirst = TextSearch.routerMemoHits
    // same corpus, different τ: the wtd checkpoint must be reused
    val at03 = rows(TextSearch.cosineSimilarityJoin(d, 0.3))
    assert(TextSearch.routerMemoHits > afterFirst,
      "second threshold probe did not hit the wtd memo")
    // identical call: both wtd and (plan, τ) prefix entries reusable
    val at03b = rows(TextSearch.cosineSimilarityJoin(d, 0.3))
    assert(at03b == at03)
    // routed results equal the blocked kernel's (plan-independence holds
    // through the memo)
    assert(at09 == rows(TextSearch.cosineSelfJoin(d, 0.9)))
    assert(at03 == rows(TextSearch.cosineSelfJoin(d, 0.3)))
    assert(TextSearch.routerMemoHits > hits0)
  }

  test("different corpora do not share memo entries") {
    val other = Seq((10L, "kappa lambda mu"), (11L, "kappa lambda nu"))
      .toDF("doc_id", "text")
    val a = rows(TextSearch.cosineSimilarityJoin(docs, 0.5))
    val b = rows(TextSearch.cosineSimilarityJoin(other, 0.5))
    assert(a.nonEmpty && b.nonEmpty)
    assert(b.forall { case (x, y, _) => x >= 10L && y >= 10L })
  }
}
