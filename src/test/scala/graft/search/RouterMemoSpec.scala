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

  test("memo is LRU-bounded: probing many corpora evicts, never grows past the cap") {
    TextSearch.clearRouterMemo()
    // 12 distinct corpora > the 8-entry bound
    (0 until 12).foreach { i =>
      val d = Seq((1L, s"alpha$i beta$i"), (2L, s"alpha$i gamma$i"))
        .toDF("doc_id", "text")
      TextSearch.cosineSimilarityJoin(d, 0.5).count()
    }
    val (w, p) = TextSearch.routerMemoSizes
    assert(w <= 8, s"wtd memo grew past the LRU bound: $w")
    assert(p <= 8, s"prefix memo grew past the LRU bound: $p")
    // the earliest corpus was evicted: re-probing it is a MISS (hit
    // counter unchanged), so it recomputes rather than serving a stale
    // or reclaimed checkpoint
    val hits = TextSearch.routerMemoHits
    val d0 = Seq((1L, "alpha0 beta0"), (2L, "alpha0 gamma0"))
      .toDF("doc_id", "text")
    TextSearch.cosineSimilarityJoin(d0, 0.5).count()
    assert(TextSearch.routerMemoHits == hits,
      "evicted entry served a hit — LRU eviction is not happening")
  }

  test("memo entries are session-scoped: a plan-identical frame in a new session misses") {
    TextSearch.clearRouterMemo()
    val d = docs
    TextSearch.cosineSimilarityJoin(d, 0.5).count()
    val hits = TextSearch.routerMemoHits
    // same literal rows, DIFFERENT session: the canonicalized plan alone
    // would collide; the session-in-key must force a miss so a future
    // stopped-context session can never serve a dead checkpoint
    val s2 = spark.newSession()
    import s2.implicits._
    val d2 = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma epsilon"),
      (4L, "zeta eta theta iota"),
      (5L, "alpha alpha alpha beta"),
      (6L, "beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    TextSearch.cosineSimilarityJoin(d2, 0.5).count()
    assert(TextSearch.routerMemoHits == hits,
      "new-session probe hit the old session's memo entry")
  }

  test("clearRouterMemo empties both maps") {
    TextSearch.cosineSimilarityJoin(docs, 0.5).count()
    assert(TextSearch.routerMemoSizes._1 > 0)
    TextSearch.clearRouterMemo()
    assert(TextSearch.routerMemoSizes == ((0, 0)))
  }

  test("bm25 scored memo: repeat retrievals over one corpus hit and stay exact") {
    TextSearch.clearRouterMemo()
    val d = docs
    val terms = Seq("alpha", "beta")
    val hits0 = TextSearch.routerMemoHits
    val full = TextSearch.bm25TopK(d, terms, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    val afterFirst = TextSearch.routerMemoHits
    // second retrieval, different k, same corpus+terms: the scored
    // cascade must be reused (the j3_rbo / PRF-feedback shape)
    val top3 = TextSearch.bm25TopK(d, terms, k = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(TextSearch.routerMemoHits > afterFirst,
      "second bm25 retrieval did not hit the scored memo")
    // memoized prefix is exactly the fresh ranking's head
    assert(top3 == full.take(3))
    // a fresh (cleared) computation agrees bit-for-bit
    TextSearch.clearRouterMemo()
    val fresh = TextSearch.bm25TopK(d, terms, k = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(fresh == top3)
    assert(TextSearch.routerMemoHits >= hits0)
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
