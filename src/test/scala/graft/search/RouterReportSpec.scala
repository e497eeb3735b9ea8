package graft.search

import graft.SparkSpec

/** Pins the cosine auto-router's plan report: a 100 TB caller must see
  * the quadratic-output regime coming (hot vocabulary → matching-pair
  * volume ∝ docs², measured ~100× at 10× docs) and be pointed at the
  * sub-quadratic MinHash-LSH path — while ROUTING ITSELF stays
  * unchanged and exact.
  */
class RouterReportSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      BigDecimal(r.getDouble(2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

  test("hot-vocabulary corpus: blocked route, quadratic-output risk flagged, result unchanged") {
    TextSearch.clearRouterMemo()
    // every doc shares one vocabulary — the posting join's worst case;
    // both router stages must fail the crossover and pick blocked
    val hot = (1L to 10L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val routed = rows(TextSearch.cosineSimilarityJoin(hot, 0.5))
    val rep = TextSearch.routerReport.getOrElse(fail("no router report published"))
    assert(rep.route == "blocked")
    assert(rep.quadraticOutputRisk, "hot regime not flagged as output-bound")
    assert(rep.nDocs == 10L)
    assert(rep.allPairs == 45.0)
    assert(rep.candidateUpperBound == rep.sumDf2 / 2.0)
    assert(rep.candidateUpperBound > 0.25 * rep.allPairs,
      "risk flagged but stage-1 volume is under the crossover")
    // stage 2 was evaluated before giving up on postings
    assert(rep.prefixCandidates.isDefined)
    // the warning names the sub-quadratic handoff
    assert(rep.render.contains("minhashNearDups"))
    // routing report changed NOTHING: routed result == blocked kernel
    assert(routed == rows(TextSearch.cosineSelfJoin(hot, 0.5)))
  }

  test("sparse-vocabulary corpus: postings route, no risk flag, stage 2 skipped") {
    TextSearch.clearRouterMemo()
    // disjoint per-doc vocabularies: Σdf²/2 ≪ allPairs, stage 1 decides
    val sparse = (1L to 20L)
      .map(i => (i, s"u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    TextSearch.cosineSimilarityJoin(sparse, 0.5).count()
    val rep = TextSearch.routerReport.getOrElse(fail("no router report published"))
    assert(rep.route == "postings")
    assert(!rep.quadraticOutputRisk)
    // stage 1 sufficed — the prefix window was never paid
    assert(rep.prefixCandidates.isEmpty)
    assert(rep.render.contains("postings"))
    assert(!rep.render.contains("QUADRATIC"))
  }
}
