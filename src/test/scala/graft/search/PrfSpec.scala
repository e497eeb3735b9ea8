package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TextSearch.prfExpansionTerms]] + [[TextSearch.bm25PrfTopK]]:
  * the term co-occurring with the query inside the feedback docs is
  * selected, query terms never are, and the PRF rerank pulls up a doc
  * that contains only the expansion term. */
class PrfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana banana"), (2L, "apple banana cherry"),
    (3L, "apple date"), (4L, "banana fig"),
    (5L, "grape melon"), (6L, "grape kiwi")).toDF("doc_id", "text")

  test("prfExpansionTerms: co-occurring term wins, query terms excluded") {
    val terms = TextSearch.prfExpansionTerms(docs, Seq("apple"),
        kFb = 3, nExp = 2)
      .orderBy(col("wgt_micro").desc, col("term")).collect()
      .map(_.getAs[String]("term"))
    assert(!terms.contains("apple"))
    assert(terms.head == "banana", terms.toSeq) // 3 hits in fb docs
  }

  test("bm25PrfTopK: expansion-only doc enters the ranking") {
    // doc 4 has no query term; PRF expansion 'banana' must score it
    val out = TextSearch.bm25PrfTopK(docs, Seq("apple"),
        kFb = 3, nExp = 1, k = 6)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score_r"))
      .toMap
    assert(out.contains(4L) && out(4L) > 0.0, out)
    // docs with the query term still outrank the expansion-only doc
    assert(out(1L) > out(4L) && out(2L) > out(4L), out)
  }
}
