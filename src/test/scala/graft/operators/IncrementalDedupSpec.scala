package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "an entirely different document about columnar execution engines"),
    (3L, "yet another unrelated text mentioning shuffle partitions and skew")
  ).toDF("doc_id", "text")

  private lazy val batch = Seq(
    (10L, "THE  QUICK brown fox jumps over the lazy dog again and again today"), // exact (normalized) dup of 1
    (11L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (12L, "completely novel content that matches nothing in the catalog at all")
  ).toDF("doc_id", "text")

  test("flags exact and near dups against the catalog; novel docs stay null") {
    val cat = Dedup.sketchCatalog(corpus)
    val out = Dedup.incrementalDedupReport(batch, cat, threshold = 0.3)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L).getAs[java.lang.Long]("exact_dup_of") == 1L)
    assert(out(10L).getAs[java.lang.Long]("near_dup_of") == 1L) // identical digest too
    assert(out(11L).getAs[java.lang.Long]("exact_dup_of") == null)
    assert(out(11L).getAs[java.lang.Long]("near_dup_of") == 1L)
    assert(out(11L).getAs[Double]("jaccard") > 0.3)
    assert(out(12L).getAs[java.lang.Long]("exact_dup_of") == null)
    assert(out(12L).getAs[java.lang.Long]("near_dup_of") == null)
  }

  test("best near match wins on jaccard, catalog id breaks ties") {
    // catalog has an exact-text twin pair (4, 5); the batch doc matches both
    val cat = Dedup.sketchCatalog(corpus.union(Seq(
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")))
    val out = Dedup.incrementalDedupReport(
        Seq((20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
          .toDF("doc_id", "text"), cat, threshold = 0.3)
      .collect().head
    assert(out.getAs[java.lang.Long]("exact_dup_of") == 4L)
    assert(out.getAs[java.lang.Long]("near_dup_of") == 4L) // tie -> min id
    assert(out.getAs[Double]("jaccard") == 1.0)
  }
}
