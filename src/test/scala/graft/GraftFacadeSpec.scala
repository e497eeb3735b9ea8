package graft

import org.apache.spark.sql.functions._

/** The facade delegations drive a miniature end-to-end workflow. */
class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("profile -> store -> search -> dedup workflow through the facade") {
    val docs = ((1L to 20L).map(i => (i, s"common shared text body $i")) ++
      Seq((21L, "common shared text body 7")))  // near-dup of doc 7
      .toDF("doc_id", "text")
    val deduped = Graft.dedupCorpus(docs, threshold = 0.5)
    assert(deduped.count() < 21)
    assert(deduped.filter(col("doc_id") === 21L).isEmpty) // min-id 7 kept

    val a = (1 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val profiles = Seq(
      profile.Profiler.profile(a, "a"),
      profile.Profiler.profile(a.limit(50), "b"),
      profile.Profiler.profile(Seq((1, "zz")).toDF("x", "y"), "c"))
      .reduce(_ unionByName _)
    val hits = Graft.searchUnionable(profiles, "a", k = 2).collect()
    assert(hits.head.getAs[String]("cand_table") == "b")

    val sampled = Graft.sampleStratified(docs, "text",
      fractions = Map.empty, defaultFraction = 0.5, idCol = "doc_id")
    assert(sampled.count() > 0 && sampled.count() < 21)
  }
}
