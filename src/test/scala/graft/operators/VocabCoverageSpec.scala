package graft.operators

import graft.SparkSpec

class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("OOV rate per language against the top-k corpus vocab") {
    val docs = Seq(
      ("en", "a a b"),
      ("fr", "c d")).toDF("lang", "text")
    // counts: a=2, b=1, c=1, d=1 → top-2 with lexicographic tie-break = {a, b}
    val out = TextAnalysis.vocabCoverage(docs, vocabSize = 2)
      .orderBy("lang").collect()
    assert(out.map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate"))).toSeq ==
      Seq(("en", 3L, 0L, 0.0), ("fr", 2L, 2L, 1.0)))
  }

  test("empty-string tokens are dropped; vocab join is broadcast") {
    val docs = Seq(("en", "  x  y  "), ("en", "")).toDF("lang", "text")
    val df = TextAnalysis.vocabCoverage(docs, vocabSize = 1)
    val out = df.collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_tokens") == 2L &&
      out(0).getAs[Long]("n_oov") == 1L)
    // the tiny vocab relation must reach the membership join as a
    // broadcast — a shuffled join here would re-exchange the whole
    // token explosion at scale
    assert(df.queryExecution.executedPlan.toString.contains("Broadcast"))
  }
}
