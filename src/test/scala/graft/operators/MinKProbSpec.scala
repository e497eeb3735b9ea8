package graft.operators

import graft.SparkSpec

/** Pins [[TextAnalysis.minKProb]]: the k = max(1, ⌊n/5⌋) selection
  * size, min-k ≤ overall mean, and the detector property — a doc the
  * LM memorized scores higher on its WORST bigrams than a novel one. */
class MinKProbSpec extends SparkSpec {
  import spark.implicits._

  test("k_used = max(1, n div 5) and min-k mean <= overall mean") {
    // one 11-token doc → 10 bigrams → k = 2; a 5-token doc → 4 → k = 1
    val docs = Seq(
      (1L, "a b c d e f g h i j k"),
      (2L, "a b c d e")).toDF("doc_id", "text")
    val mk = TextAnalysis.minKProb(docs, docs, kPct = 20).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("k_used"),
          r.getAs[Double]("min_k_avg_r"))).toMap
    assert(mk(1L)._1 == 10L && mk(1L)._2 == 2L)
    assert(mk(2L)._1 == 4L && mk(2L)._2 == 1L)
    val avg = TextAnalysis.bigramLogProb(docs, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob_r")).toMap
    assert(mk(1L)._3 <= avg(1L) && mk(2L)._3 <= avg(2L))
  }

  test("a memorized doc's worst bigrams outscore a novel doc's") {
    val memorized = "the quick brown fox jumps over the lazy dog"
    val train = (1 to 8).map(i => (i.toLong, memorized)) :+
      (99L, "alpha beta gamma delta")
    val score = Seq((1L, memorized), (2L, "fox gamma dog alpha quick"))
    val mk = TextAnalysis.minKProb(score.toDF("doc_id", "text"),
        train.toDF("doc_id", "text"), kPct = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("min_k_avg_r")).toMap
    assert(mk(1L) > mk(2L))
  }
}
