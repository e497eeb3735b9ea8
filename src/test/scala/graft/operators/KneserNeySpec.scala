package graft.operators

import graft.SparkSpec

/** Pins [[TextAnalysis.knBigramLogProb]]: exact interpolated-KN scores
  * on a hand corpus (D=0.75), the unseen-history continuation backoff,
  * and the loud zero-mass guard. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // train bigrams: "a b":1, "b a":2, "a c":1 → T=3;
  // ctx a:(c1=2,n1p=2), b:(c1=2,n1p=1); cont a/b/c: n1pc=1 each
  private def train = Seq(
    (1L, "a b a c"), (2L, "b a")).toDF("doc_id", "text")

  private def score(docs: Seq[(Long, String)]) =
    TextAnalysis.knBigramLogProb(docs.toDF("doc_id", "text"), train)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("kn_avg_logprob_r"))).toMap

  test("exact interpolated-KN micro-nat scores, D = 0.75") {
    // "b a": P = (2-.75)/2 + .75*1/2*1/3 = 0.75    → -287682 micro
    // "a b","a c": P = (1-.75)/2 + .75*2/2*1/3 = 0.375 → -980829
    // doc1 mean = (-980829-287682-980829)/3 → -749780
    val r = score(Seq((1L, "a b a c"), (2L, "b a")))
    assert(r(2L) == ((1L, -0.287682)))
    assert(r(1L) == ((3L, -0.74978)))
  }

  test("unseen history backs off to the continuation probability") {
    // "z a": w1=z untrained → P = n1pc(a)/T = 1/3 → -1098612 micro
    val r = score(Seq((9L, "z a")))
    assert(r(9L) == ((1L, -1.098612)))
  }

  test("a bigram with zero KN mass raises loudly") {
    val ex = intercept[Exception] {
      TextAnalysis.knBigramLogProb(Seq((9L, "z q")).toDF("doc_id", "text"),
        train).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("zero KN mass")))
  }
}
