package graft.ml

import graft.SparkSpec

/** Pins [[NaiveBayes]]: exact Laplace micro-nat scores on a
  * hand-computed corpus, the vocab cap's unseen semantics, the
  * ascending-class tie-break, and the empty-doc prior-only path. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // train: x={"a a b","a"}, y={"b b","b c"} → vocab {a:3,b:4,c:1}, V=3,
  // tot_x=tot_y=4, priors ln(1/2) = -693147 micro-nats each.
  private def train = Seq(
    (1L, "x", "a a b"), (2L, "x", "a"),
    (3L, "y", "b b"), (4L, "y", "b c")).toDF("doc_id", "lang", "text")

  test("exact micro-nat posterior, Laplace + unseen default") {
    // doc "a b d": x = -693147 + ln(4/7) + ln(2/7) + ln(1/7) micro
    //                = -693147 - 559616 - 1252763 - 1945910 = -4451436
    //              y = -693147 - 1945910 - 559616 - 1945910 = -5144583
    val test = Seq((10L, "x", "a b d")).toDF("doc_id", "lang", "text")
    val r = NaiveBayes.predict(train, test, "doc_id", "lang", "text")
      .collect()(0)
    assert(r.getAs[String]("pred") == "x")
    assert(r.getAs[Long]("pred_sc") == -4451436L)
  }

  test("vocab cap: out-of-cap words score as unseen on BOTH sides") {
    // maxVocab=2 keeps {b:4, a:3}; c drops from y's training mass too,
    // so tot_y=3 and doc "c" scores x=-693147+ln(1/6)=-2484906,
    // y=-693147+ln(1/5)=-2302585 → y wins.
    val test = Seq((10L, "y", "c")).toDF("doc_id", "lang", "text")
    val r = NaiveBayes.predict(train, test, "doc_id", "lang", "text",
      maxVocab = 2).collect()(0)
    assert(r.getAs[String]("pred") == "y")
    assert(r.getAs[Long]("pred_sc") == -2302585L)
  }

  test("posterior ties break to the ascending class label") {
    val sym = Seq((1L, "x", "a"), (2L, "y", "a")).toDF("doc_id", "lang", "text")
    val test = Seq((10L, "y", "a")).toDF("doc_id", "lang", "text")
    val r = NaiveBayes.predict(sym, test, "doc_id", "lang", "text").collect()(0)
    assert(r.getAs[String]("pred") == "x")
  }

  test("a zero-token doc still scores: priors only, tie to min class") {
    val sym = Seq((1L, "x", "a"), (2L, "y", "a")).toDF("doc_id", "lang", "text")
    val test = Seq((10L, "x", "   ")).toDF("doc_id", "lang", "text")
    val r = NaiveBayes.predict(sym, test, "doc_id", "lang", "text").collect()(0)
    assert(r.getAs[String]("pred") == "x")
    assert(r.getAs[Long]("pred_sc") == -693147L)
  }
}
