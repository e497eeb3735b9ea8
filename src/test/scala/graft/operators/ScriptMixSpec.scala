package graft.operators

import graft.SparkSpec

class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  test("script shares are exact and classes are disjoint") {
    // "He 42" -> latin 2, digit 2, ws 1, total 5
    // Han doc: 4 Han chars + 1 space
    val docs = Seq(("en", "He 42"), ("zh", "世界好啊 ")) // trailing space
      .toDF("lang", "text")
    val out = TextAnalysis.scriptMix(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_chars") == 5L)
    assert(en.getAs[Double]("latin_share") == 0.4)
    assert(en.getAs[Double]("digit_share") == 0.4)
    assert(en.getAs[Double]("ws_share") == 0.2)
    assert(en.getAs[Double]("han_share") == 0.0)
    assert(en.getAs[Double]("other_share") == 0.0)
    val zh = out("zh")
    assert(zh.getAs[Double]("han_share") == 0.8)
    assert(zh.getAs[Double]("ws_share") == 0.2)
  }

  test("accented Latin counts as Latin; CJK punctuation falls to other") {
    val docs = Seq(("x", "é。")).toDF("lang", "text") // é + ideographic full stop
    val r = TextAnalysis.scriptMix(docs).collect().head
    assert(r.getAs[Double]("latin_share") == 0.5)
    assert(r.getAs[Double]("other_share") == 0.5)
  }
}
