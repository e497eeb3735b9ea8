package graft.operators

import graft.SparkSpec
import graft.functions.SketchFunctions
import org.apache.spark.sql.functions._

/** Pins [[Dedup.weightedMinHashDigests]]: the tagged-copy expansion is
  * EXACTLY the standard digest of {(tok, i)} elements, and is invariant
  * to token order (a multiset property). */
class WeightedMinHashSpec extends SparkSpec {
  import spark.implicits._

  private def dig(text: String): Seq[Long] =
    Dedup.weightedMinHashDigests(Seq((1L, text)).toDF("doc_id", "text"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("mh").toSeq

  test("digest equals the standard MinHash of the tagged-copy set") {
    val expanded = Seq("a#1", "a#2", "b#1").toDF("v")
      .agg(SketchFunctions.minhash_agg(col("v")).as("mh"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("mh").toSeq
    assert(dig("a a b") == expanded)
  }

  test("token order does not change the multiset digest") {
    assert(dig("a b a") == dig("a a b"))
    assert(dig("b a a") != dig("a b b")) // different multisets differ
  }
}
