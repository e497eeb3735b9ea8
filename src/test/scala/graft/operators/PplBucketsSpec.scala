package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TextAnalysis.perplexityBuckets]]: exact positional tertile
  * boundaries, per-language independence, deterministic tie-break, and
  * head = highest mean log-prob.
  */
class PplBucketsSpec extends SparkSpec {
  import spark.implicits._

  // corpus where doc quality is controlled: low ids repeat the most
  // frequent bigram, high ids use one-off word pairs
  private val docs = (0 until 9).map { i =>
    val text =
      if (i < 3) "the cat the cat the cat"
      else if (i < 6) s"the cat word$i other$i"
      else s"rare$i pair$i only$i once$i"
    (i.toLong, text, "en")
  } ++ (0 until 4).map { i =>
    (100L + i, if (i < 2) "ab cd ab cd" else s"zz$i yy$i", "fr")
  }

  private lazy val out = TextAnalysis
    .perplexityBuckets(docs.toDF("doc_id", "text", "lang"),
      docs.toDF("doc_id", "text", "lang"))
    .collect()
    .map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("lang"), r.getAs[String]("bucket"))).toMap

  test("9-doc language splits exactly 3/3/3 with head = most fluent") {
    val en = out.filter(_._2._1 == "en")
    assert(en.values.count(_._2 == "head") == 3)
    assert(en.values.count(_._2 == "middle") == 3)
    assert(en.values.count(_._2 == "tail") == 3)
    // the boilerplate docs score highest under the corpus LM
    assert((0L to 2L).forall(i => en(i)._2 == "head"), en.toString)
    assert((6L to 8L).forall(i => en(i)._2 == "tail"), en.toString)
  }

  test("4-doc language cuts at 3·rank ≤ n boundaries: 1 head, 1 middle, 2 tail") {
    val fr = out.filter(_._2._1 == "fr").values.map(_._2).toSeq
    assert(fr.count(_ == "head") == 1, fr.toString)
    assert(fr.count(_ == "middle") == 1, fr.toString)
    assert(fr.count(_ == "tail") == 2, fr.toString)
  }

  test("ties break by doc_id: equal-scored docs bucket deterministically") {
    // docs 0-2 are identical texts → identical scores; doc 0 must rank
    // first. With n=9, all three land in head, so instead check the
    // assignment is stable across repartitioning.
    val df = docs.toDF("doc_id", "text", "lang")
    val a = TextAnalysis.perplexityBuckets(df, df)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.perplexityBuckets(df.repartition(7), df.repartition(5))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
