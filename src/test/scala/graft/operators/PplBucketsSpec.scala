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

  test("sketch path approximates the exact tertiles and is partition-invariant") {
    // spread-out scores: 30 docs per lang mixing boilerplate and rare text
    val corpus = (0 until 30).map { i =>
      val text =
        if (i < 10) "the cat the cat the cat the cat"
        else if (i < 20) s"the cat w$i x$i the cat y$i"
        else s"a$i b$i c$i d$i e$i f$i"
      (i.toLong, text, "en")
    }
    val df = corpus.toDF("doc_id", "text", "lang")
    val exact = TextAnalysis.perplexityBuckets(df, df)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sk = TextAnalysis.perplexityBucketsSketch(df, df)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sk.size == 30)
    val agree = exact.count { case (id, b) => sk(id) == b }
    assert(agree >= 24, s"sketch/exact agreement too low: $agree/30")
    // every tertile is populated (the degenerate-resolution failure mode
    // the min-shift exists to prevent)
    assert(Set("head", "middle", "tail").subsetOf(sk.values.toSet))
    val b = TextAnalysis.perplexityBucketsSketch(df.repartition(7), df.repartition(5))
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == sk)
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
