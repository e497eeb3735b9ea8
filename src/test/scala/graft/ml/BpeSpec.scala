package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def symsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]](1).toSeq).toMap

  test("wordFreq: counts, cap determinism, char+mark symbolization") {
    val docs = Seq("the cat sat", "the cat", "the").toDF("text")
    val wf = Bpe.wordFreq(docs, "text")
    val counts = wf.select("word", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L))
    assert(symsOf(wf)("cat") == Seq("c", "a", "t", "</w>"))
    val capped = Bpe.wordFreq(docs, "text", maxWords = Some(2))
    assert(capped.select("word").as[String].collect().toSet == Set("the", "cat"))
  }

  test("mergePair is greedy left-to-right; merged token does not re-merge") {
    val df = Seq(
      (Seq("a", "a", "a"), "aaa"),
      (Seq("a", "a", "a", "a"), "aaaa"),
      (Seq("x", "a", "a", "y"), "xaay"),
      (Seq("a", "b"), "ab"),
      (Seq("b", "a"), "ba"),
      (Seq("a"), "a")).toDF("syms", "tag")
    val out = df.withColumn("m", Bpe.mergePair(col("syms"), "a", "a"))
      .select("tag", "m").collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]](1).toSeq).toMap
    assert(out("aaa") == Seq("aa", "a"))
    assert(out("aaaa") == Seq("aa", "aa"))
    assert(out("xaay") == Seq("x", "aa", "y"))
    assert(out("ab") == Seq("a", "b"))
    assert(out("ba") == Seq("b", "a"))
    assert(out("a") == Seq("a"))
  }

  test("training learns the classic merges on a canonical corpus") {
    // low/lower/newest/widest family (the worked example of the public
    // BPE literature, rebalanced): 'e'+'s' dominates first.
    val docs = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val wf = Bpe.wordFreq(Seq(docs).toDF("text"), "text")
    val (merges, words) = Bpe.train(wf, 4)
    assert(merges.map(m => (m.left, m.right, m.pair_count)).take(2) ==
      Seq(("e", "s", 9L), ("es", "t", 9L)))
    // every learned merge must concatenate into a token of the final vocab
    val vocab = Bpe.vocab(words).select("token").as[String].collect().toSet
    merges.foreach(m => assert(vocab.contains(m.left + m.right) ||
      merges.exists(m2 => m2.rank > m.rank &&
        (m2.left == m.left + m.right || m2.right == m.left + m.right)),
      s"merge ${m.left}+${m.right} vanished without a successor"))
    // weighted symbol mass is conserved: sum(cnt * |syms|) shrinks by
    // exactly pair_count per merge
    val mass0 = wf.select(sum(size(col("syms")) * col("cnt"))).as[Long].first()
    val massN = words.select(sum(size(col("syms")) * col("cnt"))).as[Long].first()
    assert(mass0 - massN == merges.map(_.pair_count).sum)
  }

  test("train stops early when no pairs remain") {
    val wf = Bpe.wordFreq(Seq("a b a b a").toDF("text"), "text")
    val (merges, _) = Bpe.train(wf, 50)
    // singleton chars + </w>: "a" -> a</w> (1 merge), "b" -> b</w> (1)
    assert(merges.length <= 4)
  }

  test("applyMerges reproduces the training segmentation") {
    val docs = Seq("hello hello help hold hold hold").toDF("text")
    val wf = Bpe.wordFreq(docs, "text")
    val (merges, trained) = Bpe.train(wf, 6)
    val reEncoded = wf.withColumn("syms2", Bpe.applyMerges(col("syms"), merges))
      .select("word", "syms2").collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]](1).toSeq).toMap
    symsOf(trained).foreach { case (w, s) =>
      assert(reEncoded(w) == s, s"word $w: ${reEncoded(w)} vs $s")
    }
  }
}
