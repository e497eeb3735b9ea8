package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Unigram]]: Viterbi optimality + longest-piece tie-break, the
  * zero-count EM prune's coverage invariant, encode's distinct-word
  * join-back, and trainer determinism. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def vit(word: String, vocab: Seq[(String, Long)],
                  maxPieceLen: Int = 4): (Option[Long], Seq[String]) = {
    val r = Seq(word).toDF("word")
      .select(Unigram.viterbi(col("word"),
        Unigram.scoreMapLit(vocab), maxPieceLen).as("b"))
      .select(col("b.sc"), col("b.segs")).collect()(0)
    (Option(r.get(0)).map(_.asInstanceOf[Long]),
      Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[String]].toSeq)
        .getOrElse(null))
  }

  test("viterbi picks the max-score path, not the greedy one") {
    // greedy longest-first would take "ab"+"c" (-50-40=-90);
    // best is "a"+"bc" (-30-20=-50)
    val vocab = Seq("a" -> -30L, "b" -> -45L, "c" -> -40L,
      "ab" -> -50L, "bc" -> -20L)
    val (sc, segs) = vit("abc", vocab)
    assert(sc.contains(-50L))
    assert(segs == Seq("a", "bc"))
  }

  test("score ties break to the longest last piece") {
    // both ["ab"] and ["a","b"] score -60: the single longer piece wins
    val vocab = Seq("a" -> -30L, "b" -> -30L, "ab" -> -60L)
    val (sc, segs) = vit("ab", vocab)
    assert(sc.contains(-60L))
    assert(segs == Seq("ab"))
  }

  test("a word no vocab path covers yields the null struct") {
    val (sc, segs) = vit("axe", Seq("a" -> -10L, "e" -> -10L))
    assert(sc.isEmpty && segs == null)
  }

  test("maxPieceLen bounds candidate pieces") {
    // "abcd" in vocab but maxPieceLen=2 forbids it
    val vocab = Seq("ab" -> -10L, "cd" -> -10L, "abcd" -> -5L)
    val (sc, segs) = vit("abcd", vocab, maxPieceLen = 2)
    assert(sc.contains(-20L) && segs == Seq("ab", "cd"))
  }

  test("train prunes to used pieces and keeps every word segmentable") {
    val docs = Seq((1L, "aaab aaab cd"), (2L, "aaab cd cd")).toDF("doc_id", "text")
    val vocab = Unigram.train(Unigram.wordFreq(docs, "text", 10),
      maxPieceLen = 4, maxSeed = 20, emRounds = 2)
    val pieces = vocab.select("piece").as[String].collect().toSet
    // every final piece was used by some best path (zero-count prune)
    val enc = Unigram.encodeCorpus(docs, "text", "doc_id",
      Unigram.collectVocab(vocab), maxPieceLen = 4)
    assert(enc.filter(col("pieces").isNull).count() == 0)
    val used = enc.select(explode(col("pieces"))).as[String].collect().toSet
    assert(pieces == used, s"vocab $pieces vs used $used")
  }

  test("encodeCorpus joins the distinct-word segmentation back per occurrence") {
    val docs = Seq((1L, "xy xy z"), (2L, "z")).toDF("doc_id", "text")
    val vocab = Seq("x" -> -10L, "y" -> -10L, "z" -> -10L, "xy" -> -15L)
    val enc = Unigram.encodeCorpus(docs, "text", "doc_id", vocab, 4)
    val rows = enc.groupBy("doc_id")
      .agg(count(lit(1)).as("w"), sum(size(col("pieces"))).as("p"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: "xy" twice (1 piece each, -15 beats -20) + "z" = 3 words, 3 pieces
    assert(rows == Map(1L -> ((3L, 3L)), 2L -> ((1L, 1L))), rows.toString)
  }

  test("training is deterministic") {
    val docs = Seq((1L, "scan the table"), (2L, "scan the scan")).toDF("doc_id", "text")
    def run() = Unigram.train(Unigram.wordFreq(docs, "text", 10), 3, 15, 2)
      .orderBy("piece").collect().map(_.toString).mkString("|")
    assert(run() == run())
  }

  test("pruneByLoss: exact loss, essential flag, quota rank") {
    // words: "ab"×10 (best ["ab"] = -10; alt ["a","b"] = -60 → loss 500),
    //        "cd"×3  (best ["cd"] = -20; no "c"/"d" singles → essential)
    val words = Seq(("ab", 10L), ("cd", 3L)).toDF("word", "cnt")
    val vocab = Seq(
      ("a", 1L, -30L), ("b", 1L, -30L), ("ab", 1L, -10L), ("cd", 1L, -20L))
      .toDF("piece", "cnt", "sc")
    // targetSize = 2 singles + 1 multi → the quota must pick the
    // essential "cd" over "ab" despite ab's larger loss
    val out = Unigram.pruneByLoss(words, vocab, targetSize = 3, maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3),
          r.getBoolean(4)))).toMap
    assert(out("a") == ((None, false, true)) && out("b") == ((None, false, true)))
    assert(out("ab") == ((Some(500L), false, false)), out("ab").toString)
    assert(out("cd")._2 && out("cd")._3, out("cd").toString) // essential, kept
    // raising the quota keeps both multis, ab ranked by its loss
    val out4 = Unigram.pruneByLoss(words, vocab, targetSize = 4, maxPieceLen = 4)
      .filter(col("kept")).count()
    assert(out4 == 4L)
  }

  test("pruneByLoss: unused multi-char pieces rank at loss 0 and prune first") {
    val words = Seq(("ab", 5L)).toDF("word", "cnt")
    val vocab = Seq( // "zz" is in vocab but no word uses it
      ("a", 1L, -30L), ("b", 1L, -30L), ("ab", 1L, -10L), ("zz", 1L, -99L))
      .toDF("piece", "cnt", "sc")
    val out = Unigram.pruneByLoss(words, vocab, targetSize = 3, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(out("ab") && !out("zz"), out.toString)
  }

  test("trainPruned shrinks the vocab but never breaks segmentability") {
    // the standalone single-char words keep the alphabet in the trained
    // vocab, so every multi has a single-char alt path (none essential)
    // and the 1-multi quota genuinely binds
    val docs = Seq((1L, "a b c d x y aaab aaab cd xyxy"),
      (2L, "a b c d x y aaab cd cd xyxy")).toDF("doc_id", "text")
    val wf = Unigram.wordFreq(docs, "text", 12)
    val full = Unigram.train(wf, 4, 20, 2)
    val nSingles = Unigram.collectVocab(full).count(_._1.length == 1)
    val pruned = Unigram.trainPruned(wf, targetSize = nSingles + 1)
    assert(pruned.count() < full.count())
    val enc = Unigram.encodeCorpus(docs, "text", "doc_id",
      Unigram.collectVocab(pruned), maxPieceLen = 4)
    assert(enc.filter(col("pieces").isNull).count() == 0)
  }
}
