package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINER (Sennrich et al. 2016, public
  * algorithm) — the learned-merges counterpart of the frequency-built
  * WordPiece vocab (`WordPiece.buildVocab`). The reference tokenizes
  * with a pretrained HuggingFace WordPiece (`tabular_tokenizer.py:246`);
  * a training-data pipeline also needs to TRAIN subword vocabularies on
  * its own corpus, so this is an engine extension in the LLM-pipeline
  * family.
  *
  * Scale shape: ONE corpus-scale shuffle (word frequencies), then every
  * merge round runs on the bounded word-frequency relation — pair
  * counting is a hash aggregate over vocab-sized data and the rewrite is
  * a pure projection (higher-order fold, no shuffle). The driver sees
  * exactly one row per round (the winning pair); words never leave the
  * executors.
  */
object Bpe {

  /** End-of-word marker appended to every symbol sequence, so suffix
    * pieces learn separately from prefix pieces (the classic formulation).
    */
  val EndMark = "</w>"

  final case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** Corpus → bounded word-frequency relation with initial symbol
    * arrays (characters + [[EndMark]]). `maxWords` keeps training
    * deterministic AND bounded: top-N by (count desc, word asc).
    */
  def wordFreq(docs: DataFrame, textCol: String, maxWords: Option[Int] = None): DataFrame = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val capped = maxWords.map(n => words.orderBy(desc("cnt"), asc("word")).limit(n))
      .getOrElse(words)
    capped.withColumn("syms", symbolize(col("word")))
  }

  /** Initial symbol array of a word: characters + [[EndMark]]. */
  def symbolize(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EndMark)))

  /** Corpus-scale encoding with a trained merge table: tokenize docs to
    * words, symbolize, fold the merges in rank order — one projection
    * chain, no shuffle beyond the word explode. Output one row per
    * (idCol, word) with the encoded subword array.
    */
  def encodeCorpus(docs: DataFrame, textCol: String, idCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val words = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    // encode each DISTINCT word once, then join back: the merge cascade
    // is a deep fold expression, and the distinct-word relation is
    // orders of magnitude smaller than the corpus occurrence stream
    // (type/token ratio) — AQE broadcasts it when it fits
    val encoded = words.select("word").distinct()
      .withColumn("subwords", applyMerges(symbolize(col("word")), merges))
    words.join(encoded, "word").select(col(idCol), col("word"), col("subwords"))
  }

  /** Greedy left-to-right single-pass merge of adjacent (left, right)
    * into `left+right` over a symbol array — the standard BPE round
    * rewrite. A merged token does not re-merge within the same pass
    * (carry resets), which for `left == right` runs yields the
    * alternate-position behavior of the reference implementations.
    */
  def mergePair(syms: Column, leftSym: String, rightSym: String): Column = {
    val a = lit(leftSym); val b = lit(rightSym)
    val ab = lit(leftSym + rightSym)
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("carry"))
    val folded = aggregate(
      syms, init,
      (acc, s) => {
        val out = acc.getField("out"); val carry = acc.getField("carry")
        val doMerge = carry === a && s === b // null carry → null → treated false
        struct(
          when(doMerge, concat(out, array(ab)))
            .when(carry.isNotNull, concat(out, array(carry)))
            .otherwise(out).as("out"),
          when(doMerge, lit(null).cast("string")).otherwise(s).as("carry"))
      },
      acc => when(acc.getField("carry").isNotNull,
        concat(acc.getField("out"), array(acc.getField("carry"))))
        .otherwise(acc.getField("out")))
    folded
  }

  /** Train `numMerges` merges over a (word, cnt, syms) relation. Each
    * round: weighted adjacent-pair count (hash agg over vocab-sized
    * data), deterministic winner (count desc, pair asc), one-pass
    * rewrite, localCheckpoint to keep round plans flat. Stops early if
    * no adjacent pairs remain. Returns the merge table and the final
    * symbolized words.
    */
  def train(wordsWithSyms: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    val words0 = wordsWithSyms.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // one job per round (the winning-pair collect) — the per-round
    // rewrite checkpoint is gone; each round's symbol state is the
    // merges-so-far fold cascade over the ONE checkpointed base
    // (exactly [[applyMerges]], i.e. the same mergePair chain the old
    // per-round rewrites materialized), re-evaluated per round on the
    // vocab-bounded relation. Trade note: at numMerges ≫ 10² over an
    // unbounded vocabulary the O(rounds²) fold re-application argues
    // for periodic re-checkpoints; every registered caller trains ≤ 8
    // merges on a maxWords-capped relation.
    def state(): DataFrame =
      if (merges.isEmpty) words0
      else words0.withColumn("syms", applyMerges(col("syms"), merges.toSeq))
    var round = 1
    while (round <= numMerges) {
      val best = state()
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) round = numMerges + 1
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(round, l, r, c)
        round += 1
      }
    }
    (merges.toSeq, state())
  }

  /** Token frequencies of a trained state: explode final symbols. */
  def vocab(words: DataFrame): DataFrame =
    words.select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("cnt"))

  /** Encode-side application: fold the learned merges in rank order over
    * a symbol-array column — N chained projections, no shuffle (the
    * classic encoder applies merges by priority; applying each once in
    * rank order reproduces the training segmentation for words whose
    * pairs appear at most once per pass, and iterating rounds is the
    * exact general encoder).
    */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => mergePair(c, m.left, m.right))
}
