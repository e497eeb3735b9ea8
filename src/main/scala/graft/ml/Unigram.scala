package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer TRAINER (Kudo 2018, the SentencePiece
  * algorithm family; public) — the third member of the T2 tokenizer
  * family next to the frequency-built WordPiece vocab
  * (`WordPiece.buildVocab`) and the learned BPE merges (`Bpe.train`),
  * and the segmentation model most modern LLM data pipelines actually
  * ship. Reference anchor: the tokenizer seam at
  * `tabular_tokenizer.py:246` (the reference consumes a pretrained
  * vocabulary; a training-data pipeline must also TRAIN one on its own
  * corpus).
  *
  * Algorithm (hard-EM / Viterbi variant, deterministic by
  * construction):
  *  1. SEED: all substrings up to `maxPieceLen` of the capped
  *     word-frequency relation, occurrence-weighted; all single
  *     characters plus the top `maxSeed` multi-character pieces by
  *     (count desc, piece asc).
  *  2. SCORE: piece log-probability ln(cnt/Σcnt), micro-quantized to
  *     integer 1e-6 units with half-away-from-zero rounding (the house
  *     bm25-idf transcendental discipline) — every later comparison and
  *     sum is exact integer arithmetic.
  *  3. E-STEP: per-word Viterbi best segmentation under the current
  *     scores (ties broken to the longest piece — the first maximal
  *     candidate in ascending split-point order); expected counts are
  *     the occurrence-weighted piece counts of the best paths.
  *  4. PRUNE + M-STEP: pieces with zero expected count drop (every
  *     surviving word keeps its own best path segmentable, so coverage
  *     is invariant); survivors rescore from the new counts. Repeat
  *     from 3 `emRounds` times. (Production SentencePiece prunes by
  *     likelihood-loss quota; the zero-count prune keeps every round
  *     exactly replayable by a SQL oracle, which is the contract here.)
  *
  * Scale shape (the 100 TB argument): ONE corpus-scale shuffle (word
  * frequencies, map-side combined), capped to a deterministic top-N —
  * after that every EM round runs on the bounded word-frequency
  * relation as pure projections (the Viterbi fold is a per-row
  * expression, no shuffle) plus one vocab-sized hash aggregate for the
  * counts. Corpus encoding segments each DISTINCT word once and joins
  * back (the `Bpe.encodeCorpus` type/token discipline); the vocabulary
  * rides along as a broadcast map literal, never a join.
  */
object Unigram {

  /** Corpus → capped word-frequency relation: top `maxWords` by
    * (count desc, word asc) — the same tokenization as [[Bpe.wordFreq]]
    * (lowercase, whitespace split) so the two trainers see one corpus.
    */
  def wordFreq(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word")).limit(maxWords)

  /** Seed piece relation: every substring of length 1..maxPieceLen of
    * every word, occurrence-weighted by the word count; all single
    * characters survive, multi-char pieces cap at the top `maxSeed` by
    * (count desc, piece asc). */
  def seedVocab(words: DataFrame, maxPieceLen: Int, maxSeed: Int): DataFrame = {
    val pieces = words
      .select(col("cnt"), explode(sequence(lit(1), length(col("word")))).as("i"),
        col("word"))
      .select(col("cnt"), explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("i") + 1))).as("l"),
        col("word"), col("i"))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
    val singles = pieces.filter(length(col("piece")) === 1)
    val multis = pieces.filter(length(col("piece")) >= 2)
      .orderBy(desc("cnt"), asc("piece")).limit(maxSeed)
    singles.unionByName(multis)
  }

  /** Micro-quantized log-probability scores over a (piece, cnt) vocab:
    * sc = halfAwayRound(ln(cnt/Σcnt)·1e6) as BIGINT — the exact-integer
    * currency every Viterbi comparison uses. */
  def scored(vocab: DataFrame): DataFrame = {
    val total = vocab.agg(sum(col("cnt")).cast("double").as("__tot"))
    val l = log(col("cnt").cast("double") / col("__tot")) * lit(1000000.0)
    vocab.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        when(l >= 0, floor(l + 0.5)).otherwise(ceil(l - 0.5))
          .cast("long").as("sc"))
  }

  /** Viterbi best segmentation of `word` under a broadcast score map:
    * returns struct(sc, segs) — the exact-integer best path score and
    * its pieces, or a null struct if no path covers the word. The fold
    * state is the classic DP table best[0..L] carried as an array of
    * (sc, segs) structs; candidates enumerate split points i ascending,
    * so the FIRST maximal candidate (= longest last piece) wins ties on
    * both engines. */
  def viterbi(word: Column, scoreMap: Column, maxPieceLen: Int): Column = {
    val nullBest = struct(lit(null).cast("bigint").as("sc"),
      lit(null).cast("array<string>").as("segs"))
    val init = array(struct(lit(0L).as("sc"),
      lit(Array.empty[String]).as("segs")))
    aggregate(
      sequence(lit(1), length(word)),
      init,
      (acc, j) => {
        val cands = filter(
          transform(sequence(greatest(lit(1), j - lit(maxPieceLen) + 1), j), i => {
            // candidate: prefix best[i-1] + piece word[i..j]
            val piece = word.substr(i, j - i + 1)
            val prev = element_at(acc, i)
            struct((prev.getField("sc") + try_element_at(scoreMap, piece)).as("sc"),
              concat(prev.getField("segs"), array(piece)).as("segs"))
          }),
          c => c.getField("sc").isNotNull)
        val bestSc = array_max(transform(cands, _.getField("sc")))
        val best = try_element_at(filter(cands, c => c.getField("sc") === bestSc), lit(1))
        concat(acc, array(coalesce(best, nullBest)))
      },
      acc => element_at(acc, length(word) + 1))
  }

  /** One hard-EM round: Viterbi-segment the word relation under the
    * CURRENT scored vocab, return the occurrence-weighted expected
    * piece counts (zero-count pieces are absent — the prune). */
  def emCounts(words: DataFrame, vocab: Seq[(String, Long)],
               maxPieceLen: Int): DataFrame = {
    val vm = scoreMapLit(vocab)
    words
      .select(col("cnt"),
        viterbi(col("word"), vm, maxPieceLen).getField("segs").as("segs"))
      .select(col("cnt"), explode(col("segs")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
  }

  /** Train: seed → `emRounds` × (Viterbi counts → zero-count prune →
    * rescore). Returns the final (piece, cnt, sc) vocabulary. The two
    * driver-side collects per round are the bounded-vocab collects the
    * house allows (≤ maxSeed + alphabet rows). */
  def train(words: DataFrame, maxPieceLen: Int = 4, maxSeed: Int = 60,
            emRounds: Int = 2): DataFrame = {
    var vocab = scored(seedVocab(words, maxPieceLen, maxSeed))
    for (_ <- 1 to emRounds) {
      val vm = collectVocab(vocab)
      vocab = scored(emCounts(words, vm, maxPieceLen))
    }
    vocab
  }

  /** Likelihood-quota prune (the knob production SentencePiece tunes;
    * Kudo 2018 §3.2's "prune by loss" step, hard-EM variant): rank every
    * multi-character piece by the exact corpus-likelihood LOSS its
    * removal would cost — Σ over words whose best path uses p of
    * cnt·(best_sc − alt_sc), where alt is the word's Viterbi score with
    * p deleted from the score map — and keep only the top pieces up to
    * `targetSize` total vocabulary. All arithmetic stays in the trainer's
    * integer micro-nats, so ranking and ties ((essential, loss) desc,
    * piece asc) are exact and engine-replayable. Single characters are
    * never candidates (they are the segmentability floor); a piece whose
    * removal leaves some word with NO path is `essential`, ranks above
    * every loss value, and is kept even when the essential set alone
    * exceeds the quota (coverage outranks targetSize — the SentencePiece
    * required-piece guarantee). Returns the full decision table —
    * (piece, cnt, loss, essential, kept) — so a pipeline can audit what
    * a quota would cut before committing to it; `loss` is NULL for
    * single characters and, for essential pieces, sums only the words
    * that stay segmentable.
    *
    * Scale shape: one Viterbi projection over the capped word relation
    * for the best paths, one over the (word × used-multi-piece) explode
    * for the alt paths (bounded: ≤ pieces-per-word per word, the map
    * surgery is a per-row `map_filter` on the broadcast literal), one
    * vocab-sized aggregate; the ranking window orders a ≤ vocab-sized
    * relation (maxSeed-bounded), never corpus rows. */
  def pruneByLoss(words: DataFrame, vocab: DataFrame, targetSize: Int,
                  maxPieceLen: Int = 4): DataFrame = {
    val vseq = collectVocab(vocab)
    val nSingles = vseq.count(_._1.length == 1)
    val keepMultis = math.max(0, targetSize - nSingles)
    val vm = scoreMapLit(vseq)
    val best = words
      .select(col("word"), col("cnt"),
        viterbi(col("word"), vm, maxPieceLen).as("__b"))
      .select(col("word"), col("cnt"),
        col("__b").getField("sc").as("best_sc"),
        col("__b").getField("segs").as("segs"))
      .filter(col("best_sc").isNotNull)
    val used = best.select(col("word"), col("cnt"), col("best_sc"),
      explode(array_distinct(filter(col("segs"),
        p => length(p) > 1))).as("piece"))
    val alt = used.withColumn("alt_sc",
      viterbi(col("word"), map_filter(vm, (k, _) => k =!= col("piece")),
        maxPieceLen).getField("sc"))
    val lossByPiece = alt.groupBy("piece").agg(
      max(col("alt_sc").isNull).as("essential"),
      sum(col("cnt") * (col("best_sc") - coalesce(col("alt_sc"), col("best_sc"))))
        .cast("long").as("loss"))
    val singles = vocab.filter(length(col("piece")) === 1)
      .select(col("piece"), col("cnt"),
        lit(null).cast("long").as("loss"),
        lit(false).as("essential"), lit(true).as("kept"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("essential"), desc("loss"), asc("piece"))
    val multis = vocab.filter(length(col("piece")) > 1)
      .join(lossByPiece, Seq("piece"), "left")
      .select(col("piece"), col("cnt"),
        coalesce(col("loss"), lit(0L)).as("loss"),
        coalesce(col("essential"), lit(false)).as("essential"))
      // coverage outranks the quota: essential pieces are kept even when
      // they exceed targetSize (they rank first, so this only triggers
      // when the quota is smaller than the essential set — a quota that
      // tight would otherwise leave words unsegmentable)
      .withColumn("kept",
        col("essential") || (row_number().over(w) <= lit(keepMultis)))
    singles.unionByName(multis.select(singles.columns.map(col): _*))
  }

  /** [[train]] then [[pruneByLoss]] to `targetSize`, rescored: the kept
    * pieces re-segment the word relation once more and rescore from the
    * resulting counts — the vocabulary a quota-tuned pipeline ships. */
  def trainPruned(words: DataFrame, targetSize: Int, maxPieceLen: Int = 4,
                  maxSeed: Int = 60, emRounds: Int = 2): DataFrame = {
    val v = train(words, maxPieceLen, maxSeed, emRounds)
    val kept = pruneByLoss(words, v, targetSize, maxPieceLen)
      .filter(col("kept")).select("piece")
    scored(emCounts(words, collectVocab(v.join(kept, "piece")), maxPieceLen))
  }

  /** Collect a bounded scored vocab to (piece, sc) pairs, piece-sorted
    * (order only affects the map literal's argument order, not lookup). */
  def collectVocab(vocab: DataFrame): Seq[(String, Long)] =
    vocab.select("piece", "sc").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq

  /** Broadcast score-map literal from a bounded vocab. */
  def scoreMapLit(vocab: Seq[(String, Long)]): Column =
    map(vocab.flatMap { case (p, s) => Seq(lit(p), lit(s)) }: _*)

  /** Corpus-scale encoding under a trained vocabulary: tokenize docs to
    * words, Viterbi-segment each DISTINCT word once, join back — one
    * shuffle for the word explode, the segmentation itself is a
    * projection. Output one row per (idCol, word) with the piece array
    * and the micro-integer path score. */
  def encodeCorpus(docs: DataFrame, textCol: String, idCol: String,
                   vocab: Seq[(String, Long)], maxPieceLen: Int): DataFrame = {
    val vm = scoreMapLit(vocab)
    val words = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val encoded = words.select("word").distinct()
      .withColumn("__b", viterbi(col("word"), vm, maxPieceLen))
      .select(col("word"), col("__b").getField("segs").as("pieces"),
        col("__b").getField("sc").as("sc"))
    words.join(encoded, "word")
      .select(col(idCol), col("word"), col("pieces"), col("sc"))
  }
}
