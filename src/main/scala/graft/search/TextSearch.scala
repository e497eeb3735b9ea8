package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational BM25 keyword search over a document corpus — the text-search
  * modality next to sketch search (`Discovery`) and embedding search
  * (`operators.Ann`). Everything is DataFrame algebra shaped for corpus
  * scale:
  *
  *  - document length comes from a per-row `size(split(...))` projection
  *    (no shuffle, no explode of the full corpus);
  *  - only tokens matching the (tiny, broadcast) query-term list are
  *    exploded and aggregated, so the one shuffle carries
  *    |matching tokens| rows, never the whole token stream;
  *  - corpus-level constants (N, avgdl) ride a broadcast 1-row aggregate;
  *  - per-term contributions are rounded to 6 dp and summed as exact
  *    DECIMAL(18,6), making the doc score independent of Spark's
  *    aggregation order — a DuckDB oracle replays scores bit-for-bit.
  *
  * Scoring is classic Okapi BM25 (Robertson–Spärck Jones idf in the
  * "+1" form, so idf > 0 even for terms in most docs):
  * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1),
  * s(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
  */
object TextSearch {

  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => t =!= "")

  /** Per-document TF-IDF top terms — the classic featurization next to
    * [[bm25TopK]]: smooth idf `ln((N+1)/(df+1)) + 1` (positive for every
    * term), score `tf · idf`. Output: (doc_id, term, tf, score_r, rank)
    * with `topK` terms per doc, ties broken on ascending term.
    *
    * Scale shape: one token explode → (doc, term) counts; document
    * frequencies are a second aggregate over the DISTINCT (doc, term)
    * relation the first one already produced; corpus size joins as a
    * broadcast 1-row aggregate; the per-doc window ranks only each doc's
    * own terms. The transcendental is rounded to 6 dp before the
    * multiply, the [[bm25TopK]] determinism discipline.
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("w"))
    val consts = base.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = base.select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val df_ = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df")) // tf rows are distinct (doc,term)
    val scored = tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(consts))
      .withColumn("idf",
        round(log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0, 6))
      .withColumn("score_r", round(col("tf") * col("idf"), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_r").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("doc_id", "term", "tf", "score_r", "rank")
  }

  /** EXACT all-pairs cosine similarity self-join over TF-IDF vectors at
    * threshold τ, with the L2-norm prefix filter of Bayardo et al.,
    * WWW'07 ("Scaling Up All Pairs Similarity Search") — the WEIGHTED
    * companion to `Dedup.exactJaccardSelfJoin`'s set-overlap PPJoin.
    *
    * Determinism: term weights are integer micro-units
    * (tf · round(idf·1e6), smooth idf `ln((N+1)/(df+1))+1` as in
    * [[tfidfTopTerms]]); dot products and squared norms are exact
    * integer sums in DECIMAL(38,0), so the only float ops are the
    * closing sqrt/divide, rounded to 6 dp. The DuckDB oracle runs the
    * FULL quadratic join — an exact match also certifies the prefix
    * filter lossless on the data.
    *
    * Prefix bound: sort a doc's terms by weight desc (term asc ties); a
    * term is prefix while the EXCLUSIVE cumulative energy satisfies
    * cum < (1 − τ²)·‖d‖² — if a pair shares no prefix term of doc a,
    * cos(a,b) ≤ ‖suffix(a)‖/‖a‖ < τ. Candidates join prefix(a) against
    * the FULL posting relation (id_a < id_b), which is lossless
    * one-sidedly; prefix terms are by construction the high-idf (rare)
    * ones, so the candidate shuffle rides short posting lists. The
    * verify join is candidate-scoped; nothing is ever all-pairs.
    */
  def cosineSelfJoin(docs: DataFrame, threshold: Double,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = docs.select(col(s"`$idCol`").as("id"), toks(col(s"`$textCol`")).as("w"))
    val consts = base.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = base.select(col("id"), explode(col("w")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val wtd = tf.join(broadcast(df_), Seq("term")).crossJoin(broadcast(consts))
      .withColumn("wq", (col("tf") *
          round((log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0) * 1e6, 0))
        .cast("long"))
      .select("id", "term", "wq")
    val energy = (col("wq").cast(dec) * col("wq").cast(dec)).cast(dec)
    val norms = wtd.groupBy("id").agg(sum(energy).as("n2"))
    // τ² in pico-units keeps the prefix comparison pure integer
    val tauSqPico = math.round(threshold * threshold * 1e12)
    val wPre = Window.partitionBy(col("id")).orderBy(col("wq").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = wtd
      .withColumn("cum", coalesce(sum(energy).over(wPre), lit(0).cast(dec)))
      .join(norms, "id")
      .filter(col("cum") * lit(1000000000000L) <
        col("n2") * lit(1000000000000L - tauSqPico))
      .select(col("id"), col("term"))
    val cands = prefix
      .join(wtd.select(col("id").as("id_b"), col("term")), "term")
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b")).distinct()
    val dots = cands
      .join(wtd.select(col("id").as("id_a"), col("term"), col("wq").as("wa")), "id_a")
      .join(wtd.select(col("id").as("id_b"), col("term"), col("wq").as("wb")),
        Seq("id_b", "term"))
      .groupBy("id_a", "id_b")
      .agg(sum((col("wa").cast(dec) * col("wb").cast(dec)).cast(dec)).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("n2").as("n2a")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("n2").as("n2b")), "id_b")
      .withColumn("cosine", round(col("dot").cast("double") /
        sqrt(col("n2a").cast("double") * col("n2b").cast("double")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Top-k documents for a bag-of-words query. Ties break on ascending id.
    * Output: (doc_id, score_r, rank).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val terms = queryTerms.distinct.map(_.toLowerCase)
    val base = docs.select(col(idCol).as("doc_id"),
      toks(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("double"))
    // corpus constants: one broadcast row (count + avg doc length)
    val consts = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // explode ONLY query-term matches: the shuffle carries matching
    // tokens, not the corpus token stream
    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("w"), t => t.isInCollection(terms))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df_ = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val contrib = tf
      .join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(consts))
      // idf is the one transcendental in the score: round it to 6 dp so a
      // sub-ulp libm-vs-Math.log difference can never reach the oracle
      // compare through the later multiplications
      .withColumn("idf",
        round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1), 6))
      .withColumn("c",
        round(col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
    val scored = contrib.groupBy(col("doc_id"))
      .agg(sum(col("c").cast(DecimalType(18, 6))).cast("double").as("score_r"))
    // global top-k as TakeOrdered (distributed partial top-k per partition,
    // merged on the driver), NOT a global window over the whole corpus;
    // the rank window then orders only the k surviving rows
    val top = scored.orderBy(col("score_r").desc, col("doc_id")).limit(k)
    // window-free rank of the k survivors (TakeOrdered output is one
    // sorted partition; see Ranking.withPosition)
    graft.operators.Ranking.withPosition(top, "rank")
      .select("doc_id", "score_r", "rank")
  }

  /** Character-trigram posting lists — the substring-search ("corpus
    * grep") index. One row per DISTINCT (gram, doc): per-doc trigrams are
    * deduped inside the array expression BEFORE the explode, so the
    * posting shuffle carries ≤ text-length rows per doc and the index
    * size is Σ distinct grams, independent of repetition.
    *
    * All codegen'd array expressions (`sequence` → `transform` →
    * `array_distinct`), no UDF. At 100 TB the index is built once,
    * bucketed by gram (hot grams salt naturally: postings are
    * id-sorted), and persisted next to the corpus.
    */
  def trigramIndex(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val t = col(s"`$textCol`")
    docs.select(col(s"`$idCol`").as("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(length(t) - 2, lit(0))),
          i => t.substr(i, lit(3))))).as("gram"))
      .filter(length(col("gram")) === 3)
  }

  /** Exact substring search driven by the trigram index: candidates are
    * docs whose posting lists contain EVERY query trigram (an equi-join
    * on ≤ |q| grams + a count-match — never a corpus scan), then the
    * `instr` verify runs on candidates only, so the result is exactly
    * `contains(text, query)` with no false positives and — because any
    * matching doc necessarily indexes all of the query's trigrams — no
    * false negatives. Output: (doc_id, first_pos, n_hits) for
    * non-overlapping occurrence count via length arithmetic.
    *
    * Pass a pre-built (persisted) `index` to skip the build; omit it for
    * one-shot search.
    */
  def substringSearch(docs: DataFrame, query: String,
                      idCol: String = "doc_id", textCol: String = "text",
                      index: Option[DataFrame] = None): DataFrame = {
    require(query.length >= 3, "substringSearch needs a query of >= 3 chars")
    val qGrams = query.sliding(3).toSeq.distinct
    val idx = index.getOrElse(trigramIndex(docs, idCol, textCol))
    val cands = idx.filter(col("gram").isInCollection(qGrams))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__ng"))
      .filter(col("__ng") === qGrams.size)
      .select("doc_id")
    val t = col(s"`$textCol`")
    val q = lit(query)
    docs.select(col(s"`$idCol`").as("doc_id"), t.as("__text"))
      .join(cands, Seq("doc_id"), "left_semi")
      .filter(instr(col("__text"), query) > 0)
      .select(col("doc_id"),
        instr(col("__text"), query).cast("long").as("first_pos"),
        ((length(col("__text")) - length(replace(col("__text"), q, lit("")))) /
          query.length).cast("long").as("n_hits"))
  }
}
