package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169 —
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents whose hashed-n-gram distribution looks
  * like a TARGET corpus. Both distributions are estimated in a
  * low-dimensional hashed feature space (unigrams + bigrams →
  * `mBuckets` md5 buckets, the paper's hashed n-gram features); each
  * document's log importance weight is the sum of its bucket counts
  * times the per-bucket Laplace-smoothed log-ratio `ln(p̂_target /
  * p̂_raw)`; selection is Gumbel top-k — the importance-resampling
  * without replacement of the paper, with the Gumbel noise drawn from a
  * salted md5 hash of the document id so the sample is a pure,
  * engine-replayable function of the data (same determinism stance as
  * [[Sampling]]).
  *
  * Cross-engine determinism: each bucket's log-ratio and each
  * document's Gumbel draw are rounded to integer MICRO-units with the
  * bit-deterministic floor/ceil half-away primitive (the
  * [[TextAnalysis.bigramLogProb]] convention), and the per-document sum
  * is an exact BIGINT — no floating accumulation order anywhere.
  *
  * Scale shape: bucket aggregations are bounded by `mBuckets` rows and
  * partial-aggregate map-side; the log-ratio relation broadcasts; doc
  * scoring is one explode + two doc-keyed shuffles; top-n plans as
  * TakeOrderedAndProject (distributed partial top-k, no global window —
  * ranks come from [[Ranking.withPosition]] over the n survivors).
  */
object Importance {

  private def md5l(c: Column): Column =
    graft.functions.SketchFunctions.md5_low32(c)

  /** Round half away from zero via exact floor/ceil (bit-deterministic
    * across engines, unlike round() built-ins). */
  private def rha(y: Column): Column =
    when(y >= 0, floor(y + 0.5)).otherwise(ceil(y - 0.5))

  /** Hashed unigram+bigram occurrence counts per document:
    * `(doc_id, bucket, n)`. Words are the corpus-wide convention
    * (lowercased, whitespace-split, empties dropped); features are
    * `u:<w>` and `b:<w1> <w2>`, hashed `md5_low32(feat) % mBuckets`.
    * Documents with no words contribute no rows (callers re-attach via
    * left join).
    */
  def hashedFeatures(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     mBuckets: Int = 1024): DataFrame = {
    require(mBuckets > 0, s"mBuckets must be positive, got $mBuckets")
    val words = filter(split(lower(trim(col(textCol))), "\\s+"), w => w =!= "")
    val unis = transform(col("w"), x => concat(lit("u:"), x))
    val bis = when(size(col("w")) >= 2,
      zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat(lit("b:"), a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    // balance before the unigram+bigram explode + per-feature md5
    // (guide §2.5): measured as 1.3 s + 2.2 s single-task stages on the
    // 1-split corpus scan
    graft.sources.Lake.balance(docs)
      .select(col(idCol).as("doc_id"), words.as("w"))
      .select(col("doc_id"), explode(concat(unis, bis)).as("feat"))
      .select(col("doc_id"), (md5l(col("feat")) % mBuckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Per-bucket log importance ratio in integer micro-units:
    * `(bucket, lw_micro)` with `lw_micro = rha(1e6 · ln((ct+1)(Tr+m) /
    * ((cr+1)(Tt+m))))` — add-1-smoothed `ln(p̂_target/p̂_raw)`. The
    * smoothed numerator/denominator are exact BIGINT products, so the
    * double quotient fed to `ln` is identical in every engine. Covers
    * every bucket the raw corpus occupies (target ⊆ coverage by
    * smoothing).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        mBuckets: Int = 1024): DataFrame =
    weightsFromFeatures(hashedFeatures(raw, idCol, textCol, mBuckets),
      target, idCol, textCol, mBuckets)

  /** [[importanceWeights]] from an already-materialized raw feature
    * relation (so [[resample]] hashes the raw corpus once, not twice). */
  private def weightsFromFeatures(rawFeats: DataFrame, target: DataFrame,
                                  idCol: String, textCol: String,
                                  mBuckets: Int): DataFrame = {
    val fr = rawFeats.groupBy("bucket").agg(sum(col("n")).as("cr"))
    val ft = hashedFeatures(target, idCol, textCol, mBuckets)
      .groupBy("bucket").agg(sum(col("n")).as("ct"))
    val tot = fr.agg(sum(col("cr")).as("tr"))
      .crossJoin(ft.agg(sum(col("ct")).as("tt")))
    fr.join(ft, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        rha(log(
          ((coalesce(col("ct"), lit(0L)) + 1L) * (col("tr") + mBuckets)).cast("double") /
            ((col("cr") + 1L) * (col("tt") + mBuckets)).cast("double")) * 1e6)
          .cast("long").as("lw_micro"))
  }

  /** Gumbel top-`n` importance resample of `raw` toward `target`:
    * `(rank, doc_id, logw_r, key_r)` — the n selected documents in
    * descending sampling-key order, with the micro-exact log weight and
    * key re-scaled to doubles for reading. `key = Σ n_b·λ_b + g`, `g` a
    * salted-hash Gumbel draw, so P(select) ∝ importance weight — the
    * paper's resampling semantics, deterministic under `salt`.
    */
  def resample(raw: DataFrame, target: DataFrame, n: Int,
               idCol: String = "doc_id", textCol: String = "text",
               mBuckets: Int = 1024, salt: String = "dsir0"): DataFrame = {
    // one md5 pass over the raw corpus: the feature relation feeds both
    // the bucket-distribution estimate and the per-doc scoring
    val rawFeats = hashedFeatures(raw, idCol, textCol, mBuckets).persist()
    val lam = weightsFromFeatures(rawFeats, target, idCol, textCol, mBuckets)
    val scores = rawFeats
      .join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id").agg(sum(col("n") * col("lw_micro")).as("s"))
    val u = (md5l(concat(col("doc_id").cast("string"), lit(":" + salt)))
      .cast("double") + 0.5) / 4294967296.0
    val keyed = raw.select(col(idCol).as("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("key", col("s") + rha(-log(-log(u)) * 1e6).cast("long"))
    Ranking.withPosition(
        keyed.orderBy(col("key").desc, col("doc_id")).limit(n), "rank")
      .select(col("rank"), col("doc_id"),
        (col("s").cast("double") / 1e6).as("logw_r"),
        (col("key").cast("double") / 1e6).as("key_r"))
  }
}
