package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier (McCallum & Nigam 1998;
  * public) — the supervised classifier seat every large curation
  * pipeline fills for language ID and quality scoring (CCNet's
  * fastText langid, the FineWeb-Edu / DCLM quality classifiers are
  * this shape: linear-in-token-counts scores + argmax). The reference
  * has no trainer; its pipeline consumes pretrained scores
  * (`extract_embeddings.py`-class seams), so this is a
  * training-data-pipeline extension in the house exact-integer style.
  *
  * Determinism contract (the oracle-replay discipline):
  *  - tokenization = lowercase + `\s+` split, empties dropped (the
  *    [[Unigram.wordFreq]] corpus view);
  *  - vocabulary capped at the top `maxVocab` words of the TRAIN
  *    corpus by (global count desc, word asc); out-of-cap words score
  *    as unseen;
  *  - log-likelihoods are Laplace(+1): ln((cnt+1)/(tot_c+V)), class
  *    priors ln(n_c/n), each micro-quantized to integer 1e-6 nats with
  *    half-away-from-zero rounding (the house bm25-idf transcendental
  *    discipline) — every downstream sum/comparison is exact BIGINT;
  *  - unseen word in class c contributes the class default
  *    ln(1/(tot_c+V)) — identical to the Laplace cnt=0 path, so one
  *    coalesce covers both in-vocab-missing-class and out-of-vocab;
  *  - argmax ties break to the ascending class label.
  *
  * Scale shape (the 100 TB argument): the train side is ONE
  * corpus-scale shuffle (word counts, map-side combined) capped to a
  * bounded vocabulary; the model (vocab×classes scores + per-class
  * priors/defaults) is broadcast-sized by construction. The score side
  * never shuffles the corpus against the model — per-doc distinct
  * token counts (type/token discipline, one shuffle keyed by doc)
  * cross the bounded class relation and broadcast-join the scores, so
  * cost is linear in corpus tokens with a fixed ×C factor.
  */
object NaiveBayes {

  private def microRound(l: org.apache.spark.sql.Column) =
    when(l >= 0, floor(l + 0.5)).otherwise(ceil(l - 0.5)).cast("long")

  private def toks(df: DataFrame, textCol: String, keep: String*) = {
    val cols = keep.map(col) :+
      explode(split(lower(col(textCol)), "\\s+")).as("word")
    df.select(cols: _*).filter(col("word") =!= "")
  }

  /** Train the model relations: `classes` (C rows — cls, prior_sc,
    * default_sc) and `scores` (≤ maxVocab×C rows — cls, word, sc), both
    * broadcast-sized by construction. */
  def model(train: DataFrame, labelCol: String, textCol: String,
            maxVocab: Int = 2000): (DataFrame, DataFrame) = {
    val trTok = toks(train, textCol, labelCol).withColumnRenamed(labelCol, "cls")
    val vocab = trTok.groupBy("word").agg(count(lit(1)).as("gc"))
      .orderBy(desc("gc"), asc("word")).limit(maxVocab).select("word")
    val cw = trTok.join(broadcast(vocab), "word")
      .groupBy("cls", "word").agg(count(lit(1)).as("cnt"))
    val ct = cw.groupBy("cls").agg(sum("cnt").as("tot"))
    val vs = vocab.agg(count(lit(1)).as("v"))
    val nd = train.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("ndc"))
    val ndt = train.agg(count(lit(1)).as("ndt"))
    val classes = ct.join(nd, "cls").crossJoin(broadcast(vs)).crossJoin(broadcast(ndt))
      .select(col("cls"),
        microRound(log(col("ndc").cast("double") / col("ndt").cast("double"))
          * lit(1000000.0)).as("prior_sc"),
        microRound(log(lit(1.0) / (col("tot") + col("v")).cast("double"))
          * lit(1000000.0)).as("default_sc"))
    val scores = cw.join(ct, "cls").crossJoin(broadcast(vs))
      .select(col("cls"), col("word"),
        microRound(log((col("cnt") + lit(1)).cast("double") /
          (col("tot") + col("v")).cast("double")) * lit(1000000.0)).as("sc"))
    // Both relations are bounded (C rows; ≤ maxVocab·C rows) but derive
    // from corpus-scale token aggregations, and every consumer
    // broadcast-joins them MORE THAN ONCE (tokenLikelihoods reads
    // classes + scores per evaluation — per MICRO-BATCH on a stream;
    // predict reads classes twice more). Materialize each once
    // (guide §5; coalesce(1) first — the tiny-relation checkpoint
    // discipline) so the training cascade runs once, not per consumer.
    (classes.coalesce(1).localCheckpoint(eager = true),
      scores.coalesce(1).localCheckpoint(eager = true))
  }

  /** Per-(doc, class) token log-likelihood sums under a trained model:
    * (idCol, keep…, cls, lk). ONE aggregation over exploded tokens
    * against broadcast model relations — streaming-safe (a stream
    * scores in complete/update mode with no stream-stream join), and
    * batch-identical to a per-type×count sum since contributions are
    * linear. Zero-token docs contribute no row (the batch [[predict]]
    * path restores them prior-only). */
  def tokenLikelihoods(test: DataFrame, classes: DataFrame, scores: DataFrame,
                       idCol: String, textCol: String,
                       keep: Seq[String] = Nil): DataFrame =
    toks(test, textCol, (idCol +: keep): _*)
      .crossJoin(broadcast(classes.select("cls", "default_sc")))
      .join(broadcast(scores), Seq("word", "cls"), "left")
      .select((idCol +: keep).map(col) ++ Seq(col("cls"),
        coalesce(col("sc"), col("default_sc")).as("contrib")): _*)
      .groupBy((idCol +: keep :+ "cls").map(col): _*)
      .agg(sum("contrib").as("lk"))

  /** Train on `train` (labelCol = class), score `test`: returns one row
    * per test doc — (idCol, actual, pred, pred_sc) with pred_sc the
    * winning class's total integer micro-nat log-posterior. */
  def predict(train: DataFrame, test: DataFrame, idCol: String,
              labelCol: String, textCol: String,
              maxVocab: Int = 2000): DataFrame = {
    val (classes, scores) = model(train, labelCol, textCol, maxVocab)
    val like = tokenLikelihoods(test, classes, scores, idCol, textCol)
    // Start from test×classes so an all-empty-token doc still scores
    // its priors rather than dropping out.
    val total = test.select(col(idCol), col(labelCol).as("actual"))
      .crossJoin(broadcast(classes.select("cls", "prior_sc")))
      .join(like, Seq(idCol, "cls"), "left")
      .withColumn("total_sc", col("prior_sc") + coalesce(col("lk"), lit(0L)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("total_sc").desc, col("cls").asc)
    total.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("actual"), col("cls").as("pred"),
        col("total_sc").as("pred_sc"))
  }
}
