package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.SketchFunctions._

/** Per-document text-analysis profile over a documents relation —
  * language ID, quality scoring, token counting, fingerprinting. One
  * narrow projection, no shuffle; every metric is codegen'd except the
  * language scorer.
  */
object TextAnalysis {
  def analyze(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      length(t).as("n_chars"),
      token_count(t).as("n_tokens"),
      subword_count(t).as("n_subwords"),
      round(punct_ratio(t), 6).as("punct_ratio"),
      round(stopword_ratio(t), 6).as("stopword_ratio"),
      round(mean_token_len(t), 6).as("mean_token_len"),
      quality_score(t).as("quality"),
      doc_fingerprint(t).as("fingerprint"),
      lang_id(t).as("lang_pred"),
      simhash64(t).as("simhash"))
  }
}
