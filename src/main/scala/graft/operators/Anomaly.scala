package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust anomaly detection — median/MAD z-scores (Hampel's rule), the
  * outlier filter that survives the outliers it hunts (mean/std do
  * not).
  *
  * Determinism: values are quantized to integer micro-units
  * (`round(value·scale)` — exact BIGINTs), and medians are taken in
  * that space. Every interpolated median of integers is an exact
  * multiple of 0.5, which IEEE-754 represents exactly, so Spark's
  * `percentile` and the oracle's `quantile_cont` agree BITWISE no
  * matter how either engine writes its interpolation formula. The
  * Hampel comparison `|x − med| > k·1.4826·mad` is then one product
  * and one compare of exact doubles.
  *
  * Scale shape: exact percentile collects each group's value
  * multiset on one partition — right for the grouped-metric grain
  * this targets (groups ≪ rows, bounded per-group cardinality). For
  * a single giant group use [[graft.profile.QuantileSketch]] and trade
  * exactness for mergeable state.
  */
object Anomaly {

  /** Per-group robust stats + outlier counts:
    * (group..., n, median, mad, n_outliers). `median`/`mad` are
    * reported in original units (micro-value / scale, one exact
    * division).
    */
  def madOutlierReport(df: DataFrame, valueCol: String,
                       groupCols: Seq[String], k: Double = 3.0,
                       scale: Long = 100L): DataFrame = {
    val g = groupCols.map(c => col(s"`$c`"))
    val q = df.select(g :+
      round(col(s"`$valueCol`") * lit(scale.toDouble)).cast("long").as("__u"): _*)
    val med = q.groupBy(g: _*)
      .agg(expr("percentile(__u, 0.5)").as("__med"), count(lit(1)).as("n"))
    val withMed = q.join(med, groupCols)
      .withColumn("__dev", abs(col("__u").cast("double") - col("__med")))
    val mad = withMed.groupBy(g: _*)
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    val flagged = withMed.join(mad, groupCols)
      .withColumn("__out",
        (col("__dev") > lit(k) * lit(1.4826) * col("__mad")).cast("long"))
      .groupBy(g: _*)
      .agg(first(col("n")).as("n"), first(col("__med")).as("__med"),
        first(col("__mad")).as("__mad"), sum(col("__out")).as("n_outliers"))
    flagged.select(g ++ Seq(col("n"),
      (col("__med") / lit(scale.toDouble)).as("median"),
      (col("__mad") / lit(scale.toDouble)).as("mad"),
      col("n_outliers")): _*)
  }
}
