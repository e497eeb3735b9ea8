package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weight-of-evidence / information-value report — the classic
  * feature-screening statistic (credit-scoring lineage; here: which
  * profile features separate good from bad training documents before a
  * model ever sees them).
  *
  * For a numeric feature bucketed into `buckets` fixed-width bins and a
  * binary label: `WOE_i = ln(good-share_i / bad-share_i)` (add-one
  * smoothed so empty cells stay finite) and `IV = Σ (good-share_i −
  * bad-share_i)·WOE_i`.
  *
  * Exactness discipline: values are micro-quantized to integer CENTS,
  * bucket indices are pure integer arithmetic from broadcast bounds, the
  * WOE ln argument is ONE division of exact integer products (the
  * collocation-PMI pattern), and the IV total is a sum of round-6
  * CONTRIBUTIONS re-quantized to integer micros — commutative, so the
  * total is partitioning-independent.
  *
  * Shape at scale: one bounds scan, then one bucket aggregation; totals
  * ride a broadcast of the (≤ `buckets`-row) grouped relation. No
  * windows, no quantiles.
  */
object Woe {

  /** Output, one row per bucket (+ constant total columns):
    * (bucket, n_good, n_bad, woe, iv_contrib, iv_total). */
  def report(df: DataFrame, valueCol: String, badLabel: Column,
             buckets: Int = 10): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    val cents = round(col(s"`$valueCol`") * 100, 0).cast("long")
    val base = df.select(cents.as("c"),
      when(badLabel, 1L).otherwise(0L).as("bad"))
    val bounds = base.agg(min(col("c")).as("__lo"), max(col("c")).as("__hi"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("bucket", least(lit(buckets - 1),
        floor((col("c") - col("__lo")) * buckets /
          (col("__hi") - col("__lo") + 1))).cast("long"))
      .groupBy("bucket")
      .agg(sum(lit(1L) - col("bad")).as("n_good"), sum(col("bad")).as("n_bad"))
    val totals = bucketed.agg(sum(col("n_good")).as("__g"),
      sum(col("n_bad")).as("__b"))
    val scored = bucketed.crossJoin(broadcast(totals))
      // ln of one exact-integer product ratio (add-one smoothing keeps
      // every factor positive): ((g+1)(B+k)) / ((b+1)(G+k))
      .withColumn("woe", round(log(
        ((col("n_good") + 1) * (col("__b") + buckets)).cast("double") /
          ((col("n_bad") + 1) * (col("__g") + buckets)).cast("double")), 6))
      .withColumn("iv_contrib", round(
        ((col("n_good") + 1).cast("double") / (col("__g") + buckets).cast("double") -
          (col("n_bad") + 1).cast("double") / (col("__b") + buckets).cast("double"))
          * col("woe"), 6))
      // 6-dp value ×1e6 is within ~1e-4 of an integer — exact micros
      .withColumn("__iv_u", round(col("iv_contrib") * 1000000, 0).cast("long"))
    val ivTotal = scored.agg(sum(col("__iv_u")).as("__ivt"))
    scored.crossJoin(broadcast(ivTotal))
      .select(col("bucket"), col("n_good"), col("n_bad"), col("woe"),
        col("iv_contrib"),
        (col("__ivt").cast("double") / 1000000.0).as("iv_total"))
  }
}
