package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a baseline and a current
  * snapshot of a numeric column — the Population Stability Index
  * (PSI), the standard drift gate run before a model or mixture
  * recipe trained on the baseline is applied to new data.
  *
  * PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i), with Laplace-smoothed
  * shares p_i = (c_i + 1)/(n + B) so empty buckets stay finite.
  * Conventional reading: < 0.1 stable, 0.1–0.2 moderate, > 0.2 drifted.
  *
  * Determinism discipline: values quantize to integer micro-units;
  * buckets are fixed-width integer ranges from the BASELINE's min/max
  * (current values clamp into the edge buckets); the ln argument is
  * one division of exact integer products; ln is 6-dp-rounded; each
  * bucket's term is quantized to integer nano-units and summed in
  * integer space. One aggregation per side + a B-row join.
  */
object Drift {

  /** One-row report: (n_base, n_current, psi, drifted at `threshold`).
    */
  def psiReport(base: DataFrame, current: DataFrame, valueCol: String,
                nBuckets: Int = 10, scale: Long = 100L,
                threshold: Double = 0.2): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val u = (df: DataFrame) => df.select(
      round(col(s"`$valueCol`") * lit(scale.toDouble)).cast("long").as("__u"))
    val b = u(base)
    val bounds = b.agg(min(col("__u")).as("__lo"), max(col("__u")).as("__hi"))
      .withColumn("__w",
        greatest(lit(1L), ceil((col("__hi") - col("__lo") + 1).cast("double")
          / lit(nBuckets.toDouble)).cast("long")))
    def bucketed(df: DataFrame) = df.crossJoin(broadcast(bounds))
      .withColumn("__bkt", least(lit(nBuckets - 1L), greatest(lit(0L),
        floor((col("__u") - col("__lo")).cast("double") / col("__w").cast("double"))
          .cast("long"))))
      .groupBy("__bkt").agg(count(lit(1)).as("c"))
    val allB = base.sparkSession.range(nBuckets).select(col("id").as("__bkt"))
    val pc = allB.join(bucketed(b), Seq("__bkt"), "left").na.fill(0L, Seq("c"))
      .select(col("__bkt"), col("c").as("cb"))
    val qc = allB.join(bucketed(u(current)), Seq("__bkt"), "left")
      .na.fill(0L, Seq("c")).select(col("__bkt"), col("c").as("cc"))
    val nB = lit(nBuckets.toLong)
    val joined = pc.join(qc, "__bkt")
      .crossJoin(broadcast(pc.agg(sum(col("cb")).as("nb"))))
      .crossJoin(broadcast(qc.agg(sum(col("cc")).as("nc"))))
    // p/q = (cb+1)(nc+B) / ((cc+1)(nb+B)) — one division of exact products
    val lnr = round(log(
      ((col("cb") + 1) * (col("nc") + nB)).cast("double") /
        ((col("cc") + 1) * (col("nb") + nB)).cast("double")), 6)
    val p = (col("cb") + 1).cast("double") / (col("nb") + nB).cast("double")
    val q = (col("cc") + 1).cast("double") / (col("nc") + nB).cast("double")
    val termNano = floor((p - q) * lnr * lit(1000000000.0)).cast("long")
    joined.select(col("nb"), col("nc"), termNano.as("__t"))
      .groupBy("nb", "nc").agg(sum(col("__t")).as("__s"))
      .select(col("nb").as("n_base"), col("nc").as("n_current"),
        round(col("__s").cast("double") / lit(1000000000.0), 6).as("psi"))
      .withColumn("drifted", col("psi") > threshold)
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the NONPARAMETRIC drift
    * companion to [[psiReport]] (PSI needs buckets and smoothing; KS
    * compares the raw empirical CDFs and needs neither):
    * `D = max_v |F_a(v) − F_b(v)|`, here computed as the exact integer
    * `max |cum_a·n_b − cum_b·n_a|` over the merged value domain,
    * divided once at the end. The argmax value is reported (smallest
    * value on ties) — where the distributions pull apart.
    *
    * Shape at scale: both sides quantize to integer cents and collapse
    * to ONE distinct-value relation first (the decile-histogram
    * discipline), and the CDF prefix sums run as a distributed scan over
    * the value-ordered relation ([[graft.operators.Ranking
    * .withRunningSums]] — a global sort range-partitions in order; per-
    * partition offsets come from one bounded count pass), never through a
    * single-reducer window. Output: one row (n_a, n_b, d_stat, at_cents).
    */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String,
             scale: Long = 100L): DataFrame = {
    def cents(df: DataFrame, sideA: Long) = df
      .select(round(col(s"`$valueCol`") * scale, 0).cast("long").as("c"))
      .filter(col("c").isNotNull)
      .select(col("c"), lit(sideA).as("ca"), lit(1L - sideA).as("cb"))
    val merged = cents(a, 1L).unionByName(cents(b, 0L))
      .groupBy("c").agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val cum = graft.operators.Ranking
      .withRunningSums(merged.orderBy(col("c")), Seq("na", "nb"))
      .withColumnRenamed("cum_na", "cum_a")
      .withColumnRenamed("cum_nb", "cum_b")
    val tot = merged.agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .withColumn("__dev",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      .orderBy(col("__dev").desc, col("c"))
      .limit(1)
      .select(col("n_a"), col("n_b"),
        round(col("__dev").cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("d_stat"),
        col("c").as("at_cents"))
  }

  /** Benford first-digit conformance: the leading significant digit of
    * naturally-occurring amounts follows `P(d) = log10(1 + 1/d)` —
    * synthetic, capped, or manipulated columns deviate, making this a
    * one-pass data-forensics screen (which generated columns look
    * organic and which are uniform artifacts).
    *
    * The digit is taken from the DECIMAL STRING of the integer cent
    * value — no float log10 near power-of-ten boundaries — and the MAD
    * statistic (mean |observed − expected| share, Nigrini's measure)
    * sums |round-6| differences as exact integer micros. Nonpositive
    * values have no leading significant digit and are excluded (their
    * count is reported). Output: one row per digit 1..9
    * (digit, n, share, expected) + constant (mad, n_pos, n_nonpos).
    */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(s"`$valueCol`") * 100, 0).cast("long")
    val base = df.select(cents.as("c")).filter(col("c").isNotNull)
    val counts = base
      .select(when(col("c") > 0,
        substring(col("c").cast("string"), 1, 1).cast("long")).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n")) // null group = nonpositives
    val tot = counts.agg(
      sum(when(col("digit").isNotNull, col("n")).otherwise(0L)).as("__np"),
      sum(when(col("digit").isNull, col("n")).otherwise(0L)).as("__nn"))
    // all 9 digits, zero-filled — a missing digit is itself a signal
    val digits = base.sparkSession.range(1, 10).toDF("digit")
    val scored = digits
      .join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("share",
        round(col("n").cast("double") / col("__np").cast("double"), 6))
      .withColumn("expected",
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
      .withColumn("__du", abs(
        round(col("share") * 1000000, 0).cast("long") -
          round(col("expected") * 1000000, 0).cast("long")))
    val mad = scored.agg(sum(col("__du")).as("__madu"))
    scored.crossJoin(broadcast(mad))
      .select(col("digit"), col("n"), col("share"), col("expected"),
        round(col("__madu").cast("double") / 9000000.0, 6).as("mad"),
        col("__np").as("n_pos"), col("__nn").as("n_nonpos"))
  }
}
