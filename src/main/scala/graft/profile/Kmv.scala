package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions.md5_low32

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
  * theta-sketch set algebra follows Beyer et al., SIGMOD 2007): the
  * sketch IS a (group..., hv) DataFrame holding the `k` smallest
  * DISTINCT 32-bit hash values per group. Complements [[Hll]] in the
  * engine's mergeable-sketch family — HLL answers "how many distinct",
  * KMV additionally supports SET ALGEBRA across sketches (union /
  * intersection / Jaccard estimates) because the retained hash values
  * can be compared across sketches, which registers cannot.
  *
  * Everything up to the final estimate is exact-integer (hash values
  * and counts), so merge and oracle replay are bit-deterministic; the
  * estimate `(k-1) * 2^32 / kth_min` is one fixed-shape double
  * expression both engines evaluate identically.
  *
  * Scale posture: the hash projection keeps only (group, hv); the
  * distinct is one shuffle on that pair; the k-smallest filter is a
  * window PARTITIONED by group (never global). For a single group with
  * ~1e9+ distinct values, pre-filter `hv <= c * k * 2^32 / n_est` (an
  * [[Hll]] estimate) before the window so the sorted set stays tiny —
  * the filter is lossless whenever it keeps >= k survivors, which the
  * caller can verify relationally from the sketch row count.
  */
object Kmv {

  final case class KmvSpec(k: Int = 256) {
    require(k >= 16, s"k must be >= 16, got $k")
    /** Hash-space size: md5_low32 is uniform in [0, 2^32). */
    def space: Double = 4294967296.0
  }

  /** Build per-group sketches: (groupCols..., hv), the k smallest
    * distinct hashes, at most `k` rows per group.
    */
  def sketch(df: DataFrame, valueCol: String, spec: KmvSpec = KmvSpec(),
             groupCols: Seq[String] = Nil): DataFrame = {
    val hashed = df
      .select((groupCols.map(col) :+ md5_low32(col(valueCol)).as("hv")): _*)
      .distinct()
    kSmallest(hashed, spec, groupCols)
  }

  /** k smallest hashes per group. Ungrouped: `orderBy.limit` →
    * TakeOrdered, a distributed partial top-k with no global window.
    * Grouped: a window PARTITIONED by the group columns.
    */
  private def kSmallest(hashed: DataFrame, spec: KmvSpec,
                        groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) hashed.orderBy(col("hv")).limit(spec.k)
    else {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hv"))
      hashed.withColumn("__pos", row_number().over(w))
        .filter(col("__pos") <= spec.k).drop("__pos")
    }

  /** Sketches merge by hash union + re-take k smallest — the merge of
    * sketches equals the sketch of the unioned inputs (checked in
    * KmvSpec's merge-invariance test).
    */
  def merge(a: DataFrame, b: DataFrame, spec: KmvSpec = KmvSpec(),
            groupCols: Seq[String] = Nil): DataFrame =
    kSmallest(a.unionByName(b).distinct(), spec, groupCols)

  /** Distinct-count estimate per group. A sketch with fewer than k
    * retained hashes saw its whole input: the count IS exact. Otherwise
    * the classic unbiased estimator (k-1) * space / kth_min.
    */
  def estimate(sk: DataFrame, spec: KmvSpec = KmvSpec(),
               groupCols: Seq[String] = Nil): DataFrame = {
    val agg = sk.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_kept"),
      max(col("hv")).as("kth"))
    val est = when(col("n_kept") < spec.k, col("n_kept").cast("double"))
      .otherwise(lit((spec.k - 1).toDouble * spec.space) /
        (col("kth").cast("double") + lit(1.0)))
    agg.withColumn("kmv_estimate", round(est, 4))
      .select((groupCols.map(col) :+ col("kmv_estimate")): _*)
  }

  /** Set-algebra estimates between every pair of groups (a < b) of one
    * sketch relation: union, intersection, and Jaccard. Combined sketch
    * L = k smallest of hv(A) ∪ hv(B); with K∩ = |L ∩ A ∩ B|,
    * jaccard ≈ K∩ / |L|, union ≈ (|L|-1) * space / L_kth,
    * intersection ≈ jaccard * union (Beyer et al. 2007). Pure
    * relational: one self-join keyed on hv, windows partitioned by the
    * (a, b) pair — |L| <= k rows per pair throughout.
    */
  def setEstimates(sk: DataFrame, groupCol: String,
                   spec: KmvSpec = KmvSpec()): DataFrame = {
    val a = sk.select(col(groupCol).as("ga"), col("hv"))
    val b = sk.select(col(groupCol).as("gb"), col("hv").as("hv_b"))
    // All (pair, hv) rows with membership flags; full outer on hv per pair
    // via union of the two sides then per-(pair, hv) aggregation.
    val pairs = sk.select(col(groupCol).as("ga")).distinct()
      .crossJoin(sk.select(col(groupCol).as("gb")).distinct())
      .filter(col("ga") < col("gb"))
    val sideA = pairs.join(a, "ga").select(col("ga"), col("gb"), col("hv"),
      lit(1).as("in_a"), lit(0).as("in_b"))
    val sideB = pairs.join(b.withColumnRenamed("hv_b", "hv"), "gb")
      .select(col("ga"), col("gb"), col("hv"), lit(0).as("in_a"), lit(1).as("in_b"))
    val members = sideA.unionByName(sideB)
      .groupBy("ga", "gb", "hv")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("hv"))
    val combined = members.withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= spec.k)
    val agg = combined.groupBy("ga", "gb").agg(
      count(lit(1)).as("n_l"),
      max(col("hv")).as("lth"),
      sum((col("in_a") * col("in_b")).cast("long")).as("n_both"))
    val unionEst = when(col("n_l") < spec.k, col("n_l").cast("double"))
      .otherwise(lit((spec.k - 1).toDouble * spec.space) /
        (col("lth").cast("double") + lit(1.0)))
    val jac = col("n_both").cast("double") / col("n_l").cast("double")
    agg
      .withColumn("union_est", round(unionEst, 4))
      .withColumn("jaccard_est", round(jac, 6))
      .withColumn("intersect_est", round(jac * unionEst, 4))
      .select(col("ga"), col("gb"), col("union_est"), col("intersect_est"),
        col("jaccard_est"))
  }
}
