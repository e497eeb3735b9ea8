package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions.md5_low32

/** HyperLogLog distinct-count sketch, fully relational: the sketch IS a
  * (group..., reg, rho) DataFrame of at most `2^p` register rows per
  * group. Public algorithm (Flajolet et al. 2007). Completes the
  * engine's mergeable-sketch family — MinHash (set similarity),
  * [[QuantileSketch]] (ranks), [[CountMin]] (frequencies), Bloom
  * (membership), HLL (cardinality) — all additive, all streamable as
  * plain aggregations, all oracle-replayable.
  *
  * Replayability is the design driver (Spark's own
  * `approx_count_distinct` HLL++ is not reproducible outside the JVM):
  *  - register index = low p bits of [[md5_low32]]; rank rho from the
  *    remaining 32-p bits via `length(bin(w))` — exact string-length msb,
  *    the same trick [[QuantileSketch]] pins its octaves with;
  *  - the harmonic sum Σ 2^-rho is computed in EXACT integer space
  *    (terms scaled by 2^33 are integers, rho ≤ 33), so no
  *    floating-summation order can split Spark from the oracle;
  *  - the final estimate is one fixed-shape double expression both
  *    engines evaluate identically.
  */
object Hll {

  final case class HllSpec(p: Int = 8) {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    def m: Int = 1 << p
    /** Standard bias constant for m >= 128. */
    def alpha: Double = 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-group registers: (groupCols..., reg, rho) with rho = max rank
    * seen in that register. One groupBy, output bounded by groups × 2^p.
    */
  def registers(df: DataFrame, valueCol: String, spec: HllSpec = HllSpec(),
                groupCols: Seq[String] = Nil): DataFrame =
    df.select((groupCols.map(col) :+ md5_low32(col(valueCol)).as("__h")): _*)
      .withColumn("__w", shiftright(col("__h"), spec.p))
      .withColumn("reg", col("__h").bitwiseAND(lit((spec.m - 1).toLong)))
      // __w has 32-p bits; rho = leading-zeros(__w) + 1 within that width
      .withColumn("rho", when(col("__w") === 0, lit(33 - spec.p))
        .otherwise(lit(33 - spec.p) - length(expr("bin(__w)"))))
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).cast("int").as("rho"))

  /** Sketches merge by register max (union + re-groupBy). */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    a.unionByName(b).groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** Cardinality estimate per group: the classic raw estimate with the
    * small-range (linear counting) correction. `hll_estimate` is rounded
    * to 4 dp. Untouched registers are accounted as rho = 0 via the
    * register count — the sketch never stores them.
    */
  def estimate(regs: DataFrame, spec: HllSpec = HllSpec(),
               groupCols: Seq[String] = Nil): DataFrame = {
    val m = spec.m
    val scale = 1L << 33
    val agg = regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_regs"),
      sum(call_function("shiftleft", lit(1L), lit(33) - col("rho"))).as("s_touched"))
    val v = lit(m.toLong) - col("n_regs") // zero registers
    val s = col("s_touched") + v * lit(scale) // exact integer harmonic sum
    val raw = lit(spec.alpha * m.toDouble * m.toDouble * scale.toDouble) / s.cast("double")
    val est = when(raw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double"))).otherwise(raw)
    agg.withColumn("hll_estimate", round(est, 4))
      .select((groupCols.map(col) :+ col("hll_estimate")): _*)
  }
}
