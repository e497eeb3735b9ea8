package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.SketchFunctions._

/** Incremental profile maintenance — the 100 TB append-only-lake path.
  *
  * The batch profiler re-scans a table to profile it; at scale a lake
  * grows by partitions and re-scanning 100 TB per day is not an option.
  * Every statistic the catalog needs is re-expressed here in a MERGEABLE
  * form, so the engine profiles ONLY new chunks (files, partitions, or a
  * stream's micro-batches) and folds them into the stored catalog:
  *
  *  - counts / null counts / decimal sums: add
  *  - min / max: fold
  *  - MinHash digests: slot-wise min (exact — sketch of a union IS the
  *    slot-min of the sketches)
  *  - distinct counts: HLL sketch union (`hll_sketch_agg`/`hll_union_agg`,
  *    Apache DataSketches under Spark). Register-level merge is the max —
  *    algebraically sound for any chunking — but DataSketches promotes
  *    small sketches between exact (coupon) and estimating (HLL) modes,
  *    so a merged estimate can differ from a single-pass estimate within
  *    the sketch's error bound (±1.6% at default lgK). `IncrementalSpec`
  *    pins that bound, and pins the MinHash digests EXACTLY equal.
  *
  * This component is pure Spark-first design; the reference (batch pandas
  * over ≤10 k rows/table) has no incremental story to port.
  */
object Incremental {

  // Same huge-value discipline as Profiler's decimal sums: a value past
  // the guard would make the ANSI decimal cast throw mid-aggregation
  // (and its square overflow the capped precision), so it is excluded
  // from the decimal accumulators per value. Columns whose range exceeds
  // the guard are detected from the mergeable abs_max and fall back to
  // the double sum in [[finalize]] — never a silently partial decimal
  // mean. 1e9 keeps the six-decimal squares ~1e14 chunk rows clear of
  // the Decimal(38) accumulator cap.
  private val DecimalGuard = 1e9
  private def dec(c: Column): Column =
    when(abs(c) < lit(DecimalGuard), c).otherwise(lit(null)).cast(DecimalType(30, 6))

  /** Mergeable per-column partial profile of one chunk. Input is any
    * slice of a table's rows; output one row per column.
    */
  def profileChunk(df: DataFrame, tableName: String): DataFrame = {
    val long = Profiler.longFormat(graft.sources.Lake.balance(df))
    long.groupBy(col("col_idx").cast("long").as("col_idx")).agg(
      count(lit(1)).as("rows"),
      (count(lit(1)) - count(col("value_str"))).as("num_nan"),
      hll_sketch_agg(col("value_str")).as("unique_hll"),
      minhash_agg(col("value_str")).as("minhash_exact"),
      min(col("value_num")).as("min_v"),
      max(col("value_num")).as("max_v"),
      max(abs(col("value_num"))).as("abs_max"),
      sum(col("value_num")).as("sum_d"),
      sum(dec(col("value_num"))).as("sum_dec"),
      sum(dec(col("value_num")) * dec(col("value_num"))).as("sum_sq_dec"))
      .withColumn("table_name", lit(tableName))
  }

  /** Exact fold of chunk profiles into one profile per (table, column).
    * Digest merge = slot-wise min over the group (associative +
    * commutative, so chunks can arrive in any order, any grouping).
    */
  def merge(chunks: DataFrame): DataFrame = {
    val slotMin = aggregate(
      collect_list(col("minhash_exact")),
      array_repeat(lit(Long.MaxValue), graft.core.MinHash.NumPerm),
      (acc, d) => zip_with(acc, d, (a, b) => least(a, b)))
    chunks.groupBy(col("table_name"), col("col_idx")).agg(
      sum(col("rows")).as("rows"),
      sum(col("num_nan")).as("num_nan"),
      hll_union_agg(col("unique_hll")).as("unique_hll"),
      slotMin.as("minhash_exact"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"),
      max(col("abs_max")).as("abs_max"),
      sum(col("sum_d")).as("sum_d"),
      sum(col("sum_dec")).as("sum_dec"),
      sum(col("sum_sq_dec")).as("sum_sq_dec"))
  }

  /** Readable view: HLL estimates + derived mean over the merged state.
    * In-range columns take the exact decimal mean; columns whose values
    * exceeded [[DecimalGuard]] take the double sum (the decimal sum is
    * partial there by construction). */
  def finalize(profile: DataFrame): DataFrame =
    profile
      .withColumn("unique_est", hll_sketch_estimate(col("unique_hll")))
      .withColumn("mean",
        when(col("rows") - col("num_nan") > 0,
          when(col("abs_max") >= DecimalGuard,
            col("sum_d") / (col("rows") - col("num_nan")))
            .otherwise((col("sum_dec") / (col("rows") - col("num_nan"))).cast("double"))))
      .drop("unique_hll")
}
