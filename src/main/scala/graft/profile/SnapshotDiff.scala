package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema + profile drift between two snapshots of "the same" table —
  * the lake-management complement to `Dedup.corpusDiff` (which diffs
  * CONTENT): what a pipeline owner reads after an upstream change to see
  * whether columns appeared, vanished, changed type, or silently shifted
  * distribution.
  *
  * Reuses [[Profiler.profile]] (sketch-free, quantile-free — the cheap
  * A1/A2/A10 path) as the per-side stats engine, so "distinct" and
  * "null" here mean exactly what they mean everywhere else in the
  * engine (P2 empty→null for strings, null group counted in unique).
  * Each side collapses to one row per column before the full-outer
  * join, so the join is over two |columns|-sized relations — free at
  * any data scale.
  */
object SnapshotDiff {

  /** Column-level diff of snapshot `a` vs snapshot `b`. Output, one row
    * per column name seen on either side, ordered by name:
    * (col_name, status ∈ {added, removed, type_changed, changed,
    * unchanged}, type_a, type_b, rows_a, nulls_a, uniq_a, rows_b,
    * nulls_b, uniq_b) — `added` means present only in `b` (the newer
    * snapshot), `removed` only in `a`.
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      Profiler.profile(df, tag, withSketches = false, withQuantiles = false)
        .select(col("col_name"), col("col_type").as(s"type_$tag"),
          col("rows").as(s"rows_$tag"), col("num_nan").as(s"nulls_$tag"),
          col("unique").as(s"uniq_$tag"))
    side(a, "a").join(side(b, "b"), Seq("col_name"), "full_outer")
      .withColumn("status",
        when(col("type_a").isNull, lit("added"))
          .when(col("type_b").isNull, lit("removed"))
          .when(col("type_a") =!= col("type_b"), lit("type_changed"))
          .when(col("rows_a") =!= col("rows_b") ||
            col("nulls_a") =!= col("nulls_b") ||
            col("uniq_a") =!= col("uniq_b"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select("col_name", "status", "type_a", "type_b",
        "rows_a", "nulls_a", "uniq_a", "rows_b", "nulls_b", "uniq_b")
      .orderBy("col_name")
  }
}
