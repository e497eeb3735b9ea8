package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk audit for training-data releases — the
  * privacy companion to [[TextAnalysis]]'s PII scrub: scrubbing removes
  * direct identifiers, but a row can still be singled out by its
  * COMBINATION of quasi-identifiers (Sweeney's k-anonymity, and
  * Machanavajjhala's l-diversity for the sensitive attribute within an
  * equivalence class).
  *
  * Scale shape: one hash aggregate over the quasi-identifier key
  * (map-side combine collapses to distinct classes per partition), then
  * one tiny aggregate over the class relation — no windows, no driver
  * state. At 100 TB the class relation is bounded by the quasi-ID
  * domain, not row count.
  */
object Privacy {

  /** One row per equivalence class: its size and the number of DISTINCT
    * sensitive values inside it (the l in l-diversity). `count_distinct`
    * is exact here by design — the class relation is the grouped result,
    * so the Expand doubling rides the already-collapsed classes, not raw
    * rows.
    */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String],
                         sensitiveCol: String): DataFrame =
    df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(s"`$sensitiveCol`")).as("l_diversity"))

  /** The release-gate summary: how exposed is this table if published
    * with `quasiCols` intact?
    *
    * Output (one row): n_rows, n_classes, k_anonymity (the minimum class
    * size — the table's actual k), n_singletons (classes of size 1:
    * unique individuals), rows_below_k and share_below_k (population in
    * classes smaller than `k`), and min_l_diversity (the weakest class's
    * sensitive-value diversity — 1 means an attacker who locates the
    * class learns the sensitive value outright).
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, k: Long): DataFrame =
    equivalenceClasses(df, quasiCols, sensitiveCol)
      .agg(
        sum(col("class_size")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_anonymity"),
        sum(when(col("class_size") === 1, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_below_k"),
        min(col("l_diversity")).as("min_l_diversity"))
      .select(col("n_rows"), col("n_classes"), col("k_anonymity"),
        col("n_singletons"), col("rows_below_k"),
        round(col("rows_below_k").cast("double") / col("n_rows").cast("double"), 6)
          .as("share_below_k"),
        col("min_l_diversity"))
      .withColumn("k", lit(k))
}
