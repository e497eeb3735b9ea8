package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q1 pooling — the relational half of embedding extraction
  * (`/root/reference/extract_embeddings.py:16-73`): token-state vectors are
  * mean-pooled per column (tokens between SEPs) and per table (all
  * non-special tokens). Model inference itself stays out-of-engine; this
  * operator pools ANY (group, vector) relation: posexplode to (slot, value)
  * then per-slot averages re-assembled in slot order.
  */
object Pooling {

  /** Mean-pool `vecCol` (array<float|double>) per group. Output: groupCols
    * + `pooled` array column. Scales as one partial-aggregated shuffle of
    * (group, slot) cells.
    */
  def meanPool(df: DataFrame, groupCols: Seq[String], vecCol: String): DataFrame = {
    val keyCols = groupCols.map(col)
    df.select(keyCols :+ posexplode(col(vecCol)).as(Seq("slot", "v")): _*)
      .groupBy(keyCols :+ col("slot"): _*)
      .agg(avg(col("v")).as("slot_mean"))
      .groupBy(keyCols: _*)
      .agg(array_sort(collect_list(struct(col("slot"), col("slot_mean"))))
        .getField("slot_mean").as("pooled"))
  }

  /** L2-normalize an array column (Q2 index prep: cosine = dot of unit
    * vectors, `embedding_search.py:99-111`). */
  def l2Normalize(vec: Column): Column = {
    val nrm = sqrt(aggregate(vec, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
    transform(vec, x => when(nrm === 0, lit(0.0)).otherwise(x.cast("double") / nrm))
  }
}
