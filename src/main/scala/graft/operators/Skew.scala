package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware joins (SURVEY §4 scale tactics).
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the static fallback for the worst case — a handful of hot keys (the
  * empty string, a default id, a null-like sentinel) that concentrate a
  * large fraction of a 100 TB fact table on one reducer.
  *
  * `saltedJoin` spreads each hot left-side key over `factor` synthetic
  * sub-keys and replicates the matching right-side rows once per sub-key:
  * the hot key's rows land on `factor` reducers instead of one, at the
  * cost of `factor`× duplication of the (small) right side. Results are
  * row-identical to the plain join (`SkewSpec` asserts it).
  */
object Skew {

  /** Equi-join `left.key = right.key` with the left side's load spread
    * over `factor` salt buckets. Use when `right` is too large to
    * broadcast outright but hot keys overload single reducers; for a
    * broadcastable right side, `broadcast()` already avoids the shuffle.
    *
    * Left-preserving join types only: the right side is pre-exploded over
    * all `factor` salts, so right/full outer would emit each unmatched
    * right row `factor` times.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val leftPreserving = Set("inner", "cross", "left", "left_outer",
      "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti",
      "anti")
    require(leftPreserving.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    // uniform spread via monotonically increasing id (pmod keeps it in
    // [0, factor)); the row→salt assignment is partitioning-dependent and
    // NOT stable across runs — only the join RESULT is deterministic,
    // since every salt matches the same replicated right rows
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"), joinType)
      .drop(r(key)).drop("__salt")
  }

  /** Top-N key frequencies — the diagnostic to decide whether salting is
    * needed and with what factor (hot-key share ≈ factor needed).
    *
    * ONE action: the total is a 1-row aggregate of the grouped relation
    * broadcast-joined back in (exchange reuse — no second scan of the
    * input), not a separate eager `df.count()` job. A global window sum
    * would also work but forces every distinct key onto one task.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val grouped = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = grouped.agg(sum(col("n")).cast("double").as("__total"))
    grouped.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .drop("__total")
      // key tie-break: count ties at the cut would otherwise make the
      // kept SET run-dependent (limit under a non-total order)
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
