package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the LATEST right row with
  * `right.ts <= left.ts` within the same key (event-stream enrichment,
  * point-in-time feature lookup).
  *
  * Spark has no native as-of join; the equi+range composition Catalyst
  * would pick for `r.ts <= l.ts` is a per-key range EXPLOSION (every left
  * row joins every earlier right row, then a max filters the pile). The
  * scalable shape is the tagged-union window: union both sides, sort each
  * key's timeline once, carry the last-seen right payload forward. ONE
  * shuffle on the key, O(n log n) per key, no intermediate blow-up —
  * exactly what a 100 TB event table needs.
  */
object AsOf {

  /** `left` enriched with `payloadCols` from the as-of-matching `right`
    * row (null when no right row precedes). Ties on `tsCol` count as
    * matches (<=). `right` should be unique per (key, ts) — pre-aggregate
    * if not, or ties resolve by latest row order.
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort BEFORE left rows at equal ts, so <= semantics
    val l = left.withColumn("__tag", lit(1))
    val r = right.select((keyCols :+ tsCol).map(c => col(s"`$c`")) ++
        payloadCols.map(c => col(s"`$c`").as(s"__p_$c")): _*)
      .withColumn("__tag", lit(0))
    // Row PRESENCE, not payload nullness, drives the carry: all payloads
    // ride in one struct that is non-null exactly for right rows, so a
    // matched right row whose payload value is legitimately NULL yields
    // NULL (DuckDB/pandas ASOF semantics) instead of an older row's value.
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__pstruct", when(col("__tag") === 0,
        struct(payloadCols.map(c => col(s"`__p_$c`").as(c)): _*)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__last",
      last(col("__pstruct"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"`$c`")) ++
        payloadCols.map(c => col("__last").getField(c).as(s"asof_$c")): _*)
  }
}
