package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Window-free global position assignment for ALREADY-SORTED relations.
  *
  * `row_number().over(Window.orderBy(...))` with no partition funnels the
  * whole input through one partition (and Spark logs a scale warning for
  * it) — the wrong plan even when the input is a k-row top-k, because the
  * warning is indistinguishable from a real full-table funnel in a log
  * audit. This helper instead rides the input's EXISTING global order
  * (a global `orderBy` range-partitions in order; `orderBy(...).limit(k)`
  * plans as TakeOrderedAndProject and yields one sorted partition) and
  * assigns contiguous 1-based positions via RDD `zipWithIndex` — per-
  * partition offsets from one extra count job, no data movement, no
  * single-partition sort.
  *
  * The caller must pass a relation whose current order IS the ranking
  * order, with a total (tie-broken) sort key, or positions are
  * ill-defined.
  */
object Ranking {

  /** Append `posCol` = 1-based global position in the input's current
    * sort order. */
  def withPosition(df: DataFrame, posCol: String): DataFrame = {
    val schema = df.schema.add(posCol, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Append `cum_<c>` = inclusive running sum of each LONG column `c` in
    * the input's current (global) sort order — the distributed scan that
    * replaces `sum(..).over(Window.orderBy(..))`, whose empty partition
    * spec funnels the whole relation through ONE reducer. Two passes over
    * the input (like `zipWithIndex`): pass 1 collects per-partition
    * totals (bounded by partition count, not rows), pass 2 adds each
    * partition's exclusive offset while streaming. Null cells count as 0
    * and stay null-summed (`cum` still advances past them by 0).
    */
  def withRunningSums(df: DataFrame, sumCols: Seq[String]): DataFrame = {
    val idxs = sumCols.map(df.schema.fieldIndex).toArray
    val schema = sumCols.foldLeft(df.schema)((s, c) =>
      s.add(s"cum_$c", LongType, nullable = false))
    val rdd0 = df.rdd
    val partials = rdd0.mapPartitionsWithIndex { case (pi, it) =>
      val sums = Array.fill(idxs.length)(0L)
      it.foreach { r =>
        var j = 0
        while (j < idxs.length) {
          if (!r.isNullAt(idxs(j))) sums(j) += r.getLong(idxs(j)); j += 1
        }
      }
      Iterator((pi, sums))
    }.collect().sortBy(_._1).map(_._2)
    // exclusive prefix offsets per partition
    val offsets = partials.scanLeft(Array.fill(idxs.length)(0L)) { (acc, p) =>
      acc.zip(p).map { case (a, b) => a + b }
    }
    val rdd = rdd0.mapPartitionsWithIndex { case (pi, it) =>
      val cur = offsets(pi).clone()
      it.map { r =>
        var j = 0
        while (j < idxs.length) {
          if (!r.isNullAt(idxs(j))) cur(j) += r.getLong(idxs(j)); j += 1
        }
        Row.fromSeq(r.toSeq ++ cur.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
