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
}
