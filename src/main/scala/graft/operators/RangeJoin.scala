package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — points matched to the intervals
  * containing them.
  *
  * The naive theta-join `lo <= p AND p <= hi` plans as a nested loop over
  * the cross product — O(n·m) at any scale. Bucketization restores an
  * equi-join: intervals explode into the coarse buckets they overlap,
  * points hash to their bucket, the join runs on the bucket key, and the
  * exact bound check filters the survivors. Shuffle volume tracks
  * CANDIDATES (pairs sharing a bucket), not the cross product; pick
  * `bucketWidth` near the typical interval width so each interval lands
  * in O(1) buckets.
  */
object RangeJoin {

  /** Join `points` (value column `pCol`) to `intervals` ([`loCol`,
    * `hiCol`], inclusive both ends). Output: every point row joined to
    * every containing interval row. Intervals wider than ~1000 buckets
    * are rejected — that is a mis-chosen width, not a working plan.
    */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(s"`$pCol`") / bucketWidth).cast("long"))
    val ib = intervals
      .withColumn("__blo", floor(col(s"`$loCol`") / bucketWidth).cast("long"))
      .withColumn("__bhi", floor(col(s"`$hiCol`") / bucketWidth).cast("long"))
      .withColumn("__span", col("__bhi") - col("__blo"))
    // a pathological interval would explode into the whole axis; an EMPTY
    // intervals side yields a NULL max (widest = 0 → empty join result,
    // like any other join)
    val widestRow = ib.agg(max(col("__span"))).first()
    val widest = if (widestRow.isNullAt(0)) 0L else widestRow.getLong(0)
    require(widest <= 1000,
      s"an interval spans $widest buckets; raise bucketWidth")
    val exploded = ib.withColumn("__bucket",
        explode(sequence(col("__blo"), col("__bhi"))))
      .drop("__blo", "__bhi", "__span")
    pb.join(exploded, "__bucket")
      .filter(col(s"`$pCol`") >= col(s"`$loCol`") &&
        col(s"`$pCol`") <= col(s"`$hiCol`"))
      .drop("__bucket")
  }
}
