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

  /** Interval-overlap join: every left interval [`lLo`,`lHi`] paired with
    * every right interval [`rLo`,`rHi`] it intersects (inclusive ends:
    * overlap ⇔ lLo ≤ rHi ∧ rLo ≤ lHi). Column names must be disjoint
    * across the two sides.
    *
    * Same bucketization as [[pointInInterval]] — both sides explode into
    * the coarse buckets they cover and equi-join on the bucket key — plus
    * the standard dedup trick: a pair sharing several buckets is emitted
    * ONLY from the bucket containing max(lLo, rLo) (the left edge of the
    * intersection), so no distinct/shuffle is needed to de-duplicate.
    * Both interval sides must respect the 1000-bucket width guard.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def explodeBuckets(df: DataFrame, lo: String, hi: String): DataFrame = {
      val b = df
        .withColumn("__blo", floor(col(s"`$lo`") / bucketWidth).cast("long"))
        .withColumn("__bhi", floor(col(s"`$hi`") / bucketWidth).cast("long"))
      val widestRow = b.agg(max(col("__bhi") - col("__blo"))).first()
      val widest = if (widestRow.isNullAt(0)) 0L else widestRow.getLong(0)
      require(widest <= 1000,
        s"an interval spans $widest buckets; raise bucketWidth")
      b.withColumn("__bucket", explode(sequence(col("__blo"), col("__bhi"))))
        .drop("__blo", "__bhi")
    }
    val l = explodeBuckets(left, lLo, lHi)
    val r = explodeBuckets(right, rLo, rHi)
    l.join(r, "__bucket")
      .filter(col(s"`$lLo`") <= col(s"`$rHi`") &&
        col(s"`$rLo`") <= col(s"`$lHi`"))
      // emit each overlapping pair exactly once: from the bucket holding
      // the intersection's left edge
      .filter(col("__bucket") ===
        floor(greatest(col(s"`$lLo`"), col(s"`$rLo`")) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
