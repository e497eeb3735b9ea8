package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions.md5_low32

/** Count-Min frequency sketch, kept fully relational: the sketch IS a
  * (cms_row, cms_col, cnt) DataFrame of at most `depth × width` rows.
  * Public algorithm (Cormode & Muthukrishnan 2005); companion to
  * [[QuantileSketch]] (rank stats) and the HLL distincts in
  * [[Incremental]] — this one answers "how often does value X occur in a
  * corpus too large to keep exact counts for".
  *
  * Why relational: cells are additive, so building is one groupBy,
  * merging two sketches (or folding a new batch into a stored one) is
  * union + re-groupBy, and Structured Streaming gets the same sketch
  * from a plain Complete-mode aggregation — no custom state store, no
  * UDAF. Point estimates (`min` over the depth cells) overcount but
  * never undercount; the over-estimate is bounded by the classic
  * 2n/width at 1−(1/2)^depth confidence.
  *
  * Replayability: cell coordinates are salted [[md5_low32]] draws
  * (DuckDB: `md5_number_lower(v || ':cms' || i) & 4294967295 % width`),
  * counts are exact integers — the oracle rebuilds the sketch and every
  * estimate bit-for-bit.
  */
object CountMin {

  final case class CmsSpec(depth: Int = 3, width: Int = 1024) {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
  }

  private def cells(v: Column, spec: CmsSpec): Column =
    array((0 until spec.depth).map { i =>
      struct(lit(i).as("cms_row"),
        (md5_low32(concat(v.cast("string"), lit(s":cms$i"))) % spec.width).as("cms_col"))
    }: _*)

  /** Build the sketch over `valueCol`: one explode to `depth` cells per
    * occurrence, one groupBy — the only shuffle, bounded by
    * `depth × width` output rows however large the input.
    */
  def build(df: DataFrame, valueCol: String, spec: CmsSpec = CmsSpec()): DataFrame =
    df.select(explode(cells(col(valueCol), spec)).as("rc"))
      .groupBy(col("rc.cms_row").as("cms_row"), col("rc.cms_col").as("cms_col"))
      .agg(count(lit(1)).as("cnt"))

  /** Sketches are additive: merging is union + re-sum. Folding a new
    * batch into a stored sketch is `merge(stored, build(batch, ...))`.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("cms_row", "cms_col").agg(sum("cnt").as("cnt"))

  /** Point estimates for `values`: min over the depth cells; a missing
    * cell means the value was never seen (estimate 0). The sketch side
    * is at most `depth × width` rows, so Catalyst broadcasts it and the
    * lookup never shuffles the probe side.
    */
  def estimate(cms: DataFrame, values: DataFrame, valueCol: String,
               spec: CmsSpec = CmsSpec()): DataFrame =
    values.select(col(valueCol), explode(cells(col(valueCol), spec)).as("rc"))
      .select(col(valueCol), col("rc.cms_row").as("cms_row"), col("rc.cms_col").as("cms_col"))
      .join(cms, Seq("cms_row", "cms_col"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(valueCol).agg(min(col("cnt")).as("est_n"))
}
