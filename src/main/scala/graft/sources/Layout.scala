package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering.
  *
  * Bucketing co-locates ONE key; a lake query that filters two or more
  * dimensions (date × region, key × score band) still scans everything
  * ordered by either key alone. Writing files clustered by the
  * interleaved Z-value gives every file a compact hyper-rectangle of the
  * key space, so parquet min/max stats prune multi-dim box queries —
  * the standard lakehouse layout technique (public precedents: the
  * Morton curve literature and open lakehouse formats' OPTIMIZE ZORDER).
  *
  * Everything is exact integer arithmetic (micro quantization → integer
  * min/max scaling → bit interleave), deterministic across engines and
  * partitionings.
  */
object Layout {

  /** Interleave the low `bitsPerDim` bits of each (already-scaled)
    * dimension: bit j of dimension i lands at position j·k + i. Pure
    * shifts/masks — codegen'd, replayable.
    */
  def zValue(dims: Seq[Column], bitsPerDim: Int): Column = {
    val k = dims.length
    require(k >= 1 && k * bitsPerDim <= 62, s"z-value needs k*bits <= 62, got $k*$bitsPerDim")
    val terms = for {
      (d, i) <- dims.zipWithIndex
      j <- 0 until bitsPerDim
    } yield shiftleft(shiftright(d, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** Scale micro-quantized BIGINT dims to [0, 2^bits) by per-dim min/max
    * (equal-width in micro space; exact integer division). Adds
    * `__z` and drops nothing else. Rows with a NULL dim get z = -1
    * (cluster together at the front).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bitsPerDim: Int = 8): DataFrame = {
    val withQ = cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      acc.withColumn(s"__q$i", floor(col(c).cast("double") * lit(1e6)).cast("long"))
    }
    val aggs = cols.indices.flatMap(i =>
      Seq(min(col(s"__q$i")).as(s"__mn$i"), max(col(s"__q$i")).as(s"__mx$i")))
    val bounds = withQ.agg(aggs.head, aggs.tail: _*)
    val top = (1L << bitsPerDim) - 1
    val scaled = cols.indices.map { i =>
      when(col(s"__mx$i") === col(s"__mn$i"), lit(0L))
        .otherwise(expr(s"((__q$i - __mn$i) * $top) div (__mx$i - __mn$i)"))
    }
    val anyNull = cols.map(col(_).isNull).reduce(_ || _)
    withQ.crossJoin(broadcast(bounds))
      .withColumn("__z", when(anyNull, lit(-1L)).otherwise(zValue(scaled, bitsPerDim)))
      .drop(cols.indices.flatMap(i => Seq(s"__q$i", s"__mn$i", s"__mx$i")): _*)
  }

  /** Z-order clustered write: range-partition on the z-value (so file n
    * holds a contiguous z-range = a compact box of the key space), sort
    * within partitions, write parquet. Subsequent scans filtering any
    * subset of `cols` prune files via parquet min/max stats.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  nFiles: Int = 64, bitsPerDim: Int = 8): Unit =
    withZValue(df, cols, bitsPerDim)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
