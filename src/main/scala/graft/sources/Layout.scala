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

  /** Small-file COMPACTION PLAN — the table-maintenance primitive that
    * keeps a 100 TB lake scannable: a partition fragmented into
    * thousands of sub-target files turns every scan into a scheduling
    * storm and starves parquet row-group pruning. Given a file listing
    * (partition key, file id, bytes), files at/above `keepBytes` are
    * left alone (bin −1); smaller ones pack NEXT-FIT-DECREASING
    * (bytes desc, id asc — deterministic total order) into rewrite
    * groups of ≤ `targetBytes`.
    *
    * Why next-fit, not first-fit: the running state is one (bin,
    * remaining) pair, so the exact plan is replayable by any engine
    * with a linear recursion (the packSequences oracle discipline) —
    * first-fit's open-bin list is not. NFD wastes at most one target of
    * slack per bin versus FFD, irrelevant against rewrite IO.
    *
    * Scale shape: one `groupByKey(partition)` — plans for different
    * partitions build in parallel, each a bounded sequential fold over
    * that partition's file list (file counts per partition are
    * scheduler-bounded long before they stress one task).
    * Output: (part, bin, file_id, bytes); bin −1 = keep as-is.
    */
  def compactionPlan(files: DataFrame, partCol: String, idCol: String,
                     bytesCol: String, targetBytes: Long,
                     keepBytes: Long): DataFrame = {
    require(targetBytes > 0 && keepBytes > 0,
      s"need positive target/keep bytes, got $targetBytes/$keepBytes")
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(s"`$partCol`").cast("string"),
        col(s"`$idCol`").cast("long"), col(s"`$bytesCol`").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (p, it) =>
        val all = it.toArray
        val (keep, small) = all.partition(_._3 >= keepBytes)
        val kept = keep.sortBy(_._2).map { case (_, id, b) => (p, -1L, id, b) }
        var bin = -1L
        var rem = 0L
        val packed = small.sortBy(f => (-f._3, f._2)).map { case (_, id, b) =>
          if (bin < 0 || b > rem) { bin += 1; rem = math.max(0L, targetBytes - b) }
          else rem -= b
          (p, bin, id, b)
        }
        (kept ++ packed).iterator
      }
      .toDF("part", "bin", "file_id", "bytes")
  }
}
