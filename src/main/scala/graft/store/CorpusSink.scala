package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus sink — the output side of the pipeline. A 100 TB run
  * ends by WRITING a curated corpus, and the write has to be as
  * disciplined as the reads: hive-partitioned layout (consumers prune by
  * partition), deterministic shard assignment (re-running the job
  * produces byte-stable shard membership — `DataFrame.repartition`'s
  * round-robin does not survive a re-run, a salted id hash does), rows
  * sorted within each shard (stable file bytes, better encodings), and a
  * row-count/checksum manifest written FROM THE SAME DATAFRAME so any
  * loss between transform and sink is detectable by reconciliation.
  *
  * Layout: `dir/<part>=<v>/shard=<k>/part-….parquet` plus
  * `dir/_manifest/` (parquet: partition values, shard, n_rows,
  * id_checksum). Shard of a row = `md5_low32(id:salt) % nShards` — the
  * same engine-replayable hash family the sampling operators use.
  *
  * Scale: one repartition on (partitions…, shard) gives every writer
  * task exactly one output file (no tiny-file explosion, no 10k-file
  * tasks); nShards is the lever that sizes files toward the ~1 GB
  * sweet spot. The manifest is one extra aggregation over ids only.
  */
object CorpusSink {

  val ShardCol = "shard"

  private def shardOf(idCol: String, nShards: Int, salt: String) =
    pmod(graft.functions.SketchFunctions.md5_low32(
      concat_ws(":", col(s"`$idCol`").cast("string"), lit(salt))), lit(nShards))

  /** Data-file formats the sink writes. Parquet is the default
    * interchange; ORC is the drop-in columnar alternative (both are
    * Spark-native — predicate pushdown, column pruning, and the
    * partition layout behave identically). The `_manifest` is always
    * parquet: it is the sink's own metadata, not corpus data.
    */
  val Formats: Set[String] = Set("parquet", "orc")

  /** Write `df` under `dir`, returning nothing; read the manifest back
    * with [[manifest]] or reconcile with [[reconcile]]. */
  def write(df: DataFrame, dir: String, partitionCols: Seq[String],
            idCol: String, nShards: Int, salt: String = "corpus0",
            format: String = "parquet"): Unit = {
    require(nShards >= 1, "nShards must be >= 1")
    require(Formats.contains(format), s"unsupported sink format: $format")
    val keyed = df.withColumn(ShardCol, shardOf(idCol, nShards, salt))
    val partCols = partitionCols :+ ShardCol
    keyed
      .repartition(partCols.map(c => col(s"`$c`")): _*)
      .sortWithinPartitions(col(s"`$idCol`"))
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .format(format).save(dir)
    keyed.groupBy(partCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(s"`$idCol`").cast("long")).as("id_checksum"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")
  }

  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_manifest")

  /** Reconcile the written files against the manifest: recompute per-
    * (partition, shard) counts/checksums from the data files and FULL-
    * OUTER-join the manifest — any missing shard, extra shard, or
    * count/checksum drift surfaces as a row with `ok = false`.
    */
  def reconcile(spark: SparkSession, dir: String, partitionCols: Seq[String],
                idCol: String, format: String = "parquet"): DataFrame = {
    require(Formats.contains(format), s"unsupported sink format: $format")
    val partCols = partitionCols :+ ShardCol
    val actual = spark.read.format(format).load(dir)
      .groupBy(partCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("rows_read"),
        sum(col(s"`$idCol`").cast("long")).as("checksum_read"))
    manifest(spark, dir)
      .withColumnRenamed("n_rows", "rows_manifest")
      .withColumnRenamed("id_checksum", "checksum_manifest")
      .join(actual, partCols, "full_outer")
      .withColumn("ok",
        col("rows_read") === col("rows_manifest") &&
          col("checksum_read") === col("checksum_manifest"))
  }
}
