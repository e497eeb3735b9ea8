package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, Metadata}

/** Lake table reader.
  *
  * Spark 4 rejects parquet TIMESTAMP(NANOS) columns outright
  * (PARQUET_TYPE_ILLEGAL); the driver's `events` table carries one. We read
  * nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and convert
  * to a micros TimestampType column — the same ns→us truncation DuckDB
  * applies when it loads TIMESTAMP_NS into its us-precision TIMESTAMP, so
  * both engines see identical values.
  */
object Lake {

  /** Repartition up to the session's default parallelism when the scan
    * arrives with fewer partitions (e.g. one parquet row group). No-op on
    * already-parallel inputs — the 100 TB case keeps its natural layout.
    */
  def balance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, name, None)

  /** Read a lake table, optionally capped to the first `rowCap` rows of
    * each file in file order (O1 — the reference reads `nrows=10000`,
    * `data_prep.py:27`). The cap uses the parquet `_metadata.row_index`
    * hidden column, so it is DETERMINISTIC regardless of partitioning /
    * AQE (a bare `.limit(n)` takes whatever partitions report first) and
    * mirrorable by any order-preserving engine (`LIMIT n` over a
    * single-file table in DuckDB). On multi-file tables the cap applies
    * per file — the distributed analogue of "first rows" that needs no
    * global coordination.
    */
  def read(spark: SparkSession, dir: String, name: String, rowCap: Option[Int]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df0 = spark.read.parquet(s"$dir/$name.parquet")
    val df = rowCap match {
      case Some(n) =>
        df0.select(col("*"), col("_metadata.row_index").as("__row_index"))
          .filter(col("__row_index") < n).drop("__row_index")
      case None => df0
    }
    // Columns that were TIMESTAMP(NANOS) surface as LongType with parquet
    // metadata; the only such column in the driver lake is events.ts.
    // Convert any long column literally named like a timestamp.
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == LongType && (f.name == "ts" || f.name.endsWith("_ts")))
        // integer div (not `/`, which is double and loses ns precision)
        acc.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      else acc
    }
  }
}
