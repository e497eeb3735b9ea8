package graft.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.DecimalType

import graft.functions.SketchFunctions._

/** Column profiler — re-expresses the reference's `preprocess_cols`
  * (`/root/reference/tabsketchfm/data_prep.py:188-279`) as ONE Spark
  * aggregation over a long-format values relation.
  *
  * Shape: wide table → `posexplode(array(struct(idx, name, type, value_str,
  * value_num)))` → `groupBy(col_idx)` computing A1-A8 stats + A11/A12
  * MinHash digests. The explode multiplies rows ×nCols but partial (map-side)
  * aggregation collapses each partition to nCols fixed-size buffers before
  * the shuffle, so network cost is O(nCols × nPartitions), independent of
  * row count — the property that makes this viable at 100 TB.
  *
  * Reference semantics preserved:
  *  - `num_nan` counts nulls after empty-string→null (P2, `data_prep.py:202`)
  *  - `unique` includes null as a value (`len(Series.unique())`, `:209`)
  *  - quantile vector = 9 deciles + mean + std(pop) + min + max (`:234-244`)
  *  - `cell_width` = avg byte length of string cells (intent of `:214`)
  *  - MinHash over exact values, plus word tokens for strings (`:264-274`)
  */
object Profiler {

  val QuantileProbs: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** Logical type in the reference's 4-type system (SURVEY §1.2). */
  def logicalType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType       => "float"
    case DateType | TimestampType | TimestampNTZType   => "date"
    case StringType                                    => "string"
    case BooleanType                                   => "string" // pandas maps bool→STRING (data_prep.py:103-108)
    case _                                             => "other"  // zero-encoded downstream
  }

  /** Long-format values relation for one table:
    * (col_idx, col_name, col_type, value_str, value_num).
    * `value_num` carries numerics (and date→epoch-seconds) for quantiles.
    */
  def longFormat(df: DataFrame): DataFrame = {
    val structs = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val c = col(s"`${f.name}`")
      val lt = logicalType(f.dataType)
      val valueStr = lt match {
        // empty string → null, matching P2 (data_prep.py:202)
        case "string" => when(c.cast("string") === "", lit(null)).otherwise(c.cast("string"))
        case _        => c.cast("string")
      }
      val valueNum = lt match {
        case "integer" | "float" => c.cast("double")
        case "date"              => unix_timestamp(c.cast("timestamp")).cast("double")
        case _                   => lit(null).cast("double")
      }
      struct(
        lit(i).as("col_idx"), lit(f.name).as("col_name"), lit(lt).as("col_type"),
        valueStr.as("value_str"), valueNum.as("value_num"))
    }
    df.select(posexplode(array(structs: _*)).as(Seq("pos", "c"))).select("c.*")
  }

  /** Full per-column profile of one table (one aggregation pass). */
  def profile(df: DataFrame, tableName: String,
              withSketches: Boolean = true): DataFrame = {
    val long = longFormat(df)
    val baseAggs = Seq(
      count(lit(1)).as("rows"),                                          // A10
      sum(when(col("value_str").isNull, 1L).otherwise(0L)).as("num_nan"), // A1
      (count_distinct(col("value_str")) +
        max(when(col("value_str").isNull, 1L).otherwise(0L))).as("unique"), // A2 (unique incl. null)
      avg(octet_length(col("value_str"))).as("cell_width"),               // A3
      percentile(col("value_num"), typedLit(QuantileProbs)).as("deciles"), // A4
      avg(col("value_num")).as("mean"),                                   // A5
      stddev_pop(col("value_num")).as("std"),                             // A6
      min(col("value_num")).as("min_v"),                                  // A7
      max(col("value_num")).as("max_v"),                                  // A7
      // Exact decimal sums: order-independent mean/std for oracle parity
      // (double Σ is partition-order-dependent; DECIMAL Σ is exact).
      sum(col("value_num").cast(DecimalType(18, 2))).as("sum_dec"),
      sum(col("value_num").cast(DecimalType(18, 2)) *
        col("value_num").cast(DecimalType(18, 2))).as("sum_sq_dec"))
    val sketchAggs =
      if (withSketches) Seq(
        minhash_agg(col("value_str")).as("minhash_exact"),                // A11
        minhash_words_agg(when(col("col_type") === "string", col("value_str")))
          .as("minhash_words"))                                           // A12
      else Seq.empty
    val aggd = long
      .groupBy(col("col_idx"), col("col_name"), col("col_type"))
      .agg(baseAggs.head, (baseAggs.tail ++ sketchAggs): _*)

    val stdAdj = when(col("unique") > 2, col("std")).otherwise(lit(0.0)) // A6 guard (data_prep.py:238-241)
    val quantileVec = when(col("col_type").isin("integer", "float"),
      concat(col("deciles"),
        array(col("mean"), stdAdj, col("min_v"), col("max_v")))) // A8: 13 floats
    val out = aggd
      .withColumn("table_name", lit(tableName))
      .withColumn("quantile", quantileVec)
      .withColumn("cell_width",
        when(col("col_type") === "string", col("cell_width")))
      .withColumn("minhash_words_f",
        if (withSketches) when(col("col_type") === "string", col("minhash_words"))
        else lit(null))
    val cols = Seq("table_name", "col_idx", "col_name", "col_type", "rows",
      "num_nan", "unique", "cell_width", "quantile", "mean", "std", "min_v", "max_v",
      "sum_dec", "sum_sq_dec") ++
      (if (withSketches) Seq("minhash_exact") else Nil)
    out.select(cols.map(col) ++
      (if (withSketches) Seq(col("minhash_words_f").as("minhash_words")) else Nil): _*)
      .orderBy("col_idx")
  }

  /** Whole-table content snapshot (A13): one MinHash over the multiset of
    * space-joined row strings (`create_content_snapshot`, data_prep.py:319-337).
    */
  def contentSnapshot(df: DataFrame, tableName: String): DataFrame = {
    val rowStr = concat_ws(" ", df.columns.map(c => col(s"`$c`").cast("string")): _*)
    df.select(rowStr.as("row_str"))
      .agg(minhash_agg(col("row_str")).as("content_snapshot"))
      .withColumn("table_name", lit(tableName))
      .select("table_name", "content_snapshot")
  }

  /** Profile a whole lake directory of parquet tables into one catalog
    * DataFrame — the engine's long-format profile store (SURVEY §1.1).
    */
  def profileLake(spark: SparkSession, dir: String, tables: Seq[String],
                  withSketches: Boolean = true, rowCap: Option[Int] = None): DataFrame =
    tables.map { t =>
      val df0 = graft.sources.Lake.read(spark, dir, t)
      val df = rowCap.map(df0.limit).getOrElse(df0)
      profile(df, t, withSketches)
    }.reduce(_ unionByName _)
}
