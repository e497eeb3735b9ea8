package graft.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.expressions.Window

import graft.functions.SketchFunctions._

/** Column profiler — re-expresses the reference's `preprocess_cols`
  * (`/root/reference/tabsketchfm/data_prep.py:188-279`) as a two-level
  * Spark aggregation over a long-format values relation.
  *
  * Shape: wide table → `posexplode(array(struct(idx, value_str,
  * value_num)))` → **stage 1** `groupBy(col_idx, value)` frequency
  * histogram → **stage 2** `groupBy(col_idx)` stats over (value, freq)
  * pairs. Why two levels:
  *  - map-side partial aggregation collapses stage 1 to the per-partition
  *    distinct values, so the shuffle carries histograms, not rows;
  *  - `unique` becomes a plain `count(*)` over histogram rows — no
  *    `count_distinct`, so no Expand doubling of the stream;
  *  - exact deciles use frequency-weighted `percentile(v, p, freq)`, whose
  *    state is one histogram entry per *distinct* value, not per row;
  *  - MinHash is set-semantics, so sketching distinct values gives the
  *    identical digest while hashing each value once.
  *
  * Reference semantics preserved:
  *  - `num_nan` counts nulls after empty-string→null (P2, `data_prep.py:202`)
  *  - `unique` includes null as a value (the dropna at `:207` re-aligns on
  *    assignment, so NaN is back in the Series by `:209`)
  *  - quantile vector = 9 deciles + mean + std(pop) + min + max
  *    (`:234-244`), omitted for all-null/single-row/single-valued columns
  *    (`:231-232`)
  *  - `cell_width` = avg byte length of string cells (intent of `:214`;
  *    the reference's `tobytes()/len(df)` degenerates to pointer width and
  *    divides by the full row count — we use true avg bytes over non-null
  *    cells, per SURVEY §2.3 A3)
  *  - MinHash over exact values, plus word tokens for strings (`:264-274`).
  *    Deliberate divergence: the reference's `[... for v in col if v]`
  *    drops FALSY values (0, 0.0, False) from sketch input (`:211-213`) —
  *    we keep them; excluding legitimate zeros skews Jaccard estimates,
  *    and digest-level parity is already out of scope (permutation seeds
  *    differ, SURVEY §7 hard part 1).
  */
object Profiler {

  val QuantileProbs: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** Magnitude bound for the exact-decimal sum path: values at or past
    * this fall back to double-summed mean/std (their decimal squares
    * cannot be represented at any Spark precision without ANSI overflow).
    * Driver-lake numerics (keys, money, epoch seconds ≈ 1.7e9) all sit
    * far inside it, so oracle parity is unaffected. */
  val DecimalSumGuard = 1e12

  /** Schema-metadata key set by `RobustCsv.promoteDates` on a string
    * column whose values all parse as dates. The reference re-classifies
    * the ORIGINAL column as DATE in its type map while the values stay
    * strings (`get_types`, data_prep.py:88-98); Spark column metadata is
    * the idiomatic carrier for that out-of-band type vote.
    */
  val DatePromotedKey = "graft.date_promoted"

  /** Logical type of a field: the data type's mapping, overridden to
    * "date" for date-promoted string columns (see [[DatePromotedKey]]).
    * Rendering in [[longFormat]] still follows the physical type — the
    * values ARE strings — only the classification changes, exactly the
    * reference's split between df values and col_types.
    */
  /** The single definition of the promotion check — LakeScan's footer
    * decoding and this classification must never diverge. */
  def isDatePromoted(f: StructField): Boolean =
    f.metadata.contains(DatePromotedKey) && f.metadata.getBoolean(DatePromotedKey)

  def logicalType(f: StructField): String =
    if (isDatePromoted(f)) "date" else logicalType(f.dataType)

  /** Logical type in the reference's 4-type system (SURVEY §1.2). */
  def logicalType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType       => "float"
    case DateType | TimestampType | TimestampNTZType   => "date"
    case StringType                                    => "string"
    case BooleanType                                   => "string" // pandas maps bool→STRING (data_prep.py:103-108)
    case _                                             => "other"  // zero-encoded downstream
  }

  /** Ensure enough partitions for the downstream aggregation: a single
    * parquet row group arrives as ONE partition, which would serialize the
    * whole profile. No-op when the scan already has parallelism (the 100 TB
    * case — thousands of row groups).
    */
  private def ensureParallelism(df: DataFrame): DataFrame =
    graft.sources.Lake.balance(df)

  /** The one pair of cell-rendering casts every profile path shares —
    * `(value_str, value_num)` for a field (P2 empty→null on strings,
    * epoch seconds for dates). `LakeScan.renderLong` mirrors these over
    * its variant slots, so the unified and per-table paths render
    * bit-identically.
    */
  private def cellExprs(f: StructField, renderNumerics: Boolean): (Column, Column) = {
    val c = col(s"`${f.name}`")
    val lt = logicalType(f.dataType)
    val valueStr = lt match {
      // empty string → null, matching P2 (data_prep.py:202)
      case "string" => when(c.cast("string") === "", lit(null)).otherwise(c.cast("string"))
      // sketch-free profiles don't need the (expensive) numeric renders;
      // nullness is then carried by value_num alone
      case _ if !renderNumerics => lit(null).cast("string")
      case _        => c.cast("string")
    }
    val valueNum = lt match {
      case "integer" | "float" => c.cast("double")
      case "date"              => unix_timestamp(c.cast("timestamp")).cast("double")
      case _                   => lit(null).cast("double")
    }
    (valueStr, valueNum)
  }

  /** Long-format values relation for one table:
    * (col_idx, value_str, value_num). `value_num` carries numerics (and
    * date→epoch-seconds) for quantiles. Column metadata stays out of the
    * hot path and is re-attached from [[colMeta]] after aggregation.
    */
  def longFormat(df: DataFrame, renderNumerics: Boolean = true): DataFrame = {
    val structs = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val (valueStr, valueNum) = cellExprs(f, renderNumerics)
      struct(lit(i).as("col_idx"), valueStr.as("value_str"), valueNum.as("value_num"))
    }
    df.select(posexplode(array(structs.toIndexedSeq: _*)).as(Seq("pos", "c"))).select("c.*")
  }

  /** Schema of the KEYED long-format relation [[profileFromLong]]
    * consumes — one row per cell plus one `present=false` sentinel per
    * column (sentinels preserve the schema through aggregation, so an
    * empty table still profiles to zero-count rows).
    */
  val KeyedLongSchema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("col_idx", IntegerType, nullable = false),
    StructField("col_name", StringType, nullable = false),
    StructField("col_type", StringType, nullable = false),
    StructField("present", BooleanType, nullable = false),
    StructField("value_str", StringType),
    StructField("value_num", DoubleType)))

  /** One `present=false` row per column of `df`'s schema (tiny local
    * relation — the keyed replacement for the old meta left-join). */
  def schemaSentinels(spark: SparkSession, df: DataFrame, tableName: String): DataFrame = {
    import org.apache.spark.sql.Row
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      df.schema.fields.zipWithIndex.map { case (f, i) =>
        Row(tableName, i, f.name, logicalType(f), false, null, null)
      }: _*)
    spark.createDataFrame(rows, KeyedLongSchema)
  }

  /** [[longFormat]] with the table/column keys riding each row (plus
    * schema sentinels) — the single-table feeder of [[profileFromLong]].
    */
  def longFormatKeyed(df: DataFrame, tableName: String,
                      renderNumerics: Boolean = true): DataFrame = {
    val structs = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val (valueStr, valueNum) = cellExprs(f, renderNumerics)
      struct(lit(tableName).as("table_name"), lit(i).as("col_idx"),
        lit(f.name).as("col_name"), lit(logicalType(f)).as("col_type"),
        lit(true).as("present"),
        valueStr.as("value_str"), valueNum.as("value_num"))
    }
    val data = df.select(posexplode(array(structs.toIndexedSeq: _*)).as(Seq("pos", "c")))
      .select("c.*")
    data.unionByName(schemaSentinels(df.sparkSession, df, tableName))
  }

  /** Tiny (col_idx, col_name, col_type) dimension for one table's schema. */
  def colMeta(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.schema.fields.zipWithIndex.map { case (f, i) =>
      (i, f.name, logicalType(f))
    }
    spark.createDataFrame(rows.toIndexedSeq).toDF("col_idx", "col_name", "col_type")
  }

  /** Full per-column profile of one table (two aggregation levels) —
    * the keyed core [[profileFromLong]] with this table's literal key.
    */
  def profile(df: DataFrame, tableName: String,
              withSketches: Boolean = true,
              withQuantiles: Boolean = true): DataFrame =
    // Repartition the narrow input BEFORE exploding ×nCols — the serial
    // shuffle write from a single-row-group scan is 11× cheaper that way.
    profileFromLong(
      longFormatKeyed(ensureParallelism(df), tableName, renderNumerics = withSketches),
      withSketches, withQuantiles)
      .orderBy("col_idx")

  /** The profiling core, keyed by (table_name, col_idx): two aggregation
    * levels over a keyed long-format cell relation (see
    * [[KeyedLongSchema]]), ONE aggregate subtree for however many tables
    * ride in `long`. Feeders: [[longFormatKeyed]] (single table),
    * `LakeScan.unifiedLongRows` (whole lake, one scan).
    */
  def profileFromLong(long: DataFrame, withSketches: Boolean = true,
                      withQuantiles: Boolean = true): DataFrame = {
    val keyCols = Seq("table_name", "col_idx", "col_name", "col_type").map(col)
    // stage 1: per-column value histogram (map-side combine shrinks to
    // distinct values per partition before any shuffle); schema sentinels
    // ride through with freq 0 so every column aggregates to a row even
    // when it has no cells (empty table)
    val hist0 = long.groupBy(keyCols ++ Seq(col("value_str"), col("value_num")): _*)
      .agg(sum(when(col("present"), 1L).otherwise(0L)).as("freq"))
    // With quantiles on, the stage-1 histogram is MATERIALIZED once
    // (eager localCheckpoint + stats-barrier re-wrap): the stats branch,
    // the decile cum-sums, AND the decile branch's three driver-built
    // broadcasts (rng/probes/coverB) all read the local leaf, so the
    // cell relation is scanned and shuffled exactly once per run and no
    // broadcast build ever replays it on a busy driver (the r14-r15
    // a4_quantiles in-suite inflation mechanism). The materialized
    // relation is the DISTINCT-value histogram — i.e. at most the
    // stage-1 shuffle Spark already writes to local disk. Without
    // quantiles there is no multi-branch fan-out, so the plan stays a
    // single streaming aggregate.
    val hist = if (withQuantiles) cpBarrier(hist0) else hist0

    // Exact decimal sums power order-independent quantile-vector mean/std
    // (bit-identical across engines). A value past the guard (decimal CSV
    // columns, 1e22-scale doubles, ±Infinity, NaN — all fail the
    // comparison) would make the ANSI cast THROW mid-aggregation, so the
    // cast is guarded per value and columns whose RANGE exceeds the guard
    // (detected post-agg from min/max) fall back to the double-summed
    // mean/std below. 1e12 leaves the squares' running sum ~1e10 rows of
    // headroom inside the capped Decimal(38,4) accumulator.
    val decimalSafe = abs(col("value_num")) < lit(Profiler.DecimalSumGuard)
    val decV = when(decimalSafe, col("value_num")).otherwise(lit(null))
      .cast(DecimalType(18, 2))
    val baseAggs = Seq(
      sum(col("freq")).as("rows"),                                          // A10
      // null test spans both carriers: strings render into value_str only,
      // numerics/dates may carry value_num only (renderNumerics=false)
      sum(when(col("value_str").isNull && col("value_num").isNull, col("freq"))
        .otherwise(0L)).as("num_nan"),                                      // A1
      // A2 (incl. null): histogram rows with cells behind them — a freq-0
      // row is a sentinel for a column whose null group never materialized
      sum(when(col("freq") > 0, 1L).otherwise(0L)).as("unique"),
      (sum(octet_length(col("value_str")) * col("freq")) /
        sum(when(col("value_str").isNotNull, col("freq")))).as("cell_width"), // A3
      (sum(col("value_num") * col("freq")) /
        sum(when(col("value_num").isNotNull, col("freq")))).as("mean"),     // A5
      min(col("value_num")).as("min_v"),                                    // A7
      max(col("value_num")).as("max_v"),                                    // A7
      // Exact decimal sums: order-independent mean/std for oracle parity
      sum(decV * col("freq")).as("sum_dec"),
      sum(decV * decV * col("freq")).as("sum_sq_dec"),
      sum(col("value_num") * col("value_num") * col("freq")).as("sum_sq"),
      sum(when(col("value_num").isNotNull, col("freq"))).as("n_num"))
    // A12 runs only on string columns — gate INSIDE the aggregation (the
    // reference computes word sketches for strings only, and tokenizing
    // numeric renders just to null them out later would double sketch
    // cost). "other" types (arrays/maps/binary) are zero-encoded
    // downstream (tabular_tokenizer.py:184-189) — hashing their huge
    // renders would be pure waste, so A11 skips them too. Gating rides
    // the col_type KEY column (same values the old per-table index sets
    // produced, but schema-independent so one expression serves any mix
    // of tables).
    val exactInput = when(col("col_type") =!= "other", col("value_str"))
    val wordsInput = when(col("col_type") === "string", col("value_str"))
    val sketchAggs =
      if (withSketches) Seq(
        minhash_agg(exactInput).as("minhash_exact"),                        // A11 (set semantics)
        minhash_words_agg(wordsInput).as("minhash_words_raw"))              // A12
      else Seq.empty
    val aggd0 = hist.groupBy(keyCols: _*)
      .agg(baseAggs.head, (baseAggs.tail ++ sketchAggs): _*)
    // A4 deciles (gated — consumers that discard the quantile column skip
    // the whole subtree; Catalyst cannot prune a join that feeds a built
    // output column, so the gate must be plan-construction-time): the
    // value histogram CHAINS off `hist`, so the exploded cell relation is
    // scanned, rendered, and stage-1-shuffled exactly ONCE — the stage-1
    // exchange is shared with the stats branch (ReuseExchange / AQE stage
    // reuse), and the re-aggregation to (keys, value_num) shuffles only
    // distinct (value_str, value_num) pairs, not cells.
    val aggd = if (!withQuantiles)
      aggd0.withColumn("deciles", lit(null).cast(ArrayType(DoubleType)))
    else {
      val valueHist = hist
        .filter(col("value_num").isNotNull && col("freq") > 0)
        .select(col("table_name"), col("col_idx"), col("value_num"), col("freq"))
      aggd0.join(
        decilesFromHist(valueHist, QuantileProbs, Seq("table_name", "col_idx"),
          materialize = false), // `hist` is already a local leaf
        Seq("table_name", "col_idx"), "left")
    }

    // A6: population std = sqrt(E[x²] − E[x]²); guard unique<=2 → 0
    // (data_prep.py:238-241)
    val stdRaw = sqrt(greatest(
      col("sum_sq") / col("n_num") - col("mean") * col("mean"), lit(0.0)))
    // Quantile-vector mean/std ride the EXACT decimal sums (order-independent
    // FP → bit-identical across engines and runs; the lake's numerics are
    // ≤2-decimal so the decimal quantization is lossless). The raw double
    // `mean`/`std` columns keep the un-quantized values. Columns whose
    // range exceeds the decimal guard use the double sums instead — exact
    // decimal arithmetic cannot represent their squares at any precision.
    val isHuge = greatest(abs(col("min_v")), abs(col("max_v"))) >= lit(Profiler.DecimalSumGuard)
    val exactMeanD = when(isHuge, col("mean"))
      .otherwise(col("sum_dec").cast("double") / col("n_num"))
    val exactStdD = when(isHuge, stdRaw).otherwise(sqrt(greatest(
      col("sum_sq_dec").cast("double") / col("n_num") - exactMeanD * exactMeanD,
      lit(0.0))))
    val stdAdj = when(col("unique") > 2, exactStdD).otherwise(lit(0.0))
    // reference omits the quantile vector for all-null, single-row, or
    // single-valued columns (data_prep.py:231-232 guard)
    val quantileVec = when(col("col_type").isin("integer", "float") &&
        (col("rows") - col("num_nan")) > 1 && col("unique") > 1,
      concat(col("deciles"),
        array(exactMeanD, stdAdj, col("min_v"), col("max_v")))) // A8: 13 floats

    val out = aggd
      .withColumn("quantile", quantileVec)
      .withColumn("std", when(col("col_type").isin("integer", "float"), stdRaw))
      .withColumn("cell_width",
        when(col("col_type") === "string", col("cell_width")))
      .withColumn("minhash_words_f",
        if (withSketches) when(col("col_type") === "string", col("minhash_words_raw"))
        else lit(null))
      // zero-encoded "other" columns and all-null columns carry NO digest
      // (an empty sketch would spuriously match other empty sketches at
      // jaccard 1.0 in search)
      .withColumn("minhash_exact",
        if (withSketches)
          when(col("col_type") =!= "other" && col("num_nan") < col("rows"),
            col("minhash_exact"))
        else lit(null))
    val cols = Seq("table_name", "col_idx", "col_name", "col_type", "rows",
      "num_nan", "unique", "cell_width", "quantile", "mean", "std", "min_v", "max_v",
      "sum_dec", "sum_sq_dec") ++
      (if (withSketches) Seq("minhash_exact") else Nil)
    out.select(cols.map(col) ++
      (if (withSketches) Seq(col("minhash_words_f").as("minhash_words")) else Nil): _*)
  }

  /** Exact linear-interpolation percentiles computed relationally from a
    * (col_idx, value_num, freq) histogram — the scale-path replacement for
    * the built-in `percentile` aggregate, whose per-group in-memory value
    * maps become the bottleneck (and an OOM risk) at very high column
    * cardinality. Each probe interpolates between the two covering values
    * using the same `(hi−pos)·vLo + (pos−lo)·vHi` formula as Spark's
    * Percentile, so results are identical.
    *
    * The rank cum-sum is a TWO-LEVEL prefix sum so no column ever funnels
    * through one reducer (a plain `Window.partitionBy(col_idx)` bounds
    * parallelism by column count — a near-unique column at 100× scale
    * becomes a single-partition sort): distinct values are range-bucketed
    * deterministically on the column's (min,max) span, per-bucket totals
    * roll up into bucket offsets via a tiny window (≤ `DecileBuckets` rows
    * per column), and the heavy cum-sum runs partitioned by
    * (col_idx, bucket). Range bucketing is monotone, so bucket-then-value
    * order equals global value order and results are exactly unchanged.
    * Worst case (all distinct values in one bucket) degrades to the old
    * single-reducer plan, never below it.
    */
  val DecileBuckets = 1024

  /** Eager localCheckpoint + the house stats-barrier re-wrap (see
    * Dedup.cpOnly): materializes `df` NOW and returns a fresh-stats
    * local leaf. Used to pin multi-consumer relations whose small-side
    * broadcasts must not replay the upstream plan per build. */
  private def cpBarrier(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  def decilesFromHist(hist: DataFrame, probs: Seq[Double],
                      keys: Seq[String] = Seq("col_idx"),
                      materialize: Boolean = true): DataFrame = {
    val k = keys.map(col)
    // Accepts any (keys…, value_num, freq) histogram, WITHOUT re-aggregating
    // to distinct value_num first: duplicate (keys, value_num) rows (e.g. a
    // chained stage-1 histogram still split by value_str) merely subdivide a
    // value's rank interval into per-row sub-intervals — any probe rank
    // falls into exactly one sub-interval and recovers the same value_num,
    // so deciles are unchanged while a full re-agg shuffle is saved. The
    // within-bucket cum-sum below uses an explicit ROWS frame so tied
    // values accumulate per row, not per peer group. Null value rows
    // (string columns) ride along as bucket −1: no offset match → never
    // covering.
    // Materialize the histogram ONCE (default): every small side below
    // (rng, probes, coverB) is a driver-built broadcast whose child plan
    // would otherwise replay the upstream scan + stage-1 shuffle per
    // build. Under a loaded driver those sequential broadcast builds
    // serialized and inflated a4_quantiles 5-8× while neighbors moved
    // ~1.3× (rounds 14-15); building them from a local RDD leaf makes
    // each a milliseconds job. On a real cluster the same shape holds
    // (the materialized relation is the DISTINCT-value histogram, i.e.
    // ≤ stage-1 shuffle size, which Spark writes to local disk anyway).
    // Callers that already feed a materialized/persisted histogram (the
    // profiler checkpoints stage-1 itself so its stats branch shares the
    // same leaf) pass materialize = false.
    val h0 = hist.select(k ++ Seq(col("value_num"), col("freq")): _*)
    val h = if (materialize) cpBarrier(h0) else h0
    val rng = h.groupBy(k: _*).agg(
      min(col("value_num")).as("vmin"), max(col("value_num")).as("vmax"),
      sum(when(col("value_num").isNotNull, col("freq")).otherwise(0L)).as("n"))
    val span = when(col("vmax") > col("vmin"), col("vmax") - col("vmin")).otherwise(lit(1.0))
    val hb = h.join(broadcast(rng), keys)
      .withColumn("bucket",
        when(col("value_num").isNull, lit(-1))
          .otherwise(least(lit(DecileBuckets - 1), greatest(lit(0),
            floor((col("value_num") - col("vmin")) / span * DecileBuckets).cast("int")))))
    // level 1: bucket totals → exclusive bucket offsets (tiny per-column window)
    val wB = Window.partitionBy(k: _*).orderBy(col("bucket"))
    val bOff = hb.filter(col("value_num").isNotNull)
      .groupBy(k :+ col("bucket"): _*).agg(sum(col("freq")).as("bfreq"))
      .withColumn("boff", sum(col("bfreq")).over(wB) - col("bfreq"))
    // Probe positions: 9 tiny rows per column — joined against the bucket
    // offsets FIRST, so only buckets whose rank interval [boff, boff+bfreq)
    // actually contains a probe rank survive. Exploding the probes onto
    // every histogram row instead is a 9× row amplification on the dominant
    // relation (~all distinct values) that the filter then throws away.
    val probsLit = typedLit(probs.zipWithIndex.map { case (p, i) => (p, i) })
    val probes = rng
      .select(k ++ Seq(col("n"), explode(probsLit).as("pq")): _*)
      .select(k ++ Seq(col("pq._2").as("qi"),
        (col("pq._1") * (col("n") - 1).cast("double")).as("pos")): _*)
      .select(k ++ Seq(col("qi"), col("pos"),
        floor(col("pos")).cast("long").as("lo"),
        ceil(col("pos")).cast("long").as("hi")): _*)
    val coverB = bOff.join(broadcast(probes), keys)
      .filter((col("boff") <= col("lo") && col("lo") < col("boff") + col("bfreq")) ||
        (col("boff") <= col("hi") && col("hi") < col("boff") + col("bfreq")))
      .select(keys ++ Seq("bucket", "boff", "qi", "pos", "lo", "hi") map col: _*)
    // level 2: within-bucket cum-sum, ONLY over covering buckets (≤ 18 per
    // column), partitioned by (keys, bucket, qi) so each histogram row
    // accumulates exactly once PER COVERING PROBE — a bucket covering
    // several probes duplicates its rows per probe but each probe's
    // cum-sum sees every row once, so no double-counting. This replaces
    // the former separate `neededB` distinct + second coverB join (two
    // broadcasts and a join saved); the amplification is bounded by
    // probes-per-bucket ≤ |probs|, on the ≤2-buckets-per-probe slice of
    // the histogram only.
    val wV = Window.partitionBy(k ++ Seq(col("bucket"), col("qi")): _*)
      .orderBy(col("value_num"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covering = hb.join(broadcast(coverB), keys :+ "bucket")
      .withColumn("cum", sum(col("freq")).over(wV) + col("boff"))
      .withColumn("start", col("cum") - col("freq"))
      .filter((col("start") <= col("lo") && col("lo") < col("cum")) ||
        (col("start") <= col("hi") && col("hi") < col("cum")))
    covering.groupBy(k ++ Seq(col("qi"), col("pos"), col("lo"), col("hi")): _*)
      .agg(
        max(when(col("start") <= col("lo") && col("lo") < col("cum"), col("value_num"))).as("v_lo"),
        max(when(col("start") <= col("hi") && col("hi") < col("cum"), col("value_num"))).as("v_hi"))
      .withColumn("q", when(col("lo") === col("hi"), col("v_lo"))
        .otherwise((col("hi").cast("double") - col("pos")) * col("v_lo") +
          (col("pos") - col("lo").cast("double")) * col("v_hi")))
      .groupBy(k: _*)
      .agg(sort_array(collect_list(struct(col("qi"), col("q"))))
        .getField("q").as("deciles"))
  }

  /** Whole-table content snapshot (A13): one MinHash over the multiset of
    * space-joined row strings (`create_content_snapshot`, data_prep.py:319-337).
    * MinHash is set-semantics, so we sketch distinct row strings (stage-1
    * dedup shrinks the UDAF input).
    */
  def contentSnapshot(df: DataFrame, tableName: String): DataFrame = {
    val rowStr = concat_ws(" ", df.columns.toIndexedSeq.map(c => col(s"`$c`").cast("string")): _*)
    // Single-level aggregation: partial digests build map-side in every
    // partition and only 100-slot buffers merge — no data shuffle at all.
    // (Row strings are mostly unique, so a dedup pre-stage would only add
    // a shuffle.)
    ensureParallelism(df).select(rowStr.as("row_str"))
      .agg(minhash_agg(col("row_str")).as("content_snapshot"))
      .withColumn("table_name", lit(tableName))
      .select("table_name", "content_snapshot")
  }

  /** Profile a whole lake directory of parquet tables into one catalog
    * DataFrame — per-table plans unioned. RETAINED for the few-huge-tables
    * shape (each table's parquet scan splits by row group) and as the
    * independent double-check of [[profileLakeUnified]] (parity spec);
    * the catalog default is the unified path, whose planning cost is
    * CONSTANT in table count instead of an N-branch union.
    */
  def profileLake(spark: SparkSession, dir: String, tables: Seq[String],
                  withSketches: Boolean = true, rowCap: Option[Int] = None,
                  withQuantiles: Boolean = true): DataFrame =
    tables.map { t =>
      // deterministic first-N cap (O1, data_prep.py:27) — see Lake.read
      profile(graft.sources.Lake.read(spark, dir, t, rowCap), t, withSketches,
        withQuantiles)
    }.reduce(_ unionByName _)

  /** Lake-scale single-job profiler (SURVEY §3 E1 "Spark shape"): ONE
    * binaryFile scan over every table file → executor-side decode into a
    * long cell relation keyed by table → ONE `groupBy(table_name,
    * col_idx)` aggregate subtree, however many tables. The reference's
    * real corpora run to 40,752 tables (`README.md:175`, Wiki Union);
    * at that N the per-table loop's 40k-branch union plan and 80k+
    * scheduled jobs stall the DRIVER — this path plans one fixed-shape
    * job. Values render through the same Catalyst casts as [[profile]],
    * so outputs are bit-identical (spec-pinned).
    */
  def profileLakeUnified(spark: SparkSession, dir: String, tables: Seq[String],
                         withSketches: Boolean = true,
                         rowCap: Option[Int] = None,
                         withQuantiles: Boolean = true): DataFrame =
    profileFromLong(
      graft.sources.LakeScan.unifiedLongRows(spark, dir, tables, rowCap,
        renderNumerics = withSketches),
      withSketches, withQuantiles)
}
