package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.MinHash

/** Incremental lake indexing over Structured Streaming — the engine
  * extension SURVEY §1.1 notes the reference lacks (it is batch-only): as
  * new rows stream in, per-column profiles (counts, null counts, MinHash
  * digests) are maintained as typed state and emitted each batch.
  *
  * The sketch algebra (elementwise-min merge) is what makes this exact:
  * streaming partial digests merge into state losslessly, so the streamed
  * profile equals the batch profile over the same data.
  */
object StreamingProfile {

  case class ColState(rows: Long, nulls: Long, digest: Array[Long])
  case class ColUpdate(colName: String, rows: Long, nulls: Long, digest: Array[Long])

  /** Maintain per-column state over a stream of (col_name, value) rows.
    * Emits the updated profile row for every column touched in a batch.
    */
  def profileStream(values: DataFrame): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    values.select(col("col_name").cast("string"), col("value").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[ColState, ColUpdate](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[ColState]) =>
          val prev = state.getOption.getOrElse(
            ColState(0L, 0L, MinHash.emptyDigest()))
          val p = MinHash.perms()
          var n = prev.rows
          var nulls = prev.nulls
          val digest = prev.digest.clone()
          rows.foreach { case (_, v) =>
            n += 1
            if (v == null) nulls += 1
            else MinHash.updateInto(digest, v, p)
          }
          val next = ColState(n, nulls, digest)
          state.update(next)
          ColUpdate(key, n, nulls, digest)
      }
      .toDF("col_name", "rows", "nulls", "digest")
  }

  /** Streaming mergeable quantile sketch: HDR bucket counts are purely
    * additive, so a plain streaming aggregation IS the sketch state — no
    * custom state handler needed, and the streamed sketch equals the
    * batch sketch over the same data by [[graft.profile.QuantileSketch]]
    * merge algebra. Input: a streaming (table_name, col_idx, value_num)
    * relation; run in Update/Complete mode.
    */
  def quantileSketchStream(values: DataFrame): DataFrame =
    graft.profile.QuantileSketch.sketchLong(values)

  /** Streaming Count-Min sketch: cells are additive counts, so the plain
    * streaming aggregation IS the sketch — streamed equals batch by
    * [[graft.profile.CountMin]] merge algebra. Run in Update/Complete.
    */
  def cmsStream(values: DataFrame, valueCol: String,
                spec: graft.profile.CountMin.CmsSpec = graft.profile.CountMin.CmsSpec()): DataFrame =
    graft.profile.CountMin.build(values, valueCol, spec)

  /** Streaming HLL registers: register state is a max, which Spark's
    * streaming aggregation maintains natively — streamed equals batch by
    * [[graft.profile.Hll]] merge algebra. Run in Update/Complete.
    */
  def hllStream(values: DataFrame, valueCol: String,
                groupCols: Seq[String] = Nil): DataFrame =
    graft.profile.Hll.registers(values, valueCol, graft.profile.Hll.HllSpec(), groupCols)

  /** Windowed event aggregation with watermark — the standard streaming
    * rollup (per event_type per hour), exactly the batch `e_hourly_events`
    * semantics applied to a stream.
    */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("event_type"), col("window.start").as("h"),
        col("n"), col("approx_users"))

  /** Streaming sessionization: gap-based session windows per user — the
    * batch `e_sessionize` semantics maintained incrementally. State is
    * bounded by the watermark; sessions emit on close (Append mode).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("event_type")).as("n_types"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_types"))

  /** Stream-static enrichment: the streaming fact joined to a broadcast
    * dimension, rolled up per dimension key — Structured Streaming's
    * "dimension lookup on the hot path". The static side re-resolves per
    * micro-batch (dimension updates are picked up) and never shuffles
    * the stream: each micro-batch does a broadcast hash join. Money sums
    * in DECIMAL so the streamed total is order-insensitively exact.
    * Output (Complete mode): one row per `dimKeyCol` value.
    */
  def enrichedCounts(stream: DataFrame, dim: DataFrame,
                     streamKeyCol: String, dimKeyCol: String,
                     labelCol: String, amountCol: String): DataFrame =
    stream.join(broadcast(dim),
        col(s"`$streamKeyCol`") === col(s"`$dimKeyCol`"))
      .groupBy(col(s"`$labelCol`"))
      .agg(count(lit(1)).as("n"),
        sum(col(s"`$amountCol`").cast("decimal(18,2)")).as("amount"))

  /** Streaming decontamination guard — the eval-set n-gram leakage
    * check ([[graft.operators.Decontamination.overlapReport]]) in
    * INGEST position, where a production pipeline actually wants it:
    * documents are flagged as they stream in, not in a post-hoc batch
    * sweep. Each micro-batch's documents explode to their distinct
    * n-shingles and broadcast-hash-join the STATIC benchmark shingle
    * set (stream never shuffles for the join, same discipline as
    * [[enrichedCounts]]); ONE streaming aggregation per doc builds the
    * report. The batch operator's two-aggregate shape (counts ⋈
    * overlaps) is rewritten as left-join + conditional sum because
    * chained streaming aggregations are unsupported — identical results
    * by construction: the benchmark side is distinct, so the left join
    * is 1:≤1 per (doc, shingle). Complete mode; streamed == batch is
    * the oracle contract. */
  def decontamReport(stream: DataFrame, benchmark: DataFrame,
                     n: Int = 8, threshold: Double = 0.05,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.word_shingles
    val benchSh = benchmark.select(
        explode(array_distinct(word_shingles(col(textCol), n))).as("sh"))
      .distinct().withColumn("hit", lit(1L))
    stream.select(col(idCol).as("id"),
        explode(array_distinct(word_shingles(col(textCol), n))).as("sh"))
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        round(col("n_overlap") / col("n_shingles"), 6))
      .withColumn("contaminated", col("overlap_frac") >= threshold)
  }

  /** Stream-stream attribution join: each conversion event matched to
    * the SAME user's trigger events inside the preceding `horizon` —
    * the canonical ad-attribution shape. Both sides are watermarked so
    * the join state is bounded: a trigger can be dropped once the
    * conversion-side watermark passes `its ts + horizon`. Inner join,
    * Append mode; emits one row per (trigger, conversion) pair.
    */
  def attributionJoin(events: DataFrame, triggerType: String,
                      convType: String, horizon: String = "1 hour",
                      watermark: String = "1 hour"): DataFrame = {
    val trig = events.filter(col("event_type") === triggerType)
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
        col("event_id").as("t_id"))
      .withWatermark("t_ts", watermark)
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", watermark)
    trig.join(conv,
      col("t_user") === col("c_user") &&
        col("t_ts") <= col("c_ts") &&
        col("t_ts") >= col("c_ts") - expr(s"interval $horizon"))
  }
}
