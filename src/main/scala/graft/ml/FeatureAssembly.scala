package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-layer feature assembly (SURVEY §2.10, T1–T8 lite): turns the
  * profile catalog into fixed-width model-input tensors as array columns —
  * the DataFrame→DataFrame transforms feeding any external encoder.
  *
  * Mirrors `/root/reference/tabsketchfm/tabular_tokenizer.py`:
  *  - T4 stats layout: `[unique, num_nan, cell_width, quantile13] zero-pad
  *    → width` (`:222-227`), z-scored (`:231-234`)
  *  - T4 minhash layout: `[mh_exact100, mh_words100] / 1e8 zero-pad`
  *    (`:177,235`)
  *  - T1 text assembly: `"{table} [SEP] col1 [SEP] col2 …"` (`:24-36`)
  *  - A14 alt-sketch: hashing-trick term-frequency vector (HashingTF
  *    semantics, `data_prep.py:251-261`)
  */
object FeatureAssembly {

  val StatsWidth = 16   // unique, num_nan, cell_width, 13 quantiles
  val DefaultPad = 768  // reference hidden size

  /** Per-column stats vector, z-scored then zero-padded to `width`. */
  def statsVector(width: Int = DefaultPad): Column = {
    val raw = concat(
      array(col("unique").cast("double"), col("num_nan").cast("double"),
        coalesce(col("cell_width"), lit(0.0))),
      coalesce(col("quantile"), array_repeat(lit(0.0), 13)))
    // z-score over the 16 slots (stats.zscore at tabular_tokenizer.py:231-234)
    val mu = aggregate(raw, lit(0.0), (a, x) => a + x) / lit(StatsWidth)
    val sd = sqrt(aggregate(raw, lit(0.0), (a, x) => a + (x - mu) * (x - mu)) / lit(StatsWidth))
    val z = transform(raw, x => when(sd === 0, lit(0.0)).otherwise((x - mu) / sd))
    concat(z, array_repeat(lit(0.0), width - StatsWidth))
  }

  /** Per-column minhash vector: exact + words digests scaled by 1e-8,
    * zero-padded to `width`. */
  def minhashVector(width: Int = DefaultPad): Column = {
    val mh = concat(
      coalesce(col("minhash_exact"), array_repeat(lit(0L), 100)),
      coalesce(col("minhash_words"), array_repeat(lit(0L), 100)))
    concat(transform(mh, x => x.cast("double") / 1e8),
      array_repeat(lit(0.0), width - 200))
  }

  /** T1: table text assembly `"{table} [SEP] col1 [SEP] col2 …"`. */
  def tableText(profiles: DataFrame): DataFrame =
    profiles.groupBy(col("table_name"))
      .agg(concat_ws(" [SEP] ",
        col("table_name") +:
          Seq(array_join(array_sort(collect_list(struct(col("col_idx"), col("col_name"))))
            .getField("col_name"), " [SEP] ")): _*).as("text"))

  /** Assemble the per-column tensor relation: one row per (table, column)
    * with `stats_vec` and `minhash_vec` array columns.
    */
  def columnTensors(profiles: DataFrame, width: Int = DefaultPad): DataFrame =
    profiles.select(col("table_name"), col("col_idx"), col("col_name"),
      col("col_type"),
      statsVector(width).as("stats_vec"),
      minhashVector(width).as("minhash_vec"))

  /** A14 alt-sketch: hashing-trick term-frequency vector over the column's
    * whitespace-joined values — `HashingVectorizer(n_features)` semantics
    * via MLlib HashingTF applied per column of a long-format values
    * relation (table_name, col_idx, value_str).
    */
  def hashingSketch(values: DataFrame, nFeatures: Int = 30000): DataFrame = {
    import org.apache.spark.ml.feature.HashingTF
    val docs = values.filter(col("value_str").isNotNull)
      .groupBy(col("table_name"), col("col_idx"))
      .agg(flatten(collect_list(split(col("value_str"), "\\s+"))).as("tokens"))
    new HashingTF().setInputCol("tokens").setOutputCol("hv")
      .setNumFeatures(nFeatures)
      .transform(docs)
      .select("table_name", "col_idx", "hv")
  }
}
