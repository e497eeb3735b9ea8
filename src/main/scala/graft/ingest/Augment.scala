package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table augmentation + identity — the E1 sketch-build loop's per-table
  * transforms (`/root/reference/tabsketchfm/data_prep.py:281-337`):
  *  - P8 column obscuring: rename to `col{idx}` (`:196-200`)
  *  - P9 column shuffle for augmentations ≥2, seeded (`:288-291`)
  *  - A15 content hash as table identity (`joblib.hash` → xxhash64 over
  *    canonicalized rows, order-independent)
  */
object Augment {

  /** Rename all columns to `col0..colN` (anonymization augmentation). */
  def obscureColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.indices.map("col" + _): _*)

  /** Deterministic seeded column permutation (augmentation id ≥ 2). */
  def shuffleColumns(df: DataFrame, seed: Long): DataFrame = {
    val rng = new scala.util.Random(seed)
    val perm = rng.shuffle(df.columns.toList)
    df.select(perm.map(c => col(s"`$c`")): _*)
  }

  /** Engine-independent column permutation: rank positions by a two-round
    * Lehmer mix of (position, aug id). No RNG object, so the oracle-SQL
    * generator replays the identical order (the `random.shuffle(seed)` at
    * `data_prep.py:288-291`, made cross-engine reproducible). Result at
    * position p is the ORIGINAL index placed there. */
  def lehmerPerm(nCols: Int, augId: Int): Seq[Int] = {
    val p = 2147483647L
    def key(i: Int): Long = {
      val x = ((i + 1 + augId).toLong * 48271L) % p
      (x * 16807L) % p
    }
    (0 until nCols).sortBy(key)
  }

  /** `shuffleColumns` with the [[lehmerPerm]] order — augmentation ≥ 2 in
    * oracle-verifiable pipelines. */
  def shuffleColumnsDet(df: DataFrame, augId: Int): DataFrame = {
    val perm = lehmerPerm(df.columns.length, augId)
    df.select(perm.map(i => col(s"`${df.columns(i)}`")): _*)
  }

  /** Order-independent table content hash: a 64-bit MD5-derived hash per
    * canonical row (column names + values, \u0001-separated, nulls marked
    * \u0002), combined by an order-insensitive sum. Serves the reference's
    * duplicate-table detection (`:153-156,298`).
    *
    * The per-row hash is the little-endian uint64 of MD5 bytes [8,16) —
    * exactly DuckDB's `md5_number_lower`, so the whole table hash is
    * verifiable by an independent engine
    * (`SUM(CAST(md5_number_lower(row_str) AS HUGEINT))`). Extracted from
    * Spark's md5 hex via byte-pair reorder + `conv(_, 16, 10)`.
    */
  def contentHash(df: DataFrame): DataFrame = {
    val rowStr = concat_ws("\u0001",
      df.columns.toIndexedSeq.map(c => coalesce(col(s"`$c`").cast("string"), lit("\u0002"))): _*)
    val header = df.columns.mkString(",")
    def md5Low64Dec(c: org.apache.spark.sql.Column) = {
      val h = md5(c)
      // LE uint64 of md5 bytes [8,16): hex byte pairs 15,14,...,8
      val be = concat((15 to 8 by -1).map(b => substring(h, 2 * b + 1, 2)): _*)
      conv(be, 16, 10).cast("decimal(38,0)")
    }
    // decimal sum: order-independent and overflow-safe under ANSI mode
    df.select(md5Low64Dec(rowStr).as("h"))
      .agg((sum(col("h")) + md5Low64Dec(lit(header)))
        .cast("string").as("content_hash"),
        count(lit(1)).as("rows"))
  }

  /** The 3-augmentation set of one table (`num_augs=3`, `data_prep.py:131`):
    * aug 0 = original, aug 1 = obscured names, aug ≥2 = shuffled columns.
    * Sketches are table-level reused; only identity/orderings change — we
    * return the DataFrames for the sketch pipeline to profile.
    */
  def augmentations(df: DataFrame, numAugs: Int = 3, seed: Long = 0L): Seq[(Int, DataFrame)] =
    (0 until numAugs).map {
      case 0 => 0 -> df
      case 1 => 1 -> obscureColumns(df)
      case i => i -> shuffleColumns(df, seed + i)
    }

  /** Contrastive (anchor, positive) views for representation training:
    * the positive drops every `dropEvery`-th token — a DETERMINISTIC
    * augmentation (pure function of the text), so pair generation is
    * reproducible on any engine or partitioning, unlike RNG word
    * dropout. Hashes stand in for the texts (the training writer would
    * keep the strings); kept-token counts expose the augmentation
    * strength. Row-local — no shuffle. Output: input keys +
    * (n_tokens, n_kept, anchor_hash, positive_hash).
    */
  def contrastivePairs(docs: DataFrame, dropEvery: Int = 5,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(dropEvery > 1, "dropEvery must be at least 2")
    val w = split(lower(trim(col(s"`$textCol`"))), "\\s+")
    docs.select(col(s"`$idCol`"),
        w.as("__w"))
      .withColumn("__kept", expr(
        s"filter(__w, (x, i) -> (i + 1) % $dropEvery != 0)"))
      .select(col(s"`$idCol`"),
        size(col("__w")).cast("long").as("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        md5(array_join(col("__w"), " ")).as("anchor_hash"),
        md5(array_join(col("__kept"), " ")).as("positive_hash"))
  }
}
