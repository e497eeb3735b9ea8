package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consistent-hash shard planning (Karger et al. 1997; public) — the
  * data-layout primitive behind stable re-sharding at lake scale: keys
  * and shard virtual nodes hash onto one 2³² ring, each key lands on
  * the first vnode clockwise, so adding or removing a shard moves ONLY
  * the keys that hashed into the departed/arriving arcs — unlike
  * `hash(key) mod S`, which reshuffles nearly everything (the property
  * [[graft.operators]]' compaction/bucketing plans rely on when a 100 TB
  * lake grows its shard count).
  *
  * Determinism contract: ring positions are the house salted
  * `md5_low32` (≡ DuckDB `md5_number_lower & 2³²−1`); the clockwise
  * pick is an exact-integer argmin of (pos − h) mod 2³² with ties to
  * the ascending (shard, vnode) — fully oracle-replayable.
  */
object Sharding {

  /** The ring: (shard, vnode, pos) for shard 0..nShards−1 × vnode
    * 0..vnodesPerShard−1 — a bounded broadcast relation. */
  def ring(spark: org.apache.spark.sql.SparkSession, nShards: Int,
           vnodesPerShard: Int, salt: String = "ring0"): DataFrame = {
    require(nShards >= 1 && vnodesPerShard >= 1)
    spark.range(nShards).select(col("id").as("shard"))
      .crossJoin(spark.range(vnodesPerShard).select(col("id").as("vnode")))
      .select(col("shard"), col("vnode"),
        graft.functions.SketchFunctions.md5_low32(concat_ws(":",
          col("shard").cast("string"), col("vnode").cast("string"), lit(salt)))
          .as("pos"))
  }

  /** Assign each key its consistent-hash shard: (keyCol, shard).
    * One broadcast of the (nShards·vnodes)-row ring; assignment is a
    * row-local exact-integer argmin — corpus-linear, no shuffle. */
  def assign(keys: DataFrame, keyCol: String, ringDf: DataFrame,
             salt: String = "key0"): DataFrame = {
    val h = graft.functions.SketchFunctions.md5_low32(concat_ws(":",
      col(keyCol).cast("string"), lit(salt)))
    keys.select(col(keyCol), h.as("h"))
      .crossJoin(broadcast(ringDf))
      .withColumn("dist", expr("(pos - h + 4294967296) % 4294967296"))
      .groupBy(keyCol)
      .agg(min(struct(col("dist"), col("shard"), col("vnode"))).as("m"))
      .select(col(keyCol), col("m.shard").as("shard"))
  }
}
