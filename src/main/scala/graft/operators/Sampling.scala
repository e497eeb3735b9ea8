package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * `DataFrame.sample` is seed-stable only for a fixed partitioning — a
  * repartition or a different file split changes the sample. At 100 TB a
  * training mix must be REPRODUCIBLE from the data alone, so membership
  * here is a pure function of the row id: keep iff
  * `md5_low32(id:salt) < fraction·2³²`. Same rows selected on any
  * cluster, any partitioning, any engine (the oracle recomputes
  * membership in DuckDB via `md5_number_lower`). Changing `salt` draws an
  * independent sample — that is the resample knob.
  */
object Sampling {

  /** Little-endian uint32 of md5 bytes [8,12) — the engine's shared base
    * hash (`MinHash.md5Low32` ≡ DuckDB `md5_number_lower & 2³²−1`). */
  private def md5Low32Col(c: Column): Column =
    graft.functions.SketchFunctions.md5_low32(c)

  private def threshold(fraction: Double): Long =
    math.floor(fraction * 4294967296.0).toLong

  /** Keep each row with probability `fraction`, decided by the row's id
    * hash — reproducible Bernoulli sampling. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "s0"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(
      md5Low32Col(concat_ws(":", col(s"`$idCol`").cast("string"), lit(salt)))
        < lit(threshold(fraction)))
  }

  /** Per-stratum fractions (the data-mixing primitive: "50% en, 25% zh,
    * 10% of everything else"). Strata absent from `fractions` use
    * `defaultFraction`. One scan, no shuffle — membership is row-local.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0, idCol: String,
                       salt: String = "s0"): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(defaultFraction))) {
      case (acc, (k, f)) =>
        when(col(s"`$strataCol`") === k, lit(threshold(f))).otherwise(acc)
    }
    df.filter(
      md5Low32Col(concat_ws(":", col(s"`$idCol`").cast("string"), lit(salt))) < thr)
  }
}
