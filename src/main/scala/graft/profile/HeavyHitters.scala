package graft.profile

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters (Misra & Gries '82; mergeable-summaries
  * merge rule from Agarwal et al., PODS '12) — the two-pass EXACT
  * frequent-items operator:
  *
  * pass 1: a capacity-`k` MG summary aggregates map-side (bounded k-entry
  * state per partition, one k-entry row reduced at the end — raw keys
  * never shuffle). The summary guarantees every item with true frequency
  * > n/(k+1) survives as a candidate, whatever the partitioning or merge
  * order.
  * pass 2: candidates (≤ k, broadcast) are exactly counted — the count
  * shuffle carries ONLY rows matching a candidate — and thresholded with
  * an integer comparison.
  *
  * The OUTPUT is therefore exact and deterministic even though the
  * intermediate summary is merge-order-dependent: any threshold
  * `num/den ≥ 1/(k+1)` yields exactly the keys a full groupBy-count
  * would, at a fraction of the shuffle. This complements [[CountMin]]
  * (estimates for ALL keys) with exact answers for the heavy tail, and
  * is the shape that holds at 100 TB: state O(k), shuffles O(candidates).
  */
object HeavyHitters {

  /** Capacity-`k` MG summary: key → count lower bound. */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "capacity must be positive")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b
      else b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < k => b.updated(v, 1L)
        // full and unseen: decrement every counter (the arriving key's
        // implicit 1 decrements to 0 — it is not inserted)
        case None => b.collect { case (key, c) if c > 1 => key -> (c - 1) }
      }

    /** Agarwal et al. merge: sum counts, then subtract the (k+1)-th
      * largest and drop non-positives — keeps the n/(k+1) guarantee. */
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        summed.collect { case (key, c) if c > cut => key -> (c - cut) }
      }
    }

    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** MG candidate summary + total count in ONE scan: a single row
    * `(mg: map<string,bigint>, n_total: bigint)`. */
  def summary(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.select(col(s"`$valueCol`").cast("string").as("v"))
      .agg(udaf(new MisraGries(k)).apply(col("v")).as("mg"),
        count(col("v")).as("n_total"))

  /** EXACT keys with frequency strictly above `num/den` of the total.
    * Requires `num/den ≥ 1/(k+1)` — below that the MG pass could miss a
    * qualifying key. Output: (key, n, share), ordered (n desc, key).
    *
    * Exactly TWO scans: the summary row (≤ k entries + the total — a
    * bounded driver materialization, like a vocab) drives the second
    * scan's candidate filter as a broadcast semi-join, so the count
    * shuffle carries only heavy-candidate rows.
    */
  def exact(df: DataFrame, valueCol: String, k: Int,
            num: Long = 1, den: Long = 100): DataFrame = {
    require(num > 0 && den > 0, "threshold must be positive")
    require((k + 1) * num >= den,
      s"threshold $num/$den is below the MG guarantee 1/(k+1) for k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val row = summary(df, valueCol, k).collect()(0)
    val nTotal = row.getAs[Long]("n_total")
    val cands = row.getAs[Map[String, Long]]("mg").keys.toSeq
    df.select(col(s"`$valueCol`").cast("string").as("key"))
      .join(broadcast(cands.toDF("key")), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(den) > lit(nTotal * num))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / lit(nTotal).cast("double"), 6)
          .as("share"))
      .orderBy(col("n").desc, col("key"))
  }
}
