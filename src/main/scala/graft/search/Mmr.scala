package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
  * SIGIR '98): diversify a retrieval result by greedily picking, at each
  * step, the candidate maximizing `λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s)`
  * over the already-selected set S — the standard RAG/result-dedup move
  * when the top-k by plain cosine is a wall of near-identical hits
  * (reference retrieval surface: `embedding_search.py`'s top-k, which has
  * no diversity control).
  *
  * Scale shape: candidate generation is the existing DISTRIBUTED top-N
  * (`Ann.bruteForceTopK` — broadcast queries, corpus streams); the greedy
  * phase is O(k·N²) dot products INSIDE each query's group via
  * `flatMapGroups`, so thousands of queries parallelize across executors
  * while each group stays bounded by `nCandidates`. No all-pairs
  * candidate×candidate relation is ever shuffled; pair similarities are
  * computed on the fly from the N in-memory vectors.
  *
  * Arithmetic (oracle-exact by construction): relevance and pair
  * similarity are the engine's round-6 cosines, then quantized to exact
  * INTEGER micro-units; with λ a multiple of 0.1 the marginal score
  * `λ·rel − (1−λ)·maxSim` is the exact integer `lNum·rel_u −
  * (10−lNum)·maxSim_u` in 10⁻⁷ units. A double combination would sit on
  * a 7th-decimal HALF boundary for EVERY candidate (6-dp value × 1-dp λ),
  * exactly where Spark's decimal HALF_UP and DuckDB's binary-nearest
  * rounding disagree — integer space has no boundary to disagree on.
  * Ties select the smaller vec_id.
  */
object Mmr {

  /** Spark's `round(col, 6)` for doubles goes through
    * `BigDecimal.valueOf` (the SHORTEST decimal representation of the
    * double, not its exact binary expansion) before HALF_UP — replicate
    * that exactly or boundary values differ by 1 ulp at the 6th dp. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Sequential fold, same evaluation order as the relational
    * `aggregate(zip_with(...))` dot the rest of the engine uses. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Exact micro-units of a round-6 double: the value is within ~1e-4 of
    * an integer after ×1e6, so `Math.round` and SQL `round(x*1e6, 0)`
    * agree unconditionally. */
  private def micros(round6Value: Double): Long =
    Math.round(round6Value * 1e6)

  /** Greedy MMR over each query's top-`nCandidates` cosine candidates.
    * Output: (query_id, rank, vec_id, rel, mmr), rank 1..k in selection
    * order; `rel` the round-6 cosine to the query, `mmr` the marginal
    * score at selection time (rank 1 has no penalty term) as the exact
    * 10⁻⁷-unit integer divided back to double.
    */
  def rerank(corpus: DataFrame, queries: DataFrame, nCandidates: Int = 20,
             k: Int = 5, lambda: Double = 0.7,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nCandidates > 0 && k > 0 && lambda >= 0 && lambda <= 1,
      "need nCandidates > 0, k > 0, lambda in [0,1]")
    val lNum = Math.round(lambda * 10).toInt
    require(math.abs(lambda * 10 - lNum) < 1e-9,
      "lambda must be a multiple of 0.1 (exact integer-unit scoring)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = graft.operators.Ann
      .bruteForceTopK(corpus, queries, nCandidates, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    cands.join(vecs, "neighbor_id")
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("cosine").cast("double"), col("v"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val n = cs.length
        val vs = cs.map(_._4.toArray)
        val norms = vs.map(v => math.sqrt(dot(v, v)))
        val relU = cs.map(c => micros(c._3))
        // max similarity (micro-units) to the selected set; cosine is
        // signed, so the max over a non-empty set can be NEGATIVE —
        // MinValue marks "empty set" (rank 1 scores as plain λ·rel)
        val maxSimU = Array.fill(n)(Long.MinValue)
        val taken = Array.fill(n)(false)
        val out = Array.newBuilder[(Long, Long, Long, Double, Double)]
        var r = 1L
        while (r <= math.min(k, n)) {
          var best = -1; var bestScore = 0L
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val sc =
                if (maxSimU(i) == Long.MinValue) lNum * relU(i)
                else lNum * relU(i) - (10 - lNum) * maxSimU(i)
              if (best < 0 || sc > bestScore ||
                  (sc == bestScore && cs(i)._2 < cs(best)._2)) {
                best = i; bestScore = sc
              }
            }
            i += 1
          }
          taken(best) = true
          out += ((qid, r, cs(best)._2, cs(best)._3, bestScore.toDouble / 1e7))
          i = 0
          while (i < n) {
            if (!taken(i)) {
              val np = norms(i) * norms(best)
              val sU =
                if (np == 0) 0L else micros(round6(dot(vs(i), vs(best)) / np))
              if (sU > maxSimU(i)) maxSimU(i) = sU
            }
            i += 1
          }
          r += 1
        }
        out.result().iterator
      }
      .toDF("query_id", "rank", "vec_id", "rel", "mmr")
  }
}
