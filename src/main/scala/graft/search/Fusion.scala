package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-list fusion for hybrid retrieval — the step that combines the
  * engine's three search modalities (BM25 keyword lists from
  * [[TextSearch]], dense cosine lists from `operators.Ann`, sketch lists
  * from [[Discovery]]) into one ranking.
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09):
  * rrf(d) = Σ_lists 1/(K + rank_list(d)). Score-free — only ranks cross
  * list boundaries, so BM25's unbounded scores and cosine's [-1,1] need
  * no per-list normalization, which is exactly why RRF is the standard
  * first fusion in RAG retrieval stacks.
  *
  * Scale shape: each input list is ALREADY a per-query top-k (k rows per
  * query, produced by distributed retrieval upstream), so fusion
  * operates on Σ k·|queries| rows — one union, one small key shuffle,
  * never corpus-sized. Determinism: each reciprocal contribution is
  * rounded to 6 dp and summed as exact DECIMAL(18,6) (aggregation order
  * cannot perturb the fused score); final ties break on ascending id.
  */
object Fusion {

  /** Fuse rank lists. Each input needs columns (`idCol`, `rankCol`);
    * extra columns are dropped. Output: (`idCol`, rrf_r, n_lists, rank),
    * the `topK` best fused ids with rank 1..topK.
    */
  def rrf(lists: Seq[DataFrame], idCol: String = "doc_id",
          rankCol: String = "rank", kConst: Int = 60,
          topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one rank list")
    require(kConst > 0, "kConst must be positive")
    val contribs = lists.map { l =>
      l.select(col(idCol),
        // one double divide then a 6-dp round: bit-identical in any
        // engine (IEEE divide of small integers), so the oracle replays it
        round(lit(1.0) / (lit(kConst) + col(rankCol)), 6).as("c"))
    }.reduce(_ unionAll _)
    val fused = contribs.groupBy(col(idCol))
      .agg(sum(col("c").cast(DecimalType(18, 6))).cast("double").as("rrf_r"),
        count(lit(1)).as("n_lists"))
    // global top-k via TakeOrdered (distributed partial top-k), then a
    // window-free rank of the survivors — the TextSearch.bm25TopK tail
    val top = fused.orderBy(col("rrf_r").desc, col(idCol)).limit(topK)
    graft.operators.Ranking.withPosition(top, "rank")
      .select(idCol, "rrf_r", "n_lists", "rank")
  }
}
