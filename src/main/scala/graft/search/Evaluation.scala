package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J3: search-results vs ground-truth evaluation join
  * (`/root/reference/tabsketchfm/embedding_search.py:115-186`): explode the
  * expected candidate lists, equi-join with ranked results, report
  * precision@k / recall@k per query and macro-averaged.
  */
object Evaluation {

  /** Per-depth suffix-sum coefficients of truncated rank-biased
    * overlap: tail(m) = Σ_{d=m..k} (w_d_micro div d) with w_d =
    * round((1−p)·p^(d−1)·10⁶) — PURE literals of (k, p), shared
    * verbatim by the Spark plan and the oracle SQL so both engines
    * evaluate the same integers. */
  def rboTailMicro(k: Int, pPpm: Long = 900000L): Seq[Long] = {
    require(k >= 1 && pPpm > 0 && pPpm < 1000000L, "need k >= 1, p in (0,1)")
    val p = pPpm.toDouble / 1e6
    val c = (1 to k).map(d =>
      math.round((1 - p) * math.pow(p, d - 1) * 1e6) / d)
    (1 to k).map(m => c.drop(m - 1).sum)
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel 2010, "A
    * Similarity Measure for Indefinite Rankings" — public; this is the
    * RBO_min lower bound at depth k): rbo = Σ_{d≤k} (1−p)p^(d−1) ·
    * |A_d ∩ B_d| / d. A pair matched at ranks (ra, rb) contributes to
    * every depth ≥ max(ra, rb), so its total weight is the
    * [[rboTailMicro]] literal at that index — the data side is ONE
    * id join and an exact BIGINT sum; no per-depth pass.
    *
    * @param a,b (doc_id, rank) rankings, rank 1-based.
    * @return one row (n_common, rbo_micro, rbo_r). */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, k: Int,
                        pPpm: Long = 900000L): DataFrame = {
    val tail = rboTailMicro(k, pPpm)
    a.select(col("doc_id"), col("rank").as("ra")).filter(col("ra") <= k)
      .join(b.select(col("doc_id"), col("rank").as("rb"))
        .filter(col("rb") <= k), "doc_id")
      .select(element_at(typedLit(tail),
        greatest(col("ra"), col("rb")).cast("int")).as("t"))
      .agg(count(lit(1)).as("n_common"),
        coalesce(sum(col("t")), lit(0L)).as("rbo_micro"))
      .select(col("n_common"), col("rbo_micro"),
        (col("rbo_micro").cast("double") / 1e6).as("rbo_r"))
  }

  /** `results`: (query, candidate, rank); `groundTruth`: (query,
    * expected: array<string>). */
  def precisionAtK(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame = {
    val expected = groundTruth.select(col("query"),
      explode(col("expected")).as("candidate"))
    val hits = results.filter(col("rank") <= k)
      .join(expected, Seq("query", "candidate"), "left_semi")
      .groupBy(col("query")).agg(count(lit(1)).as("n_hits"))
    val expectedCounts = expected.groupBy(col("query"))
      .agg(count(lit(1)).as("n_expected"))
    expectedCounts.join(hits, Seq("query"), "left")
      .na.fill(0, Seq("n_hits"))
      .select(col("query"),
        round(col("n_hits") / lit(k), 6).as("precision_at_k"),
        round(col("n_hits") / col("n_expected"), 6).as("recall_at_k"))
  }

  /** nDCG@k with binary relevance: DCG = Σ hit_i / log2(i+1) over result
    * ranks i ≤ k, IDCG = the same sum over the first min(k, n_expected)
    * ideal positions. Per-position gains are quantized to integer
    * micro-gains `floor(1e6 / round(log2(i+1), 6))` and summed in
    * integer space (the engine's order-independent-sum discipline); the
    * final nDCG is one double division, 6-dp rounded. Queries whose
    * results hit nothing score 0.
    */
  def ndcgAtK(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def gainMicro(pos: org.apache.spark.sql.Column) =
      floor(lit(1000000.0) / round(log2(pos.cast("double") + lit(1.0)), 6)).cast("long")
    val expected = groundTruth.select(col("query"),
      explode(col("expected")).as("candidate"))
    val dcg = results.filter(col("rank") <= k)
      .join(expected, Seq("query", "candidate"), "left_semi")
      .select(col("query"), gainMicro(col("rank")).as("gm"))
      .groupBy("query").agg(sum(col("gm")).as("dcg_micro"))
    val idealW = Window.partitionBy(col("query")).orderBy(col("candidate"))
    val idcg = expected
      .withColumn("pos", row_number().over(idealW))
      .filter(col("pos") <= k)
      .select(col("query"), gainMicro(col("pos")).as("gm"))
      .groupBy("query").agg(sum(col("gm")).as("idcg_micro"))
    idcg.join(dcg, Seq("query"), "left")
      .na.fill(0L, Seq("dcg_micro"))
      .select(col("query"),
        round(col("dcg_micro").cast("double") / col("idcg_micro").cast("double"), 6)
          .as("ndcg_at_k"))
  }

  /** Mean-reciprocal-rank inputs @k — the first-relevant-position metric
    * next to precision@k (set overlap) and nDCG (graded positions): per
    * query, the rank of the FIRST relevant candidate inside the top k
    * (0 when none) and its reciprocal in exact integer micro-units
    * (`1e6 div rank`, truncating — engine-replayable; the corpus MRR is
    * the mean of `rr` downstream). One semi-join + one min aggregation.
    */
  def mrrAtK(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame = {
    val expected = groundTruth.select(col("query"),
      explode(col("expected")).as("candidate"))
    val firstHit = results.filter(col("rank") <= k)
      .join(expected, Seq("query", "candidate"), "left_semi")
      .groupBy("query").agg(min(col("rank")).cast("long").as("first_rank"))
    groundTruth.select("query").distinct()
      .join(firstHit, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"),
        when(col("first_rank").isNull, lit(0.0))
          .otherwise(expr("1000000 div first_rank").cast("double") / 1e6)
          .as("rr"))
  }

  /** Average precision @k per query — the area-under-PR companion to
    * [[mrrAtK]] (first hit only) and [[ndcgAtK]] (graded discount):
    * mean of precision-at-each-hit over min(|relevant|, k). Exact
    * truncating integer arithmetic at both levels (per-hit
    * `hit_idx·1e6 div rank`, then `Σ div denom` — the documented
    * convention, engine-replayable). Output: (query, n_hits, ap_at_k).
    */
  def averagePrecisionAtK(results: DataFrame, groundTruth: DataFrame,
                          k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expected = groundTruth.select(col("query"),
      explode(col("expected")).as("candidate"))
    val hits = results.filter(col("rank") <= k)
      .join(expected, Seq("query", "candidate"), "left_semi")
      .withColumn("hit_idx", row_number()
        .over(Window.partitionBy(col("query")).orderBy(col("rank")))
        .cast("long"))
      .withColumn("prec_micro", expr("hit_idx * 1000000 div rank"))
      .groupBy("query")
      .agg(count(lit(1)).as("n_hits"), sum(col("prec_micro")).as("sp"))
    val denoms = groundTruth.select(col("query"),
      least(size(col("expected")).cast("long"), lit(k.toLong)).as("denom"))
    denoms.join(hits, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("sp").isNull || col("denom") === 0, lit(0.0))
          .otherwise(expr("sp div denom").cast("double") / 1e6).as("ap_at_k"))
  }

  def macroAverage(perQuery: DataFrame): DataFrame =
    perQuery.agg(round(avg(col("precision_at_k")), 6).as("macro_precision"),
      round(avg(col("recall_at_k")), 6).as("macro_recall"),
      count(lit(1)).as("n_queries"))

  /** Spearman rank correlation between two scoring views of the same
    * items: `ρ = 1 − 6·Σd² / (n(n²−1))` — do two ranking functions
    * (e.g. BM25 vs TF-IDF, revenue vs volume) agree on item order?
    *
    * Both rankings are made TOTAL orders by the id tie-break, so Σd² is
    * an exact integer (the textbook no-ties formula applied to the
    * tie-broken rankings — documented semantics rather than fractional
    * average-ranks, which would reintroduce float sums). ρ is one
    * round-6 division. Ranks come from two chained window-free position
    * passes over the sorted item relation — scale-safe even when the
    * "items" are a whole corpus. Output: one row (n_items, sum_d2, rho).
    */
  def spearman(items: DataFrame, idCol: String,
               scoreA: String, scoreB: String): DataFrame = {
    // Window-free global ranks: two chained sorted position passes
    // (graft.operators.Ranking) — each global orderBy range-partitions
    // in rank order, so neither ranking funnels the item relation
    // through one reducer the way an unpartitioned rank window would.
    val withRa = graft.operators.Ranking.withPosition(
      items.orderBy(col(s"`$scoreA`").desc, col(s"`$idCol`")), "__ra")
    val ranked = graft.operators.Ranking.withPosition(
        withRa.orderBy(col(s"`$scoreB`").desc, col(s"`$idCol`")), "__rb")
      .withColumn("__d", col("__ra") - col("__rb"))
    ranked.agg(count(lit(1)).as("n_items"),
        sum(col("__d") * col("__d")).as("sum_d2"))
      .select(col("n_items"), col("sum_d2"),
        when(col("n_items") < 2, lit(0.0))
          .otherwise(round(lit(1.0) -
            lit(6.0) * col("sum_d2").cast("double") /
              (col("n_items") * (col("n_items") * col("n_items") - 1))
                .cast("double"), 6))
          .as("rho"))
  }

  /** Clustering-agreement metrics (Hubert & Arabie 1985 ARI; Strehl &
    * Ghosh 2002 NMI; public) — the evaluation seat for UNSUPERVISED
    * partitions (dedup clusters, k-means cells, LPA communities)
    * against a reference labeling, next to the ranked-retrieval j3
    * family. Both metrics derive from the contingency table alone:
    *
    *  - ARI = 2·(Σᵢⱼ C(nᵢⱼ,2)·C(n,2) − ΣC(aᵢ,2)·ΣC(bⱼ,2))
    *          / ((ΣC(aᵢ,2)+ΣC(bⱼ,2))·C(n,2) − 2·ΣC(aᵢ,2)·ΣC(bⱼ,2)),
    *    pair combinatorics exact in BIGINT, the two cross products in
    *    DECIMAL(38,0) with a loud overflow guard (the powerIterationPca
    *    discipline; fits to n ≈ 10⁹ items — past that, evaluate on a
    *    deterministic sample). Identical trivial partitions (both
    *    degenerate) define ARI = 1.
    *  - NMI = 2·I/(H_a+H_b) where each pointwise term micro-quantizes
    *    its ln half-away to integer 1e-6 nats BEFORE the count-weighted
    *    exact BIGINT sum (order-independent); the 1/n factors cancel in
    *    the ratio, so no decimal division ever happens. H_a+H_b = 0
    *    (both partitions trivial) defines NMI = 1.
    *
    * Scale shape: one inner join on the item id, one (ca, cb) hash
    * aggregate, then cluster-sized relations only.
    *
    * @param a (idCol, `ca`) partition one; @param b (idCol, `cb`). */
  def clusterAgreement(a: DataFrame, b: DataFrame,
                       idCol: String = "id"): DataFrame = {
    def rha(y: org.apache.spark.sql.Column) =
      when(y >= 0, floor(y + 0.5)).otherwise(ceil(y - 0.5))
    // checkpoint the contingency table (≤ ka·kb rows): ra/rb/tot/ha/hb/
    // nTerm all derive from it, and without the barrier each branch
    // replays the full upstream pipeline — for j_cluster_agreement that
    // upstream is the whole Lloyd's cascade, and the executed plan
    // carried 186 Exchange nodes (measured; 3 with the barrier)
    val ct = a.join(b, idCol)
      .groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("nij"))
      .localCheckpoint(eager = false)
    val ra = ct.groupBy("ca").agg(sum(col("nij")).as("ai"))
    val rb = ct.groupBy("cb").agg(sum(col("nij")).as("bj"))
    val tot = ra.agg(sum(col("ai")).as("n"), count(lit(1)).as("ka"))
      .crossJoin(rb.agg(count(lit(1)).as("kb")))
    val nTerm = ct.join(ra, "ca").join(rb, "cb").crossJoin(broadcast(tot))
      .select(col("nij"), expr("nij * (nij - 1) div 2").as("cij"),
        (col("nij") * rha(log(col("nij").cast("double") / col("ai").cast("double")
          * col("n").cast("double") / col("bj").cast("double"))
          * lit(1000000.0)).cast("long")).as("iterm"))
      .agg(sum(col("cij")).as("sum_idx"), sum(col("iterm")).as("i_micro"))
    val ha = ra.crossJoin(broadcast(tot.select("n")))
      .select(col("ai"),
        (col("ai") * rha(log(col("ai").cast("double") / col("n").cast("double"))
          * lit(1000000.0)).cast("long")).as("h"))
      .agg(sum(col("h")).as("ha"), expr("sum(ai * (ai - 1) div 2)").as("sum_a"))
    val hb = rb.crossJoin(broadcast(tot.select("n")))
      .select(col("bj"),
        (col("bj") * rha(log(col("bj").cast("double") / col("n").cast("double"))
          * lit(1000000.0)).cast("long")).as("h"))
      .agg(sum(col("h")).as("hb"), expr("sum(bj * (bj - 1) div 2)").as("sum_b"))
    tot.crossJoin(nTerm).crossJoin(ha).crossJoin(hb)
      .withColumn("c2n", expr("n * (n - 1) div 2"))
      // DECIMAL(38,0) cross products; a null (overflow) raises loudly
      .withColumn("__num", expr(
        "2 * (CAST(sum_idx AS DECIMAL(38,0)) * CAST(c2n AS DECIMAL(38,0))" +
          " - CAST(sum_a AS DECIMAL(38,0)) * CAST(sum_b AS DECIMAL(38,0)))"))
      .withColumn("__den", expr(
        "(CAST(sum_a AS DECIMAL(38,0)) + CAST(sum_b AS DECIMAL(38,0)))" +
          " * CAST(c2n AS DECIMAL(38,0))" +
          " - 2 * CAST(sum_a AS DECIMAL(38,0)) * CAST(sum_b AS DECIMAL(38,0))"))
      .select(col("n").as("n_items"), col("ka"), col("kb"),
        when(col("__num").isNull || col("__den").isNull, expr(
            "raise_error('clusterAgreement: pair-count product overflowed " +
              "DECIMAL(38,0) — evaluate on a deterministic sample')")
            .cast("double"))
          .when(col("__den") === 0, lit(1.0))
          .otherwise(round(col("__num").cast("double") /
            col("__den").cast("double"), 6)).as("ari"),
        when(col("ha") + col("hb") === 0, lit(1.0))
          .otherwise(round((lit(2L) * col("i_micro")).cast("double") /
            (-(col("ha") + col("hb"))).cast("double"), 6)).as("nmi"))
  }
}
