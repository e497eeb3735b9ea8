package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality for corpus curation — the web-curation
  * pipelines behind public crawls weight domains by link centrality
  * (harmonic/PageRank families) before sampling. The engine already has
  * the *connectivity* graph op ([[Dedup.resolveClusters]]); this adds the
  * *numeric* one.
  *
  * PageRank here runs in exact INTEGER parts-per-million space: ranks
  * start at 10⁶ ppm, each node ships `rank div out_degree` along its
  * edges (integral floor division), and the damping update is
  * `(1−d)·10⁶ + (d_ppm · Σin) div 10⁶` — every operation an exact
  * integer, so the fixed-iteration result is bit-identical on any
  * engine, partitioning, or re-run, and a SQL oracle replays it by
  * unrolling the loop. (Float PageRank sums in nondeterministic order —
  * unverifiable across engines.) The integer product bounds the scale:
  * `Σin · d_ppm` must stay under 2⁶³ ≈ 9.2e18, i.e. an in-neighborhood
  * carrying ≲10¹³ ppm of rank mass (~10M average-rank in-neighbors) —
  * beyond that, lift the product into DECIMAL(38,0).
  *
  * Scale shape: per iteration ONE shuffle (groupBy dst); degrees are
  * computed once; dangling-node mass leaks (the standard simplification
  * — ranks remain comparable, which is all curation needs). For deep
  * iteration counts add checkpointing as in `resolveClusters`; curation
  * runs 3-5 iterations, where lineage is fine.
  */
object Graph {

  val OnePpm = 1000000L

  /** @param edges (src: long, dst: long) relation; self-edges and
    *              duplicates are dropped.
    * @return (node, rank_ppm) for every node appearing in `edges`. */
  def pagerankInt(edges: DataFrame, nIter: Int = 3,
                  dampingPpm: Long = 850000L): DataFrame = {
    require(nIter >= 1 && dampingPpm > 0 && dampingPpm < OnePpm,
      "need nIter >= 1 and damping in (0, 1e6) ppm")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val base = OnePpm - dampingPpm
    var ranks = nodes.withColumn("rank_ppm", lit(OnePpm))
    for (_ <- 1 to nIter) {
      val inSum = e.join(ranks, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"), expr("rank_ppm div out_deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(inSum, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(coalesce(in_sum, 0L) * ${dampingPpm}L) div ${OnePpm}L"))
            .as("rank_ppm"))
    }
    ranks
  }

  /** Per-node degrees of the cleaned edge relation (self-edges and
    * duplicates dropped, as [[pagerankInt]]): (node, out_deg, in_deg).
    * Two key shuffles; nodes with no edges in a direction report 0.
    */
  def degreeReport(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outD = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    nodes.join(outD, Seq("node"), "left").join(inD, Seq("node"), "left")
      .na.fill(0L, Seq("out_deg", "in_deg"))
  }

  /** In-degree distribution — the power-law fingerprint of a link
    * graph: (in_deg, n_nodes). */
  def inDegreeDistribution(edges: DataFrame): DataFrame =
    degreeReport(edges).groupBy("in_deg").agg(count(lit(1)).as("n_nodes"))
}
