package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-theoretic column profiling: Shannon entropy per column
  * and pairwise mutual information — the signals a profiler uses to
  * rank join-key candidates (high entropy ≈ key-like) and detect
  * soft functional dependencies / correlated dimensions (high
  * normalized MI) before committing a join order.
  *
  * Determinism discipline (engine-wide): every probability is a single
  * IEEE-754 division of exact integer counts; the one transcendental
  * (ln of that ratio) is rounded to 6 dp; each value's term is then
  * quantized to integer micro-nats and SUMMED IN INTEGER SPACE, so no
  * floating-summation order can split Spark from the oracle.
  *
  * Scale shape: entropy is one groupBy per column over its distinct
  * values; MI is one groupBy over the joint (a, b) cells plus two
  * marginal aggregates equi-joined back on the value — shuffles are
  * bounded by distinct counts, never by row count.
  */
object InfoTheory {

  /** Per-value entropy term in integer micro-nats:
    * floor(c · round(ln(n/c), 6) · 1e6). */
  private def termMicro(c: Column, lnRatio: Column): Column =
    floor(c.cast("double") * lnRatio * lit(1000000.0)).cast("long")

  /** Shannon entropy (nats, 6 dp) of each listed column:
    * (col_name, n_rows, n_distinct, entropy). Nulls count as a value.
    */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val counts = df.groupBy(col(s"`$c`").cast("string").as("__v"))
        .agg(count(lit(1)).as("__c"))
      val withN = counts.crossJoin(
        broadcast(counts.agg(sum(col("__c")).as("__n"))))
      val lnr = round(log(col("__n").cast("double") / col("__c").cast("double")), 6)
      withN
        .select(col("__c"), col("__n"), termMicro(col("__c"), lnr).as("__tm"))
        .agg(first(col("__n")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          sum(col("__tm")).as("__s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_distinct"),
          round(col("__s").cast("double") / col("n_rows").cast("double")
            / lit(1000000.0), 6).as("entropy"))
    }.reduce(_ unionByName _)

  /** Candidate-key discovery: uniqueness ratio of every single column
    * and every column pair from `cols` — the key-inference pass of a
    * table profiler (a combo with ratio 1.0 is a candidate key; near-1
    * ratios flag soft keys with dirty rows). Null-bearing rows count as
    * values (a distinct group), matching a GROUP BY's view of keyness.
    * One distinct-count aggregation per combo, shuffles bounded by
    * distinct counts; exact integers + one division.
    * Output: (key_cols, n_distinct, n_rows, uniqueness, is_key).
    */
  def keyDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    val n = df.agg(count(lit(1)).as("n_rows"))
    val combos = cols.map(Seq(_)) ++
      (for { i <- cols.indices; j <- i + 1 until cols.size }
        yield Seq(cols(i), cols(j)))
    combos.map { combo =>
      df.select(combo.map(c => col(s"`$c`")): _*).distinct()
        .agg(count(lit(1)).as("n_distinct"))
        .crossJoin(broadcast(n))
        .select(lit(combo.mkString("+")).as("key_cols"),
          col("n_distinct"), col("n_rows"),
          round(col("n_distinct").cast("double") / col("n_rows").cast("double"), 6)
            .as("uniqueness"),
          (col("n_distinct") === col("n_rows")).as("is_key"))
    }.reduce(_ unionByName _)
  }

  /** Inclusion-dependency scan — the foreign-key discovery pass of a
    * lake profiler: for each directed candidate pair, the containment
    * `|distinct(src) ∩ distinct(dst)| / |distinct(src)|`; a src fully
    * contained in dst (containment 1.0) is an FK⊆PK candidate.
    *
    * One unified (src, v) distinct relation, one self-equi-join on the
    * value, one pair aggregation — shuffles bounded by distinct counts,
    * O(pairs) only in the final tiny aggregate. Ubiquitous values (an
    * id appearing in every key column) fan out in the value join; at
    * production scale pre-hash values and salt the join
    * ([[graft.operators.Skew]]) — the candidate lists a profiler feeds
    * here are key-like, so fan-out is bounded by the candidate count.
    * Exact integers + one division per pair.
    *
    * `candidates`: (label, df, column). Output: (src, dst, n_src,
    * n_common, containment ≥ `minContainment`).
    */
  def indScan(candidates: Seq[(String, DataFrame, String)],
              minContainment: Double = 0.5): DataFrame = {
    // materialized once: BOTH sides of the value self-join and the sizes
    // aggregate read it — without the checkpoint the 2×|candidates|
    // distinct subtrees (scan + shuffle each) replay inside one query
    val vals = candidates.map { case (t, df, c) =>
      df.select(lit(s"$t.$c").as("src"), col(s"`$c`").cast("string").as("v"))
        .distinct()
    }.reduce(_ unionByName _).localCheckpoint(eager = true)
    val sizes = vals.groupBy("src").agg(count(lit(1)).as("n_src"))
    val common = vals
      .join(vals.select(col("src").as("dst"), col("v")), "v")
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n_common"))
    common.join(broadcast(sizes), "src")
      .withColumn("containment",
        round(col("n_common").cast("double") / col("n_src").cast("double"), 6))
      .filter(col("containment") >= minContainment)
      .select(col("src"), col("dst"), col("n_src"), col("n_common"),
        col("containment"))
  }

  /** Approximate functional-dependency scan (the TANE g3 error, public
    * algorithm — Huhtala et al., Comput. J. 1999): for each directed
    * column pair A→B, the minimum fraction of rows whose removal makes
    * the FD exact: `g3 = 1 − (Σ_a max_b c_ab) / n`. Exact FDs score 0;
    * a key column on the left scores 0 against everything.
    *
    * All counts are exact integers; the single division happens once
    * per pair — fully oracle-replayable. Per pair the plan is one
    * groupBy(A, B) + one groupBy(A) max + one sum: shuffles bounded by
    * distinct counts. Output: (lhs, rhs, n_lhs_groups, g3_error,
    * holds) for every ordered pair of `cols`, `holds` at `epsilon`.
    */
  def fdScan(df: DataFrame, cols: Seq[String],
             epsilon: Double = 0.01): DataFrame = {
    // deliberately NOT checkpointed (unlike indScan): each pair re-reads
    // a column-pruned scan, which is CHEAPER here than materializing the
    // projection — the replayed subtree is a plain scan, not a shuffle
    val n = df.agg(count(lit(1)).as("__n"))
    val pairs = for {
      a <- cols; b <- cols if a != b
    } yield {
      val joint = df
        .groupBy(col(s"`$a`").cast("string").as("__a"),
          col(s"`$b`").cast("string").as("__b"))
        .agg(count(lit(1)).as("__c"))
      joint.groupBy("__a").agg(max(col("__c")).as("__m"))
        .agg(count(lit(1)).as("n_lhs_groups"), sum(col("__m")).as("__keep"))
        .crossJoin(broadcast(n))
        .select(lit(a).as("lhs"), lit(b).as("rhs"), col("n_lhs_groups"),
          round(lit(1.0) - col("__keep").cast("double") / col("__n").cast("double"), 6)
            .as("g3_error"))
    }
    pairs.reduce(_ unionByName _)
      .withColumn("holds", col("g3_error") <= epsilon)
  }

  /** Mutual information between two columns, one output row:
    * (h_a, h_b, mi, nmi) in nats (6 dp), nmi = mi / min(h_a, h_b)
    * (0 when either column is constant). Nulls count as values.
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val pairs = df.select(col(s"`$colA`").cast("string").as("__a"),
      col(s"`$colB`").cast("string").as("__b"))
    val joint = pairs.groupBy("__a", "__b").agg(count(lit(1)).as("__cab"))
    val ma = pairs.groupBy("__a").agg(count(lit(1)).as("__ca"))
    val mb = pairs.groupBy("__b").agg(count(lit(1)).as("__cb"))
    val n = pairs.agg(count(lit(1)).as("__n"))
    // ln((n·c_ab) / (c_a·c_b)) — both operands exact integers, one divide
    val lnr = round(log(
      (col("__n") * col("__cab")).cast("double") /
        (col("__ca") * col("__cb")).cast("double")), 6)
    val miMicro = joint.join(ma, "__a").join(mb, "__b").crossJoin(broadcast(n))
      .select(col("__n"), termMicro(col("__cab"), lnr).as("__tm"))
      .agg(first(col("__n")).as("__n"), sum(col("__tm")).as("__s"))
      .select(col("__n"),
        round(col("__s").cast("double") / col("__n").cast("double")
          / lit(1000000.0), 6).as("mi"))
    val ha = columnEntropy(df, Seq(colA)).select(col("entropy").as("h_a"))
    val hb = columnEntropy(df, Seq(colB)).select(col("entropy").as("h_b"))
    miMicro.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("h_a"), col("h_b"), col("mi"),
        when(least(col("h_a"), col("h_b")) === 0, lit(0.0))
          .otherwise(round(col("mi") / least(col("h_a"), col("h_b")), 6))
          .as("nmi"))
  }

  /** Information-gain feature ranking: `IG(col; label) = MI(col, label)`
    * for every candidate column, ranked — which features are worth a
    * model's attention, measured before any training. Rides the same
    * integer micro-nat MI machinery; `nmi` normalizes by the smaller
    * entropy so high-cardinality columns don't win by noise alone.
    * Output: (col_name, info_gain, nmi), info_gain desc.
    */
  def infoGainRanking(df: DataFrame, cols: Seq[String],
                      labelCol: String): DataFrame =
    cols.map { c =>
      mutualInformation(df, c, labelCol)
        .select(lit(c).as("col_name"), col("mi").as("info_gain"), col("nmi"))
    }.reduce(_ unionByName _)
      .orderBy(col("info_gain").desc, col("col_name"))

  /** Pearson chi-square test of association between two categorical
    * columns, with per-cell contributions and Cramér's V — the
    * contingency-table complement to [[mutualInformation]] (MI measures
    * shared information; chi-square measures deviation from
    * independence, and V normalizes it to [0,1] across table shapes).
    *
    * Exactness: each cell's `(o·n − r·c)` is exact INTEGER before the
    * one double square-and-divide, contributions are round-6 then
    * re-quantized to integer micros, and the chi-square total is their
    * commutative integer sum — partitioning-independent. At extreme
    * counts (o·n beyond ~9·10¹⁸) the integer product would overflow;
    * cells are counts of DISTINCT category pairs, so that needs an
    * n×max(o) above 10¹⁸ — far past any contingency table this report
    * is meant for (guard with a pre-aggregation sample if ever needed).
    *
    * Shape at scale: one (a,b) aggregation; margins and the total are
    * re-aggregations of that tiny grouped relation, broadcast back.
    * Output: one row per cell (a, b, observed, contrib) + constant
    * (chi2, dof, cramers_v, n) columns.
    */
  def chiSquareAssociation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val pairs = df.select(col(s"`$colA`").cast("string").as("a"),
      col(s"`$colB`").cast("string").as("b"))
    val cells = pairs.groupBy("a", "b").agg(count(lit(1)).as("observed"))
    val ra = cells.groupBy("a").agg(sum(col("observed")).as("__ra"))
    val cb = cells.groupBy("b").agg(sum(col("observed")).as("__cb"))
    val tot = cells.agg(sum(col("observed")).as("__n"),
      countDistinct(col("a")).as("__nr"), countDistinct(col("b")).as("__nc"))
    val dev = (col("observed") * col("__n") - col("__ra") * col("__cb"))
      .cast("double")
    // the FULL margin grid, not just observed cells: a zero cell with
    // non-zero expected count still contributes (0−e)²/e — dropping
    // empty cells systematically understates association
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
    val scored = grid.crossJoin(broadcast(tot))
      .withColumn("contrib", round(dev * dev /
        (col("__n") * col("__ra") * col("__cb")).cast("double"), 6))
      .withColumn("__cu", round(col("contrib") * 1000000, 0).cast("long"))
    val chi2 = scored.agg(sum(col("__cu")).as("__chi2u"),
      first(col("__n")).as("__n"), first(col("__nr")).as("__nr"),
      first(col("__nc")).as("__nc"))
      .select(col("__chi2u"), col("__n"),
        ((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
        when(least(col("__nr"), col("__nc")) === 1, lit(0.0)) // degenerate 1×C
          .otherwise(round(sqrt(col("__chi2u").cast("double") / 1000000.0 /
            (col("__n") * least(col("__nr") - 1, col("__nc") - 1)).cast("double")), 6))
          .as("cramers_v"))
    scored.select(col("a"), col("b"), col("observed"), col("contrib"))
      .crossJoin(broadcast(chi2))
      .select(col("a"), col("b"), col("observed"), col("contrib"),
        (col("__chi2u").cast("double") / 1000000.0).as("chi2"),
        col("dof"), col("cramers_v"), col("__n").as("n"))
  }
}
