package graft

/** DuckDB oracle SQL mirroring each SQL-expressible entry in
  * `SparkEntry.queries`. Aliases, rounding, and arithmetic paths match the
  * Spark implementations exactly (decimal-exact money sums, round-6 on
  * order-dependent double aggregates).
  *
  * Sketch queries are verified EXACTLY: the engine's MinHash/SimHash base
  * hash is MD5-derived (`MinHash.md5Low32/md5Low64` == DuckDB
  * `md5_number_lower`), and the permutation constants below are embedded
  * from the same `MinHash.perms()` the engine uses, so DuckDB recomputes
  * whole digests independently and the driver hash-compares them.
  */
object OracleSql {

  /** Synthetic denormalized tail appended to every doc by
    * `t_clean_normalize` so each cleaning stage provably fires:
    * double spaces, decomposed e+COMBINING ACUTE (NFC composes),
    * zero-width space (Cf strip),  (C0 strip), tab + space runs.
    * Shared verbatim with the DuckDB oracle literal.
    */
  val CleanTail: String = "  Cafe\u0301 \u200Bok\u0001!\t fin  "

  // ---------- sketch-oracle building blocks ----------

  private val MersenneP = "2305843009213693951" // 2^61 - 1, MinHash.MersennePrime

  /** The engine's 100 permutation constants as a VALUES CTE. */
  private def permsCte: String = {
    val p = graft.core.MinHash.perms()
    val rows = (0 until graft.core.MinHash.NumPerm)
      .map(i => s"(${i},${p.a(i)},${p.b(i)})").mkString(",")
    s"perms(pi, pa, pb) AS (SELECT * FROM (VALUES $rows) _p(pi, pa, pb))"
  }

  /** min-over-values of one permuted slot: mirrors MinHash.permuteInto —
    * `((a*h + b) mod p) & 0xffffffff` with h = md5Low32(v). */
  private def mhSlotMin(v: String): String =
    s"min(CAST((CAST(pa AS HUGEINT) * CAST((md5_number_lower($v) & 4294967295) AS BIGINT) + pb) % $MersenneP AS BIGINT) & 4294967295)"

  /** Logical schema of the driver lake (verified against the parquet
    * footers) — (column, logical type in the reference's 4-type system). */
  private val lakeSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "integer", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "integer", "n_name" -> "string",
      "n_regionkey" -> "integer"),
    "customer" -> Seq("c_custkey" -> "integer", "c_name" -> "string",
      "c_nationkey" -> "integer", "c_acctbal" -> "float", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "integer", "s_name" -> "string",
      "s_nationkey" -> "integer", "s_acctbal" -> "float"),
    "part" -> Seq("p_partkey" -> "integer", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "integer",
      "p_retailprice" -> "float"),
    "orders" -> Seq("o_orderkey" -> "integer", "o_custkey" -> "integer",
      "o_orderstatus" -> "string", "o_totalprice" -> "float",
      "o_orderdate" -> "date", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "integer", "l_partkey" -> "integer",
      "l_suppkey" -> "integer", "l_linenumber" -> "integer",
      "l_quantity" -> "float", "l_extendedprice" -> "float",
      "l_discount" -> "float", "l_tax" -> "float", "l_returnflag" -> "string",
      "l_linestatus" -> "string", "l_shipdate" -> "date"),
    "documents" -> Seq("doc_id" -> "integer", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "integer"),
    "embeddings" -> Seq("vec_id" -> "integer", "embedding" -> "other",
      "label" -> "integer"),
    "events" -> Seq("event_id" -> "integer", "ts" -> "date",
      "user_id" -> "integer", "event_type" -> "string", "value" -> "float",
      "props" -> "string"))

  /** Long-format values relation for a set of tables: (t, ci, v) with the
    * same string rendering as Profiler.longFormat (P2 empty→null on string
    * columns). `cap` mirrors the engine's deterministic first-N row cap.
    */
  /** Keyed deterministic cap — mirrors `Lake.read(rowCap)`: ORDER BY the
    * table key, so both engines select the SAME first-N rows regardless
    * of parquet row-group scheduling (a bare LIMIT is nondeterministic on
    * parallel scans in both engines). */
  private def cappedSrc(tbl: String, n: Int): String = {
    val keys = graft.sources.Lake.TableKeys(tbl).mkString(", ")
    s"(SELECT * FROM $tbl ORDER BY $keys LIMIT $n)"
  }

  private def valsCte(tables: Seq[String], cap: Option[Int]): String = {
    val selects = tables.flatMap { tbl =>
      val src = cap.map(n => cappedSrc(tbl, n)).getOrElse(tbl)
      lakeSchemas(tbl).zipWithIndex.map { case ((c, lt), i) =>
        val render =
          if (lt == "string") s"nullif(CAST($c AS VARCHAR), '')"
          else s"CAST($c AS VARCHAR)"
        s"SELECT '$tbl' AS t, $i AS ci, $render AS v FROM $src"
      }
    }
    s"vals AS (\n  ${selects.mkString("\n  UNION ALL ")}\n)"
  }

  /** (t, ci, col_name, col_type) metadata VALUES CTE. */
  private def metaCte(tables: Seq[String]): String = {
    val rows = tables.flatMap { tbl =>
      lakeSchemas(tbl).zipWithIndex.map { case ((c, lt), i) =>
        s"('$tbl',$i,'$c','$lt')"
      }
    }.mkString(",")
    s"meta(t, ci, cn, ct) AS (SELECT * FROM (VALUES $rows) _m(t, ci, cn, ct))"
  }

  /** Exact-value + word-token digest CTEs over `vals` → edig(t, ci,
    * mh_exact list) and wdig(t, ci, mh_words list), each slot-ordered. */
  private val digestCtes: String =
    s"""dvals AS (SELECT DISTINCT t, ci, v FROM vals WHERE v IS NOT NULL),
       |emins AS (SELECT t, ci, pi, ${mhSlotMin("v")} AS mh
       |          FROM dvals CROSS JOIN perms GROUP BY t, ci, pi),
       |edig AS (SELECT t, ci, list(mh ORDER BY pi) AS d FROM emins GROUP BY t, ci),
       |wvals AS (SELECT DISTINCT t, ci, tok FROM (
       |            SELECT v.t, v.ci, unnest(string_split_regex(v.v, '\\s+')) AS tok
       |            FROM vals v JOIN meta USING (t, ci)
       |            WHERE v.v IS NOT NULL AND meta.ct = 'string') WHERE tok <> ''),
       |wmins AS (SELECT t, ci, pi, ${mhSlotMin("tok")} AS mh
       |          FROM wvals CROSS JOIN perms GROUP BY t, ci, pi),
       |wdig AS (SELECT t, ci, list(mh ORDER BY pi) AS d FROM wmins GROUP BY t, ci)""".stripMargin

  /** Row-snapshot digest chain shared by content_snapshots /
    * q5_table_search / s7_json_roundtrip: rendered rows per table →
    * distinct → per-perm MinHash → snapd(t, d) digest lists (mirrors
    * Profiler's content-snapshot MinHash over space-joined rows). */
  private def snapshotDigestCtes(tables: Seq[String]): String = {
    val rowSelects = tables.map { tbl =>
      val cols = lakeSchemas(tbl).map { case (c, _) => s"CAST($c AS VARCHAR)" }
      s"SELECT '$tbl' AS t, concat_ws(' ', ${cols.mkString(", ")}) AS rs FROM ${cappedSrc(tbl, 10000)}"
    }
    s"""srows AS (
       |  ${rowSelects.mkString("\n  UNION ALL ")}),
       |sdrows AS (SELECT DISTINCT t, rs FROM srows),
       |smins AS (SELECT t, pi, ${mhSlotMin("rs")} AS mh
       |          FROM sdrows CROSS JOIN perms GROUP BY t, pi),
       |snapd AS (SELECT t, list(mh ORDER BY pi) AS d FROM smins GROUP BY t)""".stripMargin
  }

  /** Per-(t, ci) stats CTE over a `vals(t, ci, v)` relation — the ONE
    * definition of rows/nulls/distincts/byte-width every profile-stats
    * oracle shares. */
  private def statsCte(roundCw: Boolean = true): String = {
    val cw = "CAST(SUM(octet_length(encode(v))) AS DOUBLE) / count(v)"
    s"""stats AS (
       |  SELECT t, ci, count(*) AS n_rows, count(*) - count(v) AS num_nan,
       |         count(DISTINCT v) + CASE WHEN count(*) > count(v) THEN 1 ELSE 0 END AS n_unique,
       |         ${if (roundCw) s"round($cw, 6)" else cw} AS cw
       |  FROM vals GROUP BY t, ci)""".stripMargin
  }

  /** Stats-summary skeleton shared by the unified lake/CSV profile rows:
    * `leadingCtes` must define vals(t, ci, v) and meta(t, ci, cn, ct);
    * `nSelects` feed nvals(t, ci, nv) for numeric/date columns. */
  private def statsProfileSql(leadingCtes: String, nSelects: Seq[String]): String =
    s"""WITH $leadingCtes,
       |${statsCte()},
       |nvals AS (
       |  ${nSelects.mkString("\n  UNION ALL ")}),
       |nstats AS (SELECT t, ci, round(min(nv), 6) AS min_r, round(max(nv), 6) AS max_r
       |           FROM nvals GROUP BY t, ci)
       |SELECT meta.t AS table_name, CAST(meta.ci AS BIGINT) AS col_idx,
       |  meta.cn AS col_name, meta.ct AS col_type,
       |  stats.n_rows, stats.num_nan, stats.n_unique,
       |  CASE WHEN meta.ct = 'string' THEN stats.cw END AS cell_width_r,
       |  nstats.min_r, nstats.max_r
       |FROM meta JOIN stats USING (t, ci)
       |LEFT JOIN nstats USING (t, ci)
       |ORDER BY table_name, col_idx""".stripMargin

  /** profile_sketches: stats + stringified exact/word digests per column of
    * the five dimension tables (mirrors Profiler.profile + the md5 MinHash).
    */
  private def profileSketchesSql: String =
    profileSketchesSqlFor(Seq("customer", "supplier", "nation", "region", "part"))

  private def profileSketchesSqlFor(tables: Seq[String]): String = {
    s"""WITH $permsCte,
       |${valsCte(tables, Some(10000))},
       |${metaCte(tables)},
       |${statsCte()},
       |$digestCtes
       |SELECT meta.t AS table_name, CAST(meta.ci AS BIGINT) AS col_idx,
       |  meta.cn AS col_name, meta.ct AS col_type,
       |  stats.n_rows, stats.num_nan, stats.n_unique,
       |  CASE WHEN meta.ct = 'string' THEN stats.cw END AS cell_width_r,
       |  array_to_string(edig.d, ',') AS mh_exact,
       |  CASE WHEN meta.ct = 'string' THEN array_to_string(wdig.d, ',') END AS mh_words
       |FROM meta JOIN stats USING (t, ci) JOIN edig USING (t, ci)
       |LEFT JOIN wdig USING (t, ci)
       |ORDER BY table_name, col_idx""".stripMargin
  }

  // ---- Q1/Q7 ONNX fixtures (shared with SparkEntry so both sides build
  // from ONE formula; all values exact binary fractions → bit-equality) --
  private[graft] def q1Weight(i: Int, j: Int): Double = ((i + 1) * (j + 2) % 5) * 0.5 - 1.0
  private[graft] def q1Bias(j: Int): Double = 0.1 * (j + 1)

  // ---- q7_transformer_score fixture: a 1-layer 2-head toy encoder whose
  // weights AND inputs come from these closed-form exact-binary-fraction
  // formulas, shared with SparkEntry (which exports them as a real ONNX
  // graph and scores through OnnxSession). The oracle below replays the
  // forward pass as fully UNROLLED SQL with the session's exact
  // summation orders, so every double op except libm exp/tanh is
  // bit-identical (the q7_onnx_score sigmoid precedent). ----------------
  private[graft] val TeN = 12  // batch rows
  private[graft] val TeS = 4   // sequence length
  private[graft] val TeD = 4   // model width
  private[graft] val TeH = 2   // heads
  private[graft] val TeF = 8   // FFN width
  private[graft] def teX(s: Int, d: Int): String = // per-id input expr (SQL `i`)
    s"CAST((i * 13 + ${s * 7 + d * 3}) % 17 AS DOUBLE) * 0.125 - 1.0"
  // layer-indexed weight formulas (l = encoder layer); at l = 0 they
  // coincide with the original single-layer fixture, so the existing
  // q7/q6 hashes are layer-0 slices of the same family
  private[graft] def teWqL(l: Int, h: Int, i: Int, j: Int): Double =
    ((l * 13 + h * 5 + i * 3 + j * 7) % 9 - 4) * 0.125
  private[graft] def teWkL(l: Int, h: Int, i: Int, j: Int): Double =
    ((l * 11 + h * 7 + i * 5 + j * 3) % 9 - 4) * 0.125
  private[graft] def teWvL(l: Int, h: Int, i: Int, j: Int): Double =
    ((l * 7 + h * 3 + i * 7 + j * 5) % 9 - 4) * 0.125
  private[graft] def teWoL(l: Int, i: Int, j: Int): Double =
    ((l * 5 + i * 7 + j * 5 + 1) % 9 - 4) * 0.125
  private[graft] def teBoL(l: Int, j: Int): Double = ((l * 3 + j * 5) % 7 - 3) * 0.0625
  private[graft] def teG1L(l: Int, j: Int): Double = 1.0 + ((l + j) % 3 - 1) * 0.125
  private[graft] def teB1L(l: Int, j: Int): Double = ((l * 2 + j * 3) % 5 - 2) * 0.0625
  private[graft] def teW1L(l: Int, i: Int, j: Int): Double =
    ((l * 7 + i * 11 + j * 3) % 9 - 4) * 0.125
  private[graft] def teBf1L(l: Int, j: Int): Double = ((l + j * 3) % 5 - 2) * 0.125
  private[graft] def teW2L(l: Int, i: Int, j: Int): Double =
    ((l * 3 + i * 7 + j * 5 + 2) % 9 - 4) * 0.0625
  private[graft] def teBf2L(l: Int, j: Int): Double = ((l * 2 + j * 7) % 5 - 2) * 0.0625
  private[graft] def teG2L(l: Int, j: Int): Double = 1.0 + ((l + j) % 2 * 2 - 1) * 0.0625
  private[graft] def teB2L(l: Int, j: Int): Double = ((l * 3 + j * 5 + 1) % 7 - 3) * 0.0625
  private[graft] def teWq(h: Int, i: Int, j: Int): Double = teWqL(0, h, i, j)
  private[graft] def teWk(h: Int, i: Int, j: Int): Double = teWkL(0, h, i, j)
  private[graft] def teWv(h: Int, i: Int, j: Int): Double = teWvL(0, h, i, j)
  private[graft] def teWo(i: Int, j: Int): Double = teWoL(0, i, j)
  private[graft] def teBo(j: Int): Double = teBoL(0, j)
  private[graft] def teG1(j: Int): Double = teG1L(0, j)
  private[graft] def teB1(j: Int): Double = teB1L(0, j)
  private[graft] def teW1(i: Int, j: Int): Double = teW1L(0, i, j)
  private[graft] def teBf1(j: Int): Double = teBf1L(0, j)
  private[graft] def teW2(i: Int, j: Int): Double = teW2L(0, i, j)
  private[graft] def teBf2(j: Int): Double = teBf2L(0, j)
  private[graft] def teG2(j: Int): Double = teG2L(0, j)
  private[graft] def teB2(j: Int): Double = teB2L(0, j)
  private[graft] def teWh(j: Int): Double = ((j * 3 + 1) % 5 - 2) * 0.25
  private[graft] val TeBh = 0.125
  private[graft] val TeScale = 0.707107      // round(1/sqrt(dHead), 6)
  private[graft] val TeEps = 0.0009765625    // 2^-10: float32-exact epsilon

  // ---- the realistic tabular-BERT checkpoint fixture (E4 end-to-end:
  // WordPiece ids → 6-way TabularBertEmbeddings sum → 4-layer encoder →
  // masked mean pool → k-NN). Every weight is a small binary fraction —
  // float32-exact, so the FLOAT32 checkpoint file, the session's double
  // execution, and the oracle's SQL literals all see identical values.
  // Layer internals (wo/g1/w1/…) reuse the teW*L layer-indexed family;
  // the fused QKV below arranges the same per-head projections in the
  // torch [Q|K|V] column layout. --------------------------------------
  private[graft] val TbS = 6    // sequence length ([CLS] + 4 body + [SEP])
  private[graft] val TbD = 4    // model width
  private[graft] val TbH = 2    // heads
  private[graft] val TbF = 8    // FFN width
  private[graft] val TbM = 3    // minhash input width
  private[graft] val TbL = 4    // encoder layers (the "N≥4-layer" stack)
  private[graft] val TbT = 4    // token-type embedding rows
  private[graft] val TbP = 4    // token-position embedding rows
  private[graft] val TbSnip = 18      // snippet chars tokenized per doc
  private[graft] val TbVocabDocs = 20 // vocab built over doc_id ≤ this
  private[graft] val TbVocabMax = 120 // vocab size (whole words stay whole)
  private[graft] val TbDocs = 32     // encoded corpus: doc_id < this
  private[graft] val TbQueries = 4   // k-NN query docs: doc_id < this
  private[graft] val TbTopK = 3
  private[graft] val TbScale = 0.70703125 // 181/256: float32-exact ≈ 1/√dHead
  private[graft] val TbEps = 0.0009765625
  private[graft] def tbWordE(v: Long, d: Int): Double =
    ((v * 7 + d * 3) % 17) * 0.125 - 1.0
  private[graft] def tbTypeE(t: Long, d: Int): Double =
    ((t * 5 + d * 7) % 13) * 0.0625 - 0.375
  private[graft] def tbTokposE(p: Int, d: Int): Double =
    ((p * 3 + d * 5) % 11) * 0.125 - 0.625
  private[graft] def tbPosE(p: Int, d: Int): Double =
    ((p * 7 + d) % 9) * 0.25 - 1.0
  private[graft] def tbWVal(i: Int, j: Int): Double = ((i * 5 + j * 3 + 1) % 9 - 4) * 0.125
  private[graft] def tbBVal(j: Int): Double = ((j * 3) % 5 - 2) * 0.0625
  private[graft] def tbWMin(i: Int, j: Int): Double = ((i * 7 + j * 5 + 2) % 9 - 4) * 0.125
  private[graft] def tbBMin(j: Int): Double = ((j * 5 + 1) % 5 - 2) * 0.0625
  private[graft] def tbGEmb(d: Int): Double = 1.0 + (d % 3 - 1) * 0.125
  private[graft] def tbBEmb(d: Int): Double = ((d * 3) % 5 - 2) * 0.0625
  /** Fused QKV weight [D, 3D] in the torch [Q|K|V] column layout; each
    * block's column (h·dHead + e) is the teW{q,k,v}L per-head entry. */
  private[graft] def tbWqkv(l: Int, i: Int, j: Int): Double = {
    val dh = TbD / TbH
    if (j < TbD) teWqL(l, j / dh, i, j % dh)
    else if (j < 2 * TbD) teWkL(l, (j - TbD) / dh, i, (j - TbD) % dh)
    else teWvL(l, (j - 2 * TbD) / dh, i, (j - 2 * TbD) % dh)
  }
  private[graft] def tbBqkv(l: Int, j: Int): Double = ((l * 5 + j * 3) % 7 - 3) * 0.0625
  // per-token input-vector formulas (functions of the token id/position)
  private[graft] def tbVal(tid: Long, e: Int): Double =
    ((tid * 5 + e * 3) % 13) * 0.125 - 0.75
  private[graft] def tbMh(tid: Long, s: Int, j: Int): Double =
    ((tid * 7 + j * 5 + s) % 11) * 0.25 - 1.25

  /** Full-quadratic TF-IDF cosine self-join oracle over `docsRel` (a
    * table name or parenthesized subquery) — shared by d_cosine_pairs
    * (blocked kernel, whole corpus) and d_cosine_postings (L2AP prefix
    * plan, bounded slice). */
  private def cosinePairsSqlFor(docsRel: String): String =
    s"""WITH tk AS (SELECT doc_id AS id,
       |        unnest(list_filter(string_split_regex(lower(text), '\\s+'),
       |          t -> t <> '')) AS term
       |      FROM $docsRel),
       |tf AS (SELECT id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM $docsRel),
       |w AS (SELECT tf.id, tf.term,
       |        CAST(tf.tf * round((ln((n.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0)
       |          * 1e6, 0) AS BIGINT) AS wq
       |      FROM tf JOIN dfq USING (term), n),
       |norms AS (SELECT id, sum(CAST(wq AS HUGEINT) * CAST(wq AS HUGEINT)) AS n2
       |          FROM w GROUP BY 1),
       |dots AS (SELECT a.id AS id_a, b.id AS id_b,
       |           sum(CAST(a.wq AS HUGEINT) * CAST(b.wq AS HUGEINT)) AS dot
       |         FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
       |         GROUP BY 1, 2)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT id_a, id_b,
       |    round(CAST(dot AS DOUBLE) /
       |      sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cosine
       |  FROM dots JOIN norms na ON dots.id_a = na.id
       |            JOIN norms nb ON dots.id_b = nb.id)
       |WHERE cosine >= 0.9 ORDER BY id_a, id_b""".stripMargin

  /** Unrolled SQL replay of the mini-encoder forward pass. Generated, not
    * hand-written: every matrix product is a left-associated sum in the
    * session kernels' ascending index order; softmax uses GREATEST +
    * exp(x−max)/Σ; LayerNorm is ((x−mean)/sqrt(var+eps))·g+b with
    * population variance; pooling averages positions ascending. */
  /** The encoder CTE chain over any `c0` that provides columns `id` and
    * `x0_{s}_{d}` — shared by the q7 oracles (classifier head, 1 and
    * `layers` deep) and q6 (embedding output). Each layer l reads
    * `x{l}_*`, emits `L{l}_`-prefixed scratch columns, and writes its
    * LayerNorm output as `x{l+1}_*`; the final CTE `cP` exposes
    * (id, pooled_0..pooled_{D−1}) mean-pooled over the LAST layer.
    */
  private def teEncoderCtes(layers: Int, activation: String = "sigmoid"): String = {
    val (s_, d_, h_, f_) = (TeS, TeD, TeH, TeF)
    val dh = d_ / h_
    def f(v: Double): String = { // shortest round-trip double literal
      val t = v.toString
      if (t.contains('E') || t.contains('e')) s"CAST($t AS DOUBLE)" else t
    }
    def sum(ts: Seq[String]): String = ts.mkString("(", " + ", ")")
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = "c0"
    var n = 0
    def cte(cols: Seq[String]): Unit = {
      n += 1
      ctes += s"c$n AS (SELECT *, ${cols.mkString(", ")} FROM $prev)"
      prev = s"c$n"
    }
    for (l <- 0 until layers) {
      val X = s"x${l}_"
      val P = s"L${l}_"
      val O = s"x${l + 1}_"
      // q/k/v per head: [S,dh] = x[S,D] · W[D,dh], d ascending
      val qkv = for {
        (nm, w) <- Seq[(String, (Int, Int, Int) => Double)](
          ("q", teWqL(l, _, _, _)), ("k", teWkL(l, _, _, _)), ("v", teWvL(l, _, _, _)))
        hi <- 0 until h_; si <- 0 until s_; e <- 0 until dh
      } yield sum((0 until d_).map(di => s"$X${si}_$di * ${f(w(hi, di, e))}")) +
        s" AS $P${nm}_${hi}_${si}_$e"
      cte(qkv)
      // scaled attention logits: scl[i][j] = (Σ_e q[i][e]·k[j][e]) · scale
      cte(for (hi <- 0 until h_; i <- 0 until s_; j <- 0 until s_)
        yield sum((0 until dh).map(e => s"${P}q_${hi}_${i}_$e * ${P}k_${hi}_${j}_$e")) +
          s" * $TeScale AS ${P}scl_${hi}_${i}_$j")
      cte(for (hi <- 0 until h_; i <- 0 until s_)
        yield s"GREATEST(${(0 until s_).map(j => s"${P}scl_${hi}_${i}_$j").mkString(", ")})" +
          s" AS ${P}m_${hi}_$i")
      cte(for (hi <- 0 until h_; i <- 0 until s_; j <- 0 until s_)
        yield s"exp(${P}scl_${hi}_${i}_$j - ${P}m_${hi}_$i) AS ${P}e_${hi}_${i}_$j")
      cte(for (hi <- 0 until h_; i <- 0 until s_)
        yield sum((0 until s_).map(j => s"${P}e_${hi}_${i}_$j")) + s" AS ${P}s_${hi}_$i")
      // heads: hd[i][e] = Σ_j (e/s)·v[j][e], j ascending
      cte(for (hi <- 0 until h_; i <- 0 until s_; e <- 0 until dh)
        yield sum((0 until s_).map(j =>
          s"(${P}e_${hi}_${i}_$j / ${P}s_${hi}_$i) * ${P}v_${hi}_${j}_$e")) +
          s" AS ${P}hd_${hi}_${i}_$e")
      // r1[i][d] = ((Σ_c ctx[i][c]·wo[c][d]) + bo[d]) + x[i][d]
      def ctx(i: Int, c: Int) = s"${P}hd_${c / dh}_${i}_${c % dh}"
      cte(for (i <- 0 until s_; di <- 0 until d_)
        yield sum((0 until d_).map(c => s"${ctx(i, c)} * ${f(teWoL(l, c, di))}")) +
          s" + ${f(teBoL(l, di))} + $X${i}_$di AS ${P}r1_${i}_$di")
      def lnCols(src: String, out: String, g: Int => Double, b: Int => Double): Unit = {
        val tag = s"${P}mv${out.replace(P, "")}"
        cte((for (i <- 0 until s_)
          yield sum((0 until d_).map(di => s"${src}_${i}_$di")) +
            s" / ${d_}.0 AS mean_${tag}_$i") ++
          (for (i <- 0 until s_)
            yield sum((0 until d_).map(di =>
              s"(${src}_${i}_$di - mean_${tag}_$i) * (${src}_${i}_$di - mean_${tag}_$i)")) +
              s" / ${d_}.0 AS var_${tag}_$i"))
        cte(for (i <- 0 until s_; di <- 0 until d_)
          yield s"((${src}_${i}_$di - mean_${tag}_$i) / sqrt(var_${tag}_$i + $TeEps))" +
            s" * ${f(g(di))} + ${f(b(di))} AS ${out}${i}_$di")
      }
      lnCols(s"${P}r1", s"${P}l1_", teG1L(l, _), teB1L(l, _))
      // FFN activation: sigmoid shares the literal 1/(1+exp(−z)) formula
      // with the session (DuckDB 1.0 ships no tanh/erf; exp is the only
      // diverging libm call); the tanh variant replays math.tanh as
      // (exp(2z)−1)/(exp(2z)+1) — a ≤1-ulp formula difference absorbed
      // by the 6-dp rounding discipline
      if (activation == "gelu" || activation == "gelu_erf") {
        // both GELU spellings need the pre-activation z as its own CTE
        // column (the session's f1 node output)
        cte(for (i <- 0 until s_; fi <- 0 until f_)
          yield sum((0 until d_).map(di =>
            s"${P}l1_${i}_$di * ${f(teW1L(l, di, fi))}")) +
            s" + ${f(teBf1L(l, fi))} AS ${P}f1_${i}_$fi")
      }
      if (activation == "gelu") {
        // GELU replays the session's decomposed tanh-approx node chain:
        // 0.5·z·(1+tanh(√(2/π)·(z+0.044715·z³))) with tanh in the
        // SATURATING exp spelling 1 − 2/(exp(2a)+1): ≤1 ulp from
        // math.tanh on bounded args (inside the 6-dp rounding
        // discipline) AND it degrades to 1.0 instead of inf/inf = NaN
        // when exp(2a) overflows — matching math.tanh's saturation
        cte(for (i <- 0 until s_; fi <- 0 until f_) yield {
          val z = s"${P}f1_${i}_$fi"
          val arg = s"(($z + (($z * $z) * $z) * 0.044715) * 0.7978845608028654)"
          s"(($z * ((1.0 - 2.0 / (exp(2.0 * $arg) + 1.0)) + 1.0))" +
            s" * 0.5) AS ${P}f2_${i}_$fi"
        })
      } else if (activation == "gelu_erf") {
        // exact GELU 0.5·z·(1+erf(z/√2)): the session executes the
        // Div→Erf→Add→Mul→Mul chain with erf as the A&S 7.1.26
        // polynomial — plain arithmetic, so the oracle replays the SAME
        // polynomial term-for-term (exp is the only libm call); the
        // intermediate t needs its own CTE level to be referenced five
        // times, and `a` (= z/√2) one before that
        cte(for (i <- 0 until s_; fi <- 0 until f_)
          yield s"(${P}f1_${i}_$fi / 1.4142135623730951) AS ${P}ga_${i}_$fi")
        cte(for (i <- 0 until s_; fi <- 0 until f_)
          yield s"(1.0 / (1.0 + 0.3275911 * abs(${P}ga_${i}_$fi)))" +
            s" AS ${P}gt_${i}_$fi")
        cte(for (i <- 0 until s_; fi <- 0 until f_) yield {
          val z = s"${P}f1_${i}_$fi"
          val a = s"${P}ga_${i}_$fi"
          val t = s"${P}gt_${i}_$fi"
          // y = 1 − ((((((a1·t + a2)·t + a3)·t + a4)·t + a5)·t) · exp(−a²)),
          // associated exactly as the session's Scala expression
          val y = s"(1.0 - ((((((1.061405429 * $t - 1.453152027) * $t)" +
            s" + 1.421413741) * $t - 0.284496736) * $t + 0.254829592) * $t)" +
            s" * exp((-$a) * $a))"
          val erf = s"(CASE WHEN $a >= 0 THEN $y ELSE -$y END)"
          s"(($z * ($erf + 1.0)) * 0.5) AS ${P}f2_${i}_$fi"
        })
      } else cte(for (i <- 0 until s_; fi <- 0 until f_) yield {
        val z = sum((0 until d_).map(di =>
          s"${P}l1_${i}_$di * ${f(teW1L(l, di, fi))}")) + s" + ${f(teBf1L(l, fi))}"
        val a = activation match {
          case "sigmoid" => s"1.0 / (1.0 + exp(-($z)))"
          // saturating spelling: 1 − 2/(exp(2z)+1) degrades to 1.0 (not
          // inf/inf = NaN) on overflow, matching math.tanh
          case "tanh" => s"(1.0 - 2.0 / (exp(2.0 * ($z)) + 1.0))"
          case other => throw new IllegalArgumentException(
            s"unsupported oracle FFN activation '$other'")
        }
        s"$a AS ${P}f2_${i}_$fi"
      })
      cte(for (i <- 0 until s_; di <- 0 until d_)
        yield sum((0 until f_).map(fi => s"${P}f2_${i}_$fi * ${f(teW2L(l, fi, di))}")) +
          s" + ${f(teBf2L(l, di))} + ${P}l1_${i}_$di AS ${P}r2_${i}_$di")
      lnCols(s"${P}r2", O, teG2L(l, _), teB2L(l, _))
    }
    val pooled = for (di <- 0 until d_)
      yield sum((0 until s_).map(i => s"x${layers}_${i}_$di")) +
        s" / ${s_}.0 AS pooled_$di"
    ctes += s"cP AS (SELECT id, ${pooled.mkString(", ")} FROM $prev)"
    ctes.mkString(", ")
  }

  private def q7TransformerSql(layers: Int, activation: String = "sigmoid"): String = {
    def f(v: Double): String = v.toString
    val xsCols = for (si <- 0 until TeS; di <- 0 until TeD)
      yield s"${teX(si, di)} AS x0_${si}_$di"
    val z = (0 until TeD).map(di => s"pooled_$di * ${f(teWh(di))}")
      .mkString("(", " + ", ")") + s" + $TeBh"
    s"WITH c0 AS (SELECT i AS id, ${xsCols.mkString(", ")} " +
      s"FROM generate_series(1, $TeN) t(i)), " + teEncoderCtes(layers, activation) + "\n" +
      s"SELECT CAST(id AS BIGINT) AS id, round(1.0 / (1.0 + exp(-($z))), 6) AS score_r " +
      "FROM cP ORDER BY id"
  }

  private def q7TransformerScoreSql: String = q7TransformerSql(1)

  /** q7_encoder_tanh: the BERT-family Tanh activation under the oracle —
    * the session executes the Tanh node (correctly-rounded math.tanh);
    * DuckDB replays it as (exp(2z)−1)/(exp(2z)+1). */
  private def q7EncoderTanhSql: String = q7TransformerSql(1, "tanh")

  /** q7_encoder_gelu: BERT's actual activation (`transformer_bert.py`
    * uses the BERT GELU) in the tanh approximation — the session executes
    * the decomposed Mul/Add/Tanh node chain a torch approximate='tanh'
    * export emits; the oracle replays the same chain with DuckDB's
    * exp-based tanh spelling. */
  private def q7EncoderGeluSql: String = q7TransformerSql(1, "gelu")

  /** q7_encoder_gelu_exact: GELU in the EXACT (erf) form — the chain a
    * default torch `nn.GELU()` export writes (Div→Erf→Add→Mul→Mul). The
    * session's Erf node is the A&S 7.1.26 polynomial; the oracle replays
    * the same polynomial term-for-term (plain arithmetic + exp), so the
    * two engines agree to libm-exp rounding — completing the
    * torch-activation matrix (Sigmoid/Tanh/Relu/tanh-GELU/exact-GELU). */
  private def q7EncoderGeluExactSql: String = q7TransformerSql(1, "gelu_erf")

  /** q6_value_embed oracle: token ids from the md5-low32 hash family
    * (`md5_number_lower`, the engine's proven-parity hash), a closed-form
    * embedding table, the shared unrolled encoder, pooled output
    * float-narrowed exactly like `ExternalEmbedder`. */
  private def q6ValueEmbedSql: String = {
    val toks = (0 until TeS).map { si =>
      s"COALESCE((md5_number_lower(list_extract(w, ${si + 1})) & 4294967295) % 64, 0)" +
        s" AS tid_$si"
    }
    val xs = for (si <- 0 until TeS; di <- 0 until TeD)
      yield s"CAST((tid_$si * 7 + ${di * 3}) % 17 AS DOUBLE) * 0.125 - 1.0 AS x0_${si}_$di"
    val outs = (0 until TeD).map(di =>
      s"round(CAST(CAST(pooled_$di AS REAL) AS DOUBLE), 6) AS e${di}_r")
    s"""WITH dv AS (SELECT doc_id AS id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
       |  FROM documents WHERE doc_id <= 48),
       |tids AS (SELECT id, ${toks.mkString(", ")} FROM dv),
       |c0 AS (SELECT id, ${xs.mkString(", ")} FROM tids), """.stripMargin +
      teEncoderCtes(1) + "\n" +
      s"SELECT CAST(id AS BIGINT) AS doc_id, ${outs.mkString(", ")} FROM cP ORDER BY doc_id"
  }

  /** st_stream_embed oracle: the q6_value_embed per-doc replay (same
    * tokens, features, unrolled encoder, float narrowing, 6-dp rounds)
    * joined back to `documents` for the language and rolled up —
    * COUNT(*) plus per-dimension DECIMAL(18,6) checksums, the
    * aggregation-order-independent form the streaming complete-mode agg
    * computes micro-batch-side. Streamed == batch IS this compare. */
  private def stStreamEmbedSql: String = {
    val sums = (0 until TeD).map(di =>
      s"CAST(SUM(CAST(e${di}_r AS DECIMAL(18,6))) AS DOUBLE) AS sum_e$di")
    s"""WITH per_doc AS (${q6ValueEmbedSql}),
       |langs AS (SELECT doc_id, lang FROM documents WHERE doc_id <= 48)
       |SELECT l.lang AS lang, COUNT(*) AS n_docs, ${sums.mkString(", ")}
       |FROM per_doc e JOIN langs l ON e.doc_id = l.doc_id
       |GROUP BY l.lang ORDER BY lang""".stripMargin
  }

  /** Unrolled SQL replay of the realistic-checkpoint encoder stack: like
    * [[teEncoderCtes]] but with (a) FUSED-QKV biases on q/k/v, (b) the
    * additive attention mask `em_j` on every logit before the softmax
    * max-subtraction, (c) Tb dimensions (S=6, 4 layers), and (d) a
    * MASKED mean pool. Expects a CTE `c0` exposing `id`, `x0_{i}_{d}`,
    * `m_0..m_{S−1}` and `em_0..em_{S−1}`; emits `cP` with
    * (id, pooled_0..pooled_{D−1}). Summation orders mirror the session
    * kernels exactly (k ascending, lanes ascending). */
  private def tbEncoderCtes: String = {
    val (s_, d_, h_, f_, layers) = (TbS, TbD, TbH, TbF, TbL)
    val dh = d_ / h_
    def f(v: Double): String = {
      val t = v.toString
      if (t.contains('E') || t.contains('e')) s"CAST($t AS DOUBLE)" else t
    }
    def sum(ts: Seq[String]): String = ts.mkString("(", " + ", ")")
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = "c0"
    var n = 0
    def cte(cols: Seq[String]): Unit = {
      n += 1
      ctes += s"t$n AS (SELECT *, ${cols.mkString(", ")} FROM $prev)"
      prev = s"t$n"
    }
    for (l <- 0 until layers) {
      val X = s"x${l}_"
      val P = s"L${l}_"
      val O = s"x${l + 1}_"
      // fused-QKV projections WITH bias: the torch Linear layout
      // [Q|K|V]; block column (h·dh + e) of block `off`
      val qkv = for {
        (nm, off) <- Seq(("q", 0), ("k", d_), ("v", 2 * d_))
        hi <- 0 until h_; si <- 0 until s_; e <- 0 until dh
      } yield sum((0 until d_).map(di =>
          s"$X${si}_$di * ${f(tbWqkv(l, di, off + hi * dh + e))}")) +
        s" + ${f(tbBqkv(l, off + hi * dh + e))} AS $P${nm}_${hi}_${si}_$e"
      cte(qkv)
      // masked scaled logits: (Σ_e q·k)·scale + em_j (pad keys → −10000)
      cte(for (hi <- 0 until h_; i <- 0 until s_; j <- 0 until s_)
        yield sum((0 until dh).map(e => s"${P}q_${hi}_${i}_$e * ${P}k_${hi}_${j}_$e")) +
          s" * $TbScale + em_$j AS ${P}scl_${hi}_${i}_$j")
      cte(for (hi <- 0 until h_; i <- 0 until s_)
        yield s"GREATEST(${(0 until s_).map(j => s"${P}scl_${hi}_${i}_$j").mkString(", ")})" +
          s" AS ${P}m_${hi}_$i")
      cte(for (hi <- 0 until h_; i <- 0 until s_; j <- 0 until s_)
        yield s"exp(${P}scl_${hi}_${i}_$j - ${P}m_${hi}_$i) AS ${P}e_${hi}_${i}_$j")
      cte(for (hi <- 0 until h_; i <- 0 until s_)
        yield sum((0 until s_).map(j => s"${P}e_${hi}_${i}_$j")) + s" AS ${P}s_${hi}_$i")
      cte(for (hi <- 0 until h_; i <- 0 until s_; e <- 0 until dh)
        yield sum((0 until s_).map(j =>
          s"(${P}e_${hi}_${i}_$j / ${P}s_${hi}_$i) * ${P}v_${hi}_${j}_$e")) +
          s" AS ${P}hd_${hi}_${i}_$e")
      def ctx(i: Int, c: Int) = s"${P}hd_${c / dh}_${i}_${c % dh}"
      cte(for (i <- 0 until s_; di <- 0 until d_)
        yield sum((0 until d_).map(c => s"${ctx(i, c)} * ${f(teWoL(l, c, di))}")) +
          s" + ${f(teBoL(l, di))} + $X${i}_$di AS ${P}r1_${i}_$di")
      def lnCols(src: String, out: String, g: Int => Double, b: Int => Double): Unit = {
        val tag = s"${P}mv${out.replace(P, "")}"
        cte((for (i <- 0 until s_)
          yield sum((0 until d_).map(di => s"${src}_${i}_$di")) +
            s" / ${d_}.0 AS mean_${tag}_$i") ++
          (for (i <- 0 until s_)
            yield sum((0 until d_).map(di =>
              s"(${src}_${i}_$di - mean_${tag}_$i) * (${src}_${i}_$di - mean_${tag}_$i)")) +
              s" / ${d_}.0 AS var_${tag}_$i"))
        cte(for (i <- 0 until s_; di <- 0 until d_)
          yield s"((${src}_${i}_$di - mean_${tag}_$i) / sqrt(var_${tag}_$i + $TbEps))" +
            s" * ${f(g(di))} + ${f(b(di))} AS ${out}${i}_$di")
      }
      lnCols(s"${P}r1", s"${P}l1_", teG1L(l, _), teB1L(l, _))
      // Sigmoid FFN (the shared-exp-formula oracle discipline)
      cte(for (i <- 0 until s_; fi <- 0 until f_)
        yield s"1.0 / (1.0 + exp(-(" +
          sum((0 until d_).map(di => s"${P}l1_${i}_$di * ${f(teW1L(l, di, fi))}")) +
          s" + ${f(teBf1L(l, fi))}))) AS ${P}f2_${i}_$fi")
      cte(for (i <- 0 until s_; di <- 0 until d_)
        yield sum((0 until f_).map(fi => s"${P}f2_${i}_$fi * ${f(teW2L(l, fi, di))}")) +
          s" + ${f(teBf2L(l, di))} + ${P}l1_${i}_$di AS ${P}r2_${i}_$di")
      lnCols(s"${P}r2", O, teG2L(l, _), teB2L(l, _))
    }
    // masked mean pool: Σ_i x·m_i / Σ_i m_i, both ascending
    val cnt = sum((0 until s_).map(i => s"m_$i"))
    val pooled = for (di <- 0 until d_)
      yield sum((0 until s_).map(i => s"x${layers}_${i}_$di * m_$i")) +
        s" / $cnt AS pooled_$di"
    ctes += s"cP AS (SELECT id, ${pooled.mkString(", ")} FROM $prev)"
    ctes.mkString(", ")
  }

  /** Shared recursive-CTE WordPiece replay (the t2_wordpiece machinery,
    * parameterized): the vocab is built from the 18-char doc snippets
    * (doc_id ≤ TbVocabDocs, maxSize TbVocabMax — the TRAINED vocab
    * relation), then greedy longest-match segmentation +
    * [CLS]/body≤(TbS−2)/[SEP] encoding of `srcSql` rows
    * `(eid, etext)` (etext already lowercased; may reference `sn`).
    * Emits CTEs `sn … enc(eid, ids)`; callers continue from `enc` and
    * must open the statement with WITH RECURSIVE (the `walk` CTE). */
  private def tbWordpieceCtes(srcSql: String): String = {
    val bodySlots = TbS - 2
    s"""sn AS (SELECT doc_id, lower(substr(text, 1, $TbSnip)) AS sniptext
       |       FROM documents WHERE doc_id < $TbDocs),
       |src AS ($srcSql),
       |words AS (
       |  SELECT w FROM (
       |    SELECT unnest(regexp_split_to_array(sniptext, '\\s+')) AS w
       |    FROM sn WHERE doc_id <= $TbVocabDocs) WHERE w <> ''),
       |chars AS (
       |  SELECT DISTINCT c AS piece FROM (
       |    SELECT unnest(string_split(w, '')) AS c
       |    FROM (SELECT DISTINCT w FROM words)) WHERE c <> ''),
       |cand AS (
       |  SELECT piece, 9223372036854775807 AS freq FROM chars
       |  UNION ALL SELECT '##' || piece, 9223372036854775807 FROM chars
       |  UNION ALL SELECT w AS piece, count(*) AS freq FROM words GROUP BY w),
       |lim AS (
       |  SELECT piece, max(freq) AS freq FROM cand GROUP BY piece
       |  ORDER BY max(freq) DESC, piece LIMIT ${TbVocabMax - 4}),
       |vocab AS (
       |  SELECT piece, CAST(id AS BIGINT) AS id FROM (VALUES
       |    ('[PAD]', 0), ('[UNK]', 1), ('[CLS]', 2), ('[SEP]', 3)) sp(piece, id)
       |  UNION ALL
       |  SELECT piece, CAST(row_number() OVER (ORDER BY freq DESC, piece) + 3 AS BIGINT)
       |  FROM lim),
       |dw AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(regexp_split_to_array(etext, '\\s+')) AS w
       |    FROM src) WHERE w <> ''),
       |pieces AS (
       |  SELECT id, piece LIKE '##%' AS cont,
       |    CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS core
       |  FROM vocab WHERE piece NOT LIKE '[%'),
       |wp AS (SELECT w, unnest(generate_series(1, length(w))) AS pos FROM dw),
       |best AS (
       |  SELECT wp.w, wp.pos, arg_max(p.id, length(p.core)) AS pid,
       |    max(length(p.core)) AS plen
       |  FROM wp JOIN pieces p
       |    ON p.cont = (wp.pos > 1)
       |   AND substr(wp.w, wp.pos, length(p.core)) = p.core
       |  GROUP BY wp.w, wp.pos),
       |walk(w, pos, ids) AS (
       |  SELECT w, 1, CAST([] AS BIGINT[]) FROM dw
       |  UNION ALL
       |  SELECT x.w, x.pos + b.plen, list_append(x.ids, b.pid)
       |  FROM walk x JOIN best b ON b.w = x.w AND b.pos = x.pos),
       |wseg AS (
       |  SELECT d.w,
       |    coalesce(t.ids, list_value((SELECT id FROM vocab WHERE piece = '[UNK]'))) AS ids
       |  FROM dw d LEFT JOIN
       |    (SELECT w, ids FROM walk WHERE pos = length(w) + 1) t ON t.w = d.w),
       |toks AS (
       |  SELECT eid, w, o FROM (
       |    SELECT eid,
       |      unnest(regexp_split_to_array(etext, '\\s+')) AS w,
       |      unnest(generate_series(1, len(regexp_split_to_array(etext, '\\s+')))) AS o
       |    FROM src) WHERE w <> ''),
       |enc AS (
       |  SELECT t.eid,
       |    list_concat(
       |      list_value((SELECT id FROM vocab WHERE piece = '[CLS]')),
       |      list_append(
       |        list_slice(flatten(list(s.ids ORDER BY t.o)), 1, $bodySlots),
       |        (SELECT id FROM vocab WHERE piece = '[SEP]'))) AS ids
       |  FROM toks t JOIN wseg s ON s.w = t.w GROUP BY t.eid)""".stripMargin
  }

  /** q6_vocab_embed oracle: the distinct-value heads (the A16 relation)
    * run through the SAME trained WordPiece vocab and the checkpoint's
    * word-embedding table formula — the tokenizer → embedding-table
    * value-enrichment path (`embedding_search.py:25-42`), mean over the
    * real (unpadded) positions. All table values are multiples of 1/8,
    * so the position sum is exact in double and order-independent. */
  private def q6VocabEmbedSql: String = {
    val valSrcs = Seq(
      ("documents", "lang"), ("documents", "source"), ("events", "event_type"),
      ("orders", "o_orderstatus"), ("orders", "o_orderpriority"))
    val union = valSrcs.map { case (tbl, c) =>
      s"SELECT DISTINCT CAST($c AS VARCHAR) AS eid FROM $tbl" }
      .mkString(" UNION ")
    val pairsUnion = valSrcs.map { case (tbl, c) =>
      s"SELECT DISTINCT '$tbl.$c' AS col_ref, CAST($c AS VARCHAR) AS value_str FROM $tbl" }
      .mkString(" UNION ALL ")
    val sums = (0 until TbD).map { dd =>
      val terms = (0 until TbS).map(i =>
        s"CASE WHEN $i < ntok THEN ((COALESCE(ids[${i + 1}], 0) * 7 + ${dd * 3}) % 17) * 0.125 - 1.0 ELSE 0.0 END")
      s"round(${terms.mkString("(", " + ", ")")} / ntok, 6) AS e${dd}_r"
    }
    "WITH RECURSIVE\n" +
      tbWordpieceCtes(s"SELECT eid, lower(eid) AS etext FROM ($union)") + s""",
       |vemb AS (
       |  SELECT eid, ${sums.mkString(", ")}
       |  FROM (SELECT eid, ids, LEAST(len(ids), $TbS) AS ntok FROM enc)),
       |vout AS ($pairsUnion)
       |SELECT v.col_ref, v.value_str, e.e0_r, e.e1_r, e.e2_r, e.e3_r
       |FROM vout v JOIN vemb e ON e.eid = v.value_str
       |ORDER BY v.col_ref, v.value_str""".stripMargin
  }

  /** e2e_encode_search oracle: replay the WHOLE product loop in SQL —
    * recursive-CTE WordPiece (vocab build + greedy segmentation, the
    * t2_wordpiece machinery over 18-char snippets), the 6-way
    * TabularBertEmbeddings sum with the graph's exact add association,
    * the embedding LayerNorm, four masked encoder layers
    * ([[tbEncoderCtes]]), the masked mean pool, the float32 narrow, and
    * the ranked cosine top-k. */
  private def e2eEncodeSearchSql: String = {
    val (s_, d_) = (TbS, TbD)
    def f(v: Double): String = {
      val t = v.toString
      if (t.contains('E') || t.contains('e')) s"CAST($t AS DOUBLE)" else t
    }
    def sum(ts: Seq[String]): String = ts.mkString("(", " + ", ")")
    val bodySlots = s_ - 2
    val tidCols = (0 until s_).map(i => s"COALESCE(e.ids[${i + 1}], 0) AS tid_$i")
    val mCols = (0 until s_).map(i =>
      s"CASE WHEN $i < ntok THEN 1.0 ELSE 0.0 END AS m_$i")
    val emCols = (0 until s_).map(i => s"(m_$i - 1.0) * 10000.0 AS em_$i")
    // the graph's association: ((((we+te)+tpe)+pp)+(v·W+bV))+(m·W+bM)
    val pCols = for (i <- 0 until s_; dd <- 0 until d_) yield {
      val wE = s"(((tid_$i * 7 + ${dd * 3}) % 17) * 0.125 - 1.0)"
      val tyE = s"(((ty * 5 + ${dd * 7}) % 13) * 0.0625 - 0.375)"
      val tpE = f(tbTokposE(i % TbP, dd))
      val pE = f(tbPosE(i, dd))
      val vdot = sum((0 until d_).map(e =>
        s"(((tid_$i * 5 + ${e * 3}) % 13) * 0.125 - 0.75) * ${f(tbWVal(e, dd))}"))
      val mdot = sum((0 until TbM).map(j =>
        s"(((tid_$i * 7 + ${j * 5 + i}) % 11) * 0.25 - 1.25) * ${f(tbWMin(j, dd))}"))
      s"(((($wE + $tyE) + $tpE) + $pE) + ($vdot + ${f(tbBVal(dd))}))" +
        s" + ($mdot + ${f(tbBMin(dd))}) AS p_${i}_$dd"
    }
    val meanCols = (0 until s_).map(i =>
      sum((0 until d_).map(dd => s"p_${i}_$dd")) + s" / ${d_}.0 AS meanE_$i")
    val varCols = (0 until s_).map(i =>
      sum((0 until d_).map(dd =>
        s"(p_${i}_$dd - meanE_$i) * (p_${i}_$dd - meanE_$i)")) +
        s" / ${d_}.0 AS varE_$i")
    val x0Cols = for (i <- 0 until s_; dd <- 0 until d_) yield
      s"((p_${i}_$dd - meanE_$i) / sqrt(varE_$i + $TbEps))" +
        s" * ${f(tbGEmb(dd))} + ${f(tbBEmb(dd))} AS x0_${i}_$dd"
    val embCols = (0 until d_).map(dd =>
      s"CAST(CAST(pooled_$dd AS REAL) AS DOUBLE) AS e$dd")
    // Ann.bruteForceTopK's arithmetic: per-vector norm computed ONCE
    // (sqrt of the index-ascending square sum), cosine = dot/(n_a·n_b)
    // with the zero-norm-product guard, 6-dp round
    val dot = sum((0 until d_).map(k => s"a.e$k * b.e$k"))
    val nrm = "sqrt(" + sum((0 until d_).map(k => s"e$k * e$k")) + ")"
    s"""WITH RECURSIVE
       |${tbWordpieceCtes("SELECT doc_id AS eid, sniptext AS etext FROM sn")},
       |seq AS (
       |  SELECT e.eid AS id, len(e.ids) AS ntok,
       |    ascii(substr(d.lang, 1, 1)) % $TbT AS ty,
       |    ${tidCols.mkString(", ")}
       |  FROM enc e JOIN documents d ON d.doc_id = e.eid),
       |cm AS (SELECT *, ${mCols.mkString(", ")} FROM seq),
       |cmm AS (SELECT *, ${emCols.mkString(", ")} FROM cm),
       |ce AS (SELECT *, ${pCols.mkString(", ")} FROM cmm),
       |cv AS (SELECT *, ${meanCols.mkString(", ")}, ${varCols.mkString(", ")} FROM ce),
       |c0 AS (SELECT *, ${x0Cols.mkString(", ")} FROM cv),
       |""".stripMargin + tbEncoderCtes + s""",
       |emb0 AS (SELECT id AS doc_id, ${embCols.mkString(", ")} FROM cP),
       |emb AS (SELECT *, $nrm AS nrm FROM emb0),
       |pr AS (
       |  SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
       |    CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
       |         ELSE round($dot / (a.nrm * b.nrm), 6) END AS sim_r
       |  FROM emb a JOIN emb b ON b.doc_id <> a.doc_id
       |  WHERE a.doc_id < $TbQueries),
       |rk AS (
       |  SELECT query_id, doc_id, sim_r,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, doc_id) AS rnk
       |  FROM pr)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rnk,
       |  CAST(doc_id AS BIGINT) AS doc_id, sim_r
       |FROM rk WHERE rnk <= $TbTopK ORDER BY query_id, rnk""".stripMargin
  }

  /** q7_onnx_score: recompute sigmoid(coef·x + b) from the exported JSON
    * twin of the ONNX head over the same feature formulas. The engine
    * side scores through the parsed ONNX ModelProto, so a wire-format,
    * parse, or execution bug breaks the hash. */
  private def q7OnnxScoreSql: String =
    """WITH m AS (
      |  SELECT * FROM read_json_auto('/tmp/graft_fixtures/q7_head.json')),
      |xs AS (
      |  SELECT i, (i % 7) * 0.5 - 1.5 AS x1, (i % 5) * 0.25 AS x2,
      |         (i % 3) * 1.0 - 1.0 AS x3
      |  FROM generate_series(1, 40) t(i))
      |SELECT CAST(i AS BIGINT) AS id,
      |  round(1.0 / (1.0 + exp(-(
      |    m.coefficients[1] * x1 + m.coefficients[2] * x2 +
      |    m.coefficients[3] * x3 + m.intercept))), 6) AS score_r
      |FROM xs, m ORDER BY id""".stripMargin

  /** q1_embed_extract: replay mean-pooling + the exported linear map
    * (weights from the shared [[q1Weight]]/[[q1Bias]] formulas) with the
    * ONNX session's summation order, float-narrowed like the embedder. */
  private def q1EmbedExtractSql: String = {
    val terms = (0 until 2).map { j =>
      val dot = (0 until 3).map(i => s"p$i * ${q1Weight(i, j)}").mkString(" + ")
      s"round(CAST(CAST($dot + ${q1Bias(j)} AS REAL) AS DOUBLE), 6) AS e${j}_r"
    }
    s"""WITH toks AS (
       |  SELECT c AS col_id, s, ((c * 7 + t * 3 + s) % 11) * 0.25 - 1.0 AS v
       |  FROM generate_series(1, 6) a(c), generate_series(1, 4) b(t),
       |       generate_series(0, 2) d(s)),
       |pooled AS (
       |  SELECT col_id,
       |    avg(CASE WHEN s = 0 THEN v END) AS p0,
       |    avg(CASE WHEN s = 1 THEN v END) AS p1,
       |    avg(CASE WHEN s = 2 THEN v END) AS p2
       |  FROM toks GROUP BY col_id)
       |SELECT CAST(col_id AS BIGINT) AS col_id, ${terms.mkString(", ")}
       |FROM pooled ORDER BY col_id""".stripMargin
  }

  /** lake_csv_unified: DuckDB re-reads the CSV fixture lake (written by
    * `SparkEntry.lakeCsvUnifiedQ` before oracles run) with PINNED column
    * types — the types Spark's inference must produce — and recomputes
    * the per-column stats, cross-checking the executor-side decode's
    * sniffing, tokenization, inference replay, date promotion, and the
    * decimal-file reject routing. `tiny.csv` (<5 rows) must be absent.
    */
  private def lakeCsvUnifiedSql: String = {
    val dir = "/tmp/graft_fixtures/csv_lake"
    // (cteName, tableLiteral, reader, cols: (name, colType, v, nv))
    val tables: Seq[(String, String, String, Seq[(String, String, String, String)])] = Seq(
      ("calpha", "alpha",
        // seen reads as VARCHAR: duckdb's TIMESTAMP cast needs seconds,
        // the fixture exercises the no-seconds grammar Spark accepts
        s"""SELECT *, strptime("when", '%Y/%m/%d') AS wh_d,
           |  CAST(CASE WHEN length(seen) = 16 THEN seen || ':00' ELSE seen END AS TIMESTAMP) AS seen_t
           |  FROM read_csv('$dir/alpha.csv', header=true, dateformat='%Y-%m-%d', columns={'id':'BIGINT','amount':'DOUBLE','big':'BIGINT','flag':'BOOLEAN','day':'DATE','seen':'VARCHAR','note':'VARCHAR','when':'VARCHAR'})""".stripMargin,
        Seq(
          ("id", "integer", "CAST(id AS VARCHAR)", "CAST(id AS DOUBLE)"),
          ("amount", "float", "CAST(amount AS VARCHAR)", "amount"),
          ("big", "integer", "CAST(big AS VARCHAR)", "CAST(big AS DOUBLE)"),
          ("flag", "string", "CAST(flag AS VARCHAR)", null),
          ("day", "date", "CAST(day AS VARCHAR)", "floor(epoch(day))"),
          ("seen", "date", "CAST(seen_t AS VARCHAR)", "floor(epoch(seen_t))"),
          ("note", "string", "note", null),
          // promoted: classified date, values stay strings (no numerics)
          ("when", "date", "\"when\"", null),
          ("when_DATE", "date", "CAST(wh_d AS VARCHAR)", "floor(epoch(wh_d))"))),
      ("cbeta", "beta",
        s"""SELECT * FROM read_csv('$dir/beta.csv', header=true, delim=';', columns={'k':'BIGINT','v':'VARCHAR','w':'DOUBLE'})""",
        Seq(
          ("k", "integer", "CAST(k AS VARCHAR)", "CAST(k AS DOUBLE)"),
          ("v", "string", "v", null),
          ("w", "float", "CAST(w AS VARCHAR)", "w"))),
      ("cgamma", "gamma",
        s"""SELECT * FROM read_csv('$dir/gamma.csv.gz', header=true, columns={'x':'BIGINT','y':'VARCHAR'})""",
        Seq(
          ("x", "integer", "CAST(x AS VARCHAR)", "CAST(x AS DOUBLE)"),
          ("y", "string", "y", null))),
      ("crowidx", "rowidx",
        s"""SELECT * FROM read_csv('$dir/rowidx.csv', header=true, columns={'row_index':'BIGINT','name':'VARCHAR','val':'BIGINT'})""",
        Seq( // row_index dropped (S4); sanitized names
          ("name", "string", "name", null),
          ("val", "integer", "CAST(val AS VARCHAR)", "CAST(val AS DOUBLE)"))),
      ("cdec", "dec",
        s"""SELECT * FROM read_csv('$dir/dec.csv', header=true, columns={'id':'BIGINT','huge':'DECIMAL(23,0)'})""",
        Seq( // the reject-routed file: driver chain reads it as decimal
          ("id", "integer", "CAST(id AS VARCHAR)", "CAST(id AS DOUBLE)"),
          ("huge", "float", "CAST(huge AS VARCHAR)", "CAST(huge AS DOUBLE)"))))
    val ctes = tables.map { case (cte, _, rdr, _) => s"$cte AS (\n$rdr)" }
    val vSelects = tables.flatMap { case (cte, tbl, _, cols) =>
      cols.zipWithIndex.map { case ((_, _, v, _), i) =>
        s"SELECT '$tbl' AS t, $i AS ci, $v AS v FROM $cte"
      }
    }
    val nSelects = tables.flatMap { case (cte, tbl, _, cols) =>
      cols.zipWithIndex.collect { case ((_, _, _, nv), i) if nv != null =>
        s"SELECT '$tbl' AS t, $i AS ci, $nv AS nv FROM $cte"
      }
    }
    val metaRows = tables.flatMap { case (_, tbl, _, cols) =>
      cols.zipWithIndex.map { case ((cn, ct, _, _), i) => s"('$tbl',$i,'$cn','$ct')" }
    }.mkString(",")
    statsProfileSql(
      s"""${ctes.mkString(",\n")},
         |vals AS (
         |  ${vSelects.mkString("\n  UNION ALL ")}),
         |meta(t, ci, cn, ct) AS (SELECT * FROM (VALUES $metaRows) _m(t, ci, cn, ct))""".stripMargin,
      nSelects)
  }

  /** lake_profile_unified: per-column stats of ALL TEN driver tables —
    * the widest type surface the unified decoder covers (ns timestamps,
    * float-list embeddings included). Stats need only render INJECTIVITY
    * (distinct values ↔ distinct renders), so engine-specific timestamp /
    * float-array formatting can't fake a match the way digest compares
    * would; digests for render-stable tables are pinned by
    * `profile_sketches` over the same catalog.
    */
  private def lakeProfileUnifiedSql: String = {
    val tables = lakeSchemas.keys.toSeq.sorted
    // numeric long-format for min/max: doubles as-is, dates/timestamps as
    // floor(epoch) — the same seconds truncation Spark's unix_timestamp
    // applies
    val nSelects = tables.flatMap { tbl =>
      lakeSchemas(tbl).zipWithIndex.collect {
        case ((c, lt), i) if lt == "integer" || lt == "float" =>
          s"SELECT '$tbl' AS t, $i AS ci, CAST($c AS DOUBLE) AS nv FROM ${cappedSrc(tbl, 10000)}"
        case ((c, lt), i) if lt == "date" =>
          s"SELECT '$tbl' AS t, $i AS ci, floor(epoch($c)) AS nv FROM ${cappedSrc(tbl, 10000)}"
      }
    }
    statsProfileSql(s"${valsCte(tables, Some(10000))},\n${metaCte(tables)}", nSelects)
  }

  /** s7_json_roundtrip: DuckDB parses the plain-codec sketch documents with
    * its own JSON reader (structure check — the inner join on parsed
    * (table, column) keys drops rows if the document layout is wrong) while
    * every projected value — stats, both digests, the content snapshot — is
    * recomputed from the raw tables (content check). The Spark side reads
    * the same documents back from the bzip2 files, so the compare verifies
    * writer format, codec, and contents end-to-end. */
  private def jsonRoundtripSql: String = {
    val tables = Seq("region", "nation")
    s"""WITH $permsCte,
       |${valsCte(tables, Some(10000))},
       |${metaCte(tables)},
       |${statsCte()},
       |$digestCtes,
       |${snapshotDigestCtes(tables)},
       |docs AS (SELECT * FROM read_json('/tmp/graft_fixtures/sketch_docs_plain/*.json',
       |  format='newline_delimited',
       |  columns={'table_metadata': 'JSON', 'columns': 'JSON', 'content_snapshot': 'JSON'})),
       |dcols AS (
       |  SELECT json_extract_string(d.table_metadata, '$$.file_name') AS t,
       |         unnest(json_keys(d.columns)) AS cn
       |  FROM docs d),
       |-- EXPECTED per-table column count, from the schema literals (the
       |-- Spark side reports the ACTUAL key count of the written doc, so a
       |-- column missing from the document — invisible to the inner join
       |-- below — surfaces as a count mismatch)
       |ccnt AS (SELECT t, count(*) AS n_doc_cols FROM meta GROUP BY t)
       |SELECT meta.t AS table_name, meta.cn AS col_name, meta.ct AS col_type,
       |  ccnt.n_doc_cols,
       |  stats.n_rows, stats.num_nan, stats.n_unique,
       |  CASE WHEN meta.ct = 'string' THEN stats.cw END AS cell_width_r,
       |  array_to_string(edig.d, ',') AS mh_exact,
       |  CASE WHEN meta.ct = 'string' THEN array_to_string(wdig.d, ',') END AS mh_words,
       |  array_to_string(snapd.d, ',') AS snapshot
       |FROM meta JOIN stats USING (t, ci) JOIN edig USING (t, ci)
       |LEFT JOIN wdig USING (t, ci)
       |JOIN snapd ON snapd.t = meta.t
       |JOIN ccnt ON ccnt.t = meta.t
       |JOIN dcols ON dcols.t = meta.t AND dcols.cn = meta.cn
       |ORDER BY table_name, col_name""".stripMargin
  }

  /** s3_ingest_hygiene: DuckDB parses the SAME fixture files — the messy
    * file's row count comes from its own CSV reader, the sub-5-row file is
    * excluded by a HAVING the oracle computes itself, and the expected
    * sanitized names are generated from the engine's own `sanitizeName`
    * (shared Scala, embedded as literals). */
  private def ingestHygieneSql: String = {
    // post-CSV-parse raw header fields of messy.csv (see SparkEntry fixture)
    val raw = Seq("row_index", " n_NationKey ", "N,Name", "' n_regionkey '")
    val expect = raw.map(graft.ingest.RobustCsv.sanitizeName)
      .filterNot(_ == "row_index")
    s"""SELECT * FROM (
       |  SELECT 'messy.csv' AS file, '${expect.mkString(",")}' AS cols,
       |    count(*) AS n_rows
       |  FROM read_csv('/tmp/graft_fixtures/hygiene/messy.csv', header=true)
       |  UNION ALL
       |  SELECT 'tiny.csv', 'filtered', count(*)
       |  FROM read_csv('/tmp/graft_fixtures/hygiene/tiny.csv', header=true)
       |  HAVING count(*) >= 5)
       |ORDER BY file""".stripMargin
  }

  /** j2_missing_pairs: anti-join diagnostic replayed over the known lake
    * table list. */
  private def missingPairsSql: String = {
    val tabs = graft.SparkEntry.LakeTables.map(t => s"('$t')").mkString(",")
    s"""WITH pairs(table1, table2) AS (VALUES
       |  ('customer','orders'), ('nation','atlantis'), ('gondor','region')),
       |tabs(t) AS (VALUES $tabs)
       |SELECT table1, table2 FROM pairs
       |WHERE table1 NOT IN (SELECT t FROM tabs)
       |   OR table2 NOT IN (SELECT t FROM tabs)
       |ORDER BY table1, table2""".stripMargin
  }

  /** content_snapshots: one digest per table over space-joined row strings
    * (A13/P7; mirrors Profiler.contentSnapshot over first-10k-capped reads).
    */
  private def contentSnapshotsSql: String = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents")
    s"""WITH $permsCte,
       |${snapshotDigestCtes(tables)}
       |SELECT t AS table_name, array_to_string(d, ',') AS snapshot
       |FROM snapd ORDER BY table_name""".stripMargin
  }

  /** j5_minhash_pairs: cross-table column-pair jaccard/containment from the
    * digests (mirrors SparkEntry.minhashJaccardPairs + MinHash.containment).
    */
  private def minhashPairsSql: String = {
    val tables = Seq("customer", "supplier", "orders", "part", "lineitem")
    s"""WITH $permsCte,
       |${valsCte(tables, Some(10000))},
       |${metaCte(tables)},
       |uq AS (
       |  SELECT t, ci, count(DISTINCT v) + CASE WHEN count(*) > count(v) THEN 1 ELSE 0 END AS u
       |  FROM vals GROUP BY t, ci),
       |dvals AS (SELECT DISTINCT t, ci, v FROM vals WHERE v IS NOT NULL),
       |emins AS (SELECT t, ci, pi, ${mhSlotMin("v")} AS mh
       |          FROM dvals CROSS JOIN perms GROUP BY t, ci, pi),
       |dig AS (SELECT t, ci, list(mh ORDER BY pi) AS d FROM emins GROUP BY t, ci),
       |cols AS (
       |  SELECT meta.t, meta.ci, meta.cn, dig.d, uq.u
       |  FROM meta JOIN dig USING (t, ci) JOIN uq USING (t, ci)),
       |pairs AS (
       |  SELECT a.t || '.' || a.cn AS col_a, b.t || '.' || b.cn AS col_b,
       |    CAST(len([i FOR i IN range(1, 101) IF a.d[i] = b.d[i]]) AS DOUBLE) / 100.0 AS j,
       |    CAST(a.u AS DOUBLE) AS ua, CAST(b.u AS DOUBLE) AS ub
       |  FROM cols a JOIN cols b ON a.t < b.t)
       |SELECT col_a, col_b, round(j, 6) AS jaccard_est,
       |  round(CASE WHEN ua <= 0 THEN 0.0
       |             ELSE least(1.0, (j * (ua + ub)) / ((1.0 + j) * ua)) END, 6) AS containment_est
       |FROM pairs WHERE round(j, 6) > 0.05
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** d_minhash_lsh: 3-word-shingle MinHash near-dup pairs with the SAME
    * banding semantics as Dedup.minhashNearDups (bands of 5 consecutive
    * slots; a pair is a candidate iff some band matches in full), verified
    * at jaccard ≥ 0.05.
    */
  /** Shared CTE chain: per-doc 3-word-shingle MinHash digests (`dig`). */
  private def docDigCtes: String =
    s"""$permsCte,
       |d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |g AS (SELECT doc_id,
       |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
       |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
       |      FROM d),
       |sv AS (SELECT DISTINCT doc_id, unnest(sh) AS v FROM g),
       |mins AS (SELECT doc_id, pi, ${mhSlotMin("v")} AS mh
       |         FROM sv CROSS JOIN perms GROUP BY doc_id, pi),
       |dig AS (SELECT doc_id, list(mh ORDER BY pi) AS d FROM mins GROUP BY doc_id)""".stripMargin

  /** Digest agreement: estimated jaccard + full-band-of-5 match count. */
  private def digCompare(a: String, b: String): String =
    s"""CAST(len([i FOR i IN range(1, 101) IF $a.d[i] = $b.d[i]]) AS DOUBLE) / 100.0 AS jaccard,
       |    len([bb FOR bb IN range(0, 20) IF list_slice($a.d, 5*bb+1, 5*bb+5) = list_slice($b.d, 5*bb+1, 5*bb+5)]) AS nb""".stripMargin

  /** docDigCtes → banded candidate pairs (band agreement = candidate). */
  private def minhashPairCtes: String =
    s"""$docDigCtes,
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${digCompare("a", "b")}
       |  FROM dig a JOIN dig b ON a.doc_id < b.doc_id)""".stripMargin

  /** d_weighted_minhash: replay the tagged-copy expansion ("tok#i" for
    * i in 1..tf), the standard 100-slot digest over the expanded
    * elements (permsCte/mhSlotMin machinery unchanged), slot-agreement
    * estimates, and the exact Σmin/Σmax weighted Jaccard beside them. */
  private def weightedMinhashSql: String =
    raw"""WITH $permsCte,
      |tf AS (
      |  SELECT doc_id AS id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |        FROM documents WHERE doc_id <= 25)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |ex AS (SELECT id, tok, unnest(range(1, CAST(tf AS INTEGER) + 1)) AS i FROM tf),
      |el AS (SELECT id, tok || '#' || i AS v FROM ex),
      |mins AS (SELECT id, pi, ${mhSlotMin("v")} AS mh
      |         FROM el CROSS JOIN perms GROUP BY id, pi),
      |dig AS (SELECT id, list(mh ORDER BY pi) AS d FROM mins GROUP BY id),
      |est AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    round(CAST(len([i FOR i IN range(1, 101) IF a.d[i] = b.d[i]]) AS DOUBLE) / 100.0, 6) AS wj_est
      |  FROM dig a JOIN dig b ON a.id < b.id),
      |tot AS (SELECT id, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY 1),
      |inter AS (
      |  SELECT x.id_a, x.id_b, CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS smin
      |  FROM est x JOIN tf a ON a.id = x.id_a
      |  JOIN tf b ON b.id = x.id_b AND b.tok = a.tok
      |  GROUP BY 1, 2)
      |SELECT e.id_a, e.id_b, e.wj_est,
      |  round(CAST(coalesce(i.smin, 0) AS DOUBLE)
      |        / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6) AS wj_exact,
      |  round(abs(e.wj_est - round(CAST(coalesce(i.smin, 0) AS DOUBLE)
      |    / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6)), 6) AS abs_err
      |FROM est e JOIN tot ta ON ta.id = e.id_a JOIN tot tb ON tb.id = e.id_b
      |LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
      |ORDER BY e.id_a, e.id_b""".stripMargin

  /** d_icws_minhash: replay Ioffe ICWS in the log domain — md5
    * uniforms (low32 + 1)/2³², Gamma(2,1) r/c as negated sums of
    * 6dp-rounded lns (the weightedSample seam), exact dyadic β,
    * t_k = floor(round(ln w,6)/r + β), slot key ln(c)−r(t_k−β)−r (no
    * exp anywhere), argmin ties to ascending token — beside the exact
    * weighted Jaccard on the same tf·idf_micro weights. */
  /** The shared ICWS replay CTE block over a doc predicate: tf → idf
    * micros → wts → 32-slot log-domain ICWS keys → `sig` (id, k, s_tok,
    * s_tk). Used by d_icws_minhash and d_icws_neardups. */
  private def icwsSigCtes(pred: String, shingle: Int = 1): String = {
    def uref(j: Int) =
      s"((md5_number_lower(tok || ':icws:' || k || ':$j') & 4294967295) + 1.0) / 4294967296.0"
    // shingle = 1: whitespace unigrams; n > 1: word n-gram shingles with
    // the word_shingles short-doc whole-text collapse (docDigCtes shape)
    val tokSrc =
      if (shingle <= 1)
        raw"""SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
          |        FROM documents WHERE $pred""".stripMargin
      else {
        val cat = (0 until shingle).map(j => s"w[i+$j]").mkString(" || ' ' || ")
        raw"""SELECT doc_id,
          |          unnest(CASE WHEN len(w) <= ${shingle - 1} THEN [array_to_string(w, ' ')]
          |                 ELSE list_transform(range(1, len(w) - ${shingle - 2}), i -> $cat) END) AS tok
          |        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          |              FROM documents WHERE $pred)""".stripMargin
      }
    raw"""tf AS (
      |  SELECT doc_id AS id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM ($tokSrc)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents WHERE $pred),
      |idf AS (
      |  SELECT tok,
      |    CAST(CASE WHEN l >= 0 THEN floor(l + 0.5) ELSE ceil(l - 0.5) END AS BIGINT) AS idfm
      |  FROM (SELECT tok,
      |          ln(CAST(nd.nd + 1 AS DOUBLE) / CAST(count(DISTINCT id) AS DOUBLE)) * 1000000 AS l
      |        FROM tf, nd GROUP BY tok, nd.nd)),
      |wts AS (SELECT id, tf.tok, tf.tf * idf.idfm AS w FROM tf JOIN idf ON idf.tok = tf.tok),
      |slots AS (SELECT id, tok, w, k FROM wts, unnest(range(0, 32)) AS t(k)),
      |s0 AS (
      |  SELECT id, tok, w, k,
      |    -(round(ln(${uref(1)}), 6) + round(ln(${uref(2)}), 6)) AS r,
      |    -(round(ln(${uref(3)}), 6) + round(ln(${uref(4)}), 6)) AS c,
      |    ${uref(5)} AS beta
      |  FROM slots),
      |s1 AS (
      |  SELECT id, tok, k, r, c, beta,
      |    CAST(floor(round(ln(CAST(w AS DOUBLE)), 6) / r + beta) AS BIGINT) AS tk
      |  FROM s0),
      |keys AS (
      |  SELECT id, tok, k, tk,
      |    round(ln(c), 6) - r * (CAST(tk AS DOUBLE) - beta) - r AS key
      |  FROM s1),
      |sig AS (
      |  SELECT id, k, tok AS s_tok, tk AS s_tk FROM keys
      |  QUALIFY row_number() OVER (PARTITION BY id, k ORDER BY key, tok) = 1)""".stripMargin
  }

  private def icwsMinhashSql: String = {
    raw"""WITH ${icwsSigCtes("doc_id <= 25")},
      |ids AS (SELECT doc_id AS id FROM documents WHERE doc_id <= 25),
      |prs AS (SELECT a.id AS id_a, b.id AS id_b FROM ids a JOIN ids b ON a.id < b.id),
      |est AS (
      |  SELECT p.id_a, p.id_b,
      |    round(CAST(sum(CASE WHEN sa.s_tok = sb.s_tok AND sa.s_tk = sb.s_tk
      |      THEN 1 ELSE 0 END) AS DOUBLE) / 32.0, 6) AS wj_est
      |  FROM prs p JOIN sig sa ON sa.id = p.id_a
      |  JOIN sig sb ON sb.id = p.id_b AND sb.k = sa.k
      |  GROUP BY 1, 2),
      |tot AS (SELECT id, CAST(sum(w) AS BIGINT) AS tot FROM wts GROUP BY 1),
      |inter AS (
      |  SELECT p.id_a, p.id_b, CAST(sum(least(a.w, b.w)) AS BIGINT) AS smin
      |  FROM prs p JOIN wts a ON a.id = p.id_a
      |  JOIN wts b ON b.id = p.id_b AND b.tok = a.tok
      |  GROUP BY 1, 2)
      |SELECT e.id_a, e.id_b, e.wj_est,
      |  round(CAST(coalesce(i.smin, 0) AS DOUBLE)
      |        / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6) AS wj_exact,
      |  round(abs(e.wj_est - round(CAST(coalesce(i.smin, 0) AS DOUBLE)
      |    / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6)), 6) AS abs_err
      |FROM est e JOIN tot ta ON ta.id = e.id_a JOIN tot tb ON tb.id = e.id_b
      |LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
      |ORDER BY e.id_a, e.id_b""".stripMargin
  }

  /** emb_cka: replay linear CKA per variant — micro-quantized views,
    * truncating-div column centering, HUGEINT Gram cross products and
    * squared-Frobenius sums (mirror of the Spark DECIMAL(38,0) path),
    * one sqrt-ratio per variant rounded 6 dp. */
  private def embCkaSql: String = {
    def ckaSelect(variant: String, yCte: String, dx: Int, dy: Int): String =
      s"""SELECT '$variant' AS variant, (SELECT count(*) FROM base) AS n_vecs,
         |  CAST($dx AS INTEGER) AS dx, CAST($dy AS INTEGER) AS dy,
         |  round(CAST(fxy.f2 AS DOUBLE) /
         |    (sqrt(CAST(fxx.f2 AS DOUBLE)) * sqrt(CAST(fyy.f2 AS DOUBLE))), 6) AS cka
         |FROM
         |  (SELECT sum(c * c) AS f2 FROM (
         |    SELECT sum(CAST(a.v AS HUGEINT) * b.v) AS c
         |    FROM cx_c a JOIN ${yCte}_c b USING (n_id) GROUP BY a.d, b.d)) fxy,
         |  (SELECT sum(c * c) AS f2 FROM (
         |    SELECT sum(CAST(a.v AS HUGEINT) * b.v) AS c
         |    FROM cx_c a JOIN cx_c b USING (n_id) GROUP BY a.d, b.d)) fxx,
         |  (SELECT sum(c * c) AS f2 FROM (
         |    SELECT sum(CAST(a.v AS HUGEINT) * b.v) AS c
         |    FROM ${yCte}_c a JOIN ${yCte}_c b USING (n_id) GROUP BY a.d, b.d)) fyy"""
        .stripMargin
    def cellCtes(src: String, out: String, dim: Int): String =
      s"""${out}_r AS (
         |  SELECT vec_id AS n_id, d, q[d] AS v FROM $src, unnest(range(1, ${dim + 1})) t(d)),
         |${out}_m AS (
         |  SELECT d, CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS mu
         |  FROM (SELECT d, sum(v) AS s, count(*) AS n FROM ${out}_r GROUP BY d)),
         |${out}_c AS (
         |  SELECT n_id, d, v - mu AS v FROM ${out}_r JOIN ${out}_m USING (d))"""
        .stripMargin
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |xq AS (SELECT vec_id, [CAST(floor(x * 1e6) AS BIGINT) FOR x IN e] AS q FROM base),
       |y8 AS (SELECT vec_id,
       |  [CAST(floor(round(x * 127.0, 0) / 127.0 * 1e6) AS BIGINT) FOR x IN e] AS q FROM base),
       |yt AS (SELECT vec_id, [CAST(floor(x * 1e6) AS BIGINT) FOR x IN e[1:16]] AS q FROM base),
       |${cellCtes("xq", "cx", 64)},
       |${cellCtes("y8", "c8", 64)},
       |${cellCtes("yt", "ct", 16)}
       |${ckaSelect("int8", "c8", 64, 64)}
       |UNION ALL
       |${ckaSelect("trunc16", "ct", 64, 16)}
       |ORDER BY variant""".stripMargin
  }

  /** d_icws_neardups: the banded weighted near-dup replay — ICWS sig
    * CTEs over the whole corpus on word 3-shingle tf·idf features,
    * 8×4 band keys (slot "tok@tk" strings in slot order),
    * bucket-collision candidates, exact weighted Jaccard verify at τ. */
  private def icwsNearDupsSql: String =
    s"""WITH ${icwsSigCtes("TRUE", shingle = 3)},
       |bnd AS (
       |  SELECT id, k // 4 AS band,
       |    string_agg(s_tok || '@' || s_tk, '|' ORDER BY k) AS bkey
       |  FROM sig GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bnd a JOIN bnd b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
       |tot AS (SELECT id, CAST(sum(w) AS BIGINT) AS tot FROM wts GROUP BY 1),
       |inter AS (
       |  SELECT c.id_a, c.id_b, CAST(sum(least(a.w, b.w)) AS BIGINT) AS smin
       |  FROM cand c JOIN wts a ON a.id = c.id_a
       |  JOIN wts b ON b.id = c.id_b AND b.tok = a.tok
       |  GROUP BY 1, 2)
       |SELECT c.id_a, c.id_b,
       |  round(CAST(coalesce(i.smin, 0) AS DOUBLE)
       |        / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6) AS wjaccard
       |FROM cand c
       |JOIN tot ta ON ta.id = c.id_a JOIN tot tb ON tb.id = c.id_b
       |LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |WHERE round(CAST(coalesce(i.smin, 0) AS DOUBLE)
       |      / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6) >= 0.7
       |ORDER BY c.id_a, c.id_b""".stripMargin

  /** t_cms_freq: rebuild the depth-3 × width-16 Count-Min cells
    * (salted md5_low32 mod width, counts additive) and every per-token
    * min-cell estimate next to the exact count. */
  private def cmsFreqSql: String =
    """WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      |cells AS (SELECT i AS cms_row,
      |            (md5_number_lower(tok || ':cms' || i) & 4294967295) % 16 AS cms_col,
      |            count(*) AS cnt
      |          FROM toks, unnest([0, 1, 2]) AS t(i) GROUP BY 1, 2),
      |exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok),
      |pos AS (SELECT e.tok, i AS cms_row,
      |          (md5_number_lower(e.tok || ':cms' || i) & 4294967295) % 16 AS cms_col
      |        FROM exact e, unnest([0, 1, 2]) AS t(i)),
      |est AS (SELECT tok, min(coalesce(c.cnt, 0)) AS est_n
      |        FROM pos LEFT JOIN cells c USING (cms_row, cms_col) GROUP BY tok)
      |SELECT e.tok, e.exact_n, est.est_n
      |FROM exact e JOIN est USING (tok) ORDER BY tok""".stripMargin

  /** a_hll_distinct: replay the p=8 HLL — reg = low 8 md5_low32 bits,
    * rho = 25 - msb(bin-length) of the high 24 bits, register max,
    * harmonic sum in exact integers (terms 2^(33-rho), zeros counted via
    * 256 - n_regs), then the one fixed-shape raw / linear-counting
    * estimate expression. alpha·m²·2³³ is written with the same
    * operation order as the JVM literal so the doubles agree bitwise. */
  private def hllDistinctSql: String =
    """WITH d AS (SELECT lang, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT lang,
      |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |      FROM d),
      |sv AS (SELECT lang, unnest(sh) AS s FROM g),
      |h AS (SELECT lang, s, (md5_number_lower(s) & 4294967295) AS hv FROM sv),
      |r AS (SELECT lang, hv & 255 AS reg,
      |        CASE WHEN (hv >> 8) = 0 THEN 25 ELSE 25 - length(bin(hv >> 8)) END AS rho
      |      FROM h),
      |regs AS (SELECT lang, reg, max(rho) AS rho FROM r GROUP BY 1, 2),
      |agg AS (SELECT lang, count(*) AS n_regs,
      |          sum(CAST(1 AS BIGINT) << (33 - rho)) AS s_touched
      |        FROM regs GROUP BY 1),
      |est AS (SELECT lang,
      |    CASE WHEN (0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0 * 8589934592.0)
      |              / CAST(s_touched + (256 - n_regs) * 8589934592 AS DOUBLE) <= 640.0
      |           AND (256 - n_regs) > 0
      |         THEN 256.0 * ln(256.0 / CAST(256 - n_regs AS DOUBLE))
      |         ELSE (0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0 * 8589934592.0)
      |              / CAST(s_touched + (256 - n_regs) * 8589934592 AS DOUBLE)
      |    END AS e
      |  FROM agg),
      |exact AS (SELECT lang, count(DISTINCT s) AS exact_distinct FROM sv GROUP BY lang)
      |SELECT exact.lang, exact.exact_distinct, round(est.e, 4) AS hll_estimate
      |FROM exact JOIN est USING (lang) ORDER BY lang""".stripMargin

  /** One column's entropy row: integer micro-nat terms
    * floor(c · round(ln(n/c), 6) · 1e6), integer-summed. */
  private def entropyColSql(c: String): String =
    s"""SELECT '$c' AS col_name,
       |  CAST(any_value(n) AS BIGINT) AS n_rows,
       |  count(*) AS n_distinct,
       |  round(CAST(sum(tm) AS DOUBLE) / CAST(any_value(n) AS DOUBLE) / 1000000.0, 6) AS entropy
       |FROM (
       |  SELECT cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n,
       |    CAST(floor(CAST(cnt AS DOUBLE) * round(ln(CAST(sum(cnt) OVER () AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) * 1000000.0) AS BIGINT) AS tm
       |  FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY CAST($c AS VARCHAR)))""".stripMargin

  /** a_col_entropy: per-column Shannon entropy in nats, replayed with
    * the integer micro-nat sum (no FP summation order). */
  private def colEntropySql: String =
    Seq("l_orderkey", "l_returnflag", "l_linestatus", "l_shipdate")
      .map(entropyColSql).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** a_entropy_mi: MI(returnflag, linestatus) with the same micro-nat
    * discipline; nmi = mi / min(h_a, h_b) of the already-rounded
    * entropies. */
  private def entropyMiSql: String = {
    def h(c: String) =
      s"""(SELECT round(CAST(sum(tm) AS DOUBLE) / CAST(any_value(n) AS DOUBLE) / 1000000.0, 6)
         | FROM (SELECT cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n,
         |         CAST(floor(CAST(cnt AS DOUBLE) * round(ln(CAST(sum(cnt) OVER () AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) * 1000000.0) AS BIGINT) AS tm
         |       FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY CAST($c AS VARCHAR))))""".stripMargin
    s"""WITH p AS (SELECT CAST(l_returnflag AS VARCHAR) AS a, CAST(l_linestatus AS VARCHAR) AS b FROM lineitem),
       |j AS (SELECT a, b, count(*) AS cab FROM p GROUP BY 1, 2),
       |ma AS (SELECT a, count(*) AS ca FROM p GROUP BY 1),
       |mb AS (SELECT b, count(*) AS cb FROM p GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM p),
       |mi AS (SELECT CAST(any_value(nn.n) AS BIGINT) AS n,
       |         sum(CAST(floor(CAST(cab AS DOUBLE)
       |           * round(ln(CAST(nn.n * cab AS DOUBLE) / CAST(ca * cb AS DOUBLE)), 6)
       |           * 1000000.0) AS BIGINT)) AS s
       |       FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn),
       |vals AS (SELECT ${h("l_returnflag")} AS h_a, ${h("l_linestatus")} AS h_b,
       |           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS mi
       |         FROM mi)
       |SELECT h_a, h_b, mi,
       |  CASE WHEN least(h_a, h_b) = 0 THEN 0.0
       |       ELSE round(mi / least(h_a, h_b), 6) END AS nmi
       |FROM vals""".stripMargin
  }

  /** a_key_discovery: distinct-count uniqueness per single/pair combo. */
  private def keyDiscoverySql: String = {
    val cols = Seq("o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
    val combos = cols.map(Seq(_)) ++
      (for { i <- cols.indices; j <- i + 1 until cols.size }
        yield Seq(cols(i), cols(j)))
    val arms = combos.map { combo =>
      s"""SELECT '${combo.mkString("+")}' AS key_cols,
         |  (SELECT count(*) FROM (SELECT DISTINCT ${combo.mkString(", ")} FROM orders)) AS n_distinct,
         |  (SELECT count(*) FROM orders) AS n_rows""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT key_cols, n_distinct, n_rows,
       |  round(CAST(n_distinct AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS uniqueness,
       |  n_distinct = n_rows AS is_key
       |FROM ($arms)
       |ORDER BY key_cols""".stripMargin
  }

  /** d_ppjoin_pairs: prefix-filtered exact Jaccard self-join replay —
    * same rare-first prefix, length filter, and rounded-jaccard gate. */
  private def ppjoinPairsSql: String =
    s"""WITH $ppjoinCtes
      |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.7
      |ORDER BY id_a, id_b""".stripMargin

  /** d_exact_dedup_corpus: the PPJoin pairs feed the same recursive
    * connected-components replay as the LSH corpus dedup. */
  private def exactDedupCorpusSql: String =
    s"""WITH RECURSIVE $ppjoinCtes,
      |vp AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.7),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM vp
      |          UNION SELECT id_b, id_a FROM vp),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |labels AS (SELECT src AS id, least(src, min(dst)) AS cluster
      |           FROM reach GROUP BY src),
      |losers AS (SELECT id FROM labels WHERE id <> cluster)
      |SELECT lang, count(*) AS n_docs_kept,
      |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
      |FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Shared CTE list of the PPJoin replay (ends at `j`, the rounded
    * pairwise jaccard relation). */
  private def ppjoinCtes: String =
    """d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |      FROM d),
      |toks AS (SELECT DISTINCT doc_id AS id, unnest(sh) AS tok FROM g),
      |freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY 1),
      |sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
      |pref AS (SELECT id, tok, sz FROM (
      |    SELECT t.id, t.tok, s.sz,
      |      row_number() OVER (PARTITION BY t.id ORDER BY f.f, t.tok) AS pos
      |    FROM toks t JOIN freq f USING (tok) JOIN sizes s USING (id))
      |  WHERE pos <= sz - CAST(ceil(0.7 * CAST(sz AS DOUBLE)) AS BIGINT) + 1),
      |cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM pref a JOIN pref b ON a.tok = b.tok AND a.id < b.id
      |  WHERE CAST(b.sz AS DOUBLE) >= 0.7 * CAST(a.sz AS DOUBLE)
      |    AND CAST(a.sz AS DOUBLE) >= 0.7 * CAST(b.sz AS DOUBLE)),
      |inter AS (SELECT c.id_a, c.id_b, count(*) AS i
      |  FROM cands c JOIN toks ta ON ta.id = c.id_a
      |               JOIN toks tb ON tb.id = c.id_b AND tb.tok = ta.tok
      |  GROUP BY 1, 2),
      |j AS (SELECT i.id_a, i.id_b,
      |        round(CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE), 6) AS jaccard
      |      FROM inter i JOIN sizes sa ON sa.id = i.id_a
      |                   JOIN sizes sb ON sb.id = i.id_b)""".stripMargin

  /** t_collocations: top-20 bigrams by PMI — exact counts, one integer-
    * product ratio, 6-dp ln, (pmi DESC, w1, w2) total order. */
  private def collocationsSql: String =
    """WITH w AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
      |uni AS (SELECT t, count(*) AS c FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1),
      |big AS (SELECT w1, w2, count(*) AS n_pair FROM (
      |    SELECT w[i] AS w1, w[i + 1] AS w2
      |    FROM w, unnest(range(1, len(w))) AS t(i))
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |n AS (SELECT sum(c) AS n_tok FROM uni)
      |SELECT b.w1, b.w2, b.n_pair,
      |  round(ln(CAST(n.n_tok * b.n_pair AS DOUBLE)
      |         / CAST(u1.c * u2.c AS DOUBLE)), 6) AS pmi
      |FROM big b JOIN uni u1 ON u1.t = b.w1 JOIN uni u2 ON u2.t = b.w2
      |CROSS JOIN n
      |ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20""".stripMargin

  /** q_calibration: decile reliability bins over the [0,1]-rescaled
    * pair cosine vs same-label outcomes; per-bin mean score summed as
    * DECIMAL(18,7) (scores carry ≤7 decimals after the 6-dp cosine). */
  private def calibrationSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |s AS (
      |  SELECT q.label AS ql, c.label AS cl,
      |    CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |         ELSE round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) END AS cos
      |  FROM e q JOIN e c ON q.vec_id <= 30 AND q.vec_id < c.vec_id),
      |b AS (SELECT least(9, CAST(floor(((cos + 1) / 2) * 10) AS BIGINT)) AS bin,
      |        (cos + 1) / 2 AS score,
      |        CASE WHEN ql = cl THEN 1 ELSE 0 END AS hit
      |      FROM s)
      |SELECT bin, count(*) AS n_pairs,
      |  round(CAST(sum(CAST(score AS DECIMAL(18,7))) AS DOUBLE) / count(*), 6) AS avg_score,
      |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS match_rate
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  /** w_graph_stats: in-degree distribution of the synthetic link graph
    * (cleaned like pagerank: self-edges and duplicate edges dropped,
    * isolated-direction nodes report 0). */
  private def graphStatsSql: String =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
      |       UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
      |e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
      |      FROM e0 WHERE src <> dst),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |ind AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY 1),
      |d AS (SELECT n.node, coalesce(ind.in_deg, 0) AS in_deg
      |      FROM nodes n LEFT JOIN ind USING (node))
      |SELECT in_deg, count(*) AS n_nodes FROM d GROUP BY 1 ORDER BY in_deg""".stripMargin

  /** q_class_weights: per-class counts + balanced weights n/(k·n_c). */
  private def classWeightsSql: String =
    """WITH c AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1),
      |t AS (SELECT CAST(sum(n_label) AS BIGINT) AS n, count(*) AS k FROM c)
      |SELECT c.label, c.n_label,
      |  round(CAST(t.n AS DOUBLE) / CAST(t.k * c.n_label AS DOUBLE), 6) AS weight
      |FROM c CROSS JOIN t ORDER BY label""".stripMargin

  /** p_quality_checks: one row per declarative rule, exact counts. */
  private def qualityChecksSql: String =
    """WITH n AS (SELECT count(*) AS n_rows FROM orders),
      |r AS (
      |  SELECT 'in_range' AS rule, 'o_totalprice' AS "column", n.n_rows,
      |    (SELECT count(*) FROM orders
      |     WHERE o_totalprice IS NOT NULL
      |       AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) AS n_violations FROM n
      |  UNION ALL SELECT 'in_set', 'o_orderstatus', n.n_rows,
      |    (SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL
      |       AND CAST(o_orderstatus AS VARCHAR) NOT IN ('F', 'O', 'P')) FROM n
      |  UNION ALL SELECT 'matches_regex', 'o_orderpriority', n.n_rows,
      |    (SELECT count(*) FROM orders WHERE o_orderpriority IS NOT NULL
      |       AND NOT regexp_matches(CAST(o_orderpriority AS VARCHAR), '^[1-5]-.*')) FROM n
      |  UNION ALL SELECT 'not_null', 'o_orderkey', n.n_rows,
      |    (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) FROM n
      |  UNION ALL SELECT 'ref_integrity', 'o_custkey', n.n_rows,
      |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
      |       AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) FROM n
      |  UNION ALL SELECT 'unique', 'o_orderkey', n.n_rows,
      |    (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM
      |      (SELECT count(*) AS c FROM orders GROUP BY o_orderkey
      |       HAVING count(*) > 1)) FROM n)
      |SELECT rule, "column", n_rows, n_violations, n_violations = 0 AS pass
      |FROM r ORDER BY rule, "column"""".stripMargin

  /** a_psi_drift: 10 fixed-width cent buckets from the baseline range,
    * Laplace-smoothed shares, ln of one exact-integer-product ratio
    * (6 dp), terms in integer nano-units. */
  private def psiDriftSql: String =
    """WITH b AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS u FROM events
      |           WHERE event_type = 'view'),
      |c AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS u FROM events
      |      WHERE event_type = 'click'),
      |bounds AS (SELECT min(u) AS lo,
      |    greatest(1, CAST(ceil(CAST(max(u) - min(u) + 1 AS DOUBLE) / 10.0) AS BIGINT)) AS w
      |  FROM b),
      |bb AS (SELECT least(9, greatest(0,
      |         CAST(floor(CAST(u - lo AS DOUBLE) / CAST(w AS DOUBLE)) AS BIGINT))) AS bkt,
      |         count(*) AS cnt
      |       FROM b, bounds GROUP BY 1),
      |cc2 AS (SELECT least(9, greatest(0,
      |          CAST(floor(CAST(u - lo AS DOUBLE) / CAST(w AS DOUBLE)) AS BIGINT))) AS bkt,
      |          count(*) AS cnt
      |        FROM c, bounds GROUP BY 1),
      |bk AS (SELECT unnest(range(0, 10)) AS bkt),
      |j AS (SELECT bk.bkt, coalesce(bb.cnt, 0) AS cb, coalesce(cc2.cnt, 0) AS cc,
      |        (SELECT count(*) FROM b) AS nb, (SELECT count(*) FROM c) AS nc
      |      FROM bk LEFT JOIN bb USING (bkt) LEFT JOIN cc2 USING (bkt)),
      |t AS (SELECT nb, nc,
      |        CAST(floor((CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)
      |                  - CAST(cc + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE))
      |          * round(ln(CAST((cb + 1) * (nc + 10) AS DOUBLE)
      |                   / CAST((cc + 1) * (nb + 10) AS DOUBLE)), 6)
      |          * 1000000000.0) AS BIGINT) AS tn
      |      FROM j),
      |agg AS (SELECT any_value(nb) AS n_base, any_value(nc) AS n_current,
      |          round(CAST(sum(tn) AS DOUBLE) / 1000000000.0, 6) AS psi
      |        FROM t)
      |SELECT n_base, n_current, psi, psi > 0.2 AS drifted FROM agg""".stripMargin

  /** d_fuzzy_pairs: last-token-blocked Levenshtein pairs over distinct
    * part names (exact-integer distance), with member counts. */
  private def fuzzyPairsSql: String =
    """WITH d AS (SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS blk FROM part),
      |pairs AS (
      |  SELECT a.p_name AS val_a, b.p_name AS val_b,
      |    CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |  FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
      |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
      |c AS (SELECT p_name, count(*) AS n FROM part GROUP BY 1)
      |SELECT val_a, val_b, dist, ca.n AS n_a, cb.n AS n_b
      |FROM pairs JOIN c ca ON ca.p_name = pairs.val_a
      |           JOIN c cb ON cb.p_name = pairs.val_b
      |ORDER BY val_a, val_b""".stripMargin

  /** a_ind_scan: containment of every directed candidate-column pair
    * from the unified distinct (src, v) relation; ≥ 0.95 kept. */
  private def indScanSql: String = {
    val cands = Seq(
      ("nation", "n_nationkey"), ("nation", "n_regionkey"),
      ("region", "r_regionkey"),
      ("customer", "c_custkey"), ("customer", "c_nationkey"),
      ("supplier", "s_suppkey"), ("supplier", "s_nationkey"),
      ("orders", "o_orderkey"), ("orders", "o_custkey"),
      ("lineitem", "l_orderkey"), ("lineitem", "l_suppkey"))
    val arms = cands.map { case (t, c) =>
      s"SELECT DISTINCT '$t.$c' AS src, CAST($c AS VARCHAR) AS v FROM $t"
    }.mkString("\nUNION ALL\n")
    s"""WITH vals AS ($arms),
       |sizes AS (SELECT src, count(*) AS n_src FROM vals GROUP BY 1),
       |common AS (
       |  SELECT a.src, b.src AS dst, count(*) AS n_common
       |  FROM vals a JOIN vals b ON a.v = b.v AND a.src <> b.src
       |  GROUP BY 1, 2)
       |SELECT c.src, c.dst, s.n_src, c.n_common,
       |  round(CAST(c.n_common AS DOUBLE) / CAST(s.n_src AS DOUBLE), 6) AS containment
       |FROM common c JOIN sizes s USING (src)
       |WHERE round(CAST(c.n_common AS DOUBLE) / CAST(s.n_src AS DOUBLE), 6) >= 0.95
       |ORDER BY src, dst""".stripMargin
  }

  /** a_fd_scan: TANE g3 error per directed orders-column pair —
    * 1 − (Σ_a max_b c_ab)/n, exact integers until the one division. */
  private def fdScanSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val pairSqls = for { a <- cols; b <- cols if a != b } yield
      s"""SELECT '$a' AS lhs, '$b' AS rhs, count(*) AS n_lhs_groups,
         |  round(1.0 - CAST(sum(m) AS DOUBLE)
         |    / CAST((SELECT count(*) FROM orders) AS DOUBLE), 6) AS g3_error
         |FROM (SELECT a, max(c) AS m
         |      FROM (SELECT CAST($a AS VARCHAR) AS a, CAST($b AS VARCHAR) AS b, count(*) AS c
         |            FROM orders GROUP BY 1, 2)
         |      GROUP BY a)""".stripMargin
    s"""SELECT lhs, rhs, n_lhs_groups, g3_error, g3_error <= 0.01 AS holds
       |FROM (${pairSqls.mkString("\n", "\nUNION ALL\n", "\n")})
       |ORDER BY lhs, rhs""".stripMargin
  }

  /** a_kmv_distinct: replay the k=256 KMV sketch — distinct low-32 md5
    * hashes, the 256 smallest per lang, then the one fixed-shape
    * (k-1)·2^32 / (kth+1) estimate double. The numerator literal is
    * written as the same two-factor product the JVM computes. */
  private def kmvDistinctSql: String =
    s"""$kmvShingleCte,
      |k AS (SELECT lang, hv FROM h
      |      QUALIFY row_number() OVER (PARTITION BY lang ORDER BY hv) <= 256),
      |agg AS (SELECT lang, count(*) AS n, max(hv) AS kth FROM k GROUP BY 1),
      |est AS (SELECT lang,
      |    CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
      |         ELSE (255.0 * 4294967296.0) / (CAST(kth AS DOUBLE) + 1.0)
      |    END AS e FROM agg),
      |exact AS (SELECT lang, count(DISTINCT s) AS exact_distinct FROM sv GROUP BY lang)
      |SELECT exact.lang, exact.exact_distinct, round(est.e, 4) AS kmv_estimate
      |FROM exact JOIN est USING (lang) ORDER BY lang""".stripMargin

  /** a_kmv_setops: replay the theta-style set algebra — combined
    * 256-smallest of each lang pair's retained hashes with membership
    * flags, union estimate from the pair's kth hash, jaccard from the
    * both-flag fraction, intersection = jaccard × union. */
  private def kmvSetOpsSql: String =
    s"""$kmvShingleCte,
      |k AS (SELECT lang, hv FROM h
      |      QUALIFY row_number() OVER (PARTITION BY lang ORDER BY hv) <= 256),
      |pairs AS (SELECT a.lang AS ga, b.lang AS gb
      |          FROM (SELECT DISTINCT lang FROM k) a, (SELECT DISTINCT lang FROM k) b
      |          WHERE a.lang < b.lang),
      |members AS (
      |  SELECT ga, gb, hv, max(in_a) AS in_a, max(in_b) AS in_b FROM (
      |    SELECT p.ga, p.gb, k.hv, 1 AS in_a, 0 AS in_b
      |    FROM pairs p JOIN k ON k.lang = p.ga
      |    UNION ALL
      |    SELECT p.ga, p.gb, k.hv, 0, 1
      |    FROM pairs p JOIN k ON k.lang = p.gb)
      |  GROUP BY 1, 2, 3),
      |comb AS (SELECT * FROM members
      |         QUALIFY row_number() OVER (PARTITION BY ga, gb ORDER BY hv) <= 256),
      |agg AS (SELECT ga, gb, count(*) AS n_l, max(hv) AS lth,
      |          sum(in_a * in_b) AS n_both FROM comb GROUP BY 1, 2),
      |est AS (SELECT ga, gb,
      |    CASE WHEN n_l < 256 THEN CAST(n_l AS DOUBLE)
      |         ELSE (255.0 * 4294967296.0) / (CAST(lth AS DOUBLE) + 1.0)
      |    END AS u,
      |    CAST(n_both AS DOUBLE) / CAST(n_l AS DOUBLE) AS j
      |  FROM agg),
      |dsv AS (SELECT DISTINCT lang, s FROM sv),
      |exact AS (SELECT a.lang AS ga, b.lang AS gb, count(*) AS exact_intersect
      |          FROM dsv a JOIN dsv b ON a.s = b.s AND a.lang < b.lang
      |          GROUP BY 1, 2)
      |SELECT est.ga, est.gb, round(u, 4) AS union_est,
      |  round(j * u, 4) AS intersect_est, round(j, 6) AS jaccard_est,
      |  coalesce(exact.exact_intersect, 0) AS exact_intersect
      |FROM est LEFT JOIN exact USING (ga, gb) ORDER BY ga, gb""".stripMargin

  /** Shared CTE prefix for the KMV replays: the per-lang shingle values
    * (per-doc-deduped, as the Spark side's array_distinct) and their
    * DISTINCT low-32 md5 hashes. */
  private def kmvShingleCte: String =
    """WITH d AS (SELECT lang, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT lang,
      |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |      FROM d),
      |sv AS (SELECT lang, unnest(sh) AS s FROM g),
      |h AS (SELECT DISTINCT lang, (md5_number_lower(s) & 4294967295) AS hv FROM sv)""".stripMargin

  /** t_readability: replay Flesch–Kincaid — sentence runs, vowel-group
    * syllables with the per-word floor, the two fixed-shape score
    * expressions mirrored verbatim. */
  private def readabilitySql: String =
    raw"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w,
       |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sentences
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS words,
       |    CAST(sentences AS BIGINT) AS sentences,
       |    CAST(coalesce(list_sum(list_transform(w,
       |      x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0) AS BIGINT)
       |      AS syllables,
       |    CAST(greatest(1, len(w)) AS DOUBLE) AS wd
       |  FROM w)
       |SELECT doc_id, words, sentences, syllables,
       |  round(0.39 * (wd / CAST(sentences AS DOUBLE))
       |    + 11.8 * (CAST(syllables AS DOUBLE) / wd) - 15.59, 6) AS fk_grade,
       |  round(206.835 - 1.015 * (wd / CAST(sentences AS DOUBLE))
       |    - 84.6 * (CAST(syllables AS DOUBLE) / wd), 6) AS flesch
       |FROM c ORDER BY doc_id""".stripMargin

  /** t_textrank_keywords: replay TextRank — the symmetrized distinct
    * bigram-adjacency graph on md5 word ids, 3 unrolled integer-ppm
    * PageRank iterations (the w_page_rank template), ranks joined back
    * to min(tok) per id, top-20 by (rank desc, tok). */
  private def textrankSql: String = {
    def iter(prev: String, out: String): String =
      s"""i_$out AS (
         |  SELECT e.dst AS node, CAST(sum(r.r // g.d) AS BIGINT) AS insum
         |  FROM edges e JOIN $prev r ON r.node = e.src
         |  JOIN deg g ON g.src = e.src GROUP BY e.dst),
         |$out AS (
         |  SELECT nd.node,
         |    CAST(150000 + (coalesce(i.insum, 0) * 850000) // 1000000 AS BIGINT) AS r
         |  FROM nodes nd LEFT JOIN i_$out i ON i.node = nd.node)"""
        .stripMargin
    raw"""WITH d AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents
       |           WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
       |bg AS (SELECT unnest(list_transform(range(1, len(w)),
       |         i -> {'w1': w[i], 'w2': w[i+1]})) AS s FROM d),
       |bw AS (SELECT s.w1 AS w1, s.w2 AS w2 FROM bg
       |       WHERE s.w1 <> '' AND s.w2 <> ''),
       |eids AS (SELECT CAST(md5_number_lower(w1) & 4294967295 AS BIGINT) AS src,
       |                CAST(md5_number_lower(w2) & 4294967295 AS BIGINT) AS dst
       |         FROM bw),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM eids UNION ALL SELECT dst, src FROM eids)
       |  WHERE src <> dst),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")},
       |words AS (
       |  SELECT CAST(md5_number_lower(tok) & 4294967295 AS BIGINT) AS node,
       |    min(tok) AS tok
       |  FROM (SELECT DISTINCT tok FROM (
       |          SELECT w1 AS tok FROM bw UNION ALL SELECT w2 FROM bw))
       |  GROUP BY 1)
       |SELECT CAST(row_number() OVER (ORDER BY r.r DESC, w.tok) AS BIGINT) AS rank_pos,
       |  w.tok, r.r AS rank_ppm
       |FROM r3 r JOIN words w USING (node)
       |QUALIFY rank_pos <= 20 ORDER BY rank_pos""".stripMargin
  }

  /** t_pmi_bigrams: replay the PMI collocation table — unigram/bigram
    * totals, min-support 5, the one fixed-shape double expression
    * (c12·Nu·Nu)/((c1·c2)·Nb) left-associated then ln, 6 dp, total-order
    * rank (pmi desc, w1, w2) capped at 100. */
  private def pmiBigramsSql: String =
    raw"""WITH tk AS (
       |  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS t
       |  FROM documents),
       |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
       |nuc AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM tk),
       |d AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents
       |      WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
       |g AS (SELECT unnest(list_transform(range(1, len(w)),
       |        i -> {'w1': w[i], 'w2': w[i+1]})) AS s FROM d),
       |nbc AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM g),
       |bc AS (SELECT s.w1 AS w1, s.w2 AS w2, CAST(count(*) AS BIGINT) AS c12
       |       FROM g GROUP BY 1, 2 HAVING count(*) >= 5),
       |sc AS (SELECT bc.w1, bc.w2, bc.c12, u1.c AS c1, u2.c AS c2,
       |         round(ln(CAST(bc.c12 AS DOUBLE) * CAST(nuc.nu AS DOUBLE) * CAST(nuc.nu AS DOUBLE)
       |           / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE) * CAST(nbc.nb AS DOUBLE))), 6) AS pmi
       |       FROM bc JOIN uni u1 ON u1.t = bc.w1 JOIN uni u2 ON u2.t = bc.w2, nuc, nbc),
       |r AS (SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rank, *
       |      FROM sc)
       |SELECT rank, w1, w2, c12, c1, c2, pmi FROM r WHERE rank <= 100
       |ORDER BY rank""".stripMargin

  /** t_tfidf_terms: smooth-idf TF-IDF with the BM25 determinism
    * discipline — the ln is rounded to 6 dp BEFORE the multiply. */
  private def tfidfTermsSql: String =
    """WITH tk AS (SELECT doc_id,
      |        unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
      |      FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
      |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
      |         round(tf.tf * round(ln((n.n_docs + 1.0) / (CAST(dfq.df AS DOUBLE) + 1.0)) + 1.0, 6), 6) AS score_r
      |       FROM tf JOIN dfq USING (term), n),
      |r AS (SELECT doc_id, term, tf, score_r,
      |        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_r DESC, term) AS BIGINT) AS rank
      |      FROM sc)
      |SELECT doc_id, term, tf, score_r, rank FROM r WHERE rank <= 5
      |ORDER BY doc_id, rank""".stripMargin

  /** d_temperature_mix: replay τ=0.5 mixture rates — sqrt quantized to
    * integer micro-units so the normalizing sum is order-independent,
    * then the one fixed-shape rate expression and salted-hash
    * membership. */
  private def temperatureMixSql: String =
    """WITH tot AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n FROM documents GROUP BY source),
      |w AS (SELECT source, n,
      |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS isq
      |      FROM tot),
      |g AS (SELECT CAST(sum(isq) AS BIGINT) AS sisq, CAST(sum(n) AS BIGINT) AS t_all FROM w),
      |r AS (SELECT source, n,
      |        least(1.0, floor(CAST(g.t_all AS DOUBLE) * 0.3) * CAST(isq AS DOUBLE)
      |                   / CAST(g.sisq AS DOUBLE) / CAST(n AS DOUBLE)) AS rate
      |      FROM w, g),
      |kept AS (SELECT d.source, d.doc_id, d.n_chars, r.rate
      |         FROM documents d JOIN r USING (source)
      |         WHERE (md5_number_lower(CAST(doc_id AS VARCHAR) || ':mix0') & 4294967295)
      |               < CAST(floor(rate * 4294967296.0) AS BIGINT))
      |SELECT source, count(*) AS n_sampled,
      |  CAST(sum(n_chars) AS BIGINT) AS tokens_sampled,
      |  round(rate, 6) AS mix_rate, CAST(sum(doc_id) AS BIGINT) AS id_checksum
      |FROM kept GROUP BY source, rate ORDER BY source""".stripMargin

  /** d_mix_epochs: replay the epoch-capped allocation — isq ppm weights,
    * budget·ppm desired, min(4·10⁶, desired·10⁶ // n) micro-epochs,
    * capped actual and shortfall, all truncating BIGINT `//`. */
  private def mixEpochsSql: String =
    """WITH toks AS (
      |  SELECT source, lang,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
      |  FROM documents),
      |tot AS (SELECT source, lang, count(*) AS n_docs,
      |          CAST(sum(nt) AS BIGINT) AS n_tokens
      |        FROM toks GROUP BY source, lang),
      |q AS (SELECT *,
      |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS isq
      |      FROM tot),
      |g AS (SELECT CAST(sum(isq) AS BIGINT) AS sisq FROM q),
      |p AS (SELECT source, lang, n_docs, n_tokens,
      |        isq * 1000000 // sisq AS weight_ppm FROM q, g),
      |e AS (SELECT *, CAST(100000 AS BIGINT) * weight_ppm // 1000000 AS desired_tokens
      |      FROM p),
      |m AS (SELECT *,
      |        CASE WHEN n_tokens = 0 THEN 0
      |             ELSE least(4000000, desired_tokens * 1000000 // n_tokens) END
      |          AS epochs_micro
      |      FROM e)
      |SELECT source, lang, n_docs, n_tokens, weight_ppm, desired_tokens,
      |  CAST(epochs_micro AS DOUBLE) / 1000000.0 AS epochs_r,
      |  n_tokens * epochs_micro // 1000000 AS actual_tokens,
      |  desired_tokens - (n_tokens * epochs_micro // 1000000) AS shortfall
      |FROM m ORDER BY source, lang""".stripMargin

  /** d_incremental_dedup: new batch (doc_id % 10 = 9) vs the catalog of
    * the rest — exact fingerprint match (min catalog id) plus best banded
    * MinHash match at jaccard ≥ 0.05 (max jaccard, min id tiebreak). */
  private def incrementalDedupSql: String =
    s"""WITH $docDigCtes,
       |fp AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
       |       FROM documents),
       |exact AS (SELECT n.doc_id AS id, min(c.doc_id) AS exact_dup_of
       |          FROM fp n JOIN fp c ON n.f = c.f AND c.doc_id % 10 < 9
       |          WHERE n.doc_id % 10 = 9 GROUP BY 1),
       |pairs AS (
       |  SELECT n.doc_id AS id, c.doc_id AS cat_id,
       |    ${digCompare("n", "c")}
       |  FROM dig n JOIN dig c ON n.doc_id % 10 = 9 AND c.doc_id % 10 < 9),
       |best AS (SELECT id, cat_id AS near_dup_of, jaccard FROM (
       |    SELECT id, cat_id, jaccard,
       |      row_number() OVER (PARTITION BY id ORDER BY jaccard DESC, cat_id) AS rn
       |    FROM pairs WHERE nb > 0 AND jaccard >= 0.05) WHERE rn = 1)
       |SELECT nb.doc_id AS id, e.exact_dup_of, b.near_dup_of, b.jaccard
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 9) nb
       |LEFT JOIN exact e ON e.id = nb.doc_id
       |LEFT JOIN best b ON b.id = nb.doc_id
       |ORDER BY id""".stripMargin

  private def minhashLshSql: String =
    s"""WITH $minhashPairCtes
       |SELECT id_a, id_b, jaccard FROM pairs
       |WHERE nb > 0 AND jaccard >= 0.05
       |ORDER BY id_a, id_b""".stripMargin

  /** d_dedup_corpus: end-to-end near-dup REMOVAL — verified pairs →
    * connected components (transitive closure; min id wins) → keep one
    * representative per component plus unpaired docs (mirrors
    * Dedup.dropNearDuplicates ∘ resolveClusters ∘ minhashNearDups). The
    * id checksum pins the exact kept set, not just its size.
    */
  private def dedupCorpusSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |vp AS (SELECT id_a, id_b FROM pairs WHERE nb > 0 AND jaccard >= 0.05),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM vp
       |          UNION SELECT id_b, id_a FROM vp),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (SELECT src AS id, least(src, min(dst)) AS cluster
       |           FROM reach GROUP BY src),
       |losers AS (SELECT id FROM labels WHERE id <> cluster)
       |SELECT lang, count(*) AS n_docs_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
       |FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** mm_dhash_neardup: replay the perceptual hash from the pixel formula
    * — the engine decodes real PNGs to these exact samples, so the
    * formula-side 9×8 integer average-pool, adjacent-compare bits, and
    * all-pairs Hamming reproduce its banded output (banding is
    * exact-recall at ≤ maxHamming). */
  private def dhashNearDupSql: String =
    """WITH imgs(id, w, h, seed, bright, nx, ny) AS (VALUES
      |  (100, 18, 12,   5,  0, -1, -1),
      |  (101, 18, 12,   5, 20, -1, -1),
      |  (102, 18, 12,   5,  0,  5,  3),
      |  (110, 27, 16,  60,  0, -1, -1),
      |  (111, 27, 16,  60, 20, -1, -1),
      |  (120, 11,  9, 140,  0, -1, -1),
      |  (121, 11,  9, 140, 20, -1, -1)),
      |px AS (
      |  SELECT id, w, h, x, y,
      |    ((x*3 + y*7 + seed) % 200) + bright +
      |      CASE WHEN x = nx AND y = ny THEN 40 ELSE 0 END AS luma
      |  FROM imgs, unnest(range(0, w)) t1(x), unnest(range(0, h)) t2(y)),
      |cells AS (
      |  SELECT id, (x*9) // w AS cx, (y*8) // h AS cy,
      |    CAST(sum(luma) AS BIGINT) // count(*) AS v
      |  FROM px GROUP BY id, (x*9) // w, (y*8) // h),
      |bits AS (
      |  SELECT a.id,
      |    CASE WHEN a.v > b.v THEN CAST(1 AS UBIGINT) << (a.cy*8 + a.cx)
      |         ELSE CAST(0 AS UBIGINT) END AS bit
      |  FROM cells a JOIN cells b
      |    ON a.id = b.id AND a.cy = b.cy AND b.cx = a.cx + 1),
      |hashes AS (SELECT id, bit_or(bit) AS sh FROM bits GROUP BY id)
      |SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      |FROM hashes a JOIN hashes b ON a.id < b.id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  /** st_stream_rate: the streamed watermarked hourly rollup must equal
    * the batch date_trunc rollup (epoch-hour-aligned windows, additive
    * counts). */
  private def streamRateSql: String =
    """SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      |FROM events GROUP BY event_type, h
      |ORDER BY event_type, h""".stripMargin

  /** s_corpus_sink: recompute the deterministic shard assignment
    * (md5_low32(doc_id:corpus0) % 4) and the per-(lang, shard) manifest
    * stats straight from the documents table — the engine's value must
    * have survived write → files → read-back → reconcile intact. */
  private def corpusSinkSql: String =
    """SELECT lang,
      |  CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':corpus0')
      |        & 4294967295) % 4 AS BIGINT) AS shard,
      |  count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_checksum
      |FROM documents
      |GROUP BY lang, shard ORDER BY lang, shard""".stripMargin

  /** mm_audio_fingerprint: replay the windowed-energy gradient hash from
    * the PCM sample formula — 65 windows of mean energy (integer floor
    * division), adjacent-compare bits, all-pairs Hamming. */
  private def audioFpSql: String =
    """WITH clips(id, frames, seed, scale, nf) AS (VALUES
      |  (200, 800,  11, 1,  -1),
      |  (201, 800,  11, 2,  -1),
      |  (202, 800,  11, 1, 100),
      |  (210, 650, 400, 1,  -1),
      |  (211, 650, 400, 2,  -1),
      |  (220, 800, 999, 1,  -1)),
      |sm AS (
      |  SELECT id, frames, f,
      |    (((f*37 + seed) % 4096) - 2048) * scale +
      |      CASE WHEN f = nf THEN 500 ELSE 0 END AS s
      |  FROM clips, unnest(range(0, frames)) t(f)),
      |wn AS (
      |  SELECT id, (f*65) // frames AS w,
      |    CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) // count(*) AS e
      |  FROM sm GROUP BY id, (f*65) // frames),
      |bits AS (
      |  SELECT a.id,
      |    CASE WHEN a.e > b.e THEN CAST(1 AS UBIGINT) << a.w
      |         ELSE CAST(0 AS UBIGINT) END AS bit
      |  FROM wn a JOIN wn b ON a.id = b.id AND b.w = a.w + 1),
      |hashes AS (SELECT id, bit_or(bit) AS sh FROM bits GROUP BY id)
      |SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      |FROM hashes a JOIN hashes b ON a.id < b.id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 6
      |ORDER BY id_a, id_b""".stripMargin

  /** w_url_dedup: replay the canonicalizer — same regex surgery (scheme/
    * host/path/query extraction, www+port+userinfo strip, tracking-param
    * filter, param sort) over the same synthesized variant URLs. */
  private def urlDedupSql: String =
    """WITH urls AS (SELECT doc_id,
      |  CASE WHEN doc_id % 4 = 0 THEN 'https://shop.example.com/item/' || CAST(doc_id % 97 AS VARCHAR) || '?a=1&b=2'
      |       WHEN doc_id % 4 = 1 THEN 'HTTPS://WWW.Shop.Example.COM:443/item/' || CAST(doc_id % 97 AS VARCHAR) || '?b=2&a=1'
      |       WHEN doc_id % 4 = 2 THEN 'https://shop.example.com/item/' || CAST(doc_id % 97 AS VARCHAR) || '/?a=1&utm_source=news&b=2#top'
      |       ELSE 'https://user@shop.example.com:443/item/' || CAST(doc_id % 97 AS VARCHAR) || '?fbclid=xyz&a=1&b=2' END AS url
      |  FROM documents),
      |c AS (SELECT doc_id,
      |  lower(nullif(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1), '')) AS scheme,
      |  regexp_replace(lower(nullif(regexp_extract(url,
      |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]+)', 1), '')), '^www\.', '') AS host,
      |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?', 1) AS path0,
      |  regexp_extract(url, '^[^?#]*\?([^#]*)', 1) AS rawq
      |  FROM urls),
      |p AS (SELECT doc_id, scheme, host,
      |  CASE WHEN path0 = '' OR path0 = '/' THEN '' ELSE regexp_replace(path0, '/$', '') END AS path,
      |  array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      |    x -> x <> '' AND NOT regexp_matches(x,
      |      '^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='))), '&') AS q
      |  FROM c),
      |canon AS (SELECT doc_id,
      |  CASE WHEN scheme IS NULL OR host IS NULL THEN NULL
      |       ELSE scheme || '://' || host || path ||
      |            CASE WHEN q = '' THEN '' ELSE '?' || q END END AS url_canon
      |  FROM p)
      |SELECT url_canon, count(*) AS n_variants,
      |  CAST(min(doc_id) AS BIGINT) AS keep_id,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM canon WHERE url_canon IS NOT NULL
      |GROUP BY url_canon ORDER BY url_canon""".stripMargin

  /** t_token_budget: replay tokenBudgetPlan — whitespace token counts,
    * per-(source,lang) totals, isq = floor(sqrt(n)·10⁶) temperature
    * quantization, integer grand sums, then the same single-division
    * ratios (round 6) and floor(budget·isq/sisq) allocation with the
    * identical operation order so the doubles agree bitwise. */
  private def tokenBudgetSql: String =
    """WITH toks AS (
      |  SELECT source, lang,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
      |  FROM documents),
      |tot AS (SELECT source, lang, count(*) AS n_docs,
      |          CAST(sum(nt) AS BIGINT) AS n_tokens
      |        FROM toks GROUP BY source, lang),
      |q AS (SELECT *,
      |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS isq
      |      FROM tot),
      |g AS (SELECT CAST(sum(isq) AS BIGINT) AS sisq,
      |             CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM q)
      |SELECT source, lang, n_docs, n_tokens,
      |  round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS share,
      |  round(CAST(isq AS DOUBLE) / sisq, 6) AS weight,
      |  CAST(floor(CAST(100000 AS DOUBLE) * isq / sisq) AS BIGINT) AS planned_tokens,
      |  round(CAST(floor(CAST(100000 AS DOUBLE) * isq / sisq) AS DOUBLE) / n_tokens, 6)
      |    AS oversample
      |FROM q CROSS JOIN g
      |ORDER BY source, lang""".stripMargin

  /** t_length_histogram: replay token counts, 16-token bins, and
    * padding waste at max_len 64 — all integer floor division. */
  private def lengthHistogramSql: String =
    """WITH tk AS (
      |  SELECT CASE WHEN trim(text) = '' THEN 0
      |              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      |  FROM documents),
      |w AS (SELECT CAST(n AS BIGINT) AS n, n // 16 AS bin,
      |        ((n + 63) // 64) * 64 - n AS waste FROM tk)
      |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS total_tokens,
      |  CAST(sum(waste) AS BIGINT) AS padding_tokens,
      |  CASE WHEN sum(n) + sum(waste) = 0 THEN 0.0
      |       ELSE round(CAST(sum(waste) AS DOUBLE) / (sum(n) + sum(waste)), 6)
      |  END AS waste_ratio
      |FROM w GROUP BY bin ORDER BY bin""".stripMargin

  /** t_ngram_novelty: replay per-doc distinct 3-gram doc frequencies —
    * same shingle convention as the HLL oracle (short docs contribute
    * the whole text as one gram). */
  private def ngramNoveltySql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |      FROM d),
      |gd AS (SELECT DISTINCT doc_id, gram FROM
      |        (SELECT doc_id, unnest(sh) AS gram FROM g)),
      |f AS (SELECT gram, count(*) AS df FROM gd GROUP BY gram),
      |agg AS (SELECT doc_id, count(*) AS n_grams,
      |          sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_novel
      |        FROM gd JOIN f USING (gram) GROUP BY doc_id)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_grams,
      |  CAST(n_novel AS BIGINT) AS n_novel,
      |  round(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty
      |FROM agg WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin

  /** w_page_rank: replay integer-ppm PageRank by unrolling the 3
    * iterations — every op is exact integral arithmetic (floor division
    * on positives via //), so ranks match bit-for-bit. */
  private def pageRankSql: String = {
    def iter(prev: String, out: String): String =
      s"""i_$out AS (
         |  SELECT e.dst AS node, CAST(sum(r.r // g.d) AS BIGINT) AS insum
         |  FROM edges e JOIN $prev r ON r.node = e.src
         |  JOIN deg g ON g.src = e.src GROUP BY e.dst),
         |$out AS (
         |  SELECT nd.node,
         |    CAST(150000 + (coalesce(i.insum, 0) * 850000) // 1000000 AS BIGINT) AS r
         |  FROM nodes nd LEFT JOIN i_$out i ON i.node = nd.node)"""
        .stripMargin
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id*7 + 3) % (SELECT c FROM nn) AS dst FROM documents
       |  UNION
       |  SELECT doc_id, doc_id % 31 FROM documents),
       |edges AS (SELECT src, dst FROM e0 WHERE src <> dst),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, r AS rank_ppm FROM r3
       |ORDER BY rank_ppm DESC, node LIMIT 20""".stripMargin
  }

  /** w_kcore: replay 8 unrolled synchronous h-operator rounds (init =
    * degree; each round c(v) = max over desc-sorted neighbor values of
    * min(rownum, value)) on the symmetrized w_label_prop graph, then
    * the coreness histogram. Rounds MATERIALIZED. */
  private def kCoreSql: String = {
    def rnd(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT dst AS node, CAST(max(least(rn, v)) AS BIGINT) AS c FROM (
         |    SELECT s.dst, l.c AS v,
         |      row_number() OVER (PARTITION BY s.dst ORDER BY l.c DESC) AS rn
         |    FROM sym s JOIN $prev l ON l.node = s.src)
         |  GROUP BY 1)""".stripMargin
    val rounds = (1 to 8).map(i => rnd(if (i == 1) "c0" else s"c${i - 1}", s"c$i"))
      .mkString(",\n")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id*7 + 3) % (SELECT c FROM nn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, doc_id % 31 FROM documents),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM e0 WHERE src <> dst
       |    UNION ALL
       |    SELECT dst, src FROM e0 WHERE src <> dst)),
       |c0 AS MATERIALIZED (
       |  SELECT src AS node, CAST(count(*) AS BIGINT) AS c FROM sym GROUP BY 1),
       |$rounds
       |SELECT c AS coreness, count(*) AS n_nodes,
       |  CAST(sum(node) AS BIGINT) AS node_checksum
       |FROM c8 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** w_label_prop: replay 3 unrolled synchronous LPA rounds on the
    * symmetrized w_page_rank graph — per-node neighbor-label mode with
    * ties to the smallest label, then the community-size histogram.
    * Rounds MATERIALIZED (DuckDB inlines chained CTEs combinatorially). */
  private def labelPropSql: String = {
    def round(prev: String, out: String): String =
      s"""f_$out AS MATERIALIZED (
         |  SELECT s.dst AS node, l.label, count(*) AS c
         |  FROM sym s JOIN $prev l ON l.node = s.src GROUP BY 1, 2),
         |t_$out AS (
         |  SELECT node, label FROM f_$out
         |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1),
         |$out AS MATERIALIZED (
         |  SELECT l.node, coalesce(t.label, l.label) AS label
         |  FROM $prev l LEFT JOIN t_$out t USING (node))""".stripMargin
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id*7 + 3) % (SELECT c FROM nn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, doc_id % 31 FROM documents),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM e0 WHERE src <> dst
       |    UNION ALL
       |    SELECT dst, src FROM e0 WHERE src <> dst)),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM sym),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |${round("l2", "l3")}
       |SELECT size, count(*) AS n_communities,
       |  CAST(sum(label) AS BIGINT) AS label_checksum
       |FROM (SELECT label, count(*) AS size FROM l3 GROUP BY 1)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** d_corpus_diff: the expected status of every id follows from the
    * snapshot-membership and edit predicates — a broken fingerprint
    * compare (or broken whitespace normalization: ids%11 carry a
    * whitespace-only edit and must be unchanged) shifts the counts. */
  private def corpusDiffSql: String =
    """WITH st AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id % 3 <> 0 AND doc_id % 7 = 0 THEN 'added'
      |         WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0 THEN 'removed'
      |         WHEN doc_id % 7 <> 0 AND doc_id % 3 <> 0 AND doc_id % 5 = 0 THEN 'changed'
      |         WHEN doc_id % 7 <> 0 AND doc_id % 3 <> 0 THEN 'unchanged'
      |         ELSE NULL END AS status
      |  FROM documents)
      |SELECT status, count(*) AS n_docs, CAST(sum(id) AS BIGINT) AS id_checksum
      |FROM st WHERE status IS NOT NULL
      |GROUP BY status ORDER BY status""".stripMargin

  /** d_leakage_split: replay closure labels (cluster = component min id,
    * singletons = own id), then the salted cluster-hash thresholds —
    * every duplicate-cluster member lands in the same split by
    * construction. */
  private def leakageSplitSql: String = {
    def thr(f: Double) = math.floor(f * 4294967296.0).toLong
    s"""WITH RECURSIVE $minhashPairCtes,
       |vp AS (SELECT id_a, id_b FROM pairs WHERE nb > 0 AND jaccard >= 0.05),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM vp
       |          UNION SELECT id_b, id_a FROM vp),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (SELECT src AS id, least(src, min(dst)) AS cluster
       |           FROM reach GROUP BY src),
       |assign AS (
       |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster,
       |    (md5_number_lower(CAST(coalesce(l.cluster, d.doc_id) AS VARCHAR)
       |       || ':split0') & 4294967295) AS h
       |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
       |SELECT CASE WHEN h < ${thr(0.8)} THEN 'train'
       |            WHEN h < ${thr(0.9)} THEN 'valid'
       |            ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       |  CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
       |FROM assign GROUP BY split ORDER BY split""".stripMargin
  }

  /** d_cluster_canonical: same verified pairs → transitive closure as
    * d_dedup_corpus, then each cluster's best member by (n_chars desc,
    * id asc) — the quality-aware keep policy. All-integer output. */
  private def clusterCanonicalSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |vp AS (SELECT id_a, id_b FROM pairs WHERE nb > 0 AND jaccard >= 0.05),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM vp
       |          UNION SELECT id_b, id_a FROM vp),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (SELECT src AS id, least(src, min(dst)) AS cluster
       |           FROM reach GROUP BY src),
       |members AS (SELECT l.id, l.cluster, d.n_chars
       |            FROM labels l JOIN documents d ON d.doc_id = l.id),
       |canon AS (SELECT id, cluster, n_chars,
       |            row_number() OVER (PARTITION BY cluster
       |              ORDER BY n_chars DESC, id) AS rn
       |          FROM members)
       |SELECT m.cluster, count(*) AS n_members,
       |  CAST(min(c.id) AS BIGINT) AS canonical_id,
       |  CAST(min(c.n_chars) AS BIGINT) AS canonical_quality,
       |  CAST(sum(m.id) - min(c.id) AS BIGINT) AS dropped_id_sum
       |FROM members m JOIN (SELECT * FROM canon WHERE rn = 1) c
       |  ON c.cluster = m.cluster
       |GROUP BY m.cluster ORDER BY m.cluster""".stripMargin

  /** d_simhash_pairs: 64-bit SimHash (md5Low64 token hash) + Hamming. */
  private def simhashPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
       |  FROM documents WHERE doc_id <= 40),
       |bits AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (md5_number_lower(tok) >> b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
       |  FROM toks CROSS JOIN (SELECT unnest(range(0, 64)) AS b) GROUP BY doc_id, b),
       |sh AS (
       |  SELECT doc_id,
       |    bit_or(CASE WHEN cnt > 0 THEN (CAST(1 AS UBIGINT) << b) ELSE CAST(0 AS UBIGINT) END) AS s
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |ORDER BY hamming, id_a, id_b LIMIT 100""".stripMargin

  /** d_emb_neardups: exact all-pairs cosine ≥ 0.35 (the engine falls back
    * to Ann.exactCosinePairs at thresholds where banding can't reach the
    * recall target). */
  private def embNearDupsSql: String =
    """WITH n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  /** ann_ivf_topk: recompute Ann.bucketedTopK independently — the
    * integer-exact hyperplane signature (q_j = floor(v_j·10⁶); weight =
    * 3-round Lehmer mix of (1009h + j), centered; bit = sign of the exact
    * BIGINT dot) makes the bucket assignment engine-independent, then
    * top-5 cosine within the query's bucket. Spark j is 0-based,
    * DuckDB list index is 1-based: seeds align as (1009h + j_duck).
    */
  private def annCosineSql: String =
    """WITH n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings)
      |SELECT query_id, neighbor_id, cosine, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |         ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END AS cosine,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |        ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC, c.vec_id) AS rank
      |  FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ann_recall_audit: recall@5 of the sign-LSH bucketed search against
    * the exact top-5 — BOTH pipelines replayed as nested subqueries of
    * their own oracle SQL, counts exact. */
  private def annRecallSql: String =
    s"""WITH exact AS (SELECT query_id, neighbor_id FROM ($annCosineSql)),
       |approx AS (SELECT query_id, neighbor_id FROM (${annIvfSql})),
       |hit AS (SELECT query_id, neighbor_id FROM approx
       |        INTERSECT SELECT query_id, neighbor_id FROM exact),
       |c AS (SELECT (SELECT count(*) FROM exact) AS n_exact,
       |             (SELECT count(*) FROM approx) AS n_approx,
       |             (SELECT count(*) FROM hit) AS n_hit)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(n_approx AS BIGINT) AS n_approx, CAST(n_hit AS BIGINT) AS n_hit,
       |  CASE WHEN n_exact = 0 THEN 0.0
       |       ELSE round(CAST(n_hit AS DOUBLE) / n_exact, 6) END AS recall
       |FROM c""".stripMargin

  private def annIvfSql: String = {
    def wExpr(h: Int) =
      s"((((($h*1009 + j) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) - 1073741823"
    val bucketTerms = (0 until 8).map { h =>
      s"CASE WHEN list_sum([qv[j] * (${wExpr(h)}) FOR j IN range(1, len(qv)+1)]) >= 0 THEN ${1L << h} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    [CAST(floor(x * 1000000) AS BIGINT) FOR x IN CAST(embedding AS DOUBLE[])] AS qv
       |  FROM embeddings),
       |sigs AS (
       |  SELECT vec_id, e,
       |    sqrt(list_dot_product(e, e)) AS nrm,
       |    $bucketTerms AS bucket
       |  FROM n)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
       |  FROM sigs q JOIN sigs c ON q.bucket = c.bucket
       |    AND q.vec_id <= 10 AND c.vec_id <> q.vec_id)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Shared CTE chain replaying Ann.quantizedTopK: int8 symmetric
    * quantization (sc = max|vᵢ|/127, both engines branch on sc = 0; round
    * half away from zero; clamp ±127) → qranked(query_id, neighbor_id,
    * qcosine, rank) by the pure-BIGINT quantized dot over quantized norms
    * — every step is exact integer or a single IEEE double op in the same
    * order as the engine. */
  private val annQuantizedCtes: String =
    """v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |s AS (
      |  SELECT vec_id, e, list_max([abs(x) FOR x IN e]) / 127.0 AS sc FROM v),
      |qq AS (
      |  SELECT vec_id,
      |    CASE WHEN sc = 0 THEN [CAST(0 AS BIGINT) FOR x IN e]
      |         ELSE [CAST(greatest(-127, least(127,
      |                CASE WHEN x / sc >= 0 THEN floor(x / sc + 0.5)
      |                     ELSE ceil(x / sc - 0.5) END)) AS BIGINT) FOR x IN e]
      |    END AS q
      |  FROM s),
      |n AS (
      |  SELECT vec_id, q,
      |    sqrt(CAST(list_sum([x * x FOR x IN q]) AS DOUBLE)) AS nrm
      |  FROM qq),
      |qranked AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
      |         ELSE round(CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS DOUBLE)
      |                    / (a.nrm * b.nrm), 6) END AS qcosine,
      |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |      CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
      |           ELSE round(CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS DOUBLE)
      |                      / (a.nrm * b.nrm), 6) END DESC, b.vec_id) AS rank
      |  FROM n a JOIN n b ON a.vec_id <= 10 AND b.vec_id <> a.vec_id)""".stripMargin

  private def annQuantizedSql: String =
    s"""WITH $annQuantizedCtes
       |SELECT query_id, neighbor_id, qcosine, rank FROM qranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ann_rerank_topk: quantized prefilter (top k·oversample candidates)
    * re-scored with FULL-precision exact cosine — the production
    * retrieval shape. DuckDB replays both stages. */
  private def annRerankSql: String =
    s"""WITH $annQuantizedCtes,
       |cand AS (SELECT query_id, neighbor_id FROM qranked WHERE rank <= 20),
       |f AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT c.query_id, c.neighbor_id,
       |    CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
       |         ELSE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) END AS cosine,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
       |        ELSE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) END DESC,
       |               c.neighbor_id) AS rank
       |  FROM cand c JOIN f a ON c.query_id = a.vec_id
       |              JOIN f b ON c.neighbor_id = b.vec_id)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** inc_profile_merge: the incremental path's merged profile must equal
    * this from-scratch computation over the FULL table (counts, digests,
    * numeric bounds per column). */
  private def incProfileMergeSql: String = {
    val selects = lakeSchemas("supplier").zipWithIndex.map { case ((c, lt), i) =>
      val strRender =
        if (lt == "string") s"nullif(CAST($c AS VARCHAR), '')"
        else s"CAST($c AS VARCHAR)"
      val numRender =
        if (lt == "integer" || lt == "float") s"CAST($c AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"SELECT $i AS ci, $strRender AS v, $numRender AS vn FROM supplier"
    }
    s"""WITH $permsCte,
       |vals AS (
       |  ${selects.mkString("\n  UNION ALL ")}
       |),
       |stats AS (
       |  SELECT ci, count(*) AS n_rows, count(*) - count(v) AS num_nan,
       |         min(vn) AS min_v, max(vn) AS max_v
       |  FROM vals GROUP BY ci),
       |dvals AS (SELECT DISTINCT ci, v FROM vals WHERE v IS NOT NULL),
       |mins AS (SELECT ci, pi, ${mhSlotMin("v")} AS mh
       |         FROM dvals CROSS JOIN perms GROUP BY ci, pi),
       |dig AS (SELECT ci, array_to_string(list(mh ORDER BY pi), ',') AS mh_exact
       |        FROM mins GROUP BY ci)
       |SELECT 'supplier' AS table_name, CAST(ci AS BIGINT) AS col_idx,
       |  stats.n_rows AS "rows", stats.num_nan, dig.mh_exact,
       |  stats.min_v, stats.max_v
       |FROM stats JOIN dig USING (ci) ORDER BY col_idx""".stripMargin
  }

  /** inc_quantile_sketch: replay the HDR-style mergeable quantile sketch
    * over the FULL orders table (merge invariance makes the engine's
    * three-chunk path equivalent). Every step is exact integer: micro
    * floor-quantize, msb via bin() length, 32 sub-buckets per octave,
    * rank ceil(n·k/10), integer bucket midpoint; the single float op is
    * the closing /1e6.
    */
  private def quantileSketchSql: String = quantileSketchSql("orders")

  private def quantileSketchSql(tbl: String): String = {
    val numeric = lakeSchemas(tbl).zipWithIndex.collect {
      case ((c, "integer"), i) => s"SELECT $i AS ci, CAST($c AS DOUBLE) AS v FROM $tbl"
      case ((c, "float"), i)   => s"SELECT $i AS ci, CAST($c AS DOUBLE) AS v FROM $tbl"
      case ((c, "date"), i)    => s"SELECT $i AS ci, CAST(floor(epoch($c)) AS DOUBLE) AS v FROM $tbl"
    }
    s"""WITH vn AS (
       |  ${numeric.mkString("\n  UNION ALL ")}
       |),
       |qv AS (
       |  SELECT ci, least(greatest(CAST(floor(v * 1e6) AS BIGINT),
       |           -4611686018427387904), 4611686018427387904) AS q
       |  FROM vn WHERE v IS NOT NULL),
       |bi AS (
       |  SELECT ci, q, abs(q) AS a, length(bin(abs(q))) - 1 AS e FROM qv),
       |bk AS (
       |  SELECT ci,
       |    (CASE WHEN q < 0 THEN -1 ELSE 1 END) *
       |    (CASE WHEN a < 32 THEN a
       |          ELSE (CAST(e AS BIGINT) - 4) * 32 + (a >> (e - 5)) - 32 END) AS bucket
       |  FROM bi),
       |counts AS (SELECT ci, bucket, count(*) AS cnt FROM bk GROUP BY ci, bucket),
       |cum AS (
       |  SELECT ci, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY ci ORDER BY bucket) AS cum,
       |    sum(cnt) OVER (PARTITION BY ci) AS n
       |  FROM counts),
       |dk AS (
       |  SELECT ci, bucket, cnt, cum, n, k
       |  FROM cum CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
       |  WHERE cum >= greatest((n * k + 9) // 10, 1)
       |    AND cum - cnt < greatest((n * k + 9) // 10, 1)),
       |est AS (
       |  SELECT ci, k, bucket, abs(bucket) AS idx,
       |    abs(bucket) >> 5 AS lvl
       |  FROM dk)
       |SELECT '$tbl' AS table_name, CAST(ci AS BIGINT) AS col_idx,
       |  CAST(k AS BIGINT) AS decile,
       |  CAST((CASE WHEN bucket < 0 THEN -1 ELSE 1 END) *
       |    (CASE WHEN idx < 64 THEN idx
       |          ELSE ((32 + (idx & 31)) << (lvl - 1))
       |               + (CAST(1 AS BIGINT) << (lvl - 2)) END) AS DOUBLE)
       |    / 1e6 AS est
       |FROM est ORDER BY col_idx, decile""".stripMargin
  }

  /** x_zorder: replay quantize → integer min/max scale → Morton bit
    * interleave (bit j of dim i at position j·k+i) → prefix buckets.
    */
  private def zorderSql: String = {
    val bits = 8
    val interleave = (for (i <- 0 to 1; j <- 0 until bits)
      yield s"(((s$i >> $j) & 1) << ${j * 2 + i})").mkString(" + ")
    s"""WITH q AS (
       |  SELECT c_custkey,
       |    CAST(floor(c_custkey * 1e6) AS BIGINT) AS q0,
       |    CAST(floor(CAST(c_acctbal AS DOUBLE) * 1e6) AS BIGINT) AS q1
       |  FROM customer),
       |bnd AS (SELECT min(q0) mn0, max(q0) mx0, min(q1) mn1, max(q1) mx1 FROM q),
       |s AS (
       |  SELECT c_custkey,
       |    CASE WHEN mx0 = mn0 THEN 0 ELSE ((q0 - mn0) * 255) // (mx0 - mn0) END AS s0,
       |    CASE WHEN mx1 = mn1 THEN 0 ELSE ((q1 - mn1) * 255) // (mx1 - mn1) END AS s1
       |  FROM q, bnd),
       |z AS (SELECT c_custkey, $interleave AS zv FROM s)
       |SELECT zv >> 10 AS z_bucket, count(*) AS n_rows,
       |  CAST(sum(c_custkey) AS BIGINT) AS key_checksum
       |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
  }

  /** ann_kmeans_ivf: replay deterministic Lloyd's k-means (3 unrolled
    * iterations, exact BIGINT micro-space distances, trunc-division
    * means, empty cells keep their centroid), then the IVF search:
    * corpus→nearest cell, queries→2 nearest cells, full-precision
    * cosine within probed cells, top-5.
    */
  /** Nearest-cell argmin CTE body over `qvs` × the `src` centroid
    * relation (BIGINT micro-space distances, ties to the lowest cell) —
    * shared by the kmeans replays. */
  private def kmeansArgmin(src: String, filter: String, rnCond: String,
                           dim: Int): String =
    s"""  SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        list_sum([(v.qv[d] - c.cq[d]) * (v.qv[d] - c.cq[d])
       |                  FOR d IN range(1, ${dim + 1})]), c.cell) AS rn
       |    FROM qvs v, $src c$filter)
       |  WHERE $rnCond""".stripMargin

  /** Deterministic Lloyd's replay CTEs: `qvs` (micro-quantized
    * embeddings), `c0` (k lowest-id seeds), and per-iteration
    * assign/sum/mean/carry rounds ending at `c$iters` — shared by
    * ann_kmeans_ivf and d_semdedup. */
  private def kmeansCascade(iters: Int, kCells: Int, dim: Int): String = {
    val base =
      s"""qvs AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    [CAST(floor(x * 1e6) AS BIGINT) FOR x IN CAST(embedding AS DOUBLE[])] AS qv
         |  FROM embeddings),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS cell, qv AS cq
         |  FROM (SELECT vec_id, qv FROM qvs ORDER BY vec_id LIMIT $kCells))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (
         |${kmeansArgmin(s"c${i - 1}", "", "rn = 1", dim)}),
         |s$i AS (
         |  SELECT a.cell, d, sum(v.qv[d]) AS s, count(*) AS n
         |  FROM (SELECT vec_id, cell, unnest(range(1, ${dim + 1})) AS d FROM a$i) a
         |  JOIN qvs v USING (vec_id)
         |  GROUP BY a.cell, d),
         |n$i AS (
         |  SELECT cell,
         |    list(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END ORDER BY d) AS cq
         |  FROM s$i GROUP BY cell),
         |c$i AS (
         |  SELECT o.cell, coalesce(nn.cq, o.cq) AS cq
         |  FROM c${i - 1} o LEFT JOIN n$i nn USING (cell))""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private def annKmeansIvfSql: String = {
    val (iters, kCells, nProbe, k, dim) = (3, 8, 2, 5, 64)
    def argmin(src: String, filter: String, rnCond: String) =
      kmeansArgmin(src, filter, rnCond, dim)
    s"""WITH ${kmeansCascade(iters, kCells, dim)},
       |ca AS (
       |${argmin(s"c$iters", "", "rn = 1")}),
       |qp AS (
       |${argmin(s"c$iters", " WHERE v.vec_id <= 10", s"rn <= $nProbe")}),
       |f AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM qvs),
       |scored AS (
       |  SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
       |    CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
       |         ELSE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) END AS cosine
       |  FROM qp JOIN ca USING (cell)
       |  JOIN f a ON a.vec_id = qp.vec_id
       |  JOIN f b ON b.vec_id = ca.vec_id
       |  WHERE ca.vec_id <> qp.vec_id)
       |SELECT query_id, neighbor_id, cosine,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |FROM scored QUALIFY rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** j_cluster_agreement: replay the Lloyd's cascade → cell
    * assignments, then the contingency-table metrics — pair
    * combinatorics exact (HUGEINT cross products mirror the Spark
    * DECIMAL(38,0) path), NMI's pointwise ln terms micro-rounded
    * half-away BEFORE the count-weighted BIGINT sums so the 1/n
    * factors cancel exactly. */
  private def clusterAgreementSql: String = {
    val (iters, kCells, dim) = (3, 8, 64)
    def rhaB(l: String) =
      s"CAST(CASE WHEN $l >= 0 THEN floor($l + 0.5) ELSE ceil($l - 0.5) END AS BIGINT)"
    s"""WITH ${kmeansCascade(iters, kCells, dim)},
       |asg AS (
       |${kmeansArgmin(s"c$iters", "", "rn = 1", dim)}),
       |ct AS (
       |  SELECT asg.cell AS cca, CAST(e.label AS BIGINT) AS ccb,
       |    CAST(count(*) AS BIGINT) AS nij
       |  FROM asg JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
       |ra AS (SELECT cca, CAST(sum(nij) AS BIGINT) AS ai FROM ct GROUP BY 1),
       |rb AS (SELECT ccb, CAST(sum(nij) AS BIGINT) AS bj FROM ct GROUP BY 1),
       |tot AS (SELECT CAST(sum(ai) AS BIGINT) AS n, count(*) AS ka FROM ra),
       |kbc AS (SELECT count(*) AS kb FROM rb),
       |nt AS (
       |  SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sum_idx,
       |    CAST(sum(nij * ${rhaB("l")}) AS BIGINT) AS i_micro
       |  FROM (
       |    SELECT ct.nij,
       |      ln(CAST(ct.nij AS DOUBLE) / CAST(ra.ai AS DOUBLE)
       |         * CAST(tot.n AS DOUBLE) / CAST(rb.bj AS DOUBLE)) * 1000000 AS l
       |    FROM ct JOIN ra USING (cca) JOIN rb USING (ccb), tot)),
       |hha AS (
       |  SELECT CAST(sum(ai * ${rhaB("l")}) AS BIGINT) AS ha,
       |    CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS sum_a
       |  FROM (SELECT ai, ln(CAST(ai AS DOUBLE) / CAST(tot.n AS DOUBLE)) * 1000000 AS l
       |        FROM ra, tot)),
       |hhb AS (
       |  SELECT CAST(sum(bj * ${rhaB("l")}) AS BIGINT) AS hb,
       |    CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS sum_b
       |  FROM (SELECT bj, ln(CAST(bj AS DOUBLE) / CAST(tot.n AS DOUBLE)) * 1000000 AS l
       |        FROM rb, tot)),
       |fin AS (
       |  SELECT tot.n, tot.ka, kbc.kb, nt.i_micro, hha.ha, hhb.hb,
       |    2 * (CAST(nt.sum_idx AS HUGEINT) * (CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2)
       |         - CAST(hha.sum_a AS HUGEINT) * hhb.sum_b) AS num,
       |    (CAST(hha.sum_a AS HUGEINT) + hhb.sum_b)
       |      * (CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2)
       |      - 2 * CAST(hha.sum_a AS HUGEINT) * hhb.sum_b AS den
       |  FROM tot, kbc, nt, hha, hhb)
       |SELECT n AS n_items, ka, kb,
       |  CASE WHEN den = 0 THEN 1.0
       |       ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS ari,
       |  CASE WHEN ha + hb = 0 THEN 1.0
       |       ELSE round(CAST(2 * i_micro AS DOUBLE) / CAST(-(ha + hb) AS DOUBLE), 6) END AS nmi
       |FROM fin""".stripMargin
  }

  /** ann_pq_adc: replay product quantization — per-subspace Lloyd's
    * (2 unrolled iterations over the grouped (sub, code) codebooks,
    * BIGINT micro-space distances, trunc-division means, empty codes
    * carry), corpus PQ-encoding, and Asymmetric Distance Computation:
    * per-query (sub, code) distance tables, neighbor distance = exact
    * BIGINT sum of 8 table lookups, top-5. */
  private def annPqAdcSql: String = {
    val (iters, nSub, kCodes, subDim, kNb) = (2, 8, 16, 8, 5)
    def argmin(src: String, filter: String) =
      s"""  SELECT vec_id, sub, code FROM (
         |    SELECT v.vec_id, v.sub, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
         |        list_sum([(v.sq[d] - c.cq[d]) * (v.sq[d] - c.cq[d])
         |                  FOR d IN range(1, ${subDim + 1})]), c.code) AS rn
         |    FROM sv v JOIN $src c ON v.sub = c.sub$filter)
         |  WHERE rn = 1""".stripMargin
    val base =
      s"""qvs AS (
         |  SELECT vec_id,
         |    [CAST(floor(x * 1e6) AS BIGINT) FOR x IN CAST(embedding AS DOUBLE[])] AS qv
         |  FROM embeddings),
         |sv AS (
         |  SELECT vec_id, CAST(sub AS BIGINT) AS sub,
         |    list_slice(qv, sub * $subDim + 1, sub * $subDim + $subDim) AS sq
         |  FROM qvs, (SELECT unnest(range(0, $nSub)) AS sub)),
         |sd AS (
         |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS code
         |  FROM (SELECT DISTINCT vec_id FROM qvs ORDER BY vec_id LIMIT $kCodes)),
         |pc0 AS (SELECT v.sub, s.code, v.sq AS cq FROM sv v JOIN sd s USING (vec_id))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pa$i AS (
         |${argmin(s"pc${i - 1}", "")}),
         |ps$i AS (
         |  SELECT a.sub, a.code, d, sum(v.sq[d]) AS s, count(*) AS n
         |  FROM (SELECT vec_id, sub, code, unnest(range(1, ${subDim + 1})) AS d FROM pa$i) a
         |  JOIN sv v ON v.vec_id = a.vec_id AND v.sub = a.sub
         |  GROUP BY a.sub, a.code, d),
         |pn$i AS (
         |  SELECT sub, code,
         |    list(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END ORDER BY d) AS cq
         |  FROM ps$i GROUP BY sub, code),
         |pc$i AS (
         |  SELECT o.sub, o.code, coalesce(nn.cq, o.cq) AS cq
         |  FROM pc${i - 1} o LEFT JOIN pn$i nn ON nn.sub = o.sub AND nn.code = o.code)""".stripMargin
    }
    s"""WITH ${(base +: rounds).mkString(",\n")},
       |paf AS (
       |${argmin(s"pc$iters", "")}),
       |dtb AS (
       |  SELECT v.vec_id AS query_id, v.sub, c.code,
       |    list_sum([(v.sq[d] - c.cq[d]) * (v.sq[d] - c.cq[d])
       |              FOR d IN range(1, ${subDim + 1})]) AS d
       |  FROM sv v JOIN pc$iters c ON v.sub = c.sub
       |  WHERE v.vec_id <= 10),
       |sc AS (
       |  SELECT dtb.query_id, a.vec_id AS neighbor_id,
       |    CAST(sum(dtb.d) AS BIGINT) AS adc_dist
       |  FROM paf a JOIN dtb ON a.sub = dtb.sub AND a.code = dtb.code
       |  WHERE a.vec_id <> dtb.query_id
       |  GROUP BY dtb.query_id, a.vec_id)
       |SELECT query_id, neighbor_id, adc_dist,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rank
       |FROM sc QUALIFY rank <= $kNb ORDER BY query_id, rank""".stripMargin
  }

  /** ann_ivfpq: replay IVFADC — the coarse Lloyd's cascade + cell
    * assignment, corpus RESIDUALS (qv − home-cell centroid) sliced to
    * subvectors, the PQ cascade trained on residual subvecs, per-query
    * per-probed-cell residual distance tables, and cell-routed exact
    * BIGINT ADC sums. */
  private def annIvfPqSql: String =
    s"""WITH $annIvfPqCtes
       |SELECT query_id, neighbor_id, adc_dist, rank FROM ivf5
       |ORDER BY query_id, rank""".stripMargin

  /** ann_ivfpq_recall: the IVFADC top-5 (shared CTE block) against the
    * full-precision brute-force top-5, one summary row. */
  private def annIvfPqRecallSql: String =
    s"""WITH $annIvfPqCtes,
       |f AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM qvs),
       |bf5 AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
       |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
       |          c.vec_id) AS rank
       |    FROM (SELECT * FROM f WHERE vec_id <= 10) q
       |    JOIN f c ON c.vec_id <> q.vec_id)
       |  WHERE rank <= 5),
       |hit AS (SELECT a.query_id, a.neighbor_id FROM ivf5 a
       |        JOIN bf5 b USING (query_id, neighbor_id))
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM bf5) AS n_exact,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ivf5) AS n_approx,
       |  (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit,
       |  CASE WHEN (SELECT count(*) FROM bf5) = 0 THEN 0.0
       |       ELSE round((SELECT CAST(count(*) AS DOUBLE) FROM hit)
       |            / (SELECT CAST(count(*) AS DOUBLE) FROM bf5), 6) END AS recall"""
      .stripMargin

  private def annIvfPqCtes: String = {
    val (cellIters, kCells, dim) = (3, 8, 64)
    val (pqIters, nSub, kCodes, subDim, kNb, nProbe) = (2, 8, 16, 8, 5, 2)
    def pqArgmin(src: String) =
      s"""  SELECT vec_id, sub, code FROM (
         |    SELECT v.vec_id, v.sub, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id, v.sub ORDER BY
         |        list_sum([(v.sq[d] - c.cq[d]) * (v.sq[d] - c.cq[d])
         |                  FOR d IN range(1, ${subDim + 1})]), c.code) AS rn
         |    FROM sv v JOIN $src c ON v.sub = c.sub)
         |  WHERE rn = 1""".stripMargin
    val pqRounds = (1 to pqIters).map { i =>
      s"""pa$i AS (
         |${pqArgmin(s"pc${i - 1}")}),
         |ps$i AS (
         |  SELECT a.sub, a.code, d, sum(v.sq[d]) AS s, count(*) AS n
         |  FROM (SELECT vec_id, sub, code, unnest(range(1, ${subDim + 1})) AS d FROM pa$i) a
         |  JOIN sv v ON v.vec_id = a.vec_id AND v.sub = a.sub
         |  GROUP BY a.sub, a.code, d),
         |pn$i AS (
         |  SELECT sub, code,
         |    list(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END ORDER BY d) AS cq
         |  FROM ps$i GROUP BY sub, code),
         |pc$i AS (
         |  SELECT o.sub, o.code, coalesce(nn.cq, o.cq) AS cq
         |  FROM pc${i - 1} o LEFT JOIN pn$i nn ON nn.sub = o.sub AND nn.code = o.code)""".stripMargin
    }.mkString(",\n")
    s"""${kmeansCascade(cellIters, kCells, dim)},
       |ca AS (
       |${kmeansArgmin(s"c$cellIters", "", "rn = 1", dim)}),
       |rvs AS MATERIALIZED (
       |  SELECT q.vec_id, ca.cell,
       |    [q.qv[d] - c.cq[d] FOR d IN range(1, ${dim + 1})] AS rv
       |  FROM qvs q JOIN ca USING (vec_id) JOIN c$cellIters c ON c.cell = ca.cell),
       |sv AS MATERIALIZED (
       |  SELECT vec_id, cell, CAST(sub AS BIGINT) AS sub,
       |    list_slice(rv, sub * $subDim + 1, sub * $subDim + $subDim) AS sq
       |  FROM rvs, (SELECT unnest(range(0, $nSub)) AS sub)),
       |sd AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS code
       |  FROM (SELECT DISTINCT vec_id FROM sv ORDER BY vec_id LIMIT $kCodes)),
       |pc0 AS (SELECT v.sub, s.code, v.sq AS cq FROM sv v JOIN sd s USING (vec_id)),
       |$pqRounds,
       |paf AS (
       |${pqArgmin(s"pc$pqIters")}),
       |qp AS (
       |${kmeansArgmin(s"c$cellIters", " WHERE v.vec_id <= 10", s"rn <= $nProbe", dim)}),
       |rq AS (
       |  SELECT qp.vec_id AS query_id, qp.cell,
       |    [q.qv[d] - c.cq[d] FOR d IN range(1, ${dim + 1})] AS rv
       |  FROM qp JOIN qvs q ON q.vec_id = qp.vec_id
       |  JOIN c$cellIters c ON c.cell = qp.cell),
       |qsv AS (
       |  SELECT query_id, cell, CAST(sub AS BIGINT) AS sub,
       |    list_slice(rv, sub * $subDim + 1, sub * $subDim + $subDim) AS sq
       |  FROM rq, (SELECT unnest(range(0, $nSub)) AS sub)),
       |dtb AS MATERIALIZED (
       |  SELECT q.query_id, q.cell, q.sub, c.code,
       |    list_sum([(q.sq[d] - c.cq[d]) * (q.sq[d] - c.cq[d])
       |              FOR d IN range(1, ${subDim + 1})]) AS d
       |  FROM qsv q JOIN pc$pqIters c ON q.sub = c.sub),
       |sc AS (
       |  SELECT dtb.query_id, a.vec_id AS neighbor_id,
       |    CAST(sum(dtb.d) AS BIGINT) AS adc_dist
       |  FROM (SELECT paf.vec_id, paf.sub, paf.code, ca.cell
       |        FROM paf JOIN ca USING (vec_id)) a
       |  JOIN dtb ON a.cell = dtb.cell AND a.sub = dtb.sub AND a.code = dtb.code
       |  WHERE a.vec_id <> dtb.query_id
       |  GROUP BY dtb.query_id, a.vec_id),
       |ivf5 AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, adc_dist, rank FROM (
       |    SELECT query_id, neighbor_id, adc_dist,
       |      CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_dist, neighbor_id) AS BIGINT) AS rank
       |    FROM sc)
       |  WHERE rank <= $kNb)""".stripMargin
  }

  /** d_semdedup: replay SemDeDup — the shared Lloyd's cascade assigns
    * every vector to its final cell; within a cell a vector is removed
    * iff an earlier-id member has cosine ≥ 0.35 (upper-triangular
    * rule); the reported dominator is the lowest such id with its
    * cosine. */
  private def semDedupSql: String = {
    val (iters, kCells, dim, tau) = (3, 8, 64, "0.35")
    s"""WITH ${kmeansCascade(iters, kCells, dim)},
       |ca AS (
       |${kmeansArgmin(s"c$iters", "", "rn = 1", dim)}),
       |f AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM qvs),
       |pr AS (
       |  SELECT b.vec_id AS vec_id, a.cell AS cell, a.vec_id AS dup_of,
       |    CASE WHEN fa.nrm * fb.nrm = 0 THEN 0.0
       |         ELSE round(list_dot_product(fa.e, fb.e) / (fa.nrm * fb.nrm), 6) END AS cosine
       |  FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN f fa ON fa.vec_id = a.vec_id
       |  JOIN f fb ON fb.vec_id = b.vec_id)
       |SELECT vec_id, cell, min(dup_of) AS dup_of,
       |  arg_min(cosine, dup_of) AS cosine
       |FROM pr WHERE cosine >= $tau
       |GROUP BY vec_id, cell ORDER BY vec_id""".stripMargin
  }

  /** d_dsir_sample: replay DSIR importance resampling — hashed
    * unigram+bigram buckets (md5_low32(feat) % 1024), add-1-smoothed
    * log-ratio of target (lang='en') vs raw bucket distributions in
    * floor/ceil-half-away micro-units, exact BIGINT per-doc sums,
    * salted-hash Gumbel top-20. */
  private def dsirSampleSql: String = {
    val (m, n, salt) = (1024, 20, "dsir0")
    val rhaSql = (e: String) =>
      s"CAST(CASE WHEN $e >= 0 THEN floor($e + 0.5) ELSE ceil($e - 0.5) END AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    [x FOR x IN string_split_regex(lower(trim(text)), '\\s+') IF x <> ''] AS w
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, lang, unnest(
       |    [('u:' || x) FOR x IN w] ||
       |    CASE WHEN len(w) >= 2
       |         THEN [('b:' || w[i] || ' ' || w[i + 1]) FOR i IN range(1, len(w))]
       |         ELSE [] END) AS feat
       |  FROM d),
       |fb AS (
       |  SELECT doc_id, lang,
       |    CAST((md5_number_lower(feat) & 4294967295) % $m AS BIGINT) AS bucket,
       |    count(*) AS n
       |  FROM f GROUP BY doc_id, lang, bucket),
       |cr AS (SELECT bucket, sum(n) AS c FROM fb GROUP BY bucket),
       |ct AS (SELECT bucket, sum(n) AS c FROM fb WHERE lang = 'en' GROUP BY bucket),
       |tr AS (SELECT sum(n) AS t FROM fb),
       |tt AS (SELECT sum(n) AS t FROM fb WHERE lang = 'en'),
       |lam AS (
       |  SELECT bucket, ${rhaSql("l")} AS lw
       |  FROM (
       |    SELECT r.bucket,
       |      ln(CAST((coalesce(t2.c, 0) + 1) * (tr.t + $m) AS DOUBLE) /
       |         CAST((r.c + 1) * (tt.t + $m) AS DOUBLE)) * 1000000 AS l
       |    FROM cr r LEFT JOIN ct t2 USING (bucket), tr, tt)),
       |sc AS (SELECT doc_id, sum(n * lw) AS s FROM fb JOIN lam USING (bucket) GROUP BY doc_id),
       |ky AS (
       |  SELECT doc_id, s, s + ${rhaSql("g")} AS key
       |  FROM (
       |    SELECT dd.doc_id, coalesce(sc.s, 0) AS s,
       |      -ln(-ln((CAST((md5_number_lower(CAST(dd.doc_id AS VARCHAR) || ':$salt')
       |                     & 4294967295) AS DOUBLE) + 0.5) / 4294967296.0)) * 1000000 AS g
       |    FROM documents dd LEFT JOIN sc USING (doc_id)))
       |SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, CAST(s AS DOUBLE) / 1000000.0 AS logw_r,
       |  CAST(key AS DOUBLE) / 1000000.0 AS key_r
       |FROM (SELECT * FROM ky ORDER BY key DESC, doc_id LIMIT $n)
       |ORDER BY rank""".stripMargin
  }

  /** t2_bpe_train: replay BPE training as an UNROLLED 8-round CTE
    * cascade (each round references its predecessor freely — no
    * recursive-CTE single-reference limit). Greedy left-to-right merge
    * uses the run-parity formula: a match position is merged iff the
    * count of consecutive match positions immediately before it is even
    * — equivalent to the engine's carry fold (a merged token never
    * re-merges within a pass).
    */
  /** One greedy-rewrite round: merge `best`'s pair into `src`'s symbol
    * arrays (run-parity greedy semantics), carrying `keep` columns. */
  private def bpeRewriteCte(src: String, best: String, out: String,
                            keep: String): String =
    s"""$out AS (
       |  SELECT $keep,
       |    flatten([CASE WHEN list_contains(kept, i) THEN [syms[i] || syms[i + 1]]
       |                  WHEN list_contains(kept, i - 1) THEN []
       |                  ELSE [syms[i]] END
       |             FOR i IN range(1, len(syms) + 1)]) AS syms
       |  FROM (
       |    SELECT $keep, syms,
       |      [i FOR i IN mp IF
       |         (i - 1 - coalesce(list_max(
       |            [k2 FOR k2 IN range(1, i) IF NOT list_contains(mp, k2)]), 0)) % 2 = 0] AS kept
       |    FROM (
       |      SELECT $keep, syms,
       |        [i FOR i IN range(1, len(syms))
       |         IF syms[i] = b.lhs AND syms[i + 1] = b.rhs] AS mp
       |      FROM $src, $best b)))""".stripMargin

  /** Shared BPE training cascade: w0 (top-40 word-freq, symbolized) and
    * per-round pair counts p$k / winner b$k / rewritten w$k. */
  private def bpeTrainCtes(numRounds: Int): String = {
    val base =
      """w0 AS (
        |  SELECT word, cnt,
        |    list_append([substr(word, i, 1) FOR i IN range(1, length(word) + 1)],
        |                '</w>') AS syms
        |  FROM (
        |    SELECT word, count(*) AS cnt FROM (
        |      SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |      FROM documents)
        |    WHERE word <> '' GROUP BY word
        |    ORDER BY cnt DESC, word LIMIT 40))""".stripMargin
    val rounds = (1 to numRounds).map { k =>
      val p = k - 1
      s"""p$k AS (
         |  SELECT syms[i] AS lhs, syms[i + 1] AS rhs, sum(cnt) AS c
         |  FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM w$p)
         |  GROUP BY lhs, rhs),
         |b$k AS (SELECT lhs, rhs, c FROM p$k ORDER BY c DESC, lhs, rhs LIMIT 1),
         |${bpeRewriteCte(s"w$p", s"b$k", s"w$k", "word, cnt")}""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private def bpeTrainSql: String = {
    val numRounds = 8
    val sel = (1 to numRounds)
      .map(k => s"SELECT $k AS merge_rank, lhs, rhs, CAST(c AS BIGINT) AS pair_count FROM b$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeTrainCtes(numRounds)}
       |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs, pair_count
       |FROM (
       |  $sel)
       |ORDER BY merge_rank""".stripMargin
  }

  /** t2_bpe_encode: encode EVERY document's words with the trained
    * merges (8 more unrolled rewrite rounds over the per-doc word
    * relation, reusing the training cascade's b$k winners) — per-doc
    * subword/word counts pin the segmentation corpus-wide.
    */
  private def bpeEncodeSql: String = {
    val numRounds = 8
    val dw0 =
      """dw0 AS (
        |  SELECT doc_id, word,
        |    list_append([substr(word, i, 1) FOR i IN range(1, length(word) + 1)],
        |                '</w>') AS syms
        |  FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> '')""".stripMargin
    val encRounds = (1 to numRounds).map(k =>
      bpeRewriteCte(s"dw${k - 1}", s"b$k", s"dw$k", "doc_id, word"))
    s"""WITH ${bpeTrainCtes(numRounds)},
       |${(dw0 +: encRounds).mkString(",\n")}
       |SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
       |  count(*) AS n_words
       |FROM dw$numRounds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- t2_unigram_*: unigram-LM (SentencePiece-style) trainer replay ----

  /** Viterbi DP over a word relation, UNROLLED to `maxSteps` position
    * CTEs (words cap at length 8 in this lake; 10 leaves margin — a
    * past-the-end step is an identity projection). State st[p+1] is the
    * best (sc, segs) for the length-p prefix; candidates enumerate
    * split starts i ascending so the FIRST maximal candidate (longest
    * last piece) wins ties, exactly the engine's fold order. */
  private def unigramDpCtes(pfx: String, src: String, keep: String,
                            vmCte: String, maxPieceLen: Int,
                            maxSteps: Int): String = {
    val kc = if (keep.isEmpty) "" else keep + ", "
    // vmCte empty = PER-ROW map mode: the source relation carries its own
    // score map in a column `m` (which the caller must list in `keep` so
    // it rides through every step) — the prune oracle's alt-path DP,
    // where each (word, removed-piece) row segments under a different
    // map, uses this; the shared-vocab callers cross-join the 1-row map
    // CTE exactly as before.
    def from(prev: String) = if (vmCte.isEmpty) prev else s"$prev, $vmCte"
    val base =
      s"""${pfx}0 AS (
         |  SELECT ${kc}word,
         |    [{'sc': CAST(0 AS BIGINT), 'segs': CAST([] AS VARCHAR[])}] AS st
         |  FROM $src)""".stripMargin
    val steps = (1 to maxSteps).map { k =>
      val piece = s"substr(word, i, $k - i + 1)"
      s"""$pfx$k AS MATERIALIZED (
         |  SELECT ${kc}word,
         |    CASE WHEN $k > length(word) THEN st
         |         WHEN len(cands) = 0 THEN list_append(st,
         |           {'sc': CAST(NULL AS BIGINT), 'segs': CAST(NULL AS VARCHAR[])})
         |         ELSE list_append(st, list_filter(cands,
         |           c -> struct_extract(c, 'sc') = list_max(
         |             list_transform(cands, x -> struct_extract(x, 'sc'))))[1]) END AS st
         |  FROM (
         |    SELECT ${kc}word, st,
         |      CASE WHEN $k > length(word) THEN NULL ELSE
         |        [{'sc': struct_extract(st[i], 'sc') +
         |            CAST(map_extract(m, $piece)[1] AS BIGINT),
         |          'segs': list_append(struct_extract(st[i], 'segs'), $piece)}
         |         FOR i IN range(greatest(1, $k - $maxPieceLen + 1), $k + 1)
         |         IF struct_extract(st[i], 'sc') IS NOT NULL
         |            AND len(map_extract(m, $piece)) > 0] END AS cands
         |    FROM ${from(s"$pfx${k - 1}")}))""".stripMargin
    }
    // Loud length guard: a word longer than the unrolled steps would read
    // st past its end → NULL wsc/segs that downstream SUMs silently skip
    // while the engine segments any length — a silent oracle divergence.
    // Current lakes cap at 8 chars; if a future corpus exceeds maxSteps
    // the sweep must FAIL, not drift.
    val guard =
      s"""${pfx}G AS (
         |  SELECT CASE WHEN max(length(word)) > $maxSteps
         |    THEN error('unigramDpCtes $pfx: word length ' ||
         |      CAST(max(length(word)) AS VARCHAR) ||
         |      ' exceeds unrolled DP steps $maxSteps')
         |    ELSE 1 END AS ok FROM $src)""".stripMargin
    val fin =
      s"""${pfx}F AS (
         |  SELECT ${kc}word, struct_extract(st[length(word) + 1], 'sc') AS wsc,
         |    struct_extract(st[length(word) + 1], 'segs') AS segs
         |  FROM $pfx$maxSteps, ${pfx}G WHERE ${pfx}G.ok = 1)""".stripMargin
    (base +: guard +: steps :+ fin).mkString(",\n")
  }

  /** Micro-quantized log-prob scores over a (piece, cnt) CTE — the
    * engine's half-away-from-zero ln(cnt/Σcnt)·1e6 discipline. */
  private def unigramScoreCte(out: String, src: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(CASE WHEN l >= 0 THEN floor(l + 0.5)
       |              ELSE ceil(l - 0.5) END AS BIGINT) AS sc
       |  FROM (SELECT piece, cnt,
       |    ln(CAST(cnt AS DOUBLE) /
       |       (SELECT CAST(sum(cnt) AS DOUBLE) FROM $src)) * 1000000 AS l
       |    FROM $src)),
       |${out}m AS MATERIALIZED (
       |  SELECT map(list(piece ORDER BY piece), list(sc ORDER BY piece)) AS m
       |  FROM $out)""".stripMargin

  /** Shared unigram training cascade: capped word-freq relation, seed
    * substring vocab (all single chars + top-60 multis), then 2 hard-EM
    * rounds of Viterbi counts → zero-count prune → rescore. Final vocab
    * CTE is `uv2`. */
  private def unigramTrainCtes: String = {
    val mpl = 4; val maxSeed = 60; val steps = 10
    val wf =
      """uw AS MATERIALIZED (
        |  SELECT word, cnt FROM (
        |    SELECT word, count(*) AS cnt FROM (
        |      SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |      FROM documents)
        |    WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 40))""".stripMargin
    val seed =
      s"""usd AS (
         |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
         |    SELECT cnt, substr(word, i, l) AS piece
         |    FROM (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS i FROM uw),
         |         (SELECT unnest(range(1, $mpl + 1)) AS l)
         |    WHERE i + l - 1 <= length(word))
         |  GROUP BY piece),
         |uv0raw AS (
         |  SELECT piece, cnt FROM usd WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM usd WHERE length(piece) >= 2
         |    ORDER BY cnt DESC, piece LIMIT $maxSeed))""".stripMargin
    def countsCte(out: String, dpF: String) =
      s"""$out AS (
         |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM (SELECT cnt, unnest(segs) AS piece FROM $dpF)
         |  GROUP BY piece)""".stripMargin
    Seq(
      wf, seed,
      unigramScoreCte("uv0", "uv0raw"),
      unigramDpCtes("ud1_", "uw", "cnt", "uv0m", mpl, steps),
      countsCte("uc1", "ud1_F"),
      unigramScoreCte("uv1", "uc1"),
      unigramDpCtes("ud2_", "uw", "cnt", "uv1m", mpl, steps),
      countsCte("uc2", "ud2_F"),
      unigramScoreCte("uv2", "uc2")
    ).mkString(",\n")
  }

  /** t2_unigram_train: the full EM replay — seed, two Viterbi-count
    * rounds, final rescored vocabulary. */
  private def unigramTrainSql: String =
    s"""WITH ${unigramTrainCtes}
       |SELECT piece, cnt, CAST(sc AS DOUBLE) / 1000000.0 AS score_r
       |FROM uv2 ORDER BY piece""".stripMargin

  /** Shared encode cascade: train, then the Viterbi DP over the corpus
    * distinct-word relation (`ue_F`), with `udw` carrying per-doc word
    * occurrences for the join-back. */
  private def unigramEncodeCtes: String =
    s"""${unigramTrainCtes},
       |udw AS MATERIALIZED (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
       |    FROM documents)
       |  WHERE word <> ''),
       |udd AS MATERIALIZED (SELECT DISTINCT word FROM udw),
       |${unigramDpCtes("ue_", "udd", "", "uv2m", 4, 10)}""".stripMargin

  /** t2_unigram_encode: train (same cascade), then Viterbi-encode every
    * document's words under the final vocab — per-doc word/subword
    * counts and the exact-integer path log-likelihood. */
  private def unigramEncodeSql: String =
    s"""WITH $unigramEncodeCtes
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(len(e.segs)) AS BIGINT) AS n_subwords,
       |  CAST(sum(e.wsc) AS DOUBLE) / 1000000.0 AS loglik_r
       |FROM udw JOIN ue_F e USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t2_unigram_fertility: the encode cascade aggregated per LANGUAGE —
    * the `t2_bpe_fertility` health table under the unigram trainer,
    * with the manual half-away-from-zero ratio rounding. */
  private def unigramFertilitySql: String =
    s"""WITH $unigramEncodeCtes,
       |ag AS (
       |  SELECT d.lang, CAST(sum(len(e.segs)) AS BIGINT) AS n_subwords,
       |    count(*) AS n_words,
       |    CAST(sum(len(e.segs)) AS DOUBLE) / count(*) * 1000000 AS q
       |  FROM udw JOIN ue_F e USING (word) JOIN documents d USING (doc_id)
       |  GROUP BY d.lang)
       |SELECT lang, n_subwords, n_words,
       |  (CASE WHEN q >= 0 THEN floor(q + 0.5) ELSE ceil(q - 0.5) END) / 1000000.0
       |    AS fertility
       |FROM ag ORDER BY lang""".stripMargin

  /** t2_unigram_prune: the likelihood-quota prune decision table — best
    * paths under the trained vocab (`up_`), then a PER-ROW-MAP alt-path
    * DP (`ua_`): each (word, used-multi-piece) row re-segments under the
    * vocab map with that piece deleted; exact micro-nat loss sums, the
    * essential flag for pieces whose removal breaks segmentability, and
    * the top-12-multis quota rank ((essential, loss) desc, piece asc).
    * Single characters are never candidates and always keep. */
  private def unigramPruneSql: String =
    s"""WITH ${unigramTrainCtes},
       |${unigramDpCtes("up_", "uw", "cnt", "uv2m", 4, 10)},
       |upu AS MATERIALIZED (
       |  SELECT word, cnt, best_sc, piece FROM (
       |    SELECT word, cnt, wsc AS best_sc,
       |      unnest(list_distinct(list_filter(segs, p -> length(p) > 1))) AS piece
       |    FROM up_F)),
       |ua0 AS MATERIALIZED (
       |  SELECT word, cnt, best_sc, piece,
       |    map_from_entries(list_filter(map_entries(v.m), e -> e.key <> piece)) AS m
       |  FROM upu, uv2m v),
       |${unigramDpCtes("ua_", "ua0", "m, cnt, best_sc, piece", "", 4, 10)},
       |ulos AS (
       |  SELECT piece,
       |    max(CASE WHEN wsc IS NULL THEN 1 ELSE 0 END) = 1 AS essential,
       |    CAST(sum(cnt * (best_sc - coalesce(wsc, best_sc))) AS BIGINT) AS loss
       |  FROM ua_F GROUP BY piece)
       |SELECT piece, cnt, CAST(NULL AS BIGINT) AS loss, FALSE AS essential,
       |  TRUE AS kept
       |FROM uv2 WHERE length(piece) = 1
       |UNION ALL
       |SELECT piece, cnt, loss, essential,
       |  essential OR
       |  row_number() OVER (ORDER BY essential DESC, loss DESC, piece) <= 12
       |    AS kept
       |FROM (
       |  SELECT v.piece, v.cnt, coalesce(l.loss, 0) AS loss,
       |    coalesce(l.essential, FALSE) AS essential
       |  FROM uv2 v LEFT JOIN ulos l USING (piece)
       |  WHERE length(v.piece) > 1)
       |ORDER BY piece""".stripMargin

  /** st_stream_unigram: streamed == batch — the per-language encode
    * rollup with the exact-integer path log-likelihood sum. */
  private def unigramStreamSql: String =
    s"""WITH $unigramEncodeCtes
       |SELECT d.lang, count(*) AS n_words,
       |  CAST(sum(len(e.segs)) AS BIGINT) AS n_subwords,
       |  CAST(sum(e.wsc) AS DOUBLE) / 1000000.0 AS loglik_r
       |FROM udw JOIN ue_F e USING (word) JOIN documents d USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** t2_tokenizer_compare: BOTH trainer cascades (BPE 8-merge + unigram
    * 2-round EM) over the identical word-freq relation, each encoding
    * the identical corpus — vocab sizes, word/subword/char totals, and
    * the manual-rounded compression/fertility ratios, one row each. */
  private def tokenizerCompareSql: String = {
    val numRounds = 8
    val dw0 =
      """dw0 AS (
        |  SELECT doc_id, word,
        |    list_append([substr(word, i, 1) FOR i IN range(1, length(word) + 1)],
        |                '</w>') AS syms
        |  FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> '')""".stripMargin
    val encRounds = (1 to numRounds).map(k =>
      bpeRewriteCte(s"dw${k - 1}", s"b$k", s"dw$k", "doc_id, word"))
    def arm(tok: String, vocabSql: String, encFrom: String,
            subLen: String): String =
      s"""SELECT '$tok' AS tokenizer,
         |  ($vocabSql) AS vocab_pieces,
         |  count(*) AS n_words,
         |  CAST(sum($subLen) AS BIGINT) AS n_subwords,
         |  CAST(sum(length(word)) AS BIGINT) AS n_chars,
         |  CAST(sum(length(word)) AS DOUBLE) / sum($subLen) * 1000000 AS qc,
         |  CAST(sum($subLen) AS DOUBLE) / count(*) * 1000000 AS qf
         |FROM $encFrom""".stripMargin
    val bpeArm = arm("bpe",
      s"(SELECT count(DISTINCT s) FROM (SELECT unnest(syms) AS s FROM w$numRounds))",
      s"dw$numRounds", "len(syms)")
    val uniArm = arm("unigram",
      "(SELECT count(*) FROM uv2)",
      "udw JOIN ue_F e USING (word)", "len(e.segs)")
    s"""WITH ${bpeTrainCtes(numRounds)},
       |${(dw0 +: encRounds).mkString(",\n")},
       |$unigramEncodeCtes
       |SELECT tokenizer, CAST(vocab_pieces AS BIGINT) AS vocab_pieces,
       |  n_words, n_subwords, n_chars,
       |  (CASE WHEN qc >= 0 THEN floor(qc + 0.5) ELSE ceil(qc - 0.5) END)
       |    / 1000000.0 AS chars_per_subword,
       |  (CASE WHEN qf >= 0 THEN floor(qf + 0.5) ELSE ceil(qf - 0.5) END)
       |    / 1000000.0 AS fertility
       |FROM (
       |$bpeArm
       |UNION ALL
       |$uniArm)
       |ORDER BY tokenizer""".stripMargin
  }

  /** t2_bpe_fertility: the encode cascade again (same trained merges),
    * aggregated per LANGUAGE with the subwords-per-word ratio — the
    * multilingual-vocabulary health table. */
  private def bpeFertilitySql: String = {
    val numRounds = 8
    val dw0 =
      """dw0 AS (
        |  SELECT doc_id, word,
        |    list_append([substr(word, i, 1) FOR i IN range(1, length(word) + 1)],
        |                '</w>') AS syms
        |  FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> '')""".stripMargin
    val encRounds = (1 to numRounds).map(k =>
      bpeRewriteCte(s"dw${k - 1}", s"b$k", s"dw$k", "doc_id, word"))
    s"""WITH ${bpeTrainCtes(numRounds)},
       |${(dw0 +: encRounds).mkString(",\n")}
       |SELECT d.lang, CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
       |  count(*) AS n_words,
       |  round(CAST(sum(len(syms)) AS DOUBLE) / count(*), 6) AS fertility
       |FROM dw$numRounds e JOIN documents d USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  /** d_lsh_calibration: the analytic MinHash S-curve over the exact
    * bigram-Jaccard pair relation (d_ngram_jaccard's CTE) × the 32-hash
    * band-plan grid. J^r and the final P are rounded to 6 dp in the same
    * order as the engine; expectations sum as exact DECIMAL(18,6) and
    * project as DOUBLE (exact at this magnitude; the driver's hash
    * canonicalizes DECIMAL representations inconsistently — the
    * j_hybrid_rrf precedent). */
  private def lshCalibrationSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents WHERE doc_id <= 25
      |), g AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(w) <= 1 THEN [array_to_string(w, ' ')]
      |         ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS sh
      |  FROM d),
      |jac AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
      |grid AS (SELECT * FROM (VALUES (16, 2), (8, 4), (4, 8), (2, 16)) AS t(b, r)),
      |p AS (
      |  SELECT b, r, jaccard,
      |    round(1.0 - power(1.0 - round(power(jaccard, r), 6), b), 6) AS p
      |  FROM jac CROSS JOIN grid)
      |SELECT b, r,
      |  CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
      |  CAST(sum(CASE WHEN jaccard < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_false,
      |  CAST(sum(CASE WHEN jaccard >= 0.5 THEN CAST(p AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS exp_true_caught,
      |  CAST(sum(CASE WHEN jaccard < 0.5 THEN CAST(p AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS exp_false_caught
      |FROM p GROUP BY b, r ORDER BY b""".stripMargin

  /** d_lsh_autoplan: the analytic band-plan chooser's table — every
    * divisor plan of the 32-hash budget scored on the 99-point Jaccard
    * grid against a τ=0.5 step (FP mass below, miss mass above), micro-
    * integer sums, argmin chosen on (err, b). Same rounding order as
    * the engine's Dedup.bandPlanTable; no table scan on either side. */
  private def lshAutoplanSql: String =
    """WITH grid AS (
      |  SELECT b, 32 // b AS r FROM (SELECT unnest([1, 2, 4, 8, 16, 32]) AS b)),
      |js AS (
      |  SELECT b, r, CAST(ji AS DOUBLE) / 100.0 AS j
      |  FROM grid, (SELECT unnest(range(1, 100)) AS ji)),
      |pm AS (
      |  SELECT b, r, j,
      |    CAST(round(round(1.0 - power(1.0 - round(power(j, r), 6), b), 6)
      |      * 1000000.0, 0) AS BIGINT) AS p_micro
      |  FROM js),
      |agg AS (
      |  SELECT b, r,
      |    CAST(sum(CASE WHEN j < 0.5 THEN p_micro ELSE 0 END) AS BIGINT) AS fp_micro,
      |    CAST(sum(CASE WHEN j >= 0.5 THEN 1000000 - p_micro ELSE 0 END) AS BIGINT) AS fn_micro
      |  FROM pm GROUP BY b, r)
      |SELECT b, r,
      |  CAST(fp_micro AS DOUBLE) / 1000000.0 AS exp_fp,
      |  CAST(fn_micro AS DOUBLE) / 1000000.0 AS exp_fn,
      |  CAST(fp_micro + fn_micro AS DOUBLE) / 1000000.0 AS exp_err,
      |  row_number() OVER (ORDER BY fp_micro + fn_micro, b) = 1 AS chosen
      |FROM agg ORDER BY b""".stripMargin

  /** a_bootstrap_ci: replay the deterministic Poisson bootstrap — the
    * same md5-uniforms, the same integer CDF thresholds, exact long
    * weight·cents sums, positional CI over the 32 sorted replica means. */
  private def bootstrapCiSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM lineitem),
      |r AS (
      |  SELECT cents,
      |    md5_number_lower(CAST(l_orderkey AS VARCHAR) || ':' ||
      |      CAST(l_linenumber AS VARCHAR) || ':boot:' || CAST(b AS VARCHAR))
      |      & 4294967295 AS u32,
      |    b
      |  FROM li CROSS JOIN (SELECT unnest(range(0, 32)) AS b)),
      |w AS (
      |  SELECT b, cents,
      |    (CASE WHEN u32 >= 1580030168 THEN 1 ELSE 0 END) +
      |    (CASE WHEN u32 >= 3160060337 THEN 1 ELSE 0 END) +
      |    (CASE WHEN u32 >= 3950075421 THEN 1 ELSE 0 END) +
      |    (CASE WHEN u32 >= 4213413783 THEN 1 ELSE 0 END) +
      |    (CASE WHEN u32 >= 4279248373 THEN 1 ELSE 0 END) +
      |    (CASE WHEN u32 >= 4292415291 THEN 1 ELSE 0 END) AS w
      |  FROM r),
      |m AS (
      |  SELECT b, round(CAST(sum(w * cents) AS DOUBLE) / (sum(w) * 100.0), 6) AS mean
      |  FROM w GROUP BY b),
      |ms AS (SELECT mean, row_number() OVER (ORDER BY mean) AS rk FROM m),
      |pt AS (SELECT count(*) AS n_rows,
      |  round(CAST(sum(cents) AS DOUBLE) / (count(*) * 100.0), 6) AS point_mean FROM li)
      |SELECT pt.n_rows, CAST(32 AS BIGINT) AS n_replicas, pt.point_mean,
      |  (SELECT mean FROM ms WHERE rk = 2) AS boot_lo,
      |  (SELECT mean FROM ms WHERE rk = 16) AS boot_mid,
      |  (SELECT mean FROM ms WHERE rk = 31) AS boot_hi
      |FROM pt""".stripMargin

  /** e2e_curation_funnel: replay the whole curation chain — Gopher-rule
    * quality filter (t_quality_filter's exact thresholds/rounding),
    * min-id exact dedup among SURVIVORS (d_exact_dup's fingerprint),
    * 3-shingle decontamination vs the doc_id ≤ 5 eval split
    * (d_decontam_report's shingle collapse and τ) — and report each
    * stage's surviving docs + tokens. */
  private def curationFunnelSql: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
      |    round(CASE WHEN length(text) = 0 THEN 0
      |          ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS pr,
      |    round(CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0
      |          ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), w -> length(w))) AS DOUBLE)
      |               / len(string_split_regex(trim(text), '\s+')) END, 6) AS mtl
      |  FROM documents),
      |s1 AS (
      |  SELECT doc_id, text, n_tokens FROM m
      |  WHERE n_tokens >= 30 AND n_tokens <= 5000
      |    AND mtl >= 3.0 AND mtl <= 4.8 AND pr <= 0.1),
      |fp AS (
      |  SELECT doc_id, text, n_tokens,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM s1),
      |s2 AS (
      |  SELECT f.doc_id, f.text, f.n_tokens
      |  FROM fp f JOIN (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY fp) k
      |    ON f.fp = k.fp AND f.doc_id = k.keeper),
      |d2 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM s2),
      |g2 AS (SELECT doc_id,
      |         CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |              ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |       FROM d2),
      |ds AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM g2),
      |db AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents WHERE doc_id <= 5),
      |gb AS (SELECT doc_id,
      |         CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |              ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |       FROM db),
      |bs AS (SELECT DISTINCT unnest(sh) AS s FROM gb),
      |counts AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id),
      |ov AS (SELECT ds.doc_id, count(*) AS n_ov FROM ds JOIN bs ON ds.s = bs.s GROUP BY ds.doc_id),
      |cont AS (
      |  SELECT c.doc_id FROM counts c LEFT JOIN ov o USING (doc_id)
      |  WHERE round(CAST(coalesce(o.n_ov, 0) AS DOUBLE) / c.n_sh, 6) >= 0.2),
      |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM cont))
      |SELECT * FROM (
      |  SELECT 0 AS stage_id, 'all' AS stage, count(*) AS n_docs,
      |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM m
      |  UNION ALL SELECT 1, 'quality', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s1
      |  UNION ALL SELECT 2, 'exact_dedup', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s2
      |  UNION ALL SELECT 3, 'decontam', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s3)
      |ORDER BY stage_id""".stripMargin

  /** w_domain_cap: replay URL synthesis → host regex → registered
    * domain → salted-hash per-domain cap. Same regex text in RE2 as in
    * Java regex; md5 hex ordering is byte-identical across engines.
    */
  private def domainCapSql: String = {
    val psl = graft.operators.Web.TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""WITH u AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 4 = 0 THEN 'http://' ELSE 'https://' END) ||
       |    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
       |    source ||
       |    (CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.com' END) ||
       |    (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END) ||
       |    '/doc/' || CAST(doc_id AS VARCHAR) AS url
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, lower(nullif(regexp_extract(url,
       |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?([^/?#:]+)', 1), '')) AS host
       |  FROM u),
       |d AS (
       |  SELECT doc_id,
       |    CASE WHEN host IS NULL THEN NULL
       |         WHEN len(string_split(host, '.')) <= 2 THEN host
       |         WHEN (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
       |              IN ($psl)
       |           THEN string_split(host, '.')[-3] || '.' ||
       |                string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
       |         ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
       |    END AS url_domain
       |  FROM h),
       |r AS (
       |  SELECT doc_id, url_domain,
       |    row_number() OVER (PARTITION BY url_domain
       |      ORDER BY md5('crawlmix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM d WHERE url_domain IS NOT NULL)
       |SELECT url_domain, count(*) AS n_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
       |FROM r WHERE rk <= 8 GROUP BY url_domain ORDER BY url_domain""".stripMargin
  }

  /** Shared CTE block for the t_lr_quality family: Gopher keep labels
    * (t_quality_filter's exact metric replay), hashed token-count
    * features + intercept dim 8, and 3 unrolled exact-integer
    * hard-sigmoid GD rounds (w0 = 0, η_micro = 1000) — every div a
    * truncating `//`, mirroring Spark `div`. Final weights CTE: w3. */
  private def lrRound(prev: String, out: String, lab: String = "lab",
                      nRel: String = "nn"): String =
    s"""z_$out AS MATERIALIZED (
       |  SELECT fx.id, CAST(sum(fx.x * w.w_micro) AS BIGINT) AS z
       |  FROM fx JOIN $prev w USING (dim) GROUP BY 1),
       |r_$out AS (
       |  SELECT z.id, l.y * 1000000 -
       |    least(1000000, greatest(0, z.z // 4 + 500000)) AS r
       |  FROM z_$out z JOIN $lab l ON l.id = z.id),
       |$out AS MATERIALIZED (
       |  SELECT w.dim, CAST(w.w_micro +
       |    ((coalesce(g.g, 0) // n.n) * 1000) // 1000000 AS BIGINT) AS w_micro
       |  FROM $prev w LEFT JOIN (
       |    SELECT fx.dim, CAST(sum(fx.x * r.r) AS BIGINT) AS g
       |    FROM fx JOIN r_$out r USING (id) GROUP BY 1) g ON g.dim = w.dim, $nRel n)""".stripMargin

  private def lrBaseCtes: String =
    raw"""m AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
       |    round(CASE WHEN length(text) = 0 THEN 0
       |          ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS pr,
       |    round(CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0
       |          ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), w -> length(w))) AS DOUBLE)
       |               / len(string_split_regex(trim(text), '\s+')) END, 6) AS mtl
       |  FROM documents),
       |lab AS MATERIALIZED (
       |  SELECT doc_id AS id,
       |    CASE WHEN n_tokens >= 30 AND n_tokens <= 5000
       |          AND mtl >= 3.0 AND mtl <= 4.8 AND pr <= 0.1
       |         THEN 1 ELSE 0 END AS y
       |  FROM m),
       |tk AS (
       |  SELECT doc_id AS id,
       |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
       |  FROM documents),
       |fx AS MATERIALIZED (
       |  SELECT id, CAST(md5_number_lower(tok) & 4294967295 AS BIGINT) % 8 AS dim,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM tk GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, 8, 1 FROM documents),
       |w0 AS (SELECT CAST(unnest(range(0, 9)) AS BIGINT) AS dim, CAST(0 AS BIGINT) AS w_micro)""".stripMargin

  private def lrQualityCtes: String =
    s"""$lrBaseCtes,
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |${lrRound("w0", "w1")},
       |${lrRound("w1", "w2")},
       |${lrRound("w2", "w3")}""".stripMargin

  /** d_tracin_influence: replay TracIn attribution — LR training
    * restricted to the doc_id%5<>0 split, per-round validation-mean
    * gradient u (truncating div by n_val), per-train-doc dot and the
    * (r//1000)·(dot//1000) influence accumulation, then the top/bottom
    * 15 tables. */
  private def tracinSql: String = {
    def inflRound(t: Int): String =
      s"""${lrRound(s"w${t - 1}", s"w$t", "trl", "ntr")},
         |rva_$t AS (
         |  SELECT z.id, l.y * 1000000 -
         |    least(1000000, greatest(0, z.z // 4 + 500000)) AS r
         |  FROM z_w$t z JOIN val l ON l.id = z.id),
         |u_$t AS MATERIALIZED (
         |  SELECT fx.dim, CAST(sum(fx.x * rv.r) AS BIGINT) // (SELECT nv FROM nv) AS u
         |  FROM fx JOIN rva_$t rv USING (id) GROUP BY fx.dim),
         |dot_$t AS (
         |  SELECT fx.id, CAST(sum(fx.x * u.u) AS BIGINT) AS dot
         |  FROM fx JOIN u_$t u USING (dim) GROUP BY 1),
         |i$t AS MATERIALIZED (
         |  SELECT i.id, i.y, CAST(i.infl + (r.r // 1000) * (d.dot // 1000) AS BIGINT) AS infl
         |  FROM i${t - 1} i JOIN r_w$t r USING (id) JOIN dot_$t d USING (id))""".stripMargin
    s"""WITH $lrBaseCtes,
       |trl AS MATERIALIZED (SELECT id, y FROM lab WHERE id % 5 <> 0),
       |val AS MATERIALIZED (SELECT id, y FROM lab WHERE id % 5 = 0),
       |ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM trl),
       |nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM val),
       |i0 AS (SELECT id, y, CAST(0 AS BIGINT) AS infl FROM trl),
       |${inflRound(1)},
       |${inflRound(2)},
       |${inflRound(3)}
       |SELECT side, rank, id, CAST(y AS BIGINT) AS y, infl FROM (
       |  SELECT 'helpful' AS side,
       |    CAST(row_number() OVER (ORDER BY infl DESC, id) AS BIGINT) AS rank,
       |    id, y, infl FROM i3
       |  UNION ALL
       |  SELECT 'harmful' AS side,
       |    CAST(row_number() OVER (ORDER BY infl ASC, id) AS BIGINT) AS rank,
       |    id, y, infl FROM i3)
       |WHERE rank <= 15 ORDER BY side, rank""".stripMargin
  }

  /** t_lr_quality: replay train + score + the score-decile × label
    * calibration histogram. */
  private def lrQualitySql: String =
    s"""WITH $lrQualityCtes,
       |sc AS (
       |  SELECT fx.id, CAST(sum(fx.x * w.w_micro) AS BIGINT) AS z,
       |    least(1000000, greatest(0, CAST(sum(fx.x * w.w_micro) AS BIGINT) // 4 + 500000)) AS score
       |  FROM fx JOIN w3 w USING (dim) GROUP BY fx.id)
       |SELECT sc.score // 100000 AS bucket, count(*) AS n_docs,
       |  CAST(sum(l.y) AS BIGINT) AS n_pos, CAST(sum(sc.z) AS BIGINT) AS z_checksum
       |FROM sc JOIN lab l ON l.id = sc.id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** t_lr_quality_weights: the trained 9-row weight vector. */
  private def lrQualityWeightsSql: String =
    s"""WITH $lrQualityCtes
       |SELECT dim, w_micro FROM w3 ORDER BY dim""".stripMargin

  /** t_quality_filter: Gopher-style rule filter counts per language
    * (mirrors TextAnalysis.qualityFilter with the query's thresholds;
    * rule comparisons on round-6 metrics on both sides). */
  private def qualityFilterSql: String =
    """WITH m AS (
      |  SELECT lang,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
      |    round(CASE WHEN length(text) = 0 THEN 0
      |          ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS pr,
      |    round(CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0
      |          ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), w -> length(w))) AS DOUBLE)
      |               / len(string_split_regex(trim(text), '\s+')) END, 6) AS mtl
      |  FROM documents),
      |f AS (
      |  SELECT lang,
      |    (n_tokens >= 30 AND n_tokens <= 5000) AS ok_tokens,
      |    (mtl >= 3.0 AND mtl <= 4.8) AS ok_word_len,
      |    (pr <= 0.1) AS ok_punct
      |  FROM m)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN ok_tokens AND ok_word_len AND ok_punct THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(sum(CASE WHEN NOT ok_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_tokens,
      |  CAST(sum(CASE WHEN NOT ok_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_len,
      |  CAST(sum(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_punct
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  /** t_bm25_search: replay Okapi BM25 (k1=1.2, b=0.75) — idf rounded to
    * 6 dp on both sides (the one transcendental), per-term contributions
    * rounded then summed as exact DECIMAL(18,6) so aggregation order
    * cannot perturb the score, ties on ascending doc_id. */
  private def bm25SearchSql: String = bm25TopSql(15)

  private def bm25TopSql(k: Int): String =
    raw"""WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      |  FROM documents),
      |dd AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, w FROM d),
      |consts AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, dl, unnest(w) AS term FROM dd)
      |  WHERE term IN ('dup', 'vector', 'join', 'window')
      |  GROUP BY doc_id, dl, term),
      |dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT tf.doc_id,
      |    round(round(ln((c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1), 6)
      |          * (tf.tf * (1.2 + 1))
      |          / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / c.avgdl)), 6) AS cc
      |  FROM tf JOIN dfq USING (term), consts c)
      |SELECT doc_id,
      |  CAST(sum(CAST(cc AS DECIMAL(18,6))) AS DOUBLE) AS score_r,
      |  row_number() OVER (ORDER BY CAST(sum(CAST(cc AS DECIMAL(18,6))) AS DOUBLE) DESC, doc_id) AS rank
      |FROM contrib GROUP BY doc_id
      |QUALIFY rank <= $k ORDER BY rank""".stripMargin

  /** Shared PRF CTE block: the bm25TopSql first pass, top-10 feedback
    * docs, candidate-term counts (query terms excluded), corpus df for
    * candidates only, and micro idf·count expansion weights ranked
    * (wgt desc, term). */
  private def prfCtes: String =
    raw"""d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      |  FROM documents),
      |dd AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, w FROM d),
      |consts AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dd),
      |tf1 AS (
      |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, dl, unnest(w) AS term FROM dd)
      |  WHERE term IN ('dup', 'vector', 'join', 'window')
      |  GROUP BY doc_id, dl, term),
      |dfq1 AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf1 GROUP BY term),
      |contrib1 AS (
      |  SELECT tf1.doc_id,
      |    round(round(ln((c.n_docs - dfq1.df + 0.5) / (dfq1.df + 0.5) + 1), 6)
      |          * (tf1.tf * (1.2 + 1))
      |          / (tf1.tf + 1.2 * (0.25 + 0.75 * tf1.dl / c.avgdl)), 6) AS cc
      |  FROM tf1 JOIN dfq1 USING (term), consts c),
      |fb AS MATERIALIZED (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, row_number() OVER (
      |      ORDER BY CAST(sum(CAST(cc AS DECIMAL(18,6))) AS DOUBLE) DESC, doc_id) AS rank
      |    FROM contrib1 GROUP BY doc_id)
      |  WHERE rank <= 10),
      |cnt AS MATERIALIZED (
      |  SELECT term, CAST(count(*) AS BIGINT) AS fb_count
      |  FROM (SELECT unnest(w) AS term FROM dd JOIN fb USING (doc_id))
      |  WHERE term NOT IN ('dup', 'vector', 'join', 'window')
      |  GROUP BY 1),
      |dfc AS (
      |  SELECT t.term, CAST(count(*) AS BIGINT) AS df
      |  FROM (SELECT unnest(list_distinct(w)) AS term FROM dd) t
      |  JOIN (SELECT term FROM cnt) q ON q.term = t.term GROUP BY 1),
      |exp AS MATERIALIZED (
      |  SELECT term, fb_count, df, wgt_micro,
      |    row_number() OVER (ORDER BY wgt_micro DESC, term) AS rn
      |  FROM (
      |    SELECT cnt.term, cnt.fb_count, dfc.df,
      |      CAST(floor(round(ln((c.n_docs - dfc.df + 0.5) / (dfc.df + 0.5) + 1), 6)
      |        * 1e6 + 0.5) AS BIGINT) * cnt.fb_count AS wgt_micro
      |    FROM cnt JOIN dfc USING (term), consts c))""".stripMargin

  /** j_prf_terms: the top-5 expansion terms. */
  private def prfTermsSql: String =
    s"""WITH $prfCtes
       |SELECT term, fb_count, df, wgt_micro FROM exp WHERE rn <= 5
       |ORDER BY wgt_micro DESC, term""".stripMargin

  /** j_prf_search: the PRF-mixed rerank — query terms ppm 1e6,
    * expansion terms ppm 5e5, contributions micro-quantized before the
    * weight multiply, BIGINT sum, top-15. */
  private def prfSearchSql: String =
    s"""WITH $prfCtes,
       |tw AS (
       |  SELECT term, CAST(1000000 AS BIGINT) AS wgt
       |  FROM (VALUES ('dup'), ('vector'), ('join'), ('window')) t(term)
       |  UNION ALL
       |  SELECT term, CAST(500000 AS BIGINT) FROM exp WHERE rn <= 5),
       |tf2 AS (
       |  SELECT doc_id, dl, term, wgt, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, dl, unnest(w) AS term FROM dd) JOIN tw USING (term)
       |  GROUP BY 1, 2, 3, 4),
       |df2 AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf2 GROUP BY 1),
       |ctr2 AS (
       |  SELECT tf2.doc_id,
       |    (CAST(floor(round(round(ln((c.n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1), 6)
       |       * (tf2.tf * (1.2 + 1))
       |       / (tf2.tf + 1.2 * (0.25 + 0.75 * tf2.dl / c.avgdl)), 6) * 1e6 + 0.5) AS BIGINT)
       |     * tf2.wgt) // 1000000 AS cw
       |  FROM tf2 JOIN df2 USING (term), consts c)
       |SELECT doc_id, CAST(sum(cw) AS DOUBLE) / 1e6 AS score_r,
       |  row_number() OVER (ORDER BY CAST(sum(cw) AS DOUBLE) / 1e6 DESC, doc_id) AS rank
       |FROM ctr2 GROUP BY doc_id
       |QUALIFY rank <= 15 ORDER BY rank""".stripMargin

  /** t_ql_search: replay Dirichlet query likelihood (μ=2000) — exact
    * BIGINT collection/tf counts, ptc precomputed per term, one
    * round-6 ln per (doc, term) incl. zero-tf smoothing floors,
    * DECIMAL(18,6) sum, top-15. */
  private def qlSearchSql: String =
    raw"""WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      |  FROM documents),
      |dd AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w FROM d),
      |cn AS (SELECT CAST(sum(dl) AS BIGINT) AS cn FROM dd),
      |cf AS (
      |  SELECT term, CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
      |    / CAST(cn.cn AS DOUBLE) AS ptc
      |  FROM (SELECT unnest(w) AS term FROM dd), cn
      |  WHERE term IN ('dup', 'vector', 'join', 'window')
      |  GROUP BY term, cn.cn),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(w) AS term FROM dd)
      |  WHERE term IN ('dup', 'vector', 'join', 'window')
      |  GROUP BY doc_id, term),
      |sc AS (
      |  SELECT dd.doc_id,
      |    round(ln((CAST(coalesce(tf.tf, 0) AS DOUBLE) + 2000.0 * cf.ptc)
      |          / (CAST(dd.dl AS DOUBLE) + 2000.0)), 6) AS cc
      |  FROM dd CROSS JOIN cf
      |  LEFT JOIN tf ON tf.doc_id = dd.doc_id AND tf.term = cf.term)
      |SELECT doc_id,
      |  CAST(sum(CAST(cc AS DECIMAL(18,6))) AS DOUBLE) AS score_r,
      |  row_number() OVER (ORDER BY CAST(sum(CAST(cc AS DECIMAL(18,6))) AS DOUBLE) DESC, doc_id) AS rank
      |FROM sc GROUP BY doc_id
      |QUALIFY rank <= 15 ORDER BY rank""".stripMargin

  /** j3_rbo: replay truncated RBO between the plain BM25 top-15
    * (prfCtes' first pass) and the PRF rerank top-15 — the per-depth
    * tail weights are the SAME [[graft.search.Evaluation
    * .rboTailMicro]] literals the Spark plan uses. */
  private def rboSql: String = {
    val tail = graft.search.Evaluation.rboTailMicro(15)
    s"""WITH $prfCtes,
       |tw AS (
       |  SELECT term, CAST(1000000 AS BIGINT) AS wgt
       |  FROM (VALUES ('dup'), ('vector'), ('join'), ('window')) t(term)
       |  UNION ALL
       |  SELECT term, CAST(500000 AS BIGINT) FROM exp WHERE rn <= 5),
       |tf2 AS (
       |  SELECT doc_id, dl, term, wgt, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, dl, unnest(w) AS term FROM dd) JOIN tw USING (term)
       |  GROUP BY 1, 2, 3, 4),
       |df2 AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf2 GROUP BY 1),
       |ctr2 AS (
       |  SELECT tf2.doc_id,
       |    (CAST(floor(round(round(ln((c.n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1), 6)
       |       * (tf2.tf * (1.2 + 1))
       |       / (tf2.tf + 1.2 * (0.25 + 0.75 * tf2.dl / c.avgdl)), 6) * 1e6 + 0.5) AS BIGINT)
       |     * tf2.wgt) // 1000000 AS cw
       |  FROM tf2 JOIN df2 USING (term), consts c),
       |a15 AS (
       |  SELECT doc_id, rank FROM (
       |    SELECT doc_id, row_number() OVER (
       |      ORDER BY CAST(sum(CAST(cc AS DECIMAL(18,6))) AS DOUBLE) DESC, doc_id) AS rank
       |    FROM contrib1 GROUP BY doc_id)
       |  WHERE rank <= 15),
       |b15 AS (
       |  SELECT doc_id, rank FROM (
       |    SELECT doc_id, row_number() OVER (
       |      ORDER BY CAST(sum(cw) AS DOUBLE) / 1e6 DESC, doc_id) AS rank
       |    FROM ctr2 GROUP BY doc_id)
       |  WHERE rank <= 15),
       |mm AS (
       |  SELECT [${tail.mkString(", ")}][CAST(greatest(a.rank, b.rank) AS INT)] AS t
       |  FROM a15 a JOIN b15 b USING (doc_id))
       |SELECT CAST(count(*) AS BIGINT) AS n_common,
       |  CAST(coalesce(sum(t), 0) AS BIGINT) AS rbo_micro,
       |  CAST(CAST(coalesce(sum(t), 0) AS BIGINT) AS DOUBLE) / 1e6 AS rbo_r
       |FROM mm""".stripMargin
  }

  /** t_lm_quality: replay the add-1 bigram LM — word_shingles(2)
    * bigrams, train counts from ≥2-token docs ONLY (sub-2-token docs
    * would inject their whole-text collapse shingle), scored docs keep
    * the collapse (scores as unseen), context counts from the bigram
    * relation, unigram vocabulary. Log-probs become integer micro-units
    * via floor/ceil half-away rounding (bit-deterministic in both
    * engines, unlike round() built-ins, which disagree when the decimal
    * sum / count quotient lands exactly on a .5e-6 boundary — observed
    * at sf0.1), summed exactly; the mean re-rounds the same way. */
  /** The bigram-LM score CTE chain over an arbitrary source relation
    * `src` (train = score = src, the t_lm_quality shape) — shared by
    * t_lm_quality, t_ppl_buckets (via the full statement) and the CCNet
    * funnel (mid-cascade over langid survivors). */
  private def lmScoreCtes(src: String): String =
    s"""d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $src),
       |g AS (SELECT doc_id,
       |        CASE WHEN len(w) <= 1 THEN [array_to_string(w, ' ')]
       |             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END AS bgs
       |      FROM d),
       |tb AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c12
       |       FROM (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
       |             FROM d WHERE len(w) >= 2) GROUP BY bg),
       |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM tb GROUP BY w1),
       |vv AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
       |       FROM (SELECT unnest(w) AS tok FROM d) WHERE tok <> ''),
       |sc AS (
       |  SELECT s.doc_id,
       |    CAST(CASE WHEN l >= 0 THEN floor(l + 0.5) ELSE ceil(l - 0.5) END AS BIGINT) AS lpm
       |  FROM (
       |    SELECT s0.doc_id,
       |      ln((coalesce(tb.c12, 0) + 1.0) / (coalesce(ctx.c1, 0) + 1.0 * vv.v)) * 1000000 AS l
       |    FROM (SELECT doc_id, unnest(bgs) AS bg FROM g) s0
       |    LEFT JOIN tb USING (bg)
       |    LEFT JOIN ctx ON ctx.w1 = split_part(s0.bg, ' ', 1), vv) s),
       |ag AS (SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(lpm) AS DOUBLE) / count(*) AS m
       |       FROM sc GROUP BY doc_id)""".stripMargin

  /** t_nb_langid: replay the multinomial-NB trainer + scorer exactly —
    * train on doc_id%5<>0, capped vocab by (global count desc, word
    * asc), Laplace(+1) log-likelihoods and class priors micro-quantized
    * with the house half-away rounding, unseen words = the class
    * default ln(1/(tot+V)), BIGINT posterior sums, argmax ties to the
    * ascending class. Confusion matrix with exact micro-nat checksums. */
  private def nbLangIdSql: String = nbConfusionSql("doc_id % 5 = 0")

  /** The NB trainer + confusion-matrix replay over a parameterized
    * scored-set predicate — shared by t_nb_langid (the held-out fifth)
    * and st_stream_nb (the whole corpus; streamed == batch). */
  private def nbConfusionSql(tePred: String): String =
    raw"""WITH tr AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      |  FROM documents WHERE doc_id % 5 <> 0),
      |te AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS w
      |  FROM documents WHERE $tePred),
      |trtok AS (SELECT lang AS cls, unnest(w) AS word FROM tr),
      |gv AS (SELECT word FROM (SELECT word, count(*) AS gc FROM trtok GROUP BY word)
      |       ORDER BY gc DESC, word LIMIT 2000),
      |cw AS (SELECT cls, word, count(*) AS cnt FROM trtok JOIN gv USING (word)
      |       GROUP BY cls, word),
      |ct AS (SELECT cls, sum(cnt) AS tot FROM cw GROUP BY cls),
      |vs AS (SELECT count(*) AS v FROM gv),
      |nd AS (SELECT lang AS cls, count(*) AS ndc FROM tr GROUP BY 1),
      |ndt AS (SELECT count(*) AS ndt FROM tr),
      |cls AS (
      |  SELECT ct.cls,
      |    CAST(CASE WHEN lp >= 0 THEN floor(lp + 0.5) ELSE ceil(lp - 0.5) END AS BIGINT) AS prior_sc,
      |    CAST(CASE WHEN ld >= 0 THEN floor(ld + 0.5) ELSE ceil(ld - 0.5) END AS BIGINT) AS default_sc
      |  FROM (
      |    SELECT ct.cls, ct.tot,
      |      ln(CAST(ndc AS DOUBLE) / CAST(ndt AS DOUBLE)) * 1000000 AS lp,
      |      ln(1.0 / CAST(tot + v AS DOUBLE)) * 1000000 AS ld
      |    FROM ct JOIN nd USING (cls), vs, ndt) ct),
      |sc AS (
      |  SELECT cls, word,
      |    CAST(CASE WHEN l >= 0 THEN floor(l + 0.5) ELSE ceil(l - 0.5) END AS BIGINT) AS sc
      |  FROM (
      |    SELECT cw.cls, cw.word,
      |      ln(CAST(cnt + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)) * 1000000 AS l
      |    FROM cw JOIN ct USING (cls), vs) s),
      |tetok AS (SELECT doc_id, word, count(*) AS tc
      |          FROM (SELECT doc_id, unnest(w) AS word FROM te) GROUP BY 1, 2),
      |lk AS (
      |  SELECT t.doc_id, c.cls, sum(coalesce(s.sc, c.default_sc) * t.tc) AS lk
      |  FROM tetok t CROSS JOIN cls c
      |  LEFT JOIN sc s ON s.word = t.word AND s.cls = c.cls
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT te.doc_id, te.lang AS actual, c.cls,
      |    c.prior_sc + coalesce(lk.lk, 0) AS total_sc
      |  FROM te CROSS JOIN cls c
      |  LEFT JOIN lk ON lk.doc_id = te.doc_id AND lk.cls = c.cls),
      |pred AS (
      |  SELECT doc_id, actual, cls AS pred, total_sc,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY total_sc DESC, cls) AS rn
      |  FROM tot)
      |SELECT actual AS lang, pred, count(*) AS n_docs,
      |  CAST(sum(total_sc) AS BIGINT) AS score_sum
      |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** x_chinchilla_plan: replay the compute-optimal table — corpus
    * token aggregate, floor(sqrt(C/120)) per exaFLOP budget (sqrt is
    * IEEE-correctly-rounded, the temperatureMix seam), truncating
    * epochs-needed ppm vs the 4-epoch ceiling. */
  private def chinchillaPlanSql: String =
    raw"""WITH ct AS (
       |  SELECT CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
       |    ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS corpus_tokens
       |  FROM documents),
       |grid AS (SELECT CAST(unnest([1, 10, 100, 1000]) AS BIGINT) AS flops_exa),
       |pl AS (
       |  SELECT flops_exa,
       |    CAST(floor(sqrt(CAST(flops_exa AS DOUBLE) * 1e18 / 120.0)) AS BIGINT) AS n_opt_params
       |  FROM grid)
       |SELECT pl.flops_exa, pl.n_opt_params,
       |  pl.n_opt_params * 20 AS d_opt_tokens,
       |  ct.corpus_tokens,
       |  (pl.n_opt_params * 20 * 1000000) // ct.corpus_tokens AS epochs_needed_ppm,
       |  (pl.n_opt_params * 20 * 1000000) // ct.corpus_tokens <= 4000000 AS feasible
       |FROM pl, ct ORDER BY pl.flops_exa""".stripMargin

  /** d_domain_reweight: replay the bigram-LM CTEs, per-lang NLL vs
    * corpus NLL in truncating micro divs, the linearized MW factor,
    * and the renormalized ppm weights. */
  private def domainReweightSql: String =
    s"""WITH ${lmScoreCtes("documents")},
       |doms AS (SELECT doc_id, lang AS domain FROM documents),
       |ndc AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs FROM doms GROUP BY 1),
       |per AS (
       |  SELECT doms.domain, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(sc.lpm) AS BIGINT) AS s
       |  FROM sc JOIN doms USING (doc_id) GROUP BY 1),
       |ov AS (SELECT CAST(sum(n_bigrams) AS BIGINT) AS nb_all,
       |         CAST(sum(s) AS BIGINT) AS s_all FROM per),
       |pr AS (
       |  SELECT per.domain, ndc.n_docs, per.n_bigrams,
       |    -(per.s // per.n_bigrams) AS nll_micro,
       |    -(per.s // per.n_bigrams) - (-(ov.s_all // ov.nb_all)) AS excess_micro,
       |    (per.n_bigrams * 1000000) // ov.nb_all AS base_ppm,
       |    greatest(0, 1000000 +
       |      (5000000 * (-(per.s // per.n_bigrams) - (-(ov.s_all // ov.nb_all)))) // 1000000)
       |      AS factor_ppm
       |  FROM per JOIN ndc USING (domain), ov),
       |ar AS (SELECT *, (base_ppm * factor_ppm) // 1000000 AS alpha_raw FROM pr),
       |tt AS (SELECT CAST(sum(alpha_raw) AS BIGINT) AS t FROM ar)
       |SELECT domain, n_docs, n_bigrams,
       |  CAST(nll_micro AS BIGINT) AS nll_micro,
       |  CAST(excess_micro AS BIGINT) AS excess_micro,
       |  CAST(base_ppm AS BIGINT) AS base_ppm,
       |  CAST(factor_ppm AS BIGINT) AS factor_ppm,
       |  CAST((alpha_raw * 1000000) // tt.t AS BIGINT) AS weight_ppm
       |FROM ar, tt ORDER BY domain""".stripMargin

  private def lmQualitySql: String =
    s"""WITH ${lmScoreCtes("documents")}
       |SELECT doc_id, n_bigrams,
       |  (CASE WHEN m >= 0 THEN floor(m + 0.5) ELSE ceil(m - 0.5) END) / 1000000.0 AS avg_logprob_r
       |FROM ag ORDER BY doc_id""".stripMargin

  /** t_min_k_prob: replay the Min-K% screen over the shared
    * lmScoreCtes lpm rows — per-doc rank by (lpm asc), k = max(1,
    * n·20 // 100), sum of the selected rows (equal-lpm rank splits are
    * sum-invariant), mean re-rounds half-away. */
  private def minKProbSql: String =
    s"""WITH ${lmScoreCtes("documents")},
       |rk AS (
       |  SELECT doc_id, lpm,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY lpm) AS rn,
       |    count(*) OVER (PARTITION BY doc_id) AS n
       |  FROM sc),
       |sel AS (
       |  SELECT doc_id, max(n) AS n_bigrams,
       |    greatest(1, max(n) * 20 // 100) AS k_used,
       |    CAST(sum(CASE WHEN rn <= greatest(1, n * 20 // 100) THEN lpm END) AS BIGINT) AS s6
       |  FROM rk GROUP BY doc_id),
       |fin AS (SELECT doc_id, n_bigrams, k_used,
       |          CAST(s6 AS DOUBLE) / k_used AS m FROM sel)
       |SELECT doc_id, n_bigrams, CAST(k_used AS BIGINT) AS k_used,
       |  (CASE WHEN m >= 0 THEN floor(m + 0.5) ELSE ceil(m - 0.5) END) / 1000000.0 AS min_k_avg_r
       |FROM fin ORDER BY doc_id""".stripMargin

  /** t_kn_quality: replay interpolated Kneser-Ney (D=0.75) — bigram
    * types, the one-pass history aggregate (c1 mass + n1p distinct
    * continuations), continuation counts, type total; the probability
    * is the IDENTICAL left-to-right FP expression as the Spark side
    * (engines never re-associate), ln micro-rounds half-away, exact
    * BIGINT sums, the mean re-rounds — the lmScoreCtes seam with the
    * KN formula. */
  private def knQualitySql: String =
    raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(w) <= 1 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END AS bgs
      |      FROM d),
      |tb AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c12
      |       FROM (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
      |             FROM d WHERE len(w) >= 2) GROUP BY bg),
      |ctx AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1,
      |          CAST(count(*) AS DOUBLE) AS n1p FROM tb GROUP BY 1),
      |cont AS (SELECT string_split(bg, ' ')[-1] AS w2,
      |           CAST(count(*) AS DOUBLE) AS n1pc FROM tb GROUP BY 1),
      |tt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tb),
      |sc AS (
      |  SELECT s.doc_id,
      |    CAST(CASE WHEN l >= 0 THEN floor(l + 0.5) ELSE ceil(l - 0.5) END AS BIGINT) AS lpm
      |  FROM (
      |    SELECT s0.doc_id,
      |      ln(CASE WHEN ctx.c1 IS NOT NULL
      |           THEN greatest(coalesce(tb.c12, 0.0) - 0.75, 0.0) / ctx.c1
      |                + 0.75 * ctx.n1p / ctx.c1 * coalesce(cont.n1pc, 0.0) / tt.t
      |           ELSE coalesce(cont.n1pc, 0.0) / tt.t END) * 1000000 AS l
      |    FROM (SELECT doc_id, unnest(bgs) AS bg FROM g) s0
      |    LEFT JOIN tb USING (bg)
      |    LEFT JOIN ctx ON ctx.w1 = split_part(s0.bg, ' ', 1)
      |    LEFT JOIN cont ON cont.w2 = string_split(s0.bg, ' ')[-1], tt) s),
      |ag AS (SELECT doc_id, count(*) AS n_bigrams,
      |         CAST(sum(lpm) AS DOUBLE) / count(*) AS m
      |       FROM sc GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      |  (CASE WHEN m >= 0 THEN floor(m + 0.5) ELSE ceil(m - 0.5) END) / 1000000.0 AS kn_avg_logprob_r
      |FROM ag ORDER BY doc_id""".stripMargin

  /** t_pii_scrub: DuckDB synthesizes the same contact strings from
    * customer keys and redacts with the same RE2 patterns in the same
    * order (emails → IPv4 → phones, counts on progressively-scrubbed
    * text — mirrors TextAnalysis.scrubPii). */
  private def piiScrubSql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
    def hitSum(c: String, re: String) =
      s"CAST(sum(len(string_split_regex($c, '$re')) - 1) AS BIGINT)"
    s"""WITH base AS (
       |  SELECT c_mktsegment,
       |    c_name || ' reachable at user' || c_custkey ||
       |    '@example.com or +1 (555) 010-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
       |    ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.' || CAST(c_custkey % 100 AS VARCHAR) AS text
       |  FROM customer),
       |s1 AS (SELECT c_mktsegment, text,
       |         regexp_replace(text, '$email', '[EMAIL]', 'g') AS after_email FROM base),
       |s2 AS (SELECT *, regexp_replace(after_email, '$ip', '[IP]', 'g') AS after_ip FROM s1)
       |SELECT c_mktsegment, count(*) AS n_rows,
       |  ${hitSum("text", email)} AS emails,
       |  ${hitSum("after_ip", phone)} AS phones,
       |  ${hitSum("after_email", ip)} AS ips,
       |  min(regexp_replace(after_ip, '$phone', '[PHONE]', 'g')) AS sample_clean
       |FROM s2 GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  }

  /** d_stratified_sample: recompute the deterministic sample membership
    * (md5_low32(doc_id:salt) < floor(fraction·2³²), per-lang thresholds
    * mirroring Sampling.stratifiedSample with the query's mix). */
  private def stratifiedSampleSql: String = {
    def thr(f: Double) = math.floor(f * 4294967296.0).toLong
    s"""SELECT lang, count(*) AS n_sampled,
       |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
       |FROM documents
       |WHERE (md5_number_lower(CAST(doc_id AS VARCHAR) || ':mix1') & 4294967295)
       |      < CASE lang WHEN 'en' THEN ${thr(0.5)} WHEN 'zh' THEN ${thr(0.25)}
       |                  ELSE ${thr(0.1)} END
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** d_decontam_report: 3-gram overlap of corpus docs (id > 5) against
    * the eval set (id ≤ 5), mirroring Decontamination.overlapReport
    * (distinct shingles; ≤2-word docs collapse to one whole-text
    * shingle, same as word_shingles). */
  /** d_bloom_prefilter: decontamSql plus the Bloom band — bit positions
    * are salted md5_low32 draws mod 1024 (`md5_number_lower(s||':bloom'||i)
    * & 2³²−1 % 1024`), bits = distinct positions of the eval side, a
    * corpus shingle is a candidate iff all 3 salted positions are set
    * (JOIN multiplicity = 3), and the exact overlap join runs on
    * candidates only — identical n_overlap because Bloom has no false
    * negatives. */
  private def bloomPrefilterSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |      FROM d),
      |ds AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM g WHERE doc_id > 5),
      |bs AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE doc_id <= 5),
      |bits AS (SELECT DISTINCT (md5_number_lower(s || ':bloom' || i) & 4294967295) % 1024 AS p
      |         FROM bs, unnest([0, 1, 2]) AS t(i)),
      |pos AS (SELECT doc_id, s, (md5_number_lower(s || ':bloom' || i) & 4294967295) % 1024 AS p
      |        FROM ds, unnest([0, 1, 2]) AS t(i)),
      |cand AS (SELECT doc_id, s FROM pos JOIN bits USING (p)
      |         GROUP BY doc_id, s HAVING count(*) = 3),
      |counts AS (SELECT doc_id, count(*) AS n_shingles FROM ds GROUP BY doc_id),
      |cc AS (SELECT doc_id, count(*) AS n_candidates FROM cand GROUP BY doc_id),
      |ov AS (SELECT cand.doc_id, count(*) AS n_overlap FROM cand JOIN bs ON cand.s = bs.s GROUP BY cand.doc_id)
      |SELECT c.doc_id AS id, c.n_shingles,
      |  coalesce(cc.n_candidates, 0) AS n_candidates,
      |  coalesce(o.n_overlap, 0) AS n_overlap,
      |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / c.n_shingles, 6) AS overlap_frac,
      |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / c.n_shingles, 6) >= 0.2 AS contaminated
      |FROM counts c LEFT JOIN cc USING (doc_id) LEFT JOIN ov o USING (doc_id)
      |ORDER BY id""".stripMargin

  /** d_dup_spans: replay the exact duplicated-substring pass — 8-grams at
    * every token position, corpus-wide occurrence counts with the
    * lexicographic-first (id, pos) canonical copy (encoded as
    * id·1e6 + pos, safe: doc ids and positions are far below 1e6),
    * gaps-and-islands merge of the surviving positions. */
  private def dupSpanCtes: String =
    """d AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |        ELSE string_split_regex(trim(text), '\s+') END AS w
      |      FROM documents),
      |e AS (SELECT * FROM d WHERE len(w) >= 8),
      |g AS (SELECT doc_id AS id, i - 1 AS pos,
      |        array_to_string(w[i:i+7], ' ') AS gram
      |      FROM e, unnest(range(1, len(w) - 7 + 1)) AS t(i)),
      |st AS (SELECT gram, count(*) AS occ, min(id * 1000000 + pos) AS fk
      |       FROM g GROUP BY gram),
      |m AS (SELECT g.id, g.pos FROM g JOIN st USING (gram)
      |      WHERE st.occ > 1 AND g.id * 1000000 + g.pos <> st.fk),
      |i AS (SELECT id, pos,
      |        CASE WHEN lag(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL
      |              OR pos > lag(pos) OVER (PARTITION BY id ORDER BY pos) + 1
      |             THEN 1 ELSE 0 END AS brk
      |      FROM m),
      |isl AS (SELECT id, pos,
      |          sum(brk) OVER (PARTITION BY id ORDER BY pos) AS isl
      |        FROM i)""".stripMargin

  private def dupSpansSql: String =
    s"""WITH $dupSpanCtes
      |SELECT CAST(id AS BIGINT) AS id,
      |  CAST(min(pos) AS BIGINT) AS start_tok,
      |  CAST(max(pos) + 7 AS BIGINT) AS end_tok,
      |  CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS span_tokens
      |FROM isl GROUP BY id, isl
      |ORDER BY id, start_tok""".stripMargin

  /** d_dup_span_coverage: corpus headline over the same span CTEs —
    * total tokens, tokens inside duplicated spans, affected docs,
    * fraction. */
  private def dupSpanCoverageSql: String =
    s"""WITH $dupSpanCtes,
      |sp AS (SELECT id, min(pos) AS s, max(pos) + 7 AS e2
      |       FROM isl GROUP BY id, isl),
      |tt AS (SELECT count(*) AS n_docs, CAST(sum(len(w)) AS BIGINT) AS total_tokens FROM d),
      |ss AS (SELECT CAST(coalesce(sum(e2 - s + 1), 0) AS BIGINT) AS dup_span_tokens,
      |         count(DISTINCT id) AS docs_with_dups FROM sp)
      |SELECT tt.n_docs, tt.total_tokens, ss.dup_span_tokens, ss.docs_with_dups,
      |  round(CAST(ss.dup_span_tokens AS DOUBLE) / tt.total_tokens, 6) AS dup_fraction
      |FROM tt, ss""".stripMargin

  /** d_substring_dedup: the removal companion — every token covered by a
    * duplicated span is excised, remaining tokens reassemble in order. */
  private def removeSpansSql: String =
    s"""WITH $dupSpanCtes,
      |sp AS (SELECT id, min(pos) AS s, max(pos) + 7 AS e2
      |       FROM isl GROUP BY id, isl),
      |tok AS (SELECT doc_id AS id, gi - 1 AS pos, w[gi] AS tok
      |        FROM d, unnest(range(1, len(w) + 1)) AS t(gi)),
      |kept AS (SELECT t.id, t.pos, t.tok FROM tok t
      |         WHERE NOT EXISTS (SELECT 1 FROM sp
      |           WHERE sp.id = t.id AND t.pos BETWEEN sp.s AND sp.e2)),
      |ka AS (SELECT id, count(*) AS n_kept,
      |         string_agg(tok, ' ' ORDER BY pos) AS text
      |       FROM kept GROUP BY id)
      |SELECT CAST(d.doc_id AS BIGINT) AS id,
      |  CAST(len(d.w) AS BIGINT) AS n_tokens,
      |  CAST(len(d.w) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(ka.text, '') AS text
      |FROM d LEFT JOIN ka ON ka.id = d.doc_id
      |ORDER BY id""".stripMargin

  /** d_line_dedup: replay the 3-word line shaping, the corpus-wide
    * normalized-line doc counts, the keep rule (unique line, or the
    * minimum-id owner), and the in-order reassembly
    * (`string_agg ORDER BY pos` ≡ Spark's array_sort(struct(pos,line))). */
  private def lineDedupSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |l0 AS (SELECT doc_id, i AS pos,
      |         array_to_string(w[(i-1)*3+1:(i-1)*3+3], ' ') AS line
      |       FROM d, unnest(range(1, CAST(ceil(len(w) / 3.0) AS BIGINT) + 1)) AS t(i)),
      |k AS (SELECT lower(trim(line)) AS key, count(DISTINCT doc_id) AS n_docs,
      |        min(doc_id) AS first_id
      |      FROM l0 GROUP BY 1),
      |kept AS (SELECT l0.doc_id, l0.pos, l0.line
      |         FROM l0 JOIN k ON lower(trim(l0.line)) = k.key
      |         WHERE k.n_docs <= 1 OR l0.doc_id = k.first_id),
      |nl AS (SELECT doc_id, count(*) AS n_lines FROM l0 GROUP BY doc_id),
      |agg AS (SELECT doc_id, count(*) AS n_kept,
      |          string_agg(line, chr(10) ORDER BY pos) AS text
      |        FROM kept GROUP BY doc_id)
      |SELECT nl.doc_id AS id, nl.n_lines, coalesce(agg.n_kept, 0) AS n_kept,
      |  coalesce(agg.text, '') AS text
      |FROM nl LEFT JOIN agg USING (doc_id) ORDER BY id""".stripMargin

  private def decontamSql: String =
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
      |      FROM d),
      |ds AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM g WHERE doc_id > 5),
      |bs AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE doc_id <= 5),
      |counts AS (SELECT doc_id, count(*) AS n_shingles FROM ds GROUP BY doc_id),
      |ov AS (SELECT doc_id, count(*) AS n_overlap FROM ds JOIN bs ON ds.s = bs.s GROUP BY doc_id)
      |SELECT c.doc_id AS id, c.n_shingles, coalesce(o.n_overlap, 0) AS n_overlap,
      |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / c.n_shingles, 6) AS overlap_frac,
      |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / c.n_shingles, 6) >= 0.2 AS contaminated
      |FROM counts c LEFT JOIN ov o USING (doc_id) ORDER BY id""".stripMargin

  /** t_repetition: duplicate-word and top-bigram fractions (mirrors
    * TextAnalysis.repetitionMetrics; 2-shingles via the same ≤1-word
    * whole-text collapse as word_shingles). */
  private def repetitionSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
      |  WHERE doc_id <= 200),
      |g AS (SELECT doc_id, w,
      |        CASE WHEN len(w) <= 1 THEN [array_to_string(w, ' ')]
      |             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END AS bg
      |      FROM d)
      |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |  round(CASE WHEN len(w) > 0
      |        THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) ELSE 0 END, 6) AS dup_word_frac,
      |  round(CASE WHEN len(bg) > 0
      |        THEN CAST(list_max(list_transform(list_distinct(bg), t -> len(list_filter(bg, x -> x = t)))) AS DOUBLE)
      |             / len(bg) ELSE 0 END, 6) AS top_bigram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /** j3_search_eval: precision/recall@5 of exact cosine top-5 against the
    * same-label ground truth (mirrors Evaluation.precisionAtK over
    * Ann.bruteForceTopK). */
  private def searchEvalSql: String =
    """WITH n AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |res AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC, c.vec_id) AS rank
      |    FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |truth AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS nid
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <= 10 AND b.vec_id <> a.vec_id),
      |hits AS (
      |  SELECT r.query_id, count(*) AS n_hits
      |  FROM res r JOIN truth t ON r.query_id = t.query_id AND r.neighbor_id = t.nid
      |  GROUP BY r.query_id),
      |exp_c AS (SELECT query_id, count(*) AS n_expected FROM truth GROUP BY query_id)
      |SELECT CAST(e.query_id AS VARCHAR) AS query,
      |  round(coalesce(h.n_hits, 0) / 5.0, 6) AS precision_at_k,
      |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / e.n_expected, 6) AS recall_at_k
      |FROM exp_c e LEFT JOIN hits h USING (query_id)
      |ORDER BY query""".stripMargin

  /** j3_ndcg: nDCG@5 of the brute-force search vs label-mates truth —
    * integer micro-gains floor(1e6 / round(log2(pos+1), 6)) summed per
    * query; one final double division. */
  private def searchNdcgSql: String =
    """WITH n AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |res AS (
      |  SELECT query_id, neighbor_id, rank FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC, c.vec_id) AS rank
      |    FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |truth AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS nid
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <= 10 AND b.vec_id <> a.vec_id),
      |dcg AS (
      |  SELECT r.query_id,
      |    sum(CAST(floor(1000000.0 / round(log2(CAST(r.rank AS DOUBLE) + 1.0), 6)) AS BIGINT)) AS dcg_micro
      |  FROM res r JOIN truth t ON r.query_id = t.query_id AND r.neighbor_id = t.nid
      |  GROUP BY 1),
      |ideal AS (
      |  SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY nid) AS pos
      |  FROM truth),
      |idcg AS (
      |  SELECT query_id,
      |    sum(CAST(floor(1000000.0 / round(log2(CAST(pos AS DOUBLE) + 1.0), 6)) AS BIGINT)) AS idcg_micro
      |  FROM ideal WHERE pos <= 5 GROUP BY 1)
      |SELECT CAST(i.query_id AS VARCHAR) AS query,
      |  round(CAST(coalesce(d.dcg_micro, 0) AS DOUBLE) / CAST(i.idcg_micro AS DOUBLE), 6) AS ndcg_at_k
      |FROM idcg i LEFT JOIN dcg d USING (query_id)
      |ORDER BY query""".stripMargin

  /** q5_table_search: top tables by content-snapshot slot agreement with
    * `nation` (mirrors Discovery.searchTables over the A13 snapshots). */
  private def tableSearchSql: String = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents")
    s"""WITH $permsCte,
       |${snapshotDigestCtes(tables)}
       |SELECT c.t AS cand_table,
       |  round(CAST(len([i FOR i IN range(1, 101) IF q.d[i] = c.d[i]]) AS DOUBLE) / 100.0, 6) AS jaccard
       |FROM snapd c, snapd q WHERE q.t = 'nation' AND c.t <> 'nation'
       |ORDER BY jaccard DESC, cand_table LIMIT 10""".stripMargin
  }

  /** a15_content_hash: order-independent md5Low64 row-hash sum per table
    * (mirrors Augment.contentHash: \\u0001-joined row, \\u0002 null marker,
    * header hash added). */
  private def contentHashSql: String = {
    val tables = Seq("region", "nation", "customer", "supplier", "part")
    tables.map { tbl =>
      val cols = lakeSchemas(tbl).map(_._1)
      val rendered = cols.map(c => s"coalesce(CAST($c AS VARCHAR), chr(2))")
      val header = cols.mkString(",")
      s"""SELECT '$tbl' AS table_name,
         |  CAST(SUM(CAST(md5_number_lower(rs) AS HUGEINT)) + CAST(md5_number_lower('$header') AS HUGEINT) AS VARCHAR) AS content_hash,
         |  count(*) AS "rows"
         |FROM (SELECT concat_ws(chr(1), ${rendered.mkString(", ")}) AS rs FROM $tbl)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** a_augment_hashes: recompute each augmentation's content hash with the
    * SAME deterministic column order/header the engine used —
    * `Augment.lehmerPerm` is shared between the engine and this SQL
    * generator, so the permutation is a cross-engine constant, not RNG
    * state. `cols_reuse` is pinned at full width: per-column value digests
    * are order/name-independent by construction, and the Spark side must
    * PROVE it by recomputing and joining digests across augs. */
  private def augmentHashesSql: String = {
    val cols = lakeSchemas("part").map(_._1)
    val n = cols.length
    def one(aug: Int, order: Seq[Int], names: Seq[String]) = {
      val rendered = order.map(i => s"coalesce(CAST(${cols(i)} AS VARCHAR), chr(2))")
      val header = names.mkString(",")
      s"""SELECT CAST($aug AS BIGINT) AS aug_id, '$header' AS header,
         |  CAST(SUM(CAST(md5_number_lower(rs) AS HUGEINT)) + CAST(md5_number_lower('$header') AS HUGEINT) AS VARCHAR) AS content_hash,
         |  count(*) AS n_rows, CAST($n AS BIGINT) AS cols_reuse
         |FROM (SELECT concat_ws(chr(1), ${rendered.mkString(", ")}) AS rs FROM part)""".stripMargin
    }
    val perm = graft.ingest.Augment.lehmerPerm(n, 2)
    Seq(one(0, 0 until n, cols),
      one(1, 0 until n, (0 until n).map("col" + _)),
      one(2, perm, perm.map(cols)))
      .mkString("", "\nUNION ALL\n", "\nORDER BY aug_id")
  }

  /** t2_tokenizer_layout: DuckDB replays the tokenizer-layer layouts —
    * position encoding via a windowed SEP count, the MLM mask plan via the
    * same md5-low32 draws (`md5_number_lower & 0xffffffff`, 0-based
    * positions), pair concat via list slices. */
  private def tokenizerLayoutSql: String = {
    def mdraw(k: Int): String =
      s"(md5_number_lower(CAST(key AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR) || ':$k') & 4294967295) % 10000 / 10000.0"
    val onehot = (0 until 5)
      .map(c => s"CAST(CASE WHEN n.n_regionkey = $c THEN 1 ELSE 0 END AS VARCHAR)")
      .mkString(" || ',' || ")
    s"""WITH n AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS key, n_regionkey,
       |    ['[CLS]'] || string_split(n_name, ' ') ||
       |    ['[SEP]', CAST(n_nationkey AS VARCHAR), '[SEP]',
       |     CAST(n_regionkey AS VARCHAR), '[SEP]'] AS toks
       |  FROM nation),
       |r AS (SELECT r_regionkey,
       |    ['[CLS]'] || string_split(r_name, ' ') || ['[SEP]'] AS rtoks
       |  FROM region),
       |pos AS (SELECT key, i0 + 1 AS i, toks[i0 + 1] AS tok
       |        FROM (SELECT key, toks, unnest(range(len(toks))) AS i0 FROM n)),
       |pos2 AS (SELECT key, i, tok,
       |    coalesce(sum(CASE WHEN tok = '[SEP]' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY key ORDER BY i
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seps_before
       |  FROM pos),
       |enc AS (SELECT key, i,
       |    CASE WHEN tok IN ('[CLS]', '[SEP]', '[PAD]', '[MASK]') THEN 0
       |         ELSE 1 + CAST(seps_before AS INT) END AS ce,
       |    CASE WHEN tok IN ('[CLS]', '[SEP]', '[PAD]') THEN 'keep'
       |         WHEN ${mdraw(1)} >= 0.15 THEN 'keep'
       |         WHEN ${mdraw(2)} < 0.8 THEN 'mask'
       |         WHEN ${mdraw(2)} < 0.9 THEN 'random'
       |         ELSE 'keep_masked' END AS action
       |  FROM pos2),
       |agg AS (SELECT key,
       |    array_to_string(list(ce ORDER BY i), ',') AS colenc_s,
       |    array_to_string(list(action ORDER BY i), ',') AS mask_s
       |  FROM enc GROUP BY key)
       |SELECT n.key, array_to_string(n.toks, ' ') AS tokens_s,
       |  agg.colenc_s, agg.mask_s,
       |  array_to_string(n.toks[1:4] || r.rtoks[1:4], ' ') AS pair_s,
       |  $onehot AS onehot_s
       |FROM n JOIN r ON n.n_regionkey = r.r_regionkey JOIN agg USING (key)
       |ORDER BY key""".stripMargin
  }

  /** type_inference: DuckDB's own parquet schema read mapped into the
    * reference's 4-type system. */
  private def typeInferenceSql: String = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val describes = tables.map { tbl =>
      s"SELECT '$tbl' AS table_name, row_number() OVER () AS idx, column_name, column_type FROM (DESCRIBE $tbl)"
    }
    s"""SELECT table_name, CAST(idx - 1 AS BIGINT) AS col_idx, column_name AS col_name,
       |  CASE WHEN column_type LIKE '%[]' OR column_type LIKE 'STRUCT%'
       |            OR column_type LIKE 'MAP%' OR column_type = 'BLOB' THEN 'other'
       |       WHEN column_type LIKE 'TIMESTAMP%' OR column_type = 'DATE' THEN 'date'
       |       WHEN column_type IN ('TINYINT','SMALLINT','INTEGER','BIGINT','HUGEINT') THEN 'integer'
       |       WHEN column_type IN ('FLOAT','DOUBLE') OR column_type LIKE 'DECIMAL%' THEN 'float'
       |       WHEN column_type IN ('VARCHAR','BOOLEAN') THEN 'string'
       |       ELSE 'other' END AS col_type
       |FROM (${describes.mkString("\nUNION ALL ")})
       |ORDER BY table_name, col_idx""".stripMargin
  }

  /** t1_feature_tensors: per-column stats + minhash tensors of customer/
    * nation/region, rendered as DECIMAL(28,6)-joined strings. The z-score
    * mirrors FeatureAssembly.zscoreUdf's exact FP expression tree:
    * μ = (x1+…+x16)/256 (pad zeros add exactly nothing), variance =
    * Σ(xi−μ)² + (240·μ)·μ (closed-form pad term), σ = √(s2/256).
    */
  private def featureTensorsSql: String = {
    val tables = Seq("customer", "nation", "region")
    val width = 256
    val head = 16
    // numeric long-format values for the quantile branch
    val nvalSelects = tables.flatMap { tbl =>
      lakeSchemas(tbl).zipWithIndex.collect {
        case ((c, lt), i) if lt == "integer" || lt == "float" =>
          // capped like every other catalog branch — customer exceeds the
          // cap from sf0.1 up, and the Spark side profiles capped reads
          s"SELECT '$tbl' AS t, $i AS ci, CAST($c AS DOUBLE) AS nv FROM ${cappedSrc(tbl, 10000)}"
      }
    }
    val qCols = (1 to 9).map(i => s"quantile_cont(nv, 0.$i) AS q$i").mkString(", ")
    val meanE = "CAST(SUM(CAST(nv AS DECIMAL(18,2))) AS DOUBLE) / count(nv)"
    val raw =
      (Seq("CAST(n_unique AS DOUBLE)", "CAST(num_nan AS DOUBLE)",
        "coalesce(CASE WHEN ct = 'string' THEN cw END, 1.0)") ++
        (1 to 9).map(i => s"CASE WHEN qok THEN q$i ELSE 0.0 END") ++
        Seq("CASE WHEN qok THEN mean_e ELSE 0.0 END",
          "CASE WHEN qok AND n_unique > 2 THEN std_e ELSE 0.0 END",
          "CASE WHEN qok THEN mn ELSE 0.0 END",
          "CASE WHEN qok THEN mx ELSE 0.0 END"))
        .zipWithIndex.map { case (e, i) => s"$e AS x${i + 1}" }
    val xs = (1 to head).map(i => s"x$i")
    val muExpr = s"(${xs.mkString(" + ")}) / $width.0"
    val s2Expr = xs.map(x => s"($x - mu) * ($x - mu)").mkString(" + ") +
      s" + (($width - $head) * mu) * mu"
    val zList = xs.map(x => s"CAST(($x - mu) / sd AS DECIMAL(28,6))").mkString(", ")
    val zerosTail = (n: Int) => s"repeat(',0.000000', $n)"
    val mhToDec = (d: String) =>
      s"array_to_string(list_transform($d, _h -> CAST(CAST(_h AS DOUBLE) / 100000000.0 AS DECIMAL(28,6))), ',')"
    s"""WITH $permsCte,
       |${valsCte(tables, Some(10000))},
       |${metaCte(tables)},
       |${statsCte(roundCw = false)},
       |nvals AS (
       |  ${nvalSelects.mkString("\n  UNION ALL ")}
       |),
       |q0 AS (
       |  SELECT t, ci, $qCols, $meanE AS mean_e,
       |    sqrt(greatest(CAST(SUM(CAST(nv AS DECIMAL(18,2)) * CAST(nv AS DECIMAL(18,2))) AS DOUBLE) / count(nv)
       |      - ($meanE) * ($meanE), 0.0)) AS std_e,
       |    min(nv) AS mn, max(nv) AS mx
       |  FROM nvals GROUP BY t, ci),
       |$digestCtes,
       |raw0 AS (
       |  SELECT meta.t, meta.ci, meta.cn, meta.ct, edig.d AS ed, wdig.d AS wd,
       |    stats.n_rows, stats.num_nan, stats.n_unique, stats.cw,
       |    q0.q1, q0.q2, q0.q3, q0.q4, q0.q5, q0.q6, q0.q7, q0.q8, q0.q9,
       |    q0.mean_e, q0.std_e, q0.mn, q0.mx,
       |    (meta.ct IN ('integer', 'float') AND (stats.n_rows - stats.num_nan) > 1
       |      AND stats.n_unique > 1 AND q0.mean_e IS NOT NULL) AS qok
       |  FROM meta JOIN stats USING (t, ci)
       |  JOIN edig USING (t, ci) LEFT JOIN wdig USING (t, ci)
       |  LEFT JOIN q0 USING (t, ci)),
       |raw AS (
       |  SELECT t, ci, cn, ct, ed, wd,
       |    ${raw.mkString(",\n    ")}
       |  FROM raw0),
       |m1 AS (SELECT *, $muExpr AS mu FROM raw),
       |m2 AS (SELECT *, sqrt(($s2Expr) / $width.0) AS sd FROM m1)
       |SELECT t AS table_name, CAST(ci AS BIGINT) AS col_idx, cn AS col_name,
       |  ct AS col_type,
       |  CASE WHEN sd = 0 THEN '0.000000' || ${zerosTail(width - 1)}
       |       ELSE array_to_string([$zList], ',')
       |            || repeat(',' || CAST(CAST((-mu) / sd AS DECIMAL(28,6)) AS VARCHAR), ${width - head}) END AS stats_vec_str,
       |  ${mhToDec("ed")} || ',' ||
       |    CASE WHEN ct = 'string' AND wd IS NOT NULL THEN ${mhToDec("wd")}
       |         ELSE '0.000000' || ${zerosTail(99)} END
       |    || ${zerosTail(width - 200)} AS mh_vec_str
       |FROM m2 ORDER BY table_name, col_idx""".stripMargin
  }

  /** t_lang_quality: the n-gram-marker language heuristic + composite
    * quality score, grouped by (lang, lang_pred) — mirrors
    * TextFunctions.lang_id (non-overlapping marker counts, deterministic
    * argmax) and quality_score.
    */
  private def langQualitySql: String = {
    val markers = graft.functions.TextFunctions.langMarkers
    val cntSelects = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val cnt = ms.map { m =>
        s"(length(t) - length(replace(t, '$m', ''))) // ${m.length}"
      }.mkString(" + ")
      s"SELECT doc_id, '$lang' AS cand, $cnt AS cnt FROM t0"
    }
    val nTok = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"
    val punctR = "CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END"
    val stopR = s"CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x IN ($stopList))) AS DOUBLE) / len(string_split_regex(lower(trim(text)), '\\s+'))"
    s"""WITH t0 AS (
       |  SELECT doc_id, lang, text, ' ' || lower(text) || ' ' AS t FROM documents),
       |scores AS (
       |  ${cntSelects.mkString("\n  UNION ALL ")}
       |),
       |best AS (
       |  SELECT doc_id, cand, cnt,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY cnt DESC, CASE WHEN cand = 'en' THEN 0 ELSE 1 END, cand) AS rn
       |  FROM scores),
       |marker AS (
       |  SELECT doc_id, CASE WHEN cnt = 0 THEN 'und' ELSE cand END AS marker_pred
       |  FROM best WHERE rn = 1),
       |pred AS (
       |  SELECT t0.lang,
       |    CASE WHEN t0.text IS NULL OR trim(t0.text) = '' THEN 'und'
       |         WHEN length(regexp_replace(t0.t, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) * 2 > length(t0.t) THEN 'zh'
       |         ELSE m.marker_pred END AS lang_pred,
       |    round(
       |      (CASE WHEN ($nTok) < 5 THEN CAST(($nTok) AS DOUBLE) / 5.0
       |            WHEN ($nTok) > 5000 THEN 0.5 ELSE 1.0 END) * 0.4
       |      + (1.0 - least(($punctR) * 2.0, 1.0)) * 0.3
       |      + least(($stopR) * 4.0, 1.0) * 0.3, 6) AS q
       |  FROM t0 JOIN marker m USING (doc_id))
       |SELECT lang, lang_pred, count(*) AS n,
       |  round(CAST(SUM(CAST(q AS DECIMAL(20,6))) AS DOUBLE) / count(q), 6) AS avg_quality
       |FROM pred GROUP BY lang, lang_pred
       |ORDER BY lang, lang_pred""".stripMargin
  }

  /** e2e_ccnet_funnel: replay the whole CCNet-shaped chain — marker
    * language-ID (t_lang_quality's CTEs) → agreement filter → bigram-LM
    * scores over the SURVIVORS (lmScoreCtes parameterized mid-cascade)
    * → per-language positional tertiles, tail dropped → salted-md5
    * per-source cap (w_domain_cap's ordering) — with per-stage doc and
    * token counts. */
  private def ccnetFunnelSql: String = {
    val markers = graft.functions.TextFunctions.langMarkers
    val cntSelects = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val cnt = ms.map { m =>
        s"(length(t) - length(replace(t, '$m', ''))) // ${m.length}"
      }.mkString(" + ")
      s"SELECT doc_id, '$lang' AS cand, $cnt AS cnt FROM t0"
    }
    val nTok = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"
    s"""WITH t0 AS (
       |  SELECT doc_id, lang, source, text, ' ' || lower(text) || ' ' AS t FROM documents),
       |scores AS (
       |  ${cntSelects.mkString("\n  UNION ALL ")}
       |),
       |best AS (
       |  SELECT doc_id, cand, cnt,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY cnt DESC, CASE WHEN cand = 'en' THEN 0 ELSE 1 END, cand) AS rn
       |  FROM scores),
       |marker AS (
       |  SELECT doc_id, CASE WHEN cnt = 0 THEN 'und' ELSE cand END AS marker_pred
       |  FROM best WHERE rn = 1),
       |pr AS (
       |  SELECT t0.doc_id, t0.lang, t0.source, t0.text,
       |    CASE WHEN t0.text IS NULL OR trim(t0.text) = '' THEN 'und'
       |         WHEN length(regexp_replace(t0.t, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) * 2 > length(t0.t) THEN 'zh'
       |         ELSE m.marker_pred END AS lang_pred
       |  FROM t0 JOIN marker m USING (doc_id)),
       |s2 AS (SELECT doc_id, lang, source, text FROM pr WHERE lang_pred = lang),
       |${lmScoreCtes("s2")},
       |rk AS (SELECT s2.doc_id, s2.lang, s2.source, s2.text,
       |    row_number() OVER (PARTITION BY s2.lang
       |      ORDER BY (CASE WHEN ag.m >= 0 THEN floor(ag.m + 0.5) ELSE ceil(ag.m - 0.5) END) DESC, s2.doc_id) AS rn,
       |    count(*) OVER (PARTITION BY s2.lang) AS nl
       |  FROM s2 JOIN ag USING (doc_id)),
       |s3 AS (SELECT doc_id, lang, source, text FROM rk WHERE rn * 3 <= nl * 2),
       |s4 AS (SELECT doc_id, source, text FROM s3
       |  QUALIFY row_number() OVER (PARTITION BY source
       |    ORDER BY md5('ccnet:' || CAST(doc_id AS VARCHAR)), doc_id) <= 8)
       |SELECT CAST(1 AS BIGINT) AS stage_idx, 'all' AS stage, count(*) AS n_docs,
       |  CAST(coalesce(sum($nTok), 0) AS BIGINT) AS n_tokens FROM documents
       |UNION ALL SELECT CAST(2 AS BIGINT), 'langid_match', count(*), CAST(coalesce(sum($nTok), 0) AS BIGINT) FROM s2
       |UNION ALL SELECT CAST(3 AS BIGINT), 'ppl_head_middle', count(*), CAST(coalesce(sum($nTok), 0) AS BIGINT) FROM s3
       |UNION ALL SELECT CAST(4 AS BIGINT), 'source_cap', count(*), CAST(coalesce(sum($nTok), 0) AS BIGINT) FROM s4
       |ORDER BY stage_idx""".stripMargin
  }

  /** o4_search_minhash: the full sketch-mode discovery search — digests
    * over the capped catalog, per-query-column k·3 over-fetch, first-match
    * per candidate table, seen-cols dedup, column-vote rank (mirrors
    * Discovery.columnDistances + columnVoteRank for query 'supplier').
    * Date/other columns are omitted: the type-equality join makes them
    * unreachable from supplier's {integer,float,string} columns, and the
    * ns-timestamp render (events.ts) is the one cross-engine unstable one.
    */
  private def searchMinhashSql: String = searchSql("supplier", containment = false)

  private def searchSubsetSql: String = searchSql("nation", containment = true)

  /** Sketch-mode discovery search: digests over the capped catalog,
    * per-query-column k·3 over-fetch, first-match + seen-cols dedup,
    * column-vote rank. `containment = true` ranks by the J5 containment
    * estimator (query ⊆ candidate) instead of Jaccard — the Q4 subset
    * semantics. */
  private def searchSql(queryTable: String, containment: Boolean): String = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val selects = tables.flatMap { tbl =>
      lakeSchemas(tbl).zipWithIndex.collect {
        case ((c, lt), i) if lt == "integer" || lt == "float" || lt == "string" =>
          val render =
            if (lt == "string") s"nullif(CAST($c AS VARCHAR), '')"
            else s"CAST($c AS VARCHAR)"
          s"SELECT '$tbl' AS t, $i AS ci, '$lt' AS ct, $render AS v FROM ${cappedSrc(tbl, 10000)}"
      }
    }
    val jExpr = "CAST(len([i FOR i IN range(1, 101) IF q.d[i] = c.d[i]]) AS DOUBLE) / 100.0"
    val distExpr =
      if (!containment) s"1.0 - $jExpr"
      else s"""1.0 - (CASE WHEN q.u <= 0 THEN 0.0
              ELSE least(1.0, ($jExpr) * (q.u + c.u) / ((1.0 + $jExpr) * q.u)) END)"""
    s"""WITH $permsCte,
       |vals AS (
       |  ${selects.mkString("\n  UNION ALL ")}
       |),
       |uq AS (
       |  SELECT t, ci, CAST(count(DISTINCT v) + CASE WHEN count(*) > count(v) THEN 1 ELSE 0 END AS DOUBLE) AS u
       |  FROM vals GROUP BY t, ci),
       |dvals AS (SELECT DISTINCT t, ci, ct, v FROM vals WHERE v IS NOT NULL),
       |emins AS (SELECT t, ci, any_value(ct) AS ct, pi, ${mhSlotMin("v")} AS mh
       |          FROM dvals CROSS JOIN perms GROUP BY t, ci, pi),
       |dig AS (SELECT e.t, e.ci, any_value(e.ct) AS ct, any_value(uq.u) AS u,
       |          list(e.mh ORDER BY e.pi) AS d
       |        FROM emins e JOIN uq ON e.t = uq.t AND e.ci = uq.ci
       |        GROUP BY e.t, e.ci),
       |q AS (SELECT * FROM dig WHERE t = '$queryTable'),
       |c AS (SELECT * FROM dig WHERE t <> '$queryTable'),
       |dists AS (
       |  SELECT q.ci AS q_ci, c.t AS cand_table, c.ci AS cand_ci,
       |    $distExpr AS dist
       |  FROM c JOIN q ON q.ct = c.ct),
       |knn AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_ci ORDER BY dist, cand_table, cand_ci) AS rnk
       |    FROM dists) WHERE rnk <= 30),
       |firstm AS (
       |  SELECT * FROM knn
       |  QUALIFY row_number() OVER (PARTITION BY q_ci, cand_table ORDER BY rnk) = 1),
       |dedup AS (
       |  SELECT * FROM firstm
       |  QUALIFY row_number() OVER (PARTITION BY cand_table, cand_ci ORDER BY dist, rnk) = 1)
       |SELECT cand_table, count(*) AS matched_cols, round(sum(dist), 6) AS sum_dist
       |FROM dedup GROUP BY cand_table
       |ORDER BY matched_cols DESC, sum_dist, cand_table
       |LIMIT 10""".stripMargin
  }

  /** m4_pair_features: table-pair similarity features from the capped
    * catalog digests (mirrors PairScoring.pairFeatures). */
  private def pairFeaturesSql: String = {
    val tables = Seq("customer", "supplier", "orders", "nation", "region", "part")
    val pairs = Seq(("customer", "orders"), ("customer", "supplier"),
      ("nation", "region"), ("part", "supplier"), ("orders", "supplier"),
      ("nation", "nation"), ("region", "region")) // Q8 self-pairs
      .map { case (a, b) => s"('$a','$b')" }.mkString(",")
    val jac = (da: String, db: String) =>
      s"CAST(len([i FOR i IN range(1, 101) IF $da[i] = $db[i]]) AS DOUBLE) / 100.0"
    def nameToks(cn: String) = s"list_distinct(string_split_regex(lower($cn), '[_\\s]+'))"
    s"""WITH $permsCte,
       |${valsCte(tables, Some(10000))},
       |${metaCte(tables)},
       |$digestCtes,
       |cols AS (
       |  SELECT meta.t, meta.ci, meta.cn, meta.ct, edig.d AS ed, wdig.d AS wd
       |  FROM meta JOIN edig USING (t, ci) LEFT JOIN wdig USING (t, ci)),
       |prs AS (SELECT * FROM (VALUES $pairs) _r(table1, table2)),
       |aligned AS (
       |  SELECT p.table1, p.table2, a.ci AS ci1, b.ci AS ci2,
       |    ${jac("a.ed", "b.ed")} AS j_exact,
       |    CASE WHEN a.wd IS NOT NULL AND b.wd IS NOT NULL
       |         THEN ${jac("a.wd", "b.wd")} END AS j_words,
       |    CASE WHEN len(list_distinct(list_concat(${nameToks("a.cn")}, ${nameToks("b.cn")}))) = 0 THEN 1.0
       |         ELSE CAST(len(list_intersect(${nameToks("a.cn")}, ${nameToks("b.cn")})) AS DOUBLE)
       |              / len(list_distinct(list_concat(${nameToks("a.cn")}, ${nameToks("b.cn")}))) END AS name_sim,
       |    CASE WHEN a.ct = b.ct THEN 1.0 ELSE 0.0 END AS type_match
       |  FROM prs p JOIN cols a ON a.t = p.table1 JOIN cols b ON b.t = p.table2)
       |SELECT table1, table2,
       |  round(max(j_exact), 6) AS max_j_exact,
       |  round(CAST(SUM(CAST(j_exact AS DECIMAL(20,10))) AS DOUBLE) / count(j_exact), 6) AS mean_j_exact,
       |  round(max(coalesce(j_words, 0.0)), 6) AS max_j_words,
       |  round(max(name_sim), 6) AS max_name_sim,
       |  round(avg(type_match), 6) AS type_agreement,
       |  count(DISTINCT ci1) AS n_cols_1, count(DISTINCT ci2) AS n_cols_2,
       |  round(CAST(least(count(DISTINCT ci1), count(DISTINCT ci2)) AS DOUBLE)
       |        / greatest(count(DISTINCT ci1), count(DISTINCT ci2)), 6) AS col_ratio
       |FROM aligned GROUP BY table1, table2
       |ORDER BY table1, table2""".stripMargin
  }

  /** a14_hashing_sketch: md5-bucket term-frequency vectors as sorted
    * sparse "bucket:count" strings (mirrors FeatureAssembly.hashingSketch,
    * nFeatures = 1024). */
  private def hashingSketchSql: String =
    s"""WITH ${valsCte(Seq("nation", "region", "supplier"), None)},
       |toks AS (
       |  SELECT t, ci, unnest(string_split_regex(v, '\\s+')) AS tok
       |  FROM vals WHERE v IS NOT NULL),
       |b AS (
       |  SELECT t, ci, bucket, count(*) AS cnt FROM (
       |    SELECT t, ci, CAST((md5_number_lower(tok) & 4294967295) % 1024 AS BIGINT) AS bucket
       |    FROM toks WHERE tok <> '')
       |  GROUP BY t, ci, bucket)
       |SELECT t AS table_name, CAST(ci AS BIGINT) AS col_idx,
       |  string_agg(bucket || ':' || cnt, ' ' ORDER BY bucket) AS hv_str
       |FROM b GROUP BY t, ci ORDER BY table_name, col_idx""".stripMargin

  /** st_stream_profile: the streamed profile of `nation` must equal the
    * batch profile over the same rows (lossless sketch merge), so its
    * oracle is just the batch computation. */
  private def streamProfileSql: String = {
    val selects = lakeSchemas("nation").map { case (c, lt) =>
      val render =
        if (lt == "string") s"nullif(CAST($c AS VARCHAR), '')"
        else s"CAST($c AS VARCHAR)"
      s"SELECT '$c' AS cn, $render AS v FROM nation"
    }
    s"""WITH $permsCte,
       |vals AS (
       |  ${selects.mkString("\n  UNION ALL ")}
       |),
       |stats AS (
       |  SELECT cn, count(*) AS n_rows, count(*) - count(v) AS n_nulls
       |  FROM vals GROUP BY cn),
       |dvals AS (SELECT DISTINCT cn, v FROM vals WHERE v IS NOT NULL),
       |mins AS (SELECT cn, pi, ${mhSlotMin("v")} AS mh
       |         FROM dvals CROSS JOIN perms GROUP BY cn, pi),
       |dig AS (SELECT cn, array_to_string(list(mh ORDER BY pi), ',') AS digest
       |        FROM mins GROUP BY cn)
       |SELECT cn AS col_name, stats.n_rows, stats.n_nulls, dig.digest
       |FROM stats JOIN dig USING (cn) ORDER BY col_name""".stripMargin
  }

  /** mm_media_stats: binary-column probe over the documents-derived media
    * relation (payload = UTF-8 text bytes; DuckDB md5/hex hash the same
    * bytes). */
  private def mediaStatsSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  substr(hex(text), 1, 8) AS magic
      |FROM documents ORDER BY media_id""".stripMargin

  private val lineitemNumeric = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  // exact decimal-sum mean/std (order-independent; mirrors Profiler sums)
  private def meanSql(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count($c)"
  private def stdSql(c: String) =
    s"""sqrt(greatest(CAST(SUM(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count($c)
       | - (${meanSql(c)}) * (${meanSql(c)}), 0))""".stripMargin.replace("\n", "")

  private def profileStatsSql: String =
    lineitemNumeric.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS num_nan,
         |  count(DISTINCT $c) + CASE WHEN count(*) > count($c) THEN 1 ELSE 0 END AS n_unique,
         |  ${meanSql(c)} AS mean_r, round(${stdSql(c)}, 6) AS std_r,
         |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  private def quantileSql: String =
    lineitemNumeric.map { c =>
      val qs = (1 to 9).map(i => s"round(quantile_cont($c, 0.${i}), 6) AS q$i").mkString(", ")
      s"""SELECT '$c' AS col_name, $qs,
         |  ${meanSql(c)} AS mean_q,
         |  CASE WHEN count(DISTINCT $c) + CASE WHEN count(*) > count($c) THEN 1 ELSE 0 END > 2
         |       THEN round(${stdSql(c)}, 6) ELSE 0.0 END AS std_q,
         |  CAST(min($c) AS DOUBLE) AS min_q, CAST(max($c) AS DOUBLE) AS max_q
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  private def jaccardPairSql(label: String, ta: String, ca: String, tb: String, cb: String): String =
    s"""SELECT '$label' AS pair,
       |  round(n_i / (n_a + n_b - n_i), 6) AS jaccard,
       |  round(n_i / n_a, 6) AS containment
       |FROM (SELECT
       |  (SELECT count(*) FROM (SELECT DISTINCT CAST($ca AS VARCHAR) AS v FROM $ta WHERE $ca IS NOT NULL)) AS n_a,
       |  (SELECT count(*) FROM (SELECT DISTINCT CAST($cb AS VARCHAR) AS v FROM $tb WHERE $cb IS NOT NULL)) AS n_b,
       |  (SELECT count(*) FROM
       |     (SELECT DISTINCT CAST($ca AS VARCHAR) AS v FROM $ta WHERE $ca IS NOT NULL) x
       |     JOIN (SELECT DISTINCT CAST($cb AS VARCHAR) AS v FROM $tb WHERE $cb IS NOT NULL) y USING (v)) AS n_i)""".stripMargin

  /** (table, columns) schema of the relational lake for the exact search. */
  private val searchSchemas: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "region" -> Seq("r_regionkey", "r_name"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))

  private def searchExactSql: String = {
    val cv = searchSchemas.flatMap { case (tbl, cols) =>
      cols.zipWithIndex.map { case (c, i) =>
        s"SELECT DISTINCT '$tbl' AS t, $i AS ci, CAST($c AS VARCHAR) AS v FROM $tbl"
      }
    }.mkString("\n    UNION ALL ")
    s"""WITH cv AS (
       |  SELECT t, ci, v, count(*) OVER (PARTITION BY t, ci) AS n FROM (
       |    $cv
       |  ) WHERE v IS NOT NULL AND v <> ''
       |), q AS (
       |  SELECT ci AS q_ci, v, n AS n_q FROM cv WHERE t = 'supplier'
       |), c AS (
       |  SELECT t, ci, v, n AS n_c FROM cv WHERE t <> 'supplier'
       |), inter AS (
       |  SELECT q.q_ci, c.t, c.ci, q.n_q, c.n_c, count(*) AS ni
       |  FROM c JOIN q USING (v) GROUP BY 1, 2, 3, 4, 5
       |), dists AS (
       |  SELECT i.q_ci, i.t AS cand_table, i.ci AS cand_ci,
       |         1.0 - CAST(i.ni AS DOUBLE) / (i.n_q + i.n_c - i.ni) AS dist
       |  FROM inter i
       |), knn AS (
       |  SELECT * FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY q_ci ORDER BY dist, cand_table, cand_ci) <= 30
       |), knn_r AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_ci ORDER BY dist, cand_table, cand_ci) AS rnk FROM knn
       |), firstm AS (
       |  SELECT * FROM knn_r
       |  QUALIFY row_number() OVER (PARTITION BY q_ci, cand_table ORDER BY rnk) = 1
       |), dedup AS (
       |  SELECT * FROM firstm
       |  QUALIFY row_number() OVER (PARTITION BY cand_table, cand_ci ORDER BY dist, rnk) = 1
       |)
       |SELECT cand_table, count(*) AS matched_cols, round(sum(dist), 6) AS sum_dist
       |FROM dedup GROUP BY cand_table
       |ORDER BY matched_cols DESC, sum_dist, cand_table
       |LIMIT 10""".stripMargin
  }

  private val stopList = "'the','a','an','of','to','and','in','is','it','on','for','with','as','at','by','or','be','this','that'"

  /** e_change_history: SCD2-style interval compression — per-user runs
    * of equal event_type, versioned in time order, effective-dated. */
  private def changeHistorySql: String =
    """WITH o AS (SELECT user_id, event_type, ts, event_id,
      |  CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |            IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM events),
      |r AS (SELECT user_id, event_type, ts,
      |  sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS version
      |  FROM o),
      |g AS (SELECT user_id, version, min(event_type) AS event_type,
      |  min(ts) AS eff_from, count(*) AS n_events
      |  FROM r GROUP BY 1, 2)
      |SELECT user_id, CAST(version AS BIGINT) AS version, event_type, eff_from,
      |  lead(eff_from) OVER (PARTITION BY user_id ORDER BY version) AS eff_to,
      |  n_events
      |FROM g ORDER BY user_id, version""".stripMargin

  /** t_vocab_coverage: per-language OOV rate vs the corpus' top-10
    * tokens (freq desc, token asc tie-break — same vocab cut). */
  private def vocabCoverageSql: String =
    """WITH toks AS (SELECT lang, t AS tok FROM (
      |    SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      |    FROM documents) WHERE t <> ''),
      |vocab AS (SELECT tok FROM (
      |  SELECT tok, count(*) AS c FROM toks GROUP BY 1
      |  ORDER BY c DESC, tok LIMIT 10)),
      |f AS (SELECT lang,
      |  CASE WHEN tok IN (SELECT tok FROM vocab) THEN 0 ELSE 1 END AS oov
      |  FROM toks)
      |SELECT lang, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
      |  round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  /** a_key_skew: top-15 l_suppkey frequencies with corpus share —
    * mirror of Skew.keySkewProfile's one-agg + broadcast-total plan. */
  private def keySkewSql: String =
    """WITH g AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM g)
      |SELECT g.l_suppkey, g.n, round(CAST(g.n AS DOUBLE) / t.tot, 6) AS share
      |FROM g, t ORDER BY g.n DESC, g.l_suppkey LIMIT 15""".stripMargin

  /** st_stream_sessions: batch replay of gap-based sessionization at
    * MICROSECOND precision (a gap >= 30 min opens a new session —
    * `session_window`'s strict-overlap merge rule), checksummed on
    * session starts so every boundary is pinned. */
  private def streamSessionsSql: String =
    """WITH o AS (SELECT user_id, ts, event_id,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |f AS (SELECT user_id, ts, event_id,
      |  CASE WHEN prev_ts IS NULL
      |       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM o),
      |r AS (SELECT user_id, ts,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM f),
      |g AS (SELECT user_id, sess, min(ts) AS session_start, count(*) AS n
      |  FROM r GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
      |  CAST(max(n) AS BIGINT) AS max_session_events,
      |  CAST(sum(epoch_us(session_start)) AS BIGINT) AS start_checksum
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ann_mmr_rerank: the greedy MMR selection UNROLLED per rank (k=5,
    * λ=0.7, top-20 cosine candidates for queries 0..2). Each step:
    * anti-join out the selected, max-sim against the selected set,
    * argmax of the EXACT INTEGER score `7·rel_u − 3·ms_u` in 10⁻⁷ units
    * with id tie-break — the arithmetic `Mmr.rerank` runs inside each
    * group. Integer units because a double `0.7·rel − 0.3·ms` over 6-dp
    * inputs lands on a 7th-decimal HALF for every candidate, exactly
    * where Spark's decimal HALF_UP and DuckDB's binary-nearest round
    * disagree; micro-quantizing the round-6 cosines (×1e6 is within
    * ~1e-4 of an integer, so both engines agree) removes the boundary. */
  private def mmrRerankSql: String = {
    def step(i: Int): String = {
      val p = i - 1
      s"""rem$p AS (SELECT c.* FROM cand c ANTI JOIN sel$p s ON s.qid = c.qid AND s.cid = c.cid),
         |ms$p AS (SELECT r.qid, r.cid, r.rel, max(s.s_u) AS ms_u
         |  FROM rem$p r JOIN sim s ON s.qid = r.qid AND s.ia = r.cid
         |  JOIN sel$p t ON t.qid = s.qid AND t.cid = s.ib
         |  GROUP BY 1, 2, 3),
         |p$i AS (SELECT qid, cid, m.rel, 7 * cand.rel_u - 3 * m.ms_u AS mmr_u
         |  FROM ms$p m JOIN cand USING (qid, cid)
         |  QUALIFY row_number() OVER (PARTITION BY qid
         |    ORDER BY 7 * cand.rel_u - 3 * m.ms_u DESC, cid) = 1),
         |sel$i AS (SELECT qid, cid FROM sel$p UNION ALL SELECT qid, cid FROM p$i),""".stripMargin
    }
    val steps = (2 to 5).map(step).mkString("\n")
    val unions = (1 to 5).map(i =>
      s"SELECT qid AS query_id, CAST($i AS BIGINT) AS rank, cid AS vec_id, rel, CAST(mmr_u AS DOUBLE) / 10000000.0 AS mmr FROM p$i")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id <= 2),
       |cand AS (SELECT qid, cid, rel, CAST(round(rel * 1000000, 0) AS BIGINT) AS rel_u, cv, cn FROM (
       |  SELECT qid, cid, rel, cv, cn FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |      CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
       |           ELSE round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) END AS rel,
       |      c.v AS cv, c.nrm AS cn
       |    FROM q JOIN e c ON q.vec_id <> c.vec_id)
       |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) <= 20)),
       |sim AS (SELECT qid, ia, ib, CAST(round(s * 1000000, 0) AS BIGINT) AS s_u FROM (
       |  SELECT a.qid, a.cid AS ia, b.cid AS ib,
       |    CASE WHEN a.cn * b.cn = 0 THEN 0.0
       |         ELSE round(list_dot_product(a.cv, b.cv) / (a.cn * b.cn), 6) END AS s
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid)),
       |p1 AS (SELECT qid, cid, rel, 7 * rel_u AS mmr_u FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY qid
       |    ORDER BY 7 * rel_u DESC, cid) = 1),
       |sel1 AS (SELECT qid, cid FROM p1),
       |$steps
       |final AS ($unions)
       |SELECT query_id, rank, vec_id, rel, mmr FROM final
       |ORDER BY query_id, rank""".stripMargin
  }

  /** t_heavy_hitters: the exact >1%-of-rows suppliers — what the
    * MG-candidate + exact-count two-pass must reproduce verbatim. */
  private def heavyHittersSql: String =
    """WITH t AS (SELECT count(*) AS n FROM lineitem),
      |g AS (SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS n
      |      FROM lineitem GROUP BY 1)
      |SELECT g.key, g.n, round(CAST(g.n AS DOUBLE) / t.n, 6) AS share
      |FROM g, t WHERE g.n * 100 > t.n * 1
      |ORDER BY g.n DESC, g.key""".stripMargin

  /** a_woe_iv: WOE/IV of o_totalprice (10 fixed-width cent buckets) vs
    * the F-status label — integer-exact buckets and ln arguments,
    * micro-summed IV total. */
  private def woeIvSql: String =
    """WITH base AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad FROM orders),
      |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM base),
      |bk AS (SELECT least(9, CAST(floor((c - lo) * 10 / (hi - lo + 1)) AS BIGINT)) AS bucket, bad
      |  FROM base, bounds),
      |g AS (SELECT bucket, CAST(sum(1 - bad) AS BIGINT) AS n_good,
      |    CAST(sum(bad) AS BIGINT) AS n_bad FROM bk GROUP BY 1),
      |tt AS (SELECT CAST(sum(n_good) AS BIGINT) AS gt, CAST(sum(n_bad) AS BIGINT) AS bt FROM g),
      |s AS (SELECT bucket, n_good, n_bad,
      |  round(ln(CAST((n_good + 1) * (bt + 10) AS DOUBLE)
      |         / CAST((n_bad + 1) * (gt + 10) AS DOUBLE)), 6) AS woe
      |  FROM g, tt),
      |s2 AS (SELECT bucket, n_good, n_bad, woe,
      |  round((CAST(n_good + 1 AS DOUBLE) / (gt + 10)
      |       - CAST(n_bad + 1 AS DOUBLE) / (bt + 10)) * woe, 6) AS iv_contrib
      |  FROM s, tt),
      |u AS (SELECT *, CAST(round(iv_contrib * 1000000, 0) AS BIGINT) AS ivu FROM s2),
      |tot AS (SELECT CAST(sum(ivu) AS BIGINT) AS ivt FROM u)
      |SELECT bucket, n_good, n_bad, woe, iv_contrib,
      |  CAST(tot.ivt AS DOUBLE) / 1000000.0 AS iv_total
      |FROM u, tot ORDER BY bucket""".stripMargin

  /** a_chi2_assoc: Pearson chi-square of lang × source — integer
    * (o·n − r·c) deviations, round-6 per-cell contributions, micro-sum
    * total, Cramér's V. */
  private def chi2AssocSql: String =
    """WITH p AS (SELECT CAST(lang AS VARCHAR) AS a, CAST(source AS VARCHAR) AS b FROM documents),
      |cells AS (SELECT a, b, count(*) AS observed FROM p GROUP BY 1, 2),
      |ra AS (SELECT a, CAST(sum(observed) AS BIGINT) AS rtot FROM cells GROUP BY 1),
      |cb AS (SELECT b, CAST(sum(observed) AS BIGINT) AS ctot FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n,
      |    count(DISTINCT a) AS nr, count(DISTINCT b) AS nc FROM cells),
      |grid AS (SELECT ra.a, cb.b, coalesce(c.observed, 0) AS observed, ra.rtot, cb.ctot
      |  FROM ra CROSS JOIN cb LEFT JOIN cells c ON c.a = ra.a AND c.b = cb.b),
      |sc AS (SELECT g.a, g.b, g.observed,
      |    round(CAST(g.observed * t.n - g.rtot * g.ctot AS DOUBLE)
      |        * CAST(g.observed * t.n - g.rtot * g.ctot AS DOUBLE)
      |        / CAST(t.n * g.rtot * g.ctot AS DOUBLE), 6) AS contrib,
      |    t.n, t.nr, t.nc
      |  FROM grid g CROSS JOIN tot t),
      |u AS (SELECT *, CAST(round(contrib * 1000000, 0) AS BIGINT) AS cu FROM sc),
      |agg AS (SELECT CAST(sum(cu) AS BIGINT) AS chi2u, first(n) AS n,
      |    first(nr) AS nr, first(nc) AS nc FROM u)
      |SELECT u.a, u.b, u.observed, u.contrib,
      |  CAST(agg.chi2u AS DOUBLE) / 1000000.0 AS chi2,
      |  CAST((agg.nr - 1) * (agg.nc - 1) AS BIGINT) AS dof,
      |  CASE WHEN least(agg.nr, agg.nc) = 1 THEN 0.0
      |       ELSE round(sqrt(CAST(agg.chi2u AS DOUBLE) / 1000000.0
      |            / CAST(agg.n * least(agg.nr - 1, agg.nc - 1) AS DOUBLE)), 6) END AS cramers_v,
      |  agg.n AS n
      |FROM u, agg ORDER BY u.a, u.b""".stripMargin

  /** e_trend_mk: Mann–Kendall S and τ per event_type over daily counts
    * — exact integer pairwise sign sum. */
  private def trendMkSql: String =
    """WITH daily AS (SELECT event_type AS key,
      |    CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |pr AS (SELECT a.key, sign(b.x - a.x) AS sg
      |  FROM daily a JOIN daily b ON a.key = b.key AND a.d < b.d),
      |nd AS (SELECT key, count(*) AS n_days FROM daily GROUP BY 1),
      |st AS (SELECT key, CAST(sum(sg) AS BIGINT) AS s_stat FROM pr GROUP BY 1)
      |SELECT st.key, nd.n_days, st.s_stat,
      |  round(CAST(st.s_stat AS DOUBLE)
      |      / CAST(nd.n_days * (nd.n_days - 1) / 2 AS DOUBLE), 6) AS tau
      |FROM st JOIN nd USING (key) ORDER BY key""".stripMargin

  /** e_acf: lag-k autocorrelation over daily counts — exact integer
    * (n·x − S) deviation products, one final division per (key, lag). */
  private def acfSql: String =
    """WITH daily AS (SELECT event_type AS key,
      |    CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT key, count(*) AS n, CAST(sum(x) AS BIGINT) AS s, min(d) AS d0
      |  FROM daily GROUP BY 1),
      |dev AS (SELECT daily.key, date_diff('day', st.d0, daily.d) AS t,
      |    CAST(st.n * daily.x - st.s AS BIGINT) AS dv, st.n AS n_days
      |  FROM daily JOIN st USING (key)),
      |den AS (SELECT key, CAST(sum(dv * dv) AS BIGINT) AS den,
      |    first(n_days) AS n_days FROM dev GROUP BY 1),
      |lg AS (SELECT * FROM (VALUES (1), (2), (3)) l(lag)),
      |num AS (SELECT a.key, l.lag, CAST(sum(a.dv * b.dv) AS BIGINT) AS num
      |  FROM dev a CROSS JOIN lg l
      |  JOIN dev b ON b.key = a.key AND b.t = a.t + l.lag
      |  GROUP BY 1, 2)
      |SELECT num.key, CAST(num.lag AS BIGINT) AS lag, den.n_days,
      |  CASE WHEN den.den = 0 THEN 0.0
      |       ELSE round(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) END AS acf
      |FROM num JOIN den USING (key) ORDER BY key, lag""".stripMargin

  /** e_theil_sen: median pairwise day-slope per key — the two central
    * sorted positions averaged, 6 dp; n_days recovered from the exact
    * pair-count inversion. */
  private def theilSenSql: String =
    """WITH daily AS (SELECT event_type AS key,
      |    CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT a.key,
      |    CAST(b.x - a.x AS DOUBLE) / date_diff('day', a.d, b.d) AS slope
      |  FROM daily a JOIN daily b ON a.key = b.key AND a.d < b.d),
      |r AS (SELECT key, slope,
      |    row_number() OVER (PARTITION BY key ORDER BY slope) AS rn,
      |    count(*) OVER (PARTITION BY key) AS m FROM p),
      |sel AS (SELECT key, slope, m FROM r
      |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1),
      |ag AS (SELECT key, round(avg(slope), 6) AS slope,
      |    CAST(first(m) AS BIGINT) AS n_pairs FROM sel GROUP BY 1)
      |SELECT key,
      |  CAST((1 + sqrt(1 + 8 * CAST(n_pairs AS DOUBLE))) / 2 AS BIGINT) AS n_days,
      |  n_pairs, slope
      |FROM ag ORDER BY key""".stripMargin

  /** a_benford: first-digit shares of integer-cent amounts vs
    * log10(1 + 1/d), MAD in exact micro space. Digits come from the
    * decimal STRING — no float log10 at power-of-ten boundaries. */
  private def benfordSql: String =
    """WITH base AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |cnt AS (SELECT CASE WHEN c > 0
      |      THEN CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) END AS digit,
      |    count(*) AS n
      |  FROM base GROUP BY 1),
      |tot AS (SELECT
      |    CAST(sum(CASE WHEN digit IS NOT NULL THEN n ELSE 0 END) AS BIGINT) AS np,
      |    CAST(sum(CASE WHEN digit IS NULL THEN n ELSE 0 END) AS BIGINT) AS nn
      |  FROM cnt),
      |digits AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(digit)),
      |sc AS (SELECT CAST(d.digit AS BIGINT) AS digit,
      |    CAST(coalesce(c.n, 0) AS BIGINT) AS n, tot.np, tot.nn,
      |    round(CAST(coalesce(c.n, 0) AS DOUBLE) / tot.np, 6) AS share,
      |    round(log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / d.digit), 6) AS expected
      |  FROM digits d LEFT JOIN cnt c ON c.digit = d.digit CROSS JOIN tot),
      |u AS (SELECT *, abs(CAST(round(share * 1000000, 0) AS BIGINT)
      |    - CAST(round(expected * 1000000, 0) AS BIGINT)) AS du FROM sc),
      |m AS (SELECT CAST(sum(du) AS BIGINT) AS madu FROM u)
      |SELECT u.digit, u.n, u.share, u.expected,
      |  round(CAST(m.madu AS DOUBLE) / 9000000.0, 6) AS mad,
      |  u.np AS n_pos, u.nn AS n_nonpos
      |FROM u, m ORDER BY u.digit""".stripMargin

  /** w_triangles: exact triangle census of the synthetic link graph —
    * canonical u<v edges, wedges around the middle vertex, EXISTS-closed
    * (a,c); wedge total from Σd(d−1)/2 in integer space. */
  private def trianglesSql: String =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
      |       UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
      |und AS (SELECT DISTINCT least(CAST(src AS BIGINT), CAST(dst AS BIGINT)) AS u,
      |        greatest(CAST(src AS BIGINT), CAST(dst AS BIGINT)) AS v
      |        FROM e0 WHERE src <> dst),
      |w AS (SELECT a.u AS a, a.v AS b, b2.v AS c FROM und a JOIN und b2 ON b2.u = a.v),
      |tri AS (SELECT count(*) AS n_triangles FROM w
      |        WHERE EXISTS (SELECT 1 FROM und x WHERE x.u = w.a AND x.v = w.c)),
      |deg AS (SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY 1),
      |ds AS (SELECT count(*) AS n_nodes,
      |    CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
      |ec AS (SELECT count(*) AS n_edges FROM und)
      |SELECT ds.n_nodes, ec.n_edges, tri.n_triangles, ds.n_wedges,
      |  CASE WHEN ds.n_wedges = 0 THEN 0.0
      |       ELSE round(CAST(3 AS DOUBLE) * tri.n_triangles / ds.n_wedges, 6) END AS clustering
      |FROM ds, ec, tri""".stripMargin

  /** e_changepoint: argmax of the between-segment variance gain over
    * every split of the daily series — integer prefix-sum deviations,
    * one round-6 division, earlier-day tie-break. */
  private def changepointSql: String =
    """WITH daily AS (SELECT event_type AS key,
      |    CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT key, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
      |  FROM daily GROUP BY 1),
      |pre AS (SELECT key, d,
      |    CAST(row_number() OVER (PARTITION BY key ORDER BY d) AS BIGINT) AS p,
      |    CAST(sum(x) OVER (PARTITION BY key ORDER BY d
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lsum
      |  FROM daily),
      |sc AS (SELECT pre.key, pre.d, pre.p, pre.lsum, st.n, st.s,
      |    round(CAST(pre.lsum * st.n - pre.p * st.s AS DOUBLE)
      |        * CAST(pre.lsum * st.n - pre.p * st.s AS DOUBLE)
      |        / CAST(st.n * pre.p * (st.n - pre.p) AS DOUBLE), 6) AS gain
      |  FROM pre JOIN st USING (key) WHERE pre.p < st.n),
      |best AS (SELECT * FROM sc
      |  QUALIFY row_number() OVER (PARTITION BY key ORDER BY gain DESC, p) = 1)
      |SELECT key, n AS n_days, d AS cp_day, gain,
      |  round(CAST(lsum AS DOUBLE) / p, 6) AS mean_left,
      |  round(CAST(s - lsum AS DOUBLE) / (n - p), 6) AS mean_right
      |FROM best ORDER BY key""".stripMargin

  /** d_kfold: deterministic md5-mod-k fold assignment, pinned by the
    * per-(fold, lang) id checksum. */
  private def kFoldSql: String =
    """SELECT CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':fold0')
      |    & 4294967295) % 5 AS BIGINT) AS fold,
      |  lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum
      |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin

  /** e_transitions: corpus-wide event-type Markov transitions — one
    * lead window per user, row-normalized probabilities. */
  private def transitionsSql: String =
    """WITH p AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |rt AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS rt FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  round(CAST(c.n AS DOUBLE) / rt.rt, 6) AS p
      |FROM c JOIN rt USING (from_type) ORDER BY from_type, to_type""".stripMargin

  /** e_ab_test: pooled-variance two-proportion z over user-level
    * conversion, variants by user-id parity. */
  private def abTestSql: String =
    """WITH pu AS (SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY 1),
      |arms AS (SELECT user_id % 2 AS variant, count(*) AS n,
      |    CAST(sum(converted) AS BIGINT) AS conv FROM pu GROUP BY 1),
      |a AS (SELECT n AS n_a, conv AS conv_a FROM arms WHERE variant = 0),
      |b AS (SELECT n AS n_b, conv AS conv_b FROM arms WHERE variant = 1),
      |k AS (SELECT *, CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp
      |  FROM a, b)
      |SELECT n_a, n_b, conv_a, conv_b,
      |  round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
      |  round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
      |  round(round(CAST(conv_b AS DOUBLE) / n_b, 6)
      |      - round(CAST(conv_a AS DOUBLE) / n_a, 6), 6) AS lift,
      |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0.0
      |       ELSE round((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
      |         / sqrt(pp * (CAST(1 AS DOUBLE) - pp)
      |              * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6) END AS z
      |FROM k""".stripMargin

  /** j3_rank_corr: Spearman ρ between supplier revenue and volume
    * rankings — id-tie-broken total orders, exact integer Σd². */
  private def rankCorrSql: String =
    """WITH g AS (SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue,
      |    count(*) AS volume
      |  FROM lineitem GROUP BY 1),
      |r AS (SELECT l_suppkey,
      |    CAST(row_number() OVER (ORDER BY revenue DESC, l_suppkey) AS BIGINT) AS ra,
      |    CAST(row_number() OVER (ORDER BY volume DESC, l_suppkey) AS BIGINT) AS rb
      |  FROM g)
      |SELECT count(*) AS n_items,
      |  CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2,
      |  CASE WHEN count(*) < 2 THEN 0.0
      |       ELSE round(CAST(1 AS DOUBLE)
      |         - CAST(6 AS DOUBLE) * CAST(sum((ra - rb) * (ra - rb)) AS DOUBLE)
      |           / CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE), 6) END AS rho
      |FROM r""".stripMargin

  /** st_stream_enrich: the batch replay of the stream-static dimension
    * join + per-segment decimal rollup. */
  private def streamEnrichSql: String =
    """SELECT c.c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS amount
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** st_stream_attrib: batch replay of the click→purchase interval
    * join — per-user pair counts and both id checksums pin the exact
    * matched set. */
  private def streamAttribSql: String =
    """WITH t AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT t.user_id, count(*) AS n_pairs,
      |  CAST(sum(t.event_id) AS BIGINT) AS trig_checksum,
      |  CAST(sum(c.event_id) AS BIGINT) AS conv_checksum
      |FROM t JOIN c ON t.user_id = c.user_id AND t.ts <= c.ts
      |  AND t.ts >= c.ts - INTERVAL 1 HOUR
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** e_time_to_convert: exact-microsecond latency order statistics —
    * median as the mean of the two central ranks, p90 at ⌈9n/10⌉. */
  private def timeToConvertSql: String =
    """WITH f AS (SELECT user_id AS uid, min(ts) AS t0 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |l AS (SELECT e.user_id AS uid, f.t0, min(e.ts) AS t1
      |  FROM events e JOIN f ON f.uid = e.user_id AND e.ts > f.t0
      |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
      |lat AS (SELECT uid, epoch_us(t1) - epoch_us(t0) AS lat_us FROM l),
      |r AS (SELECT uid, lat_us,
      |    CAST(row_number() OVER (ORDER BY lat_us, uid) AS BIGINT) AS rn,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM lat)
      |SELECT max(m) AS n_users, min(lat_us) AS min_us, max(lat_us) AS max_us,
      |  avg(CASE WHEN rn = (m + 1) // 2 OR rn = m // 2 + 1
      |      THEN lat_us END) AS median_us,
      |  max(CASE WHEN rn = (m * 9 + 9) // 10 THEN lat_us END) AS p90_us
      |FROM r""".stripMargin

  /** a_ks_test: two-sample KS over integer-cent values — exact integer
    * ECDF cross-products, one final division, min-value tie-break. */
  private def ksTestSql: String =
    """WITH av AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c FROM events
      |  WHERE event_type = 'purchase' AND value IS NOT NULL),
      |bv AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c FROM events
      |  WHERE event_type = 'view' AND value IS NOT NULL),
      |m AS (SELECT c, CAST(sum(na) AS BIGINT) AS na, CAST(sum(nb) AS BIGINT) AS nb
      |  FROM (SELECT c, 1 AS na, 0 AS nb FROM av
      |        UNION ALL SELECT c, 0, 1 FROM bv) GROUP BY 1),
      |cum AS (SELECT c,
      |    CAST(sum(na) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
      |    CAST(sum(nb) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
      |  FROM m),
      |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b FROM m)
      |SELECT tot.n_a, tot.n_b,
      |  round(CAST(abs(cum_a * tot.n_b - cum_b * tot.n_a) AS DOUBLE)
      |      / CAST(tot.n_a * tot.n_b AS DOUBLE), 6) AS d_stat,
      |  c AS at_cents
      |FROM cum, tot
      |ORDER BY abs(cum_a * tot.n_b - cum_b * tot.n_a) DESC, c LIMIT 1""".stripMargin

  /** x_grouping_sets: explicit multi-granularity aggregate with
    * per-column grouping flags. */
  private def groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** j_revenue_share: per-nation decimal revenue with double-space
    * shares against the broadcast total. */
  private def revenueShareSql: String =
    """WITH rev AS (SELECT n_name,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1),
      |tot AS (SELECT sum(revenue) AS t FROM rev)
      |SELECT n_name, CAST(revenue AS DOUBLE) AS revenue,
      |  round(CAST(revenue AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS share
      |FROM rev, tot ORDER BY n_name""".stripMargin

  /** w_components: component-size histogram of the functional link
    * graph, recomputed by recursive transitive closure. */
  private def componentsSql: String =
    """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
      |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst
      |       FROM documents, nn),
      |ed AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
      |       FROM e0 WHERE src <> dst),
      |edges AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |labels AS (SELECT src AS id, least(src, min(dst)) AS cluster
      |           FROM reach GROUP BY src),
      |cs AS (SELECT cluster, count(*) AS size FROM labels GROUP BY 1)
      |SELECT size, count(*) AS n_components FROM cs
      |GROUP BY 1 ORDER BY size""".stripMargin

  /** w_hits: two unrolled integer-ppm HITS iterations — sum along
    * edges, exact `//` rescale to max 10⁶ per half-step. */
  private def hitsSql: String = {
    def half(scoreRel: String, scoreCol: String, joinOn: String,
             groupAs: String, rawOut: String, out: String, outCol: String): String =
      s"""${rawOut}_r AS (SELECT e.$groupAs AS node, CAST(sum(s.$scoreCol) AS BIGINT) AS raw
         |  FROM edges e JOIN $scoreRel s ON s.node = e.$joinOn GROUP BY 1),
         |${rawOut}_a AS (SELECT nd.node, coalesce(r.raw, 0) AS raw
         |  FROM nodes nd LEFT JOIN ${rawOut}_r r ON r.node = nd.node),
         |${rawOut}_m AS (SELECT max(raw) AS m FROM ${rawOut}_a),
         |$out AS (SELECT a.node,
         |    CAST(CASE WHEN m.m = 0 THEN 0 ELSE (a.raw * 1000000) // m.m END AS BIGINT) AS $outCol
         |  FROM ${rawOut}_a a, ${rawOut}_m m)""".stripMargin
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id * 7 + 3) % (SELECT c FROM nn) AS dst FROM documents
       |  UNION
       |  SELECT doc_id, doc_id % 31 FROM documents),
       |edges AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
       |          FROM e0 WHERE src <> dst),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |${half("h0", "h", "src", "dst", "a1", "auth1", "a")},
       |${half("auth1", "a", "dst", "src", "h1", "hub1", "h")},
       |${half("hub1", "h", "src", "dst", "a2", "auth2", "a")},
       |${half("auth2", "a", "dst", "src", "h2", "hub2", "h")}
       |SELECT a.node, a.a AS auth_ppm, h.h AS hub_ppm
       |FROM auth2 a JOIN hub2 h ON h.node = a.node
       |ORDER BY auth_ppm DESC, a.node LIMIT 20""".stripMargin
  }

  /** a_eqfreq_bins: replay the HDR quantization + decile-bucket cuts,
    * then bin every row by integer bucket comparison. */
  private def eqfreqBinsSql: String =
    """WITH qv AS (SELECT least(greatest(CAST(floor(CAST(o_totalprice AS DOUBLE) * 1e6) AS BIGINT),
      |    -4611686018427387904), 4611686018427387904) AS q
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |bi AS (SELECT q, abs(q) AS a, length(bin(abs(q))) - 1 AS e FROM qv),
      |bk AS (SELECT (CASE WHEN q < 0 THEN -1 ELSE 1 END) *
      |    (CASE WHEN a < 32 THEN a
      |          ELSE (CAST(e AS BIGINT) - 4) * 32 + (a >> (e - 5)) - 32 END) AS bucket
      |  FROM bi),
      |counts AS (SELECT bucket, count(*) AS cnt FROM bk GROUP BY 1),
      |cum AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum,
      |    sum(cnt) OVER () AS n FROM counts),
      |dk AS (SELECT bucket FROM cum CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
      |  WHERE cum >= greatest((n * k + 9) // 10, 1)
      |    AND cum - cnt < greatest((n * k + 9) // 10, 1)),
      |binned AS (SELECT (SELECT count(*) FROM dk c WHERE b.bucket > c.bucket) AS bin
      |  FROM bk b),
      |g AS (SELECT bin, count(*) AS n_rows FROM binned GROUP BY 1),
      |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n FROM g)
      |SELECT CAST(g.bin AS BIGINT) AS bin, g.n_rows,
      |  round(CAST(g.n_rows AS DOUBLE) / t.n, 6) AS share
      |FROM g, t ORDER BY bin""".stripMargin

  /** a_join_estimate: the uniform-key join-size estimate vs exact. */
  private def joinEstimateSql: String =
    """WITH a AS (SELECT count(*) AS n_a, count(DISTINCT l_orderkey) AS d_a FROM lineitem),
      |b AS (SELECT count(*) AS n_b, count(DISTINCT o_orderkey) AS d_b FROM orders),
      |e AS (SELECT count(*) AS exact_rows FROM lineitem
      |      JOIN orders ON l_orderkey = o_orderkey)
      |SELECT n_a, n_b, d_a, d_b,
      |  CAST((n_a * n_b) // greatest(d_a, d_b) AS BIGINT) AS est_rows,
      |  exact_rows,
      |  round(CAST(abs(CAST((n_a * n_b) // greatest(d_a, d_b) AS BIGINT)
      |      - exact_rows) AS DOUBLE) / exact_rows, 6) AS rel_err
      |FROM a, b, e""".stripMargin

  /** d_lsh_quality: banded-MinHash predictions (digest replay) vs
    * all-pairs exact-Jaccard truth on the SAME ≤200-doc sample and
    * shingles — precision/recall/F1 in exact integer counts. */
  private def lshQualitySql: String = {
    val dig = docDigCtes.replace("FROM documents)",
      "FROM documents WHERE doc_id < 200)")
    s"""WITH $dig,
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${digCompare("a", "b")}
       |  FROM dig a JOIN dig b ON a.doc_id < b.doc_id),
       |pred AS (SELECT id_a, id_b FROM pairs WHERE nb > 0 AND jaccard >= 0.05),
       |toks2 AS (SELECT DISTINCT doc_id AS id, unnest(sh) AS tok FROM g),
       |sizes2 AS (SELECT id, count(*) AS sz FROM toks2 GROUP BY 1),
       |inter2 AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
       |  FROM toks2 a JOIN toks2 b ON a.tok = b.tok AND a.id < b.id
       |  GROUP BY 1, 2),
       |truth AS (SELECT i.id_a, i.id_b FROM inter2 i
       |  JOIN sizes2 sa ON sa.id = i.id_a JOIN sizes2 sb ON sb.id = i.id_b
       |  WHERE round(CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE), 6) >= 0.05),
       |hit AS (SELECT id_a, id_b FROM pred INTERSECT SELECT id_a, id_b FROM truth),
       |c AS (SELECT (SELECT count(*) FROM pred) AS n_pred,
       |             (SELECT count(*) FROM truth) AS n_true,
       |             (SELECT count(*) FROM hit) AS n_hit)
       |SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_true AS BIGINT) AS n_true,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  CASE WHEN n_pred = 0 THEN 0.0
       |       ELSE round(CAST(n_hit AS DOUBLE) / n_pred, 6) END AS prec,
       |  CASE WHEN n_true = 0 THEN 0.0
       |       ELSE round(CAST(n_hit AS DOUBLE) / n_true, 6) END AS recall,
       |  CASE WHEN n_pred + n_true = 0 THEN 0.0
       |       ELSE round(CAST(2 AS DOUBLE) * n_hit / (n_pred + n_true), 6) END AS f1
       |FROM c""".stripMargin
  }

  /** t_zipf: OLS of micro-quantized round-6 logs — exact integer
    * moments, two closing double divisions. */
  private def zipfSql: String =
    """WITH f AS (SELECT tok, count(*) AS f FROM (
      |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM documents) WHERE tok <> '' GROUP BY 1),
      |r AS (SELECT
      |    CAST(round(round(ln(CAST(row_number() OVER (ORDER BY f DESC, tok) AS DOUBLE)), 6) * 1000000, 0) AS BIGINT) AS lx,
      |    CAST(round(round(ln(CAST(f AS DOUBLE)), 6) * 1000000, 0) AS BIGINT) AS ly
      |  FROM f),
      |a AS (SELECT count(*) AS n, CAST(sum(lx) AS BIGINT) AS sx,
      |    CAST(sum(ly) AS BIGINT) AS sy, CAST(sum(lx * ly) AS BIGINT) AS sxy,
      |    CAST(sum(lx * lx) AS BIGINT) AS sxx, CAST(sum(ly * ly) AS BIGINT) AS syy
      |  FROM r)
      |SELECT n AS n_terms,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
      |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
      |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0.0
      |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r2
      |FROM a""".stripMargin

  /** emb_centroids: per-(label, dim) integer micro sums, dim-ordered
    * arrays, pairwise centroid cosines (counts cancel). */
  private def embCentroidsSql: String =
    """WITH comps AS (SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS u
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |cent AS (SELECT label, dim, CAST(sum(u) AS BIGINT) AS s
      |  FROM comps GROUP BY 1, 2),
      |arrs AS (SELECT label, list(CAST(s AS DOUBLE) ORDER BY dim) AS sv
      |  FROM cent GROUP BY 1),
      |cnts AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n
      |  FROM embeddings GROUP BY 1),
      |j AS (SELECT a.label AS label_a, b.label AS label_b,
      |    ca.n AS n_a, cb.n AS n_b,
      |    sqrt(list_dot_product(a.sv, a.sv)) AS na,
      |    sqrt(list_dot_product(b.sv, b.sv)) AS nb,
      |    list_dot_product(a.sv, b.sv) AS dp
      |  FROM arrs a JOIN arrs b ON a.label < b.label
      |  JOIN cnts ca ON ca.label = a.label JOIN cnts cb ON cb.label = b.label)
      |SELECT label_a, label_b, n_a, n_b,
      |  CASE WHEN na * nb = 0 THEN 0.0 ELSE round(dp / (na * nb), 6) END AS cosine
      |FROM j ORDER BY label_a, label_b""".stripMargin

  /** q_contrastive_pairs: deterministic every-5th-token drop, md5 pair
    * hashes (DuckDB list lambda indexes are 1-based; Spark's are
    * 0-based — the predicates below are the same positions). */
  private def contrastivePairsSql: String =
    """WITH d AS (SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents WHERE doc_id < 50),
      |k AS (SELECT doc_id, w, list_filter(w, (x, i) -> i % 5 != 0) AS kept FROM d)
      |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(kept) AS BIGINT) AS n_kept,
      |  md5(array_to_string(w, ' ')) AS anchor_hash,
      |  md5(array_to_string(kept, ' ')) AS positive_hash
      |FROM k ORDER BY doc_id""".stripMargin

  /** x_groupby_ols: per-group OLS from the same exact integer moments
    * (n·Σy² taken in double — it alone exceeds long range). */
  private def groupedOlsSql: String =
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(round(l_quantity, 0) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      |  FROM lineitem),
      |a AS (SELECT grp, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM b GROUP BY 1)
      |SELECT grp AS "group", n,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
      |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
      |       ELSE round((CAST(sy AS DOUBLE)
      |            - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) END AS intercept,
      |  CASE WHEN n * sxx - sx * sx = 0
      |         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0 THEN 0.0
      |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
      |            / (CAST(n * sxx - sx * sx AS DOUBLE)
      |               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS r2
      |FROM a ORDER BY grp""".stripMargin

  /** e_top_paths: corpus-wide counts of per-user 3-event type paths. */
  private def topPathsSql: String =
    """WITH p AS (SELECT event_type AS e0,
      |    lead(event_type, 1) OVER w AS e1,
      |    lead(event_type, 2) OVER w AS e2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e0 || '>' || e1 || '>' || e2 AS path, count(*) AS n
      |FROM p WHERE e1 IS NOT NULL AND e2 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 5""".stripMargin

  /** a_info_gain: MI(col; o_orderstatus) per candidate column over
    * orders — one micro-nat MI block per arm, ranked. */
  private def infoGainSql: String = {
    def h(c: String) =
      s"""(SELECT round(CAST(sum(tm) AS DOUBLE) / CAST(any_value(n) AS DOUBLE) / 1000000.0, 6)
         | FROM (SELECT cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n,
         |         CAST(floor(CAST(cnt AS DOUBLE) * round(ln(CAST(sum(cnt) OVER () AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) * 1000000.0) AS BIGINT) AS tm
         |       FROM (SELECT count(*) AS cnt FROM orders GROUP BY CAST($c AS VARCHAR))))""".stripMargin
    def arm(c: String) =
      s"""SELECT '$c' AS col_name, mi AS info_gain,
         |  CASE WHEN least(h_a, h_b) = 0 THEN 0.0
         |       ELSE round(mi / least(h_a, h_b), 6) END AS nmi
         |FROM (
         |  WITH p AS (SELECT CAST($c AS VARCHAR) AS a, CAST(o_orderstatus AS VARCHAR) AS b FROM orders),
         |  j AS (SELECT a, b, count(*) AS cab FROM p GROUP BY 1, 2),
         |  ma AS (SELECT a, count(*) AS ca FROM p GROUP BY 1),
         |  mb AS (SELECT b, count(*) AS cb FROM p GROUP BY 1),
         |  nn AS (SELECT count(*) AS n FROM p),
         |  mi AS (SELECT CAST(any_value(nn.n) AS BIGINT) AS n,
         |           sum(CAST(floor(CAST(cab AS DOUBLE)
         |             * round(ln(CAST(nn.n * cab AS DOUBLE) / CAST(ca * cb AS DOUBLE)), 6)
         |             * 1000000.0) AS BIGINT)) AS s
         |         FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn)
         |  SELECT ${h(c)} AS h_a, ${h("o_orderstatus")} AS h_b,
         |    round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS mi
         |  FROM mi)""".stripMargin
    val arms = Seq("o_custkey", "o_orderdate", "o_orderpriority")
      .map(arm).mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$arms
       |) ORDER BY info_gain DESC, col_name""".stripMargin
  }

  /** w_reciprocity: fraction of directed edges with a reverse edge. */
  private def reciprocitySql: String =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
      |       UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
      |ed AS (SELECT DISTINCT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
      |       FROM e0 WHERE src <> dst),
      |r AS (SELECT count(*) AS n_rec FROM ed a
      |      WHERE EXISTS (SELECT 1 FROM ed b WHERE b.src = a.dst AND b.dst = a.src)),
      |t AS (SELECT count(*) AS n_edges FROM ed)
      |SELECT t.n_edges, r.n_rec AS n_reciprocal,
      |  CASE WHEN t.n_edges = 0 THEN 0.0
      |       ELSE round(CAST(r.n_rec AS DOUBLE) / t.n_edges, 6) END AS reciprocity
      |FROM t, r""".stripMargin

  /** t_corpus_card: one-row corpus KPI card — documents, tokens,
    * languages, exact-dup share via the normalized-content fingerprint,
    * mean length. */
  private def corpusCardSql: String =
    """WITH d AS (SELECT doc_id, lang, text,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
      |  FROM documents),
      |fpc AS (SELECT fp, count(*) AS c FROM d GROUP BY 1),
      |dup AS (SELECT CAST(sum(c) AS BIGINT) AS n_dup FROM fpc WHERE c > 1)
      |SELECT (SELECT count(*) FROM d) AS n_docs,
      |  (SELECT CAST(sum(n_tok) AS BIGINT) FROM d) AS n_tokens,
      |  (SELECT count(DISTINCT lang) FROM d) AS n_langs,
      |  coalesce(dup.n_dup, 0) AS n_dup_docs,
      |  round(CAST(coalesce(dup.n_dup, 0) AS DOUBLE)
      |      / (SELECT count(*) FROM d), 6) AS dup_rate,
      |  round(CAST((SELECT sum(n_tok) FROM d) AS DOUBLE)
      |      / (SELECT count(*) FROM d), 6) AS mean_tokens
      |FROM dup""".stripMargin

  /** emb_dim_variance: per-dim scaled variance n·Σu² − (Σu)² from
    * integer micro components; anisotropy = max·n_dims / Σ. */
  private def dimVarianceSql: String =
    """WITH comps AS (SELECT i - 1 AS dim,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS u
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |pd AS (SELECT dim, count(*) AS n, CAST(sum(u) AS BIGINT) AS su,
      |    CAST(sum(u * u) AS BIGINT) AS suu FROM comps GROUP BY 1),
      |v AS (SELECT dim, n, CAST(n * suu - su * su AS BIGINT) AS vu2 FROM pd),
      |tot AS (SELECT CAST(sum(vu2) AS BIGINT) AS sv, CAST(max(vu2) AS BIGINT) AS mv,
      |    count(*) AS n_dims FROM v)
      |SELECT CAST(v.dim AS BIGINT) AS dim,
      |  round(CAST(v.vu2 AS DOUBLE) / CAST(v.n * v.n AS DOUBLE) / 1e12, 6) AS variance,
      |  CASE WHEN tot.sv = 0 THEN 0.0
      |       ELSE round(CAST(v.vu2 AS DOUBLE) / tot.sv, 6) END AS var_share,
      |  tot.n_dims,
      |  CASE WHEN tot.sv = 0 THEN 0.0
      |       ELSE round(CAST(tot.mv AS DOUBLE) * tot.n_dims / tot.sv, 6) END AS anisotropy
      |FROM v, tot ORDER BY dim""".stripMargin

  /** emb_pca_power: replay the exact-integer power iteration — the same
    * micro-quantization seam as emb_dim_variance, truncating `//` for
    * the centering mean and every rescale (Spark `div` ≡ DuckDB `//`
    * toward zero), four unrolled rounds, canonical sign from the
    * lowest-dim nonzero component, and the explained-variance share as
    * one exact HUGEINT integral divide to ppm. CTEs are MATERIALIZED:
    * the iteration chain references each round's relations repeatedly
    * and default inlining re-evaluates the chain combinatorially. */
  private def pcaChainCtes(nIter: Int): String = {
    def iter(i: Int, vPrev: String): String =
      s"""d$i AS MATERIALIZED (SELECT y.id, CAST(sum(y.y * v.v) AS BIGINT) AS dot
         |  FROM y JOIN $vPrev v USING (dim) GROUP BY y.id),
         |s$i AS MATERIALIZED (SELECT greatest(CAST(1 AS BIGINT),
         |    CAST(max(abs(dot)) AS BIGINT) // 1000000) AS s FROM d$i),
         |dn$i AS MATERIALIZED (SELECT id, dot // s AS ds FROM d$i, s$i),
         |z$i AS MATERIALIZED (SELECT y.dim, CAST(sum(y.y * dn.ds) AS BIGINT) AS z
         |  FROM y JOIN dn$i dn USING (id) GROUP BY y.dim),
         |t$i AS MATERIALIZED (SELECT greatest(CAST(1 AS BIGINT),
         |    CAST(max(abs(z)) AS BIGINT) // 1000000) AS t FROM z$i),
         |v$i AS MATERIALIZED (SELECT dim, CAST(z // t AS BIGINT) AS v FROM z$i, t$i)""".stripMargin
    s"""comps AS MATERIALIZED (SELECT CAST(vec_id AS BIGINT) AS id, i - 1 AS dim,
       |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS u
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
       |mu AS MATERIALIZED (SELECT dim, CAST(sum(u) AS BIGINT) // count(*) AS mu
       |  FROM comps GROUP BY 1),
       |y AS MATERIALIZED (SELECT c.id, c.dim, c.u - m.mu AS y
       |  FROM comps c JOIN mu m USING (dim)),
       |v0 AS MATERIALIZED (SELECT DISTINCT dim, CAST(1000000 + dim AS BIGINT) AS v FROM y),
       |${(1 to nIter).map(i => iter(i, s"v${i - 1}")).mkString(",\n")},
       |sg AS MATERIALIZED (SELECT CASE WHEN
       |    coalesce((SELECT v FROM v$nIter WHERE v <> 0 ORDER BY dim LIMIT 1), 1) >= 0
       |    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sgn),
       |vc AS MATERIALIZED (SELECT dim, v * sgn AS v FROM v$nIter, sg),
       |fd AS MATERIALIZED (SELECT y.id, CAST(sum(y.y * vc.v) AS BIGINT) AS dot
       |  FROM y JOIN vc USING (dim) GROUP BY y.id)""".stripMargin
  }

  private def pcaPowerSql: String =
    s"""WITH ${pcaChainCtes(4)},
       |nm AS MATERIALIZED (SELECT sum(CAST(dot AS HUGEINT) * dot) AS num FROM fd),
       |dd AS MATERIALIZED (SELECT (SELECT sum(CAST(v AS HUGEINT) * v) FROM vc) *
       |    (SELECT sum(CAST(y AS HUGEINT) * y) FROM y) AS den),
       |ev AS MATERIALIZED (SELECT CASE WHEN den IS NULL OR den = 0 THEN 0.0
       |    ELSE CAST(CAST((num * 1000000) // den AS BIGINT) AS DOUBLE) / 1000000.0 END
       |    AS ev_share FROM nm, dd)
       |SELECT CAST(vc.dim AS BIGINT) AS dim, CAST(vc.v AS BIGINT) AS component_ppm,
       |  ev.ev_share
       |FROM vc, ev ORDER BY dim""".stripMargin

  /** emb_abtt: the All-but-the-top projection replay — exact integral
    * projection quotient per cell, ppm ratios by HUGEINT integral
    * divides (Spark's DECIMAL `div` and DuckDB `//` both truncate
    * toward zero). */
  private def abttSql: String =
    s"""WITH ${pcaChainCtes(4)},
       |nv2 AS MATERIALIZED (SELECT CAST(sum(v * v) AS BIGINT) AS nv2 FROM vc),
       |yp AS MATERIALIZED (SELECT y.id, y.dim,
       |    CASE WHEN n.nv2 = 0 THEN y.y
       |         ELSE y.y - CAST((CAST(f.dot AS HUGEINT) * v.v) // n.nv2 AS BIGINT) END AS yp
       |  FROM y JOIN fd f USING (id) JOIN vc v USING (dim), nv2 n),
       |syy AS MATERIALIZED (SELECT sum(CAST(y AS HUGEINT) * y) AS syy FROM y),
       |syp AS MATERIALIZED (SELECT sum(CAST(yp AS HUGEINT) * yp) AS syp FROM yp),
       |axb AS MATERIALIZED (SELECT max(sd) AS mx, sum(sd) AS tot, count(*) AS nd
       |  FROM (SELECT dim, sum(CAST(y AS HUGEINT) * y) AS sd FROM y GROUP BY dim)),
       |axa AS MATERIALIZED (SELECT max(sd) AS mx, sum(sd) AS tot, count(*) AS nd
       |  FROM (SELECT dim, sum(CAST(yp AS HUGEINT) * yp) AS sd FROM yp GROUP BY dim)),
       |cnts AS (SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
       |                (SELECT count(*) FROM vc) AS n_dims)
       |SELECT cnts.n_vecs, cnts.n_dims,
       |  CASE WHEN syy.syy IS NULL OR syy.syy = 0 THEN 0.0
       |       ELSE CAST(CAST(((syy.syy - syp.syp) * 1000000) // syy.syy AS BIGINT) AS DOUBLE) / 1000000.0
       |  END AS ev_top_share,
       |  CASE WHEN syy.syy IS NULL OR syy.syy = 0 THEN 0.0
       |       ELSE CAST(CAST((syp.syp * 1000000) // syy.syy AS BIGINT) AS DOUBLE) / 1000000.0
       |  END AS var_retained,
       |  CASE WHEN axb.tot IS NULL OR axb.tot = 0 THEN 0.0
       |       ELSE CAST(CAST((axb.mx * axb.nd * 1000000) // axb.tot AS BIGINT) AS DOUBLE) / 1000000.0
       |  END AS axis_aniso_before,
       |  CASE WHEN axa.tot IS NULL OR axa.tot = 0 THEN 0.0
       |       ELSE CAST(CAST((axa.mx * axa.nd * 1000000) // axa.tot AS BIGINT) AS DOUBLE) / 1000000.0
       |  END AS axis_aniso_after
       |FROM cnts, syy, syp, axb, axa""".stripMargin

  /** t_c4_filters: rebuild the identical synthesized pages (8-token
    * lines, residue-keyed terminal '.', injected code/lorem/policy
    * lines) and replay the C4 line + page rules. */
  private def c4FiltersSql: String =
    """WITH d AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |p0 AS (SELECT doc_id, lang,
      |  list_transform(range(0, (len(w)+7)//8),
      |    i -> array_to_string(list_slice(w, i*8+1, i*8+8), ' ') ||
      |         CASE WHEN (doc_id + i) % 4 <> 0 THEN '.' ELSE '' END) AS lines
      |  FROM d),
      |pages AS (SELECT doc_id, lang, array_to_string(
      |    lines
      |    || CASE WHEN doc_id % 23 = 0 THEN ['function() { return 1; }'] ELSE []::VARCHAR[] END
      |    || CASE WHEN doc_id % 29 = 0 THEN ['Lorem ipsum dolor sit amet.'] ELSE []::VARCHAR[] END
      |    || CASE WHEN doc_id % 31 = 0 THEN ['this page contains unsafeword content.'] ELSE []::VARCHAR[] END,
      |    chr(10)) AS text FROM p0),
      |rep AS (SELECT doc_id, lang,
      |  string_split(text, chr(10)) AS ls,
      |  list_filter(string_split(text, chr(10)), ln ->
      |    regexp_matches(trim(ln), '[.!?"]$')
      |    AND len(list_filter(string_split_regex(trim(ln), '\s+'), x -> x <> '')) >= 5
      |    AND NOT contains(lower(ln), 'javascript')) AS kept,
      |  contains(lower(text), 'lorem ipsum') AS has_lorem,
      |  contains(text, '{') AS has_brace,
      |  list_contains(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''), 'unsafeword') AS has_badword
      |  FROM pages),
      |agg AS (SELECT lang, len(ls) AS n_lines, len(kept) AS n_kept,
      |  coalesce(list_sum(list_transform(kept,
      |    ln -> len(list_filter(string_split_regex(trim(ln), '\s+'), x -> x <> '')))), 0) AS kt,
      |  has_lorem, has_brace, has_badword,
      |  (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace AND NOT has_badword) AS keep FROM rep)
      |SELECT lang, count(*) AS n_pages,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS pages_kept,
      |  CAST(sum(n_lines) AS BIGINT) AS lines_total,
      |  CAST(sum(n_kept) AS BIGINT) AS lines_kept,
      |  CAST(sum(kt) AS BIGINT) AS kept_tokens,
      |  CAST(sum(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT) AS n_lorem,
      |  CAST(sum(CASE WHEN has_brace THEN 1 ELSE 0 END) AS BIGINT) AS n_brace,
      |  CAST(sum(CASE WHEN has_badword THEN 1 ELSE 0 END) AS BIGINT) AS n_badword,
      |  CAST(sum(CASE WHEN NOT keep AND NOT has_lorem AND NOT has_brace AND NOT has_badword
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_too_few_lines,
      |  round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS kept_fraction
      |FROM agg GROUP BY lang ORDER BY lang""".stripMargin

  /** t_ppl_buckets: the lmQuality replay as a subquery, per-language
    * positional tertiles over (score DESC, doc_id), decimal-exact mean. */
  private def pplBucketsSql: String =
    s"""WITH sc AS (SELECT * FROM ($lmQualitySql)),
       |sl AS (SELECT sc.doc_id, d.lang, sc.avg_logprob_r
       |  FROM sc JOIN documents d USING (doc_id)),
       |rk AS (SELECT *,
       |    row_number() OVER (PARTITION BY lang ORDER BY avg_logprob_r DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS nl FROM sl),
       |ag AS (SELECT lang,
       |  CASE WHEN rn*3 <= nl THEN 'head' WHEN rn*3 <= 2*nl THEN 'middle' ELSE 'tail' END AS bucket,
       |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       |  CAST(sum(CAST(avg_logprob_r AS DECIMAL(20,6))) AS DOUBLE) / count(*) * 1000000 AS q
       |FROM rk GROUP BY 1, 2)
       |SELECT lang, bucket, n_docs, id_checksum,
       |  (CASE WHEN q >= 0 THEN floor(q + 0.5) ELSE ceil(q - 0.5) END) / 1000000.0 AS avg_score
       |FROM ag ORDER BY lang, bucket""".stripMargin

  /** t_ppl_buckets_sketch: the lm replay, per-language min-shift (the
    * relative-error sketch resolves near zero — see the operator
    * scaladoc), the HDR quantization (eqfreqBins' formula),
    * per-language cut buckets at ranks ⌈n/3⌉ and ⌈2n/3⌉ from the
    * cumulative walk, bucket-vs-cut integer comparisons. */
  private def pplBucketsSketchSql: String =
    s"""WITH ${lmScoreCtes("documents")},
       |sl0 AS (SELECT ag.doc_id, dd.lang,
       |    (CASE WHEN m >= 0 THEN floor(m + 0.5) ELSE ceil(m - 0.5) END) / 1000000.0 AS v0
       |  FROM ag JOIN documents dd USING (doc_id)),
       |mn AS (SELECT lang, min(v0) AS vmin FROM sl0 GROUP BY 1),
       |sl AS (SELECT sl0.doc_id, sl0.lang, sl0.v0 - mn.vmin AS v
       |  FROM sl0 JOIN mn USING (lang)),
       |qv AS (SELECT doc_id, lang,
       |    least(greatest(CAST(floor(v * 1e6) AS BIGINT),
       |      -4611686018427387904), 4611686018427387904) AS q
       |  FROM sl),
       |bk AS (SELECT doc_id, lang, (CASE WHEN q < 0 THEN -1 ELSE 1 END) *
       |    (CASE WHEN abs(q) < 32 THEN abs(q)
       |          ELSE (CAST(length(bin(abs(q))) - 1 AS BIGINT) - 4) * 32
       |               + (abs(q) >> (length(bin(abs(q))) - 1 - 5)) - 32 END) AS bucket
       |  FROM qv),
       |counts AS (SELECT lang, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
       |cum AS (SELECT lang, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
       |    sum(cnt) OVER (PARTITION BY lang) AS n FROM counts),
       |dk AS (SELECT lang, bucket FROM cum CROSS JOIN (SELECT unnest(range(1, 3)) AS k)
       |  WHERE cum >= greatest((n * k + 2) // 3, 1)
       |    AND cum - cnt < greatest((n * k + 2) // 3, 1)),
       |ab AS (SELECT b.doc_id, b.lang,
       |    (SELECT count(*) FROM dk c WHERE c.lang = b.lang AND b.bucket > c.bucket) AS above
       |  FROM bk b)
       |SELECT lang,
       |  CASE WHEN above = 2 THEN 'head' WHEN above = 1 THEN 'middle' ELSE 'tail' END AS bucket,
       |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_checksum
       |FROM ab GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** t_quality_agreement: replay the Gopher-rule keep verdict (the
    * curation funnel's m CTE) and the exact perplexity tertiles, then
    * the cross-tab. */
  private def qualityAgreementSql: String =
    s"""WITH m AS (SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       |    round(CASE WHEN length(text) = 0 THEN 0
       |          ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS pr,
       |    round(CASE WHEN len(string_split_regex(trim(text), '\\s+')) = 0 THEN 0
       |          ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'), w -> length(w))) AS DOUBLE)
       |               / len(string_split_regex(trim(text), '\\s+')) END, 6) AS mtl
       |  FROM documents),
       |kk AS (SELECT doc_id,
       |    (n_tokens >= 30 AND n_tokens <= 5000 AND mtl >= 3.0 AND mtl <= 4.8
       |     AND pr <= 0.1) AS keep FROM m),
       |sc AS (SELECT * FROM ($lmQualitySql)),
       |sl AS (SELECT sc.doc_id, d.lang, sc.avg_logprob_r
       |  FROM sc JOIN documents d USING (doc_id)),
       |rk AS (SELECT *,
       |    row_number() OVER (PARTITION BY lang ORDER BY avg_logprob_r DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS nl FROM sl),
       |bk AS (SELECT doc_id,
       |    CASE WHEN rn*3 <= nl THEN 'head' WHEN rn*3 <= 2*nl THEN 'middle'
       |         ELSE 'tail' END AS bucket FROM rk)
       |SELECT kk.keep, bk.bucket, count(*) AS n_docs,
       |  CAST(sum(kk.doc_id) AS BIGINT) AS id_checksum
       |FROM kk JOIN bk USING (doc_id)
       |GROUP BY 1, 2 ORDER BY keep, bucket""".stripMargin

  /** x_merge_upsert: replay the changelog compaction (rank window ≡ the
    * struct-max), the full-outer MERGE resolution, and the per-type
    * checksums of the merged state. */
  private def mergeUpsertSql: String =
    """WITH ev AS (SELECT user_id, event_type, ts, event_id, CAST(value AS DOUBLE) AS value FROM events),
      |tgt AS (
      |  SELECT user_id, event_type, ts, event_id, value FROM ev WHERE event_id % 2 = 0
      |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id, value,
      |    CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
      |  FROM ev WHERE event_id % 2 = 1
      |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1),
      |mg AS (
      |  SELECT coalesce(t.user_id, c.user_id) AS user_id,
      |         coalesce(t.event_type, c.event_type) AS event_type,
      |         CASE WHEN c.op IS NOT NULL THEN c.event_id ELSE t.event_id END AS event_id,
      |         CASE WHEN c.op IS NOT NULL THEN c.value ELSE t.value END AS value
      |  FROM tgt t FULL OUTER JOIN chg c
      |    ON t.user_id = c.user_id AND t.event_type = c.event_type
      |  WHERE c.op IS NULL OR c.op <> 'delete')
      |SELECT event_type, count(*) AS n_keys,
      |  CAST(sum(user_id) AS BIGINT) AS user_checksum,
      |  CAST(sum(event_id) AS BIGINT) AS event_checksum,
      |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM mg GROUP BY 1 ORDER BY 1""".stripMargin

  /** mm_resize: replay real-decode box resize from the generative pixel
    * formulas — truncating per-block integer mean, channel means over
    * the resized raster, exact checksum. */
  private def mmResizeSql: String =
    """WITH imgs AS (
      |  SELECT i AS media_id, 'png' AS fmt, 8 + (i % 5) * 3 AS w,
      |         6 + (i % 4) * 2 AS h, (i * 17) % 251 AS seed
      |  FROM generate_series(1, 12) t(i)
      |  UNION ALL
      |  SELECT i, 'gif', 7 + (i % 4) * 5, 5 + (i % 3) * 4, (i * 29) % 101
      |  FROM generate_series(13, 18) t(i)),
      |xs AS (SELECT media_id, fmt, w, h, seed,
      |       unnest(generate_series(0, w - 1)) AS x FROM imgs),
      |ys AS (SELECT media_id, fmt, w, h, seed, x,
      |       unnest(generate_series(0, h - 1)) AS y FROM xs),
      |cells AS (SELECT media_id, w, h, x, y, c,
      |            CASE WHEN fmt = 'png'
      |              THEN (x * 3 + y * 7 + c * 11 + seed) % 256
      |              ELSE (((x * 3 + y * 7 + seed) % 64) * [5, 9, 11][c + 1]
      |                    + [13, 7, 3][c + 1]) % 256
      |            END AS v
      |          FROM (SELECT *, unnest([0, 1, 2]) AS c FROM ys)),
      |rs AS (SELECT media_id, w, h, x // 2 AS bx, y // 2 AS by, c,
      |         CAST(sum(v) AS BIGINT) // count(*) AS rv
      |       FROM cells GROUP BY media_id, w, h, x // 2, y // 2, c)
      |SELECT media_id, CAST((w + 1) // 2 AS BIGINT) AS rs_width,
      |  CAST((h + 1) // 2 AS BIGINT) AS rs_height,
      |  round(avg(CASE WHEN c = 0 THEN rv END), 6) AS mean_r,
      |  round(avg(CASE WHEN c = 1 THEN rv END), 6) AS mean_g,
      |  round(avg(CASE WHEN c = 2 THEN rv END), 6) AS mean_b,
      |  CAST(sum(rv) AS BIGINT) AS checksum
      |FROM rs GROUP BY media_id, w, h ORDER BY media_id""".stripMargin

  /** emb_knn_graph: replay the exact kNN edges (the ann_cosine_topk
    * scoring, all queries), then the mutual/hubness/orphan rollup. */
  private def knnGraphSql: String =
    """WITH n AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |knn AS MATERIALIZED (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
      |          c.vec_id) AS rank
      |    FROM n q JOIN n c ON c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |m AS (SELECT count(*) AS mutual_pairs FROM knn a JOIN knn b
      |  ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
      |     AND a.query_id < a.neighbor_id),
      |ind AS (SELECT neighbor_id, count(*) AS d FROM knn GROUP BY 1),
      |hub AS (SELECT CAST(coalesce(max(d), 0) AS BIGINT) AS max_in_degree,
      |               count(*) AS reached FROM ind),
      |ne AS (SELECT count(*) AS n_edges FROM knn),
      |nn AS (SELECT count(*) AS n_nodes FROM embeddings)
      |SELECT nn.n_nodes, ne.n_edges, m.mutual_pairs,
      |  CASE WHEN ne.n_edges = 0 THEN 0.0
      |       ELSE CAST((2 * m.mutual_pairs * 1000000) // ne.n_edges AS BIGINT) / 1000000.0
      |  END AS mutual_fraction,
      |  hub.max_in_degree,
      |  nn.n_nodes - hub.reached AS n_orphans
      |FROM nn, ne, m, hub""".stripMargin

  /** emb_label_agreement: replay the exact kNN edges (all queries,
    * k=5), attach both endpoints' labels, per-vector agreement counts,
    * per-label rollup with the exact ppm rate. */
  private def labelAgreementSql: String =
    """WITH n AS MATERIALIZED (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |knn AS MATERIALIZED (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
      |          c.vec_id) AS rank
      |    FROM n q JOIN n c ON c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |pv AS (
      |  SELECT k.query_id, ql.label AS ql, count(*) AS n_nb,
      |    CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
      |  FROM knn k
      |  JOIN n ql ON ql.vec_id = k.query_id
      |  JOIN n nl ON nl.vec_id = k.neighbor_id
      |  GROUP BY 1, 2)
      |SELECT ql AS label, count(*) AS n_vecs,
      |  CAST(sum(n_agree) AS BIGINT) AS agree_edges,
      |  CAST(sum(n_nb) AS BIGINT) AS total_edges,
      |  CAST(sum(CASE WHEN n_agree = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspects,
      |  CAST((sum(n_agree) * 1000000) // sum(n_nb) AS BIGINT) / 1000000.0 AS agreement
      |FROM pv GROUP BY ql ORDER BY label""".stripMargin

  /** emb_matryoshka: replay the prefix-truncated exact top-5 rankings
    * (cast → slice → norm, the same 6-dp safeCosine and (cosine DESC,
    * id) tie-break as annCosineSql) at 16/32/64 dims, then the overlap
    * join of each prefix's pair set against the full-dim pair set. */
  private def matryoshkaSql: String = {
    val dims = Seq(16, 32, 64)
    def prefCte(d: Int) =
      s"""p$d AS MATERIALIZED (
         |  SELECT vec_id, e2 AS e, sqrt(list_dot_product(e2, e2)) AS nrm FROM (
         |    SELECT vec_id, CAST(embedding AS DOUBLE[])[1:$d] AS e2 FROM embeddings))""".stripMargin
    def topCte(d: Int) =
      s"""t$d AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
         |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
         |          c.vec_id) AS rank
         |    FROM (SELECT * FROM p$d WHERE vec_id <= 10) q
         |    JOIN p$d c ON c.vec_id <> q.vec_id)
         |  WHERE rank <= 5)""".stripMargin
    val nq = "nq AS (SELECT count(*) AS n FROM embeddings WHERE vec_id <= 10)"
    val ctes = (dims.map(prefCte) ++ dims.map(topCte) :+ nq).mkString(",\n")
    val arms = dims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS dim_prefix,
         |  CAST(count(*) AS BIGINT) AS matches,
         |  CAST(count(*) * 1000000 // (nq.n * 5) AS BIGINT) / 1000000.0 AS overlap_r
         |FROM t$d a JOIN t64 b USING (query_id, neighbor_id), nq
         |GROUP BY nq.n""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $ctes
       |SELECT * FROM (
       |$arms)
       |ORDER BY dim_prefix""".stripMargin
  }

  /** emb_jl_overlap: replay the ±1 JL projection (sign = parity of
    * md5_number_lower('jl:j:k'), j input dim 0..63, k output dim
    * 0..15), sequential list_dot_product projection and cosine top-5
    * in both spaces, overlap row. */
  private def jlOverlapSql: String =
    s"""WITH sgn AS MATERIALIZED (
       |  SELECT k, list_transform(range(0, 64), j ->
       |    CASE WHEN (md5_number_lower('jl:' || j || ':' || k) & 1) = 0
       |         THEN 1.0 ELSE -1.0 END) AS s
       |  FROM (SELECT unnest(range(0, 16)) AS k)),
       |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |pfull AS MATERIALIZED (
       |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM base),
       |pj AS MATERIALIZED (
       |  SELECT vec_id, list(y ORDER BY k) AS e FROM (
       |    SELECT base.vec_id, sgn.k, list_dot_product(base.e, sgn.s) AS y
       |    FROM base, sgn)
       |  GROUP BY vec_id),
       |pjl AS MATERIALIZED (
       |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM pj),
       |tfull AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
       |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
       |          c.vec_id) AS rank
       |    FROM (SELECT * FROM pfull WHERE vec_id <= 10) q
       |    JOIN pfull c ON c.vec_id <> q.vec_id)
       |  WHERE rank <= 5),
       |tjl AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
       |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
       |          c.vec_id) AS rank
       |    FROM (SELECT * FROM pjl WHERE vec_id <= 10) q
       |    JOIN pjl c ON c.vec_id <> q.vec_id)
       |  WHERE rank <= 5),
       |nq AS (SELECT count(*) AS n FROM embeddings WHERE vec_id <= 10)
       |SELECT CAST(16 AS BIGINT) AS dim_out,
       |  CAST(count(*) AS BIGINT) AS matches,
       |  CAST(count(*) * 1000000 // (nq.n * 5) AS BIGINT) / 1000000.0 AS overlap_r
       |FROM tjl a JOIN tfull b USING (query_id, neighbor_id), nq
       |GROUP BY nq.n""".stripMargin

  /** d_kcenter_coreset: replay greedy farthest-point — smallest id
    * seeds, 7 unrolled rounds of per-point min cosine distance to the
    * center set (d = 10⁶ − rha(round(cos,6)·10⁶)) and (d desc, id)
    * argmax. */
  private def kCenterSql: String = {
    def rnd(r: Int): String = {
      val prev = s"c${r - 1}"
      s"""m$r AS (
         |  SELECT p.vec_id AS pid,
         |    min(1000000 - CAST(CASE WHEN x >= 0 THEN floor(x + 0.5)
         |                            ELSE ceil(x - 0.5) END AS BIGINT)) AS md
         |  FROM (
         |    SELECT p.vec_id, 1000000.0 * (CASE WHEN p.nrm * c.nrm = 0 THEN 0.0
         |      ELSE round(list_dot_product(p.e, c.e) / (p.nrm * c.nrm), 6) END) AS x
         |    FROM n p, n c JOIN $prev s ON s.vec_id = c.vec_id) p(vec_id, x)
         |  GROUP BY 1),
         |n$r AS (SELECT CAST($r AS BIGINT) AS sel_order, pid AS vec_id,
         |          md AS gain_micro
         |        FROM m$r ORDER BY md DESC, pid LIMIT 1),
         |c$r AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM n$r)"""
        .stripMargin
    }
    s"""WITH n AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |c1 AS (SELECT CAST(1 AS BIGINT) AS sel_order, vec_id,
       |         CAST(2000000 AS BIGINT) AS gain_micro
       |       FROM (SELECT vec_id FROM n ORDER BY vec_id LIMIT 1)),
       |${(2 to 8).map(rnd).mkString(",\n")}
       |SELECT sel_order, vec_id, CAST(gain_micro AS BIGINT) AS gain_micro
       |FROM c8 ORDER BY sel_order""".stripMargin
  }

  /** j3_mrr: the searchNdcg result/truth replay with the
    * first-relevant-rank tail — reciprocal in truncating micro-units. */
  private def searchMrrSql: String =
    """WITH n AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |res AS (
      |  SELECT query_id, neighbor_id, rank FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC, c.vec_id) AS rank
      |    FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |truth AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS nid
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <= 10 AND b.vec_id <> a.vec_id),
      |fh AS (
      |  SELECT r.query_id, CAST(min(r.rank) AS BIGINT) AS first_rank
      |  FROM res r JOIN truth t ON r.query_id = t.query_id AND r.neighbor_id = t.nid
      |  GROUP BY 1)
      |SELECT CAST(q.query_id AS VARCHAR) AS query,
      |  coalesce(f.first_rank, 0) AS first_rank,
      |  CASE WHEN f.first_rank IS NULL THEN 0.0
      |       ELSE CAST(1000000 // f.first_rank AS BIGINT) / 1000000.0 END AS rr
      |FROM (SELECT DISTINCT query_id FROM truth) q
      |LEFT JOIN fh f USING (query_id)
      |ORDER BY query""".stripMargin

  /** j3_map: the searchMrr result/truth replay with the
    * average-precision tail — per-hit truncating micro precision, then
    * one truncating divide by min(|relevant|, k). */
  private def searchMapSql: String =
    """WITH n AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |res AS (
      |  SELECT query_id, neighbor_id, rank FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
      |          ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC, c.vec_id) AS rank
      |    FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |truth AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS nid
      |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <= 10 AND b.vec_id <> a.vec_id),
      |h AS (
      |  SELECT r.query_id, r.rank,
      |    row_number() OVER (PARTITION BY r.query_id ORDER BY r.rank) AS hit_idx
      |  FROM res r JOIN truth t ON r.query_id = t.query_id AND r.neighbor_id = t.nid),
      |pa AS (SELECT query_id, count(*) AS n_hits,
      |         CAST(sum((hit_idx * 1000000) // rank) AS BIGINT) AS sp
      |       FROM h GROUP BY 1),
      |dn AS (SELECT query_id, least(count(*), 5) AS denom FROM truth GROUP BY 1)
      |SELECT CAST(d.query_id AS VARCHAR) AS query,
      |  coalesce(p.n_hits, 0) AS n_hits,
      |  CASE WHEN p.sp IS NULL OR d.denom = 0 THEN 0.0
      |       ELSE CAST(p.sp // d.denom AS BIGINT) / 1000000.0 END AS ap_at_k
      |FROM dn d LEFT JOIN pa p USING (query_id)
      |ORDER BY query""".stripMargin

  /** ann_cell_balance: the shared Lloyd's cascade + final-cell argmin
    * assignment, per-cell counts, exact ppm skew. */
  private def cellBalanceSql: String =
    s"""WITH ${kmeansCascade(3, 8, 64)},
       |ca AS (
       |${kmeansArgmin("c3", "", "rn = 1", 64)}),
       |cs AS (SELECT cell, count(*) AS n_vecs FROM ca GROUP BY 1),
       |tt AS (SELECT max(n_vecs) AS mx, CAST(sum(n_vecs) AS BIGINT) AS n,
       |              count(*) AS k FROM cs)
       |SELECT cs.cell, cs.n_vecs,
       |  CAST((tt.mx * tt.k * 1000000) // tt.n AS BIGINT) / 1000000.0 AS skew
       |FROM cs, tt ORDER BY cell""".stripMargin

  /** e_rolling_wau: trailing 7-day distinct users per observed day. */
  private def rollingWauSql: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
      |days AS (SELECT DISTINCT d AS day FROM ud)
      |SELECT days.day, count(DISTINCT ud.user_id) AS wau
      |FROM ud JOIN days ON days.day BETWEEN ud.d AND ud.d + 6
      |GROUP BY 1 ORDER BY day""".stripMargin

  /** a_boxplot: per-group positional quartiles in integer cents and
    * Tukey fences doubled into integer space. */
  private def boxplotSql: String =
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |r AS (SELECT grp, c,
      |    CAST(row_number() OVER (PARTITION BY grp ORDER BY c, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS m
      |  FROM b),
      |q AS (SELECT grp, max(m) AS n,
      |    max(CASE WHEN rn = (m + 3) // 4 THEN c END) AS q1,
      |    avg(CASE WHEN rn = (m + 1) // 2 OR rn = m // 2 + 1 THEN c END) AS median,
      |    max(CASE WHEN rn = (m * 3 + 3) // 4 THEN c END) AS q3
      |  FROM r GROUP BY 1),
      |o AS (SELECT b.grp, count(*) AS n_outliers
      |  FROM b JOIN q ON q.grp = b.grp
      |  WHERE b.c * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3
      |     OR b.c * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3
      |  GROUP BY 1)
      |SELECT q.grp, q.n, q.q1, q.median, q.q3, q.q3 - q.q1 AS iqr,
      |  coalesce(o.n_outliers, 0) AS n_outliers
      |FROM q LEFT JOIN o ON o.grp = q.grp ORDER BY q.grp""".stripMargin

  /** e_last_touch: latest click at-or-before each purchase, exact gap
    * micro sum. */
  private def lastTouchSql: String =
    """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
      |lt AS (SELECT p.event_id, p.ts, max(c.ts) AS ct
      |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
      |  GROUP BY p.event_id, p.ts)
      |SELECT count(*) AS n_purchases, count(ct) AS n_attributed,
      |  CAST(sum(epoch_us(ts) - epoch_us(ct)) AS BIGINT) AS gap_us_sum
      |FROM lt""".stripMargin

  val all: Map[String, String] = Map(
    "s1_scan_topn" ->
      s"SELECT * FROM lineitem ORDER BY ${graft.sources.Lake.TableKeys("lineitem").mkString(", ")} LIMIT 100",

    "p2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= '1995-06-01' AND l_shipdate < '1995-07-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "a_profile_stats" -> profileStatsSql,

    "a4_quantiles" -> quantileSql,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "j_star_join" ->
      """SELECT r_name, count(*) AS n_orders, count(DISTINCT c_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "o_topk_window" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "w_running_agg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "set_ops" ->
      """SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT DISTINCT CAST(c_nationkey AS INT) AS k FROM customer
        |  EXCEPT SELECT DISTINCT CAST(s_nationkey AS INT) AS k FROM supplier)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT DISTINCT CAST(c_nationkey AS INT) AS k FROM customer
        |  INTERSECT SELECT DISTINCT CAST(s_nationkey AS INT) AS k FROM supplier)
        |UNION ALL
        |SELECT 'union' AS op, count(*) AS n FROM (
        |  SELECT DISTINCT CAST(c_nationkey AS INT) AS k FROM customer
        |  UNION SELECT DISTINCT CAST(s_nationkey AS INT) AS k FROM supplier)
        |ORDER BY op""".stripMargin,

    "j5_exact_jaccard" -> Seq(
      jaccardPairSql("c_nationkey~s_nationkey", "customer", "c_nationkey", "supplier", "s_nationkey"),
      jaccardPairSql("l_partkey~p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      jaccardPairSql("o_custkey~c_custkey", "orders", "o_custkey", "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY pair"),

    "f_lenient_dates" ->
      """SELECT o_orderkey, strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS parsed
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,

    "f_json_extract" ->
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e_hourly_events" ->
      """SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, h""".stripMargin,

    "e_sessionize" ->
      """SELECT user_id, count(*) AS n_events, CAST(SUM(new_sess) AS BIGINT) AS n_sessions FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT user_id, ts, event_id,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "t_text_metrics" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
         |  round(CASE WHEN length(text) = 0 THEN 0
         |        ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_r,
         |  round(CASE WHEN len(string_split_regex(lower(trim(text)), '\\s+')) = 0 THEN 0
         |        ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x IN ($stopList))) AS DOUBLE)
         |             / len(string_split_regex(lower(trim(text)), '\\s+')) END, 6) AS stopword_r,
         |  round(CASE WHEN len(string_split_regex(trim(text), '\\s+')) = 0 THEN 0
         |        ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'), w -> length(w))) AS DOUBLE)
         |             / len(string_split_regex(trim(text), '\\s+')) END, 6) AS mean_tok_len,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t_bm25_search" -> bm25SearchSql,
    "j_prf_terms" -> prfTermsSql,
    "j_prf_search" -> prfSearchSql,
    "t_ql_search" -> qlSearchSql,
    "j3_rbo" -> rboSql,
    "t_lm_quality" -> lmQualitySql,
    "t_kn_quality" -> knQualitySql,
    "t_min_k_prob" -> minKProbSql,
    "t_nb_langid" -> nbLangIdSql,
    // streamed == batch IS the oracle: the per-(doc, class) likelihood
    // aggregation folded over micro-batches must equal the batch replay
    "st_stream_domains" -> domainReweightSql, // streamed == batch
    "st_stream_lr" -> lrQualitySql, // streamed == batch
    "st_stream_nb" -> nbConfusionSql("TRUE"),
    // streamed == batch IS the oracle: per-doc LM scores computed in
    // micro-batches must equal the batch replay exactly
    "st_stream_ppl" -> lmQualitySql,
    "t_token_freq" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
        |WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,

    "t_dup_ngram_coverage" ->
      """WITH d AS (
        |  SELECT lang, string_split_regex(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT lang, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
        |  FROM d WHERE len(w) >= 2
        |), c AS (
        |  SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2
        |)
        |SELECT lang, CAST(sum(c) AS BIGINT) AS gram_instances,
        |  count(*) AS distinct_grams,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_instances,
        |  round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c), 6) AS dup_fraction
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    "d_exact_dup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |  count(*) AS n_dups, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fingerprint""".stripMargin,

    "d_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents WHERE doc_id <= 25
        |), g AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) <= 1 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS sh
        |  FROM d)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh)) > 0
        |ORDER BY id_a, id_b""".stripMargin,

    "d_weighted_minhash" -> weightedMinhashSql,
    "d_icws_minhash" -> icwsMinhashSql,
    "d_icws_neardups" -> icwsNearDupsSql,

    // j5_weighted_jaccard: tf-multiset Jaccard Σmin/Σmax with
    // Σmax = tot_a + tot_b − Σmin (min + max = a + b per token);
    // exact BIGINT counts, one 6-dp division per pair.
    "j5_weighted_jaccard" ->
      raw"""WITH tf AS (
        |  SELECT doc_id AS id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |        FROM documents WHERE doc_id <= 25)
        |  WHERE tok <> '' GROUP BY 1, 2),
        |tot AS (SELECT id, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY 1),
        |prs AS (SELECT a.id AS id_a, b.id AS id_b
        |        FROM (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id <= 25) a
        |        JOIN (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id <= 25) b
        |          ON a.id < b.id),
        |inter AS (
        |  SELECT p.id_a, p.id_b, CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS smin
        |  FROM prs p
        |  JOIN tf a ON a.id = p.id_a
        |  JOIN tf b ON b.id = p.id_b AND b.tok = a.tok
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  round(CAST(coalesce(i.smin, 0) AS DOUBLE)
        |        / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6) AS wjaccard
        |FROM prs p
        |JOIN tot ta ON ta.id = p.id_a
        |JOIN tot tb ON tb.id = p.id_b
        |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
        |WHERE round(CAST(coalesce(i.smin, 0) AS DOUBLE)
        |      / CAST(ta.tot + tb.tot - coalesce(i.smin, 0) AS DOUBLE), 6) > 0
        |ORDER BY p.id_a, p.id_b""".stripMargin,

    "emb_stats" ->
      """SELECT label, count(*) AS n, round(avg(nrm), 5) AS avg_norm,
        |  round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
        |FROM (SELECT label,
        |        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |      FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,

    // d_semantic_decontam: per corpus vector (vec_id > 50) the
    // best-cosine eval match (vec_id <= 50); argmax replayed as
    // rank-1 of (cosine DESC, bench_id ASC) — the same deterministic
    // tie-break as the Spark max(struct(cosine, -bench_id)).
    "d_semantic_decontam" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |s AS (
        |  SELECT c.vec_id AS id, b.vec_id AS bench_id,
        |    CASE WHEN c.nrm * b.nrm = 0 THEN 0.0
        |         ELSE round(list_dot_product(c.e, b.e) / (c.nrm * b.nrm), 6) END AS cosine
        |  FROM n c JOIN n b ON c.vec_id > 50 AND b.vec_id <= 50),
        |best AS (SELECT id, bench_id, cosine,
        |           row_number() OVER (PARTITION BY id ORDER BY cosine DESC, bench_id) AS rn
        |         FROM s)
        |SELECT id, CAST(bench_id AS BIGINT) AS best_match, cosine AS best_cosine,
        |  cosine >= 0.35 AS contaminated
        |FROM best WHERE rn = 1 ORDER BY id""".stripMargin,

    "ann_cosine_topk" -> annCosineSql,

    // q_hard_negatives: same cosine+rank replay as ann_cosine_topk with
    // the [0.10, 0.30) band filter applied before ranking.
    "q_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
        |         ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END AS cosine
        |  FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored WHERE cosine >= 0.10 AND cosine < 0.30)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "o4_search_exact" -> searchExactSql,

    "a16_value_heads" -> Seq(
      ("documents", "lang"), ("documents", "source"), ("events", "event_type"),
      ("orders", "o_orderstatus"), ("orders", "o_orderpriority"),
      ("lineitem", "l_returnflag"))
      .map { case (tbl, c) =>
        s"""SELECT '$tbl.$c' AS col_ref,
           |  array_to_string(list_sort(list(DISTINCT CAST($c AS VARCHAR))), ',') AS values_head
           |FROM $tbl""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_ref"),

    // x_pivot: static conditional-count pivot, 0 for absent combos.
    "x_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // x_unpivot: melt three measures; totals as exact DECIMAL sums cast
    // back to DOUBLE (no FP summation order).
    "x_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |SELECT metric, count(*) AS n,
        |  CAST(sum(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM m GROUP BY metric ORDER BY metric""".stripMargin,

    // w_range_window: RANGE frame on integer epoch seconds; decimal
    // sums so the sliding aggregation is FP-order-free.
    "w_range_window" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS es
        |           FROM events WHERE user_id < 20)
        |SELECT user_id, event_id,
        |  count(*) OVER w AS n_last_hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // e_decayed_engagement: 2^(-age_days) rounded 6 dp per event, terms
    // integer-micro summed; top-20 with (value DESC, user) tie-break.
    "e_decayed_engagement" ->
      """WITH ev AS (SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |mx AS (SELECT max(es) AS max_es FROM ev),
        |t AS (SELECT user_id,
        |        CAST(floor(value * round(pow(0.5, CAST(mx.max_es - es AS DOUBLE) / 86400.0), 6)
        |                   * 1000000.0) AS BIGINT) AS tm
        |      FROM ev CROSS JOIN mx),
        |agg AS (SELECT user_id, count(*) AS n_events,
        |          round(CAST(sum(tm) AS DOUBLE) / 1000000.0, 6) AS decayed_value
        |        FROM t GROUP BY 1)
        |SELECT user_id, n_events, decayed_value FROM agg
        |ORDER BY decayed_value DESC, user_id LIMIT 20""".stripMargin,

    // e_mad_outliers: integer-cent medians (every interpolation an
    // exact multiple of 0.5 → bitwise engine parity), Hampel rule at
    // (3.0 * 1.4826) computed as the same double product Spark folds.
    "e_mad_outliers" ->
      """WITH q AS (SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS u FROM events),
        |med AS (SELECT event_type, quantile_cont(u, 0.5) AS med, count(*) AS n
        |        FROM q GROUP BY 1),
        |d AS (SELECT q.event_type, abs(CAST(u AS DOUBLE) - med) AS dev, med, n
        |      FROM q JOIN med USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad_u FROM d GROUP BY 1)
        |SELECT d.event_type, any_value(d.n) AS n,
        |  any_value(d.med) / 100.0 AS median,
        |  any_value(md.mad_u) / 100.0 AS mad,
        |  CAST(sum(CASE WHEN d.dev > (CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE)) * md.mad_u
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // e_funnel: staged min-ts chain — each stage joins the previous
    // stage's completion time and requires a strictly later event.
    "e_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
        |      UNION ALL SELECT 2, 'click', count(*) FROM s2
        |      UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT step_idx, step, n_users,
        |  round(CAST(n_users AS DOUBLE)
        |    / CAST((SELECT n_users FROM c WHERE step_idx = 1) AS DOUBLE), 6) AS conv_total,
        |  round(CAST(n_users AS DOUBLE)
        |    / CAST(coalesce((SELECT c2.n_users FROM c c2 WHERE c2.step_idx = c.step_idx - 1),
        |                    n_users) AS DOUBLE), 6) AS conv_prev
        |FROM c ORDER BY step_idx""".stripMargin,

    // e_cohort_retention: ISO-week cohorts; week offsets are exact
    // multiples of 7 days, so the /7 division is exact in both engines.
    "e_cohort_retention" ->
      """WITH fw AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |            FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
        |c AS (SELECT cohort_week, CAST((w - cohort_week) / 7 AS INTEGER) AS week_offset,
        |        count(*) AS n_active
        |      FROM act JOIN fw USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort_week, n_active AS size FROM c WHERE week_offset = 0)
        |SELECT c.cohort_week, c.week_offset, c.n_active,
        |  round(CAST(c.n_active AS DOUBLE) / CAST(sz.size AS DOUBLE), 6) AS retention
        |FROM c JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // e_resample_locf: hourly grid per user via generate_series, carry
    // via native ASOF LEFT JOIN (ties-at-grid-point count, >= semantics,
    // matching AsOf.join's right-before-left tag order).
    "e_resample_locf" ->
      """WITH obs AS (SELECT user_id, ts, max(value) AS value FROM events
        |             WHERE user_id < 8 GROUP BY 1, 2),
        |spans AS (SELECT user_id, date_trunc('hour', min(ts)) AS lo,
        |            date_trunc('hour', max(ts)) AS hi
        |          FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
        |         FROM spans)
        |SELECT g.user_id, g.ts, round(o.value, 6) AS asof_value
        |FROM grid g ASOF LEFT JOIN obs o
        |  ON g.user_id = o.user_id AND g.ts >= o.ts
        |ORDER BY g.user_id, g.ts""".stripMargin,

    "x_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(value) AS pv FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, round(p.pv, 6) AS asof_purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY event_id""".stripMargin,

    "x_range_join" ->
      """SELECT s.s_suppkey, count(*) AS n_customers,
        |  CAST(sum(c.c_custkey) AS BIGINT) AS cust_checksum
        |FROM supplier s JOIN customer c
        |  ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal <= s.s_acctbal + 100.0
        |GROUP BY s.s_suppkey ORDER BY s_suppkey""".stripMargin,

    "x_interval_overlap" ->
      """SELECT s.s_suppkey, count(*) AS n_overlaps,
        |  CAST(sum(c.c_custkey) AS BIGINT) AS cust_checksum
        |FROM supplier s JOIN customer c
        |  ON c.c_acctbal <= s.s_acctbal + 100.0
        | AND s.s_acctbal <= c.c_acctbal + 50.0
        |GROUP BY s.s_suppkey ORDER BY s_suppkey""".stripMargin,

    // x_salted_join: the oracle is the PLAIN equi-join — salting must be
    // result-invisible.
    "x_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // j_hybrid_rrf: both retrieval lists replayed by their own oracle
    // pipelines (BM25 top-20, exact cosine top-20 for query vec 1), then
    // RRF-fused — reciprocal contributions rounded to 6 dp and summed as
    // exact DECIMAL(18,6), ties on ascending doc_id.
    "j_hybrid_rrf" ->
      s"""WITH sparse AS (SELECT doc_id, rank FROM (${bm25TopSql(20)})),
         |nrm AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |dense AS (
         |  SELECT neighbor_id AS doc_id, rank FROM (
         |    SELECT c.vec_id AS neighbor_id,
         |      row_number() OVER (ORDER BY
         |        CASE WHEN q.nrm * c.nrm = 0 THEN 0.0
         |             ELSE round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) END DESC,
         |        c.vec_id) AS rank
         |    FROM nrm q JOIN nrm c ON q.vec_id = 1 AND c.vec_id <> 1)
         |  WHERE rank <= 20),
         |u AS (
         |  SELECT doc_id, round(1.0 / (60 + rank), 6) AS c FROM sparse
         |  UNION ALL
         |  SELECT doc_id, round(1.0 / (60 + rank), 6) AS c FROM dense),
         |f AS (
         |  SELECT doc_id, CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS rrf_r,
         |    count(*) AS n_lists
         |  FROM u GROUP BY doc_id)
         |SELECT doc_id, rrf_r, n_lists,
         |  row_number() OVER (ORDER BY rrf_r DESC, doc_id) AS rank
         |FROM f QUALIFY rank <= 10 ORDER BY rank""".stripMargin,

    // e_multi_touch: linear attribution — each purchase's credit split
    // 1/n over the preceding hour's same-user clicks, shares rounded to
    // 6 dp and summed as exact DECIMAL(18,6), rolled up by click hour.
    "e_multi_touch" ->
      """WITH t AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT t.ts AS t_ts, c.event_id AS c_id
        |  FROM t JOIN c ON t.user_id = c.user_id AND t.ts <= c.ts
        |    AND t.ts >= c.ts - INTERVAL 1 HOUR),
        |w AS (SELECT t_ts, count(*) OVER (PARTITION BY c_id) AS n_trig FROM pairs)
        |SELECT CAST(hour(t_ts) AS BIGINT) AS click_hour, count(*) AS n_touches,
        |  CAST(sum(CAST(round(1.0 / n_trig, 6) AS DECIMAL(18,6))) AS DOUBLE) AS credit
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    // a_schema_diff: per-side column stats replayed with the engine's
    // profile semantics (unique counts the null group; strings P2
    // empty→null), full-outer joined, status by the same CASE ladder.
    "a_schema_diff" ->
      """WITH a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |           FROM orders WHERE o_orderkey % 3 < 2),
        |b AS (SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        |      FROM orders WHERE o_orderkey % 3 > 0),
        |pa AS (
        |  SELECT 'o_orderkey' AS col_name, 'integer' AS type_a, count(*) AS rows_a,
        |    count(*) - count(o_orderkey) AS nulls_a,
        |    count(DISTINCT o_orderkey) + CAST(count(*) > count(o_orderkey) AS BIGINT) AS uniq_a
        |  FROM a
        |  UNION ALL
        |  SELECT 'o_custkey', 'integer', count(*), count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey) + CAST(count(*) > count(o_custkey) AS BIGINT) FROM a
        |  UNION ALL
        |  SELECT 'o_orderstatus', 'string', count(*),
        |    count(*) - count(NULLIF(o_orderstatus, '')),
        |    count(DISTINCT NULLIF(o_orderstatus, ''))
        |      + CAST(count(*) > count(NULLIF(o_orderstatus, '')) AS BIGINT) FROM a
        |  UNION ALL
        |  SELECT 'o_totalprice', 'float', count(*), count(*) - count(o_totalprice),
        |    count(DISTINCT o_totalprice) + CAST(count(*) > count(o_totalprice) AS BIGINT) FROM a),
        |pb AS (
        |  SELECT 'o_orderkey' AS col_name, 'integer' AS type_b, count(*) AS rows_b,
        |    count(*) - count(o_orderkey) AS nulls_b,
        |    count(DISTINCT o_orderkey) + CAST(count(*) > count(o_orderkey) AS BIGINT) AS uniq_b
        |  FROM b
        |  UNION ALL
        |  SELECT 'o_custkey', 'integer', count(*), count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey) + CAST(count(*) > count(o_custkey) AS BIGINT) FROM b
        |  UNION ALL
        |  SELECT 'o_orderpriority', 'string', count(*),
        |    count(*) - count(NULLIF(o_orderpriority, '')),
        |    count(DISTINCT NULLIF(o_orderpriority, ''))
        |      + CAST(count(*) > count(NULLIF(o_orderpriority, '')) AS BIGINT) FROM b
        |  UNION ALL
        |  SELECT 'o_totalprice', 'float', count(*), count(*) - count(o_totalprice),
        |    count(DISTINCT o_totalprice) + CAST(count(*) > count(o_totalprice) AS BIGINT) FROM b)
        |SELECT col_name,
        |  CASE WHEN type_a IS NULL THEN 'added'
        |       WHEN type_b IS NULL THEN 'removed'
        |       WHEN type_a <> type_b THEN 'type_changed'
        |       WHEN rows_a <> rows_b OR nulls_a <> nulls_b OR uniq_a <> uniq_b THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  type_a, type_b, rows_a, nulls_a, uniq_a, rows_b, nulls_b, uniq_b
        |FROM pa FULL OUTER JOIN pb USING (col_name)
        |ORDER BY col_name""".stripMargin,

    "x_cube_agg" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    // w_window_suite: every ordering totalized by event_id, so
    // lag/lead/ntile/percent_rank/cume_dist are engine-exact.
    "w_window_suite" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
        |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v,
        |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS tile4,
        |  round(percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS pct_rank,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS cume
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,

    "x_rollup_agg" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "x_semi_anti_join" ->
      """SELECT 'anti' AS kind, count(*) AS n FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |UNION ALL
        |SELECT 'semi' AS kind, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY kind""".stripMargin,

    // ---- sketch pipeline (digest-exact via md5-derived base hash) ----
    "profile_sketches" -> profileSketchesSql,
    "lake_profile_unified" -> lakeProfileUnifiedSql,
    "lake_csv_unified" -> lakeCsvUnifiedSql,
    "q7_onnx_score" -> q7OnnxScoreSql,
    "e2e_encode_search" -> e2eEncodeSearchSql,
    "q6_vocab_embed" -> q6VocabEmbedSql,
    "q7_encoder_tanh" -> q7EncoderTanhSql,
    "q7_encoder_gelu" -> q7EncoderGeluSql,
    "q7_encoder_gelu_exact" -> q7EncoderGeluExactSql,
    "q7_transformer_score" -> q7TransformerScoreSql,
    "q7_encoder_stack" -> q7TransformerSql(3),
    "q6_value_embed" -> q6ValueEmbedSql,
    "st_stream_embed" -> stStreamEmbedSql,
    "q1_embed_extract" -> q1EmbedExtractSql,
    // full-frame decode: per-channel means recomputed from the generative
    // pixel formulas (SparkEntry.mmPixelDecode encodes the same formulas
    // through deflate+filters / LZW / FDCT+Huffman; the engine must
    // reverse each codec to land on these numbers). JPEG legs are exact
    // because tile-constant blocks carry only a DC coefficient, which
    // unit quantization preserves bit-for-bit; the color leg's neutral
    // chroma makes the JFIF transform return R=G=B=Y exactly.
    "mm_pixel_decode" ->
      """WITH imgs AS (
        |  SELECT i AS media_id, 'png' AS fmt, 8 + (i % 5) * 3 AS w,
        |         6 + (i % 4) * 2 AS h, (i * 17) % 251 AS seed
        |  FROM generate_series(1, 12) t(i)
        |  UNION ALL
        |  SELECT i, 'gif', 7 + (i % 4) * 5, 5 + (i % 3) * 4, (i * 29) % 101
        |  FROM generate_series(13, 18) t(i)
        |  UNION ALL
        |  SELECT i, 'jgray', 9 + (i % 5) * 4, 7 + (i % 4) * 3, (i * 31) % 200
        |  FROM generate_series(19, 24) t(i)
        |  UNION ALL
        |  SELECT i, 'jcolor', 14 + (i % 3) * 9, 10 + (i % 2) * 13, (i * 23) % 150
        |  FROM generate_series(25, 30) t(i)),
        |xs AS (SELECT media_id, fmt, w, h, seed,
        |       unnest(generate_series(0, w - 1)) AS x FROM imgs),
        |ys AS (SELECT media_id, fmt, w, h, seed, x,
        |       unnest(generate_series(0, h - 1)) AS y FROM xs),
        |cells AS (SELECT media_id, w, h,
        |            CASE WHEN fmt = 'png'
        |              THEN (x * 3 + y * 7 + c * 11 + seed) % 256
        |              -- gif: palette-resolved ramp — index (x*3+y*7+seed)%64,
        |              -- palette channel c = (idx*(5|9|11) + (13|7|3)) % 256
        |            WHEN fmt = 'gif'
        |              THEN (((x * 3 + y * 7 + seed) % 64) * [5, 9, 11][c + 1]
        |                    + [13, 7, 3][c + 1]) % 256
        |              -- jpeg grayscale: 8x8-tile-constant luma, channel 0 only
        |            WHEN fmt = 'jgray'
        |              THEN CASE WHEN c = 0
        |                THEN ((x // 8) * 5 + (y // 8) * 11 + seed) % 256 END
        |              -- jpeg 4:2:0 neutral-chroma: R=G=B = 16x16-tile luma
        |              ELSE ((x // 16) * 5 + (y // 16) * 11 + seed) % 256
        |            END AS v, c
        |          FROM (SELECT *, unnest([0, 1, 2]) AS c FROM ys))
        |SELECT media_id, CAST(w AS BIGINT) AS px_width, CAST(h AS BIGINT) AS px_height,
        |  round(avg(CASE WHEN c = 0 THEN v END), 6) AS mean_r,
        |  round(avg(CASE WHEN c = 1 THEN v END), 6) AS mean_g,
        |  round(avg(CASE WHEN c = 2 THEN v END), 6) AS mean_b
        |FROM cells GROUP BY media_id, w, h ORDER BY media_id""".stripMargin,
    // WAV decode: frames/duration/RMS recomputed from the generative
    // sample formula (v² is an exact integer, so avg/sqrt match the
    // engine's doubles bit-for-bit)
    "mm_audio_decode" ->
      """WITH clips AS (
        |  SELECT i AS media_id,
        |         ([8000, 16000, 22050, 44100])[(i % 4) + 1] AS rate,
        |         1 + (i % 3) AS ch, 100 + (i % 5) * 77 AS frames,
        |         (i * 13) % 97 AS seed
        |  FROM generate_series(1, 10) t(i)),
        |vals AS (
        |  SELECT media_id, rate, ch, frames,
        |         ((k * 37 + seed) % 4096) - 2048 AS v
        |  FROM (SELECT *, unnest(generate_series(0, frames * ch - 1)) AS k
        |        FROM clips))
        |SELECT media_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(ch AS BIGINT) AS n_channels, CAST(frames AS BIGINT) AS n_frames,
        |  CAST(frames * 1000 // rate AS BIGINT) AS duration_ms,
        |  round(sqrt(avg(v * v)), 6) AS rms_r
        |FROM vals GROUP BY media_id, rate, ch, frames ORDER BY media_id""".stripMargin,
    // sliding-window chunking: same tokens, same window arithmetic,
    // chunk text rebuilt by list slicing and compared verbatim
    "t_chunk_windows" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id % 7 = 3 AND trim(text) <> ''),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
        |c AS (SELECT doc_id, toks, n,
        |        unnest(generate_series(0,
        |          CASE WHEN n <= 64 THEN 0
        |               ELSE (n - 64 + 47) // 48 END)) AS chunk_idx
        |      FROM n)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 48 AS BIGINT) AS chunk_start,
        |  CAST(least(64, n - chunk_idx * 48) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, chunk_idx * 48 + 1,
        |    least(chunk_idx * 48 + 64, n)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // greedy per-shard packing: the engine's per-shard state machine
    // replayed as a recursive CTE (rn-ordered fold over each shard)
    "t_pack_sequences" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id AS id, doc_id % 16 AS shard,
        |         len(string_split_regex(trim(text), '\s+')) AS n,
        |         row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS rn
        |  FROM documents WHERE trim(text) <> ''),
        |rec AS (
        |  SELECT shard, rn, id, n, CAST(0 AS BIGINT) AS bin,
        |         CASE WHEN 512 - n > 0 THEN 512 - n ELSE 0 END AS rem
        |  FROM toks WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.rn, t.id, t.n,
        |    CASE WHEN t.n <= r.rem THEN r.bin ELSE r.bin + 1 END,
        |    CASE WHEN t.n <= r.rem THEN r.rem - t.n
        |         WHEN 512 - t.n > 0 THEN 512 - t.n ELSE 0 END
        |  FROM toks t JOIN rec r ON t.shard = r.shard AND t.rn = r.rn + 1)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(bin AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS bin_tokens,
        |  CAST(min(id) AS BIGINT) AS first_doc,
        |  CAST(max(id) AS BIGINT) AS last_doc
        |FROM rec GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    // cross-format media dedup: duplicate groups recomputed INDEPENDENTLY
    // by materializing every id's decoded raster from its generative
    // formula (GIF palette arithmetic, 8/16-pixel gray tiles, PNG ramp)
    // and grouping ids on the full ordered pixel sequence + dimensions —
    // the engine must land on identical groups via decoded-content hashes
    "d_media_dedup" ->
      """WITH geom AS (
        |  SELECT i AS id,
        |    CASE WHEN i <= 8 THEN 11 + (i - 1) // 2
        |         WHEN i <= 10 THEN 16 WHEN i <= 12 THEN 24
        |         WHEN i <= 15 THEN 32
        |         WHEN i = 16 THEN 10 WHEN i = 17 THEN 9 ELSE 17 END AS w,
        |    CASE WHEN i <= 8 THEN 7 + (i - 1) // 2
        |         WHEN i <= 10 THEN 16 WHEN i <= 12 THEN 9
        |         WHEN i <= 15 THEN 32
        |         WHEN i = 16 THEN 6 WHEN i = 17 THEN 8 ELSE 11 END AS h,
        |    CASE WHEN i <= 8 THEN 3 WHEN i <= 12 THEN 1 WHEN i <= 15 THEN 3
        |         WHEN i = 16 THEN 3 WHEN i = 17 THEN 3 ELSE 1 END AS ch,
        |    CASE WHEN i <= 8 OR i = 17 THEN 'gifpal'
        |         WHEN i <= 12 OR i = 18 THEN 'gray8'
        |         WHEN i <= 15 THEN 'gray16'
        |         ELSE 'pngramp' END AS fmt,
        |    CASE WHEN i <= 8 THEN 10 + 7 * ((i - 1) // 2)
        |         WHEN i <= 10 THEN 101 WHEN i <= 12 THEN 33
        |         WHEN i <= 15 THEN 77
        |         WHEN i = 16 THEN 200 WHEN i = 17 THEN 55 ELSE 66 END AS seed
        |  FROM generate_series(1, 18) t(i)),
        |xs AS (SELECT *, unnest(generate_series(0, w - 1)) AS x FROM geom),
        |ys AS (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM xs),
        |cells AS (
        |  SELECT id, w, h, ch, x, y, c,
        |    CASE fmt
        |      WHEN 'gifpal' THEN (((x * 3 + y * 7 + seed) % 64) * [5, 9, 11][c + 1]
        |                          + [13, 7, 3][c + 1]) % 256
        |      WHEN 'gray8'  THEN ((x // 8) * 5 + (y // 8) * 11 + seed) % 256
        |      WHEN 'gray16' THEN ((x // 16) * 5 + (y // 16) * 11 + seed) % 256
        |      ELSE (x * 3 + y * 7 + c * 11 + seed) % 256
        |    END AS v
        |  FROM (SELECT *, unnest(generate_series(0, ch - 1)) AS c FROM ys)),
        |rasters AS (
        |  SELECT id, w || 'x' || h || 'x' || ch || ':' ||
        |         string_agg(v::VARCHAR, ',' ORDER BY y, x, c) AS raster
        |  FROM cells GROUP BY id, w, h, ch)
        |SELECT CAST(min(id) AS BIGINT) AS keeper,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  string_agg(id::VARCHAR, ',' ORDER BY id) AS member_ids
        |FROM rasters GROUP BY raster HAVING count(*) > 1
        |ORDER BY keeper""".stripMargin,
    // MP4 probe: duration/dims/track-count recomputed from the same
    // integer formulas the synthetic containers encode (timescale
    // division is integer on both sides)
    "mm_video_probe" ->
      """SELECT i AS media_id,
        |  CAST((([600, 1000, 90000, 48000])[(i % 4) + 1] * (10 + i) + i * 7)
        |       * 1000 // ([600, 1000, 90000, 48000])[(i % 4) + 1] AS BIGINT)
        |    AS duration_ms,
        |  CAST(320 + i * 16 AS BIGINT) AS vid_width,
        |  CAST(180 + i * 9 AS BIGINT) AS vid_height,
        |  CAST(CASE WHEN i % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_tracks
        |FROM generate_series(1, 8) t(i) ORDER BY media_id""".stripMargin,
    // same semantics as o4_search_minhash — the e2e row additionally
    // routes the catalog through a store round-trip before searching
    "e2e_lake_search" -> searchMinhashSql,
    "content_snapshots" -> contentSnapshotsSql,
    "j5_minhash_pairs" -> minhashPairsSql,
    "d_minhash_lsh" -> minhashLshSql,
    "d_simhash_pairs" -> simhashPairsSql,
    "d_emb_neardups" -> embNearDupsSql,
    "ann_ivf_topk" -> annIvfSql,
    "ann_quantized_topk" -> annQuantizedSql,
    "ann_rerank_topk" -> annRerankSql,
    "a15_content_hash" -> contentHashSql,
    "a_augment_hashes" -> augmentHashesSql,
    "t2_tokenizer_layout" -> tokenizerLayoutSql,
    "type_inference" -> typeInferenceSql,
    "t1_feature_tensors" -> featureTensorsSql,
    "t_lang_quality" -> langQualitySql,
    "mm_media_stats" -> mediaStatsSql,
    "mm_frame_plan" ->
      """SELECT doc_id AS media_id,
        |  CAST((n_chars * 100) // 1000 + 1 AS BIGINT) AS n_frames,
        |  CAST(((n_chars * 100) // 1000) * 1000 AS BIGINT) AS last_offset_ms
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
    "o4_search_minhash" -> searchMinhashSql,
    "o4_search_subset" -> searchSubsetSql,
    "m4_pair_features" -> pairFeaturesSql,
    "a14_hashing_sketch" -> hashingSketchSql,
    "st_stream_profile" -> streamProfileSql,
    // streamed dedup must keep exactly one row per distinct fingerprint key
    "st_stream_dedup" ->
      """SELECT event_type,
        |  count(DISTINCT coalesce(CAST(user_id AS VARCHAR), chr(2))) AS n_kept
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // round-trip fixtures: Verify writes these files BEFORE the oracle
    // runs; DuckDB parses the same bytes with its own readers
    "s2_compressed_roundtrip" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n,
        |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
        |  CAST(sum(length(n_name)) AS BIGINT) AS name_chars
        |FROM read_csv('/tmp/graft_fixtures/nation_gz/*.csv.gz', header=true)
        |GROUP BY 1 ORDER BY n_regionkey""".stripMargin,

    "s7s8_sketch_roundtrip" -> profileSketchesSqlFor(Seq("region", "nation")),
    "s7_json_roundtrip" -> jsonRoundtripSql,
    "s3_ingest_hygiene" -> ingestHygieneSql,
    "j2_missing_pairs" -> missingPairsSql,
    "j3_search_eval" -> searchEvalSql,
    "j3_ndcg" -> searchNdcgSql,
    "inc_profile_merge" -> incProfileMergeSql,
    "inc_quantile_sketch" -> quantileSketchSql,
    "w_domain_cap" -> domainCapSql,
    "t2_bpe_train" -> bpeTrainSql,
    "ann_kmeans_ivf" -> annKmeansIvfSql,
    "j_cluster_agreement" -> clusterAgreementSql,
    "d_semdedup" -> semDedupSql,
    "ann_pq_adc" -> annPqAdcSql,
    "ann_ivfpq" -> annIvfPqSql,
    "ann_ivfpq_recall" -> annIvfPqRecallSql,
    "d_dsir_sample" -> dsirSampleSql,
    "st_stream_quantiles" -> quantileSketchSql("lineitem"),
    "x_zorder" -> zorderSql,
    "t2_bpe_encode" -> bpeEncodeSql,
    "t2_bpe_fertility" -> bpeFertilitySql,
    "t2_unigram_train" -> unigramTrainSql,
    "t2_unigram_encode" -> unigramEncodeSql,
    "t2_unigram_fertility" -> unigramFertilitySql,
    "t2_unigram_prune" -> unigramPruneSql,
    "t2_tokenizer_compare" -> tokenizerCompareSql,
    "st_stream_unigram" -> unigramStreamSql,
    "d_tracin_influence" -> tracinSql,
    "t_lr_quality" -> lrQualitySql,
    "t_lr_quality_weights" -> lrQualityWeightsSql,
    "t_quality_filter" -> qualityFilterSql,
    "d_dedup_corpus" -> dedupCorpusSql,
    "d_cluster_canonical" -> clusterCanonicalSql,
    "d_corpus_diff" -> corpusDiffSql,
    "w_page_rank" -> pageRankSql,
    "w_kcore" -> kCoreSql,
    "w_label_prop" -> labelPropSql,
    "t_ngram_novelty" -> ngramNoveltySql,
    "t_length_histogram" -> lengthHistogramSql,
    "d_leakage_split" -> leakageSplitSql,
    "t_token_budget" -> tokenBudgetSql,
    "d_domain_reweight" -> domainReweightSql,
    "x_chinchilla_plan" -> chinchillaPlanSql,
    "d_mix_epochs" -> mixEpochsSql,
    "w_url_dedup" -> urlDedupSql,
    "mm_dhash_neardup" -> dhashNearDupSql,
    "mm_audio_fingerprint" -> audioFpSql,
    "s_corpus_sink" -> corpusSinkSql,
    "st_stream_rate" -> streamRateSql,
    "t_pii_scrub" -> piiScrubSql,
    "d_stratified_sample" -> stratifiedSampleSql,

    // d_weighted_sample: Efraimidis–Spirakis keys — u from the salted id
    // hash, ln(u) rounded to 6 dp BEFORE the divide by weight (the BM25
    // transcendental discipline), top-5 per lang by key desc, id asc.
    "d_weighted_sample" ->
      """WITH k AS (
        |  SELECT lang, doc_id, n_chars,
        |    round(ln((CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':ws0') & 4294967295) AS DOUBLE) + 1.0)
        |             / 4294967296.0), 6) / CAST(n_chars AS DOUBLE) AS key
        |  FROM documents WHERE n_chars > 0)
        |SELECT lang, doc_id, n_chars, round(key, 6) AS sample_key FROM k
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) <= 5
        |ORDER BY lang, doc_id""".stripMargin,
    "d_decontam_report" -> decontamSql,
    // streamed == batch IS the contract: the streaming guard must
    // reproduce the batch overlap report bit-for-bit
    "st_stream_decontam" -> decontamSql,
    "e2e_curation_funnel" -> curationFunnelSql,
    "d_lsh_calibration" -> lshCalibrationSql,
    "d_lsh_autoplan" -> lshAutoplanSql,
    "a_bootstrap_ci" -> bootstrapCiSql,
    "d_bloom_prefilter" -> bloomPrefilterSql,

    // d_bloom_merge: chunked set-bit union == one-shot build IS the
    // oracle (only the one-shot side is replayed)
    "d_bloom_merge" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')]
        |             ELSE list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS sh
        |      FROM d),
        |vs AS (SELECT DISTINCT unnest(sh) AS s FROM g),
        |bits AS (SELECT DISTINCT (md5_number_lower(s || ':bloom' || i) & 4294967295) % 1024 AS p
        |         FROM vs, unnest([0, 1, 2]) AS t(i))
        |SELECT count(*) AS n_set_bits, CAST(sum(p) AS BIGINT) AS pos_checksum,
        |  round(CAST(count(*) AS DOUBLE) / 1024, 6) AS fill_ratio
        |FROM bits""".stripMargin,
    "d_line_dedup" -> lineDedupSql,
    "d_dup_spans" -> dupSpansSql,
    "d_dup_span_coverage" -> dupSpanCoverageSql,
    "d_substring_dedup" -> removeSpansSql,
    "t_cms_freq" -> cmsFreqSql,
    // streamed CMS must converge to the batch sketch — same oracle.
    "st_stream_cms" -> cmsFreqSql,
    "d_incremental_dedup" -> incrementalDedupSql,
    "a_hll_distinct" -> hllDistinctSql,
    "a_kmv_distinct" -> kmvDistinctSql,
    "a_col_entropy" -> colEntropySql,
    "a_fd_scan" -> fdScanSql,
    "a_ind_scan" -> indScanSql,
    "a_key_discovery" -> keyDiscoverySql,
    "d_fuzzy_pairs" -> fuzzyPairsSql,
    "d_ppjoin_pairs" -> ppjoinPairsSql,
    "d_exact_dedup_corpus" -> exactDedupCorpusSql,
    "t_collocations" -> collocationsSql,
    "q_class_weights" -> classWeightsSql,
    "q_calibration" -> calibrationSql,
    "w_graph_stats" -> graphStatsSql,
    "p_quality_checks" -> qualityChecksSql,
    "a_psi_drift" -> psiDriftSql,
    "a_entropy_mi" -> entropyMiSql,
    "a_kmv_setops" -> kmvSetOpsSql,
    "d_temperature_mix" -> temperatureMixSql,
    "t_pmi_bigrams" -> pmiBigramsSql,
    "t_textrank_keywords" -> textrankSql,
    "t_readability" -> readabilitySql,
    "t_tfidf_terms" -> tfidfTermsSql,
    "t_repetition" -> repetitionSql,
    "q5_table_search" -> tableSearchSql,
    "e_change_history" -> changeHistorySql,
    "t_vocab_coverage" -> vocabCoverageSql,
    "a_key_skew" -> keySkewSql,
    // streamed session windows must equal the batch islands — the
    // oracle replays them relationally at micros precision.
    "st_stream_sessions" -> streamSessionsSql,
    "ann_mmr_rerank" -> mmrRerankSql,
    "t_heavy_hitters" -> heavyHittersSql,
    "a_woe_iv" -> woeIvSql,
    "a_chi2_assoc" -> chi2AssocSql,
    "e_trend_mk" -> trendMkSql,
    "e_acf" -> acfSql,
    "e_theil_sen" -> theilSenSql,
    "a_benford" -> benfordSql,
    "w_triangles" -> trianglesSql,
    "e_changepoint" -> changepointSql,
    "d_kfold" -> kFoldSql,
    "e_transitions" -> transitionsSql,
    "e_ab_test" -> abTestSql,
    "j3_rank_corr" -> rankCorrSql,
    "st_stream_enrich" -> streamEnrichSql,
    "st_stream_attrib" -> streamAttribSql,
    "e_time_to_convert" -> timeToConvertSql,
    "a_ks_test" -> ksTestSql,
    "x_grouping_sets" -> groupingSetsSql,
    "j_revenue_share" -> revenueShareSql,
    "w_components" -> componentsSql,
    // incremental == from-scratch IS the oracle: folding the second
    // edge batch into the first batch's label catalog must equal the
    // full closure over all edges
    "d_incremental_clusters" -> componentsSql,
    "w_hits" -> hitsSql,
    "a_eqfreq_bins" -> eqfreqBinsSql,
    "a_join_estimate" -> joinEstimateSql,
    "d_lsh_quality" -> lshQualitySql,
    "t_zipf" -> zipfSql,
    "emb_centroids" -> embCentroidsSql,
    "q_contrastive_pairs" -> contrastivePairsSql,
    "x_groupby_ols" -> groupedOlsSql,
    "e_top_paths" -> topPathsSql,
    "a_info_gain" -> infoGainSql,
    "w_reciprocity" -> reciprocitySql,
    "a_boxplot" -> boxplotSql,
    "e_last_touch" -> lastTouchSql,
    "ann_recall_audit" -> annRecallSql,
    "t_corpus_card" -> corpusCardSql,
    "emb_dim_variance" -> dimVarianceSql,
    "emb_pca_power" -> pcaPowerSql,
    "emb_abtt" -> abttSql,
    "emb_cka" -> embCkaSql,
    "emb_matryoshka" -> matryoshkaSql,
    "emb_jl_overlap" -> jlOverlapSql,
    "d_kcenter_coreset" -> kCenterSql,
    "t_c4_filters" -> c4FiltersSql,
    "t_ppl_buckets" -> pplBucketsSql,
    "t_ppl_buckets_sketch" -> pplBucketsSketchSql,
    "t_quality_agreement" -> qualityAgreementSql,

    // t_ngram_entropy: micro-nat terms floor(c·round6(ln(n/c))·1e6)
    // over the three bounded count relations; conditional = one
    // subtraction of the two rounded entropies
    "t_ngram_entropy" ->
      """WITH tok AS (SELECT t FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents)
        |  WHERE t <> ''),
        |uc AS (SELECT count(*) AS c FROM tok GROUP BY t),
        |uh AS (SELECT CAST(any_value(n) AS BIGINT) AS n, count(*) AS nd,
        |    round(CAST(sum(tm) AS DOUBLE) / any_value(n) / 1000000.0, 6) AS h
        |  FROM (SELECT c, CAST(sum(c) OVER () AS BIGINT) AS n,
        |          CAST(floor(CAST(c AS DOUBLE)
        |            * round(ln(CAST(sum(c) OVER () AS DOUBLE) / c), 6)
        |            * 1000000.0) AS BIGINT) AS tm
        |        FROM uc)),
        |d AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
        |gg AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        |       FROM d WHERE len(w) >= 2),
        |bc AS (SELECT count(*) AS c FROM gg GROUP BY g),
        |bh AS (SELECT CAST(any_value(n) AS BIGINT) AS n, count(*) AS nd,
        |    round(CAST(sum(tm) AS DOUBLE) / any_value(n) / 1000000.0, 6) AS h
        |  FROM (SELECT c, CAST(sum(c) OVER () AS BIGINT) AS n,
        |          CAST(floor(CAST(c AS DOUBLE)
        |            * round(ln(CAST(sum(c) OVER () AS DOUBLE) / c), 6)
        |            * 1000000.0) AS BIGINT) AS tm
        |        FROM bc)),
        |cc AS (SELECT count(*) AS c FROM (SELECT split_part(g, ' ', 1) AS w1 FROM gg) GROUP BY w1),
        |ch AS (SELECT round(CAST(sum(tm) AS DOUBLE) / any_value(n) / 1000000.0, 6) AS h
        |  FROM (SELECT c, CAST(sum(c) OVER () AS BIGINT) AS n,
        |          CAST(floor(CAST(c AS DOUBLE)
        |            * round(ln(CAST(sum(c) OVER () AS DOUBLE) / c), 6)
        |            * 1000000.0) AS BIGINT) AS tm
        |        FROM cc))
        |SELECT uh.n AS n_tokens, uh.nd AS n_distinct_tokens, uh.h AS h_unigram,
        |  bh.n AS n_bigrams, bh.nd AS n_distinct_bigrams, bh.h AS h_bigram,
        |  round(bh.h - ch.h, 6) AS h_conditional
        |FROM uh, bh, ch""".stripMargin,

    "w_source_concentration" ->
      """WITH p AS (SELECT source,
        |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS n_sources, CAST(sum(n_tok) AS BIGINT) AS total,
        |      sum(CAST(n_tok AS HUGEINT) * n_tok) AS ss FROM p),
        |r AS (SELECT n_tok, row_number() OVER (ORDER BY n_tok DESC, source) AS rn FROM p)
        |SELECT t.n_sources, t.total AS total_tokens,
        |  CAST(((SELECT n_tok FROM r WHERE rn = 1) * 1000000) // t.total AS BIGINT) / 1000000.0 AS top1_share,
        |  CAST(((SELECT CAST(sum(n_tok) AS BIGINT) FROM r WHERE rn <= 5) * 1000000) // t.total AS BIGINT) / 1000000.0 AS top5_share,
        |  CAST((t.ss * 1000000) // (CAST(t.total AS HUGEINT) * t.total) AS BIGINT) / 1000000.0 AS hhi
        |FROM t""".stripMargin,
    "x_merge_upsert" -> mergeUpsertSql,
    "e2e_ccnet_funnel" -> ccnetFunnelSql,
    "mm_resize" -> mmResizeSql,
    "emb_knn_graph" -> knnGraphSql,
    "emb_label_agreement" -> labelAgreementSql,
    "j3_mrr" -> searchMrrSql,
    "j3_map" -> searchMapSql,
    "ann_cell_balance" -> cellBalanceSql,
    // streamed == batch IS the oracle: the streaming C4 rollup must
    // equal the batch replay exactly
    "st_stream_c4" -> c4FiltersSql,

    // st_stream_upsert: micro-batched LWW folds must equal the one-shot
    // latest-per-key compaction (tombstones excluded from the live view)
    "st_stream_upsert" ->
      """WITH ev AS (SELECT user_id, event_type, ts, event_id,
        |    CAST(value AS DOUBLE) AS value,
        |    CASE WHEN event_id % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM events),
        |w AS (SELECT * FROM ev
        |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) = 1)
        |SELECT event_type, count(*) AS n_keys,
        |  CAST(sum(user_id) AS BIGINT) AS user_checksum,
        |  CAST(sum(event_id) AS BIGINT) AS event_checksum,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM w WHERE op <> 'delete' GROUP BY 1 ORDER BY 1""".stripMargin,

    "e_seasonality" ->
      """WITH c AS (SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type FROM c GROUP BY 1)
        |SELECT c.event_type, c.dow, c.n,
        |  CAST((c.n * 7 * 1000000) // t.n_type AS BIGINT) / 1000000.0 AS seasonality_idx
        |FROM c JOIN t USING (event_type) ORDER BY event_type, dow""".stripMargin,

    "d_soft_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(regexp_replace(lower(trim(substr(text, 1, 80))), '\s+', ' ', 'g')) AS fp FROM documents),
        |g AS (SELECT fp, count(*) AS n FROM fp GROUP BY fp)
        |SELECT CAST(g.n AS BIGINT) AS cl_size,
        |  CAST(1000000 // g.n AS BIGINT) AS weight_ppm,
        |  count(*) AS n_docs, CAST(sum(f.doc_id) AS BIGINT) AS id_checksum
        |FROM fp f JOIN g USING (fp) GROUP BY 1, 2 ORDER BY cl_size""".stripMargin,
    "e_rolling_wau" -> rollingWauSql,

    // x_latest_by_key: the compacted current-state view — latest row
    // per key by (ts, event_id), replayed with a rank window.
    "x_latest_by_key" ->
      """SELECT user_id, event_type, ts AS last_ts, event_id AS last_event_id,
        |  CAST(value AS DOUBLE) AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    // s_csv_write_roundtrip: the writer must round-trip losslessly —
    // the oracle checksums the SOURCE table directly.
    "s_csv_write_roundtrip" ->
      """SELECT count(*) AS n_rows, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  CAST(sum(length(n_name)) AS BIGINT) AS name_len_sum,
        |  CAST(sum(n_regionkey) AS BIGINT) AS region_sum
        |FROM nation""".stripMargin,

    "s10_split_roundtrip" ->
      """WITH raw AS (SELECT * FROM read_json_auto('/tmp/graft_fixtures/pair_labels.json')),
        |x AS (
        |  SELECT 'train' AS split, unnest(train, recursive := false) AS r FROM raw
        |  UNION ALL SELECT 'valid', unnest(valid, recursive := false) FROM raw
        |  UNION ALL SELECT 'test', unnest(test, recursive := false) FROM raw)
        |SELECT split,
        |  regexp_replace(string_split(r.table1.filename, '/')[-1], '\.csv(\.bz2|\.gz)?$', '') AS t1,
        |  regexp_replace(string_split(r.table2.filename, '/')[-1], '\.csv(\.bz2|\.gz)?$', '') AS t2,
        |  CAST(r.label AS BIGINT) AS label
        |FROM x ORDER BY split, t1, t2""".stripMargin,

    "s5_sidecar_merge" ->
      """WITH meta AS (
        |  SELECT table_name, table_description, dataset_description
        |  FROM read_json_auto('/tmp/graft_fixtures/sidecars/*.meta.json')),
        |counts AS (
        |  SELECT 'region' AS table_name, count(*) AS n_rows FROM region
        |  UNION ALL SELECT 'nation', count(*) FROM nation)
        |SELECT m.table_name, m.table_description, m.dataset_description, c.n_rows
        |FROM meta m JOIN counts c USING (table_name)
        |ORDER BY table_name""".stripMargin,

    "o7_seeded_shuffle" ->
      """SELECT pos, c_custkey FROM (
        |  SELECT CAST(row_number() OVER (
        |      ORDER BY md5('42' || chr(1) ||
        |        CASE WHEN c_custkey IS NULL THEN '0' ELSE '1' END || chr(1) ||
        |        coalesce(CAST(c_custkey AS VARCHAR), '')), c_custkey)
        |    AS BIGINT) AS pos,
        |    CAST(c_custkey AS BIGINT) AS c_custkey
        |  FROM customer)
        |WHERE pos <= 100 ORDER BY pos""".stripMargin,

    "s12_excel_charset" -> {
      val files = Seq("latin1.csv" -> "ISO-8859-1", "utf16.csv" -> "UTF-16LE",
        "book.xlsx" -> "xlsx", "book.xls" -> "xls-biff8")
      val exp = files.flatMap { case (f, cs) =>
        SparkEntry.CharsetFixtureRows.map { case (id, n, c) =>
          s"('$f', '$cs', $id, '$n', '$c')"
        }
      }.mkString(",\n  ")
      val conv = files.map { case (f, _) =>
        s"""SELECT '$f' AS file, id, name, city
           |  FROM read_csv('/tmp/graft_fixtures/charset_utf8/$f.csv', header=true,
           |    columns={'id': 'BIGINT', 'name': 'VARCHAR', 'city': 'VARCHAR'})"""
          .stripMargin
      }.mkString("\n  UNION ALL ")
      // expected literals JOIN the engine-converted UTF-8 copies: a wrong
      // decode (or a conversion that doesn't match the in-memory read)
      // drops rows from the join and the compare fails on row count
      s"""WITH exp(file, charset, id, name, city) AS (VALUES
         |  $exp),
         |conv AS (
         |  $conv)
         |SELECT e.file, e.charset, CAST(e.id AS BIGINT) AS id, e.name, e.city
         |FROM exp e JOIN conv c
         |  ON c.file = e.file AND c.id = e.id AND c.name = e.name AND c.city = e.city
         |ORDER BY e.file, e.id""".stripMargin
    },

    // JSONL ingest replay: DuckDB parses the same shards (gz transparent)
    // with ignore_errors, so parsed values come from the FILES, not from
    // the engine; the corrupt counts are stated as literals the way the
    // charset fixture states its expected rows (shard0 carries exactly
    // one corrupt line by construction, shard1 none).
    "s_jsonl_scan" -> {
      val jcols = "columns={'id': 'BIGINT', 'Title': 'VARCHAR', " +
        "'meta': 'STRUCT(lang VARCHAR, score BIGINT)'}"
      s"""WITH u AS (
         |  SELECT 'shard0.jsonl' AS file, 1 AS n_corrupt, id, "Title" AS title,
         |    meta.lang AS lang, meta.score AS score
         |  FROM read_json('/tmp/graft_fixtures/jsonl/shard0.jsonl',
         |    format='newline_delimited', ignore_errors=true, $jcols)
         |  UNION ALL
         |  SELECT 'shard1.jsonl.gz', 0, id, "Title", meta.lang, meta.score
         |  FROM read_json('/tmp/graft_fixtures/jsonl/shard1.jsonl.gz',
         |    format='newline_delimited', ignore_errors=true, $jcols))
         |SELECT file, CAST(n_corrupt AS BIGINT) AS n_corrupt, id, title, lang, score
         |FROM u
         |WHERE id IS NOT NULL OR title IS NOT NULL OR lang IS NOT NULL
         |   OR score IS NOT NULL -- ignore_errors renders a skipped line all-NULL
         |ORDER BY file, id""".stripMargin
    },

    // WordPiece replay: the greedy longest-match choice at each (word,
    // position) does not depend on segmentation history, so `best`
    // precomputes it per position and `walk` just follows the path.
    // Constants mirror wordpieceQ: vocab docs<=20, maxSize 60 (56 pieces
    // after the 4 specials), encode docs<=10, maxLen 32 (30 body slots).
    "t2_wordpiece" ->
      """WITH RECURSIVE
        |words AS (
        |  SELECT w FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |    FROM documents WHERE doc_id <= 20) WHERE w <> ''),
        |chars AS (
        |  SELECT DISTINCT c AS piece FROM (
        |    SELECT unnest(string_split(w, '')) AS c
        |    FROM (SELECT DISTINCT w FROM words)) WHERE c <> ''),
        |cand AS (
        |  SELECT piece, 9223372036854775807 AS freq FROM chars
        |  UNION ALL SELECT '##' || piece, 9223372036854775807 FROM chars
        |  UNION ALL SELECT w AS piece, count(*) AS freq FROM words GROUP BY w),
        |lim AS (
        |  SELECT piece, max(freq) AS freq FROM cand GROUP BY piece
        |  ORDER BY max(freq) DESC, piece LIMIT 56),
        |vocab AS (
        |  SELECT piece, CAST(id AS BIGINT) AS id FROM (VALUES
        |    ('[PAD]', 0), ('[UNK]', 1), ('[CLS]', 2), ('[SEP]', 3)) sp(piece, id)
        |  UNION ALL
        |  SELECT piece, CAST(row_number() OVER (ORDER BY freq DESC, piece) + 3 AS BIGINT)
        |  FROM lim),
        |dw AS (
        |  SELECT DISTINCT w FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |    FROM documents WHERE doc_id <= 10) WHERE w <> ''),
        |pieces AS (
        |  SELECT id, piece LIKE '##%' AS cont,
        |    CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS core
        |  FROM vocab WHERE piece NOT LIKE '[%'),
        |wp AS (SELECT w, unnest(generate_series(1, length(w))) AS pos FROM dw),
        |best AS (
        |  SELECT wp.w, wp.pos, arg_max(p.id, length(p.core)) AS pid,
        |    max(length(p.core)) AS plen
        |  FROM wp JOIN pieces p
        |    ON p.cont = (wp.pos > 1)
        |   AND substr(wp.w, wp.pos, length(p.core)) = p.core
        |  GROUP BY wp.w, wp.pos),
        |walk(w, pos, ids) AS (
        |  SELECT w, 1, CAST([] AS BIGINT[]) FROM dw
        |  UNION ALL
        |  SELECT x.w, x.pos + b.plen, list_append(x.ids, b.pid)
        |  FROM walk x JOIN best b ON b.w = x.w AND b.pos = x.pos),
        |wseg AS (
        |  SELECT d.w,
        |    coalesce(t.ids, list_value((SELECT id FROM vocab WHERE piece = '[UNK]'))) AS ids
        |  FROM dw d LEFT JOIN
        |    (SELECT w, ids FROM walk WHERE pos = length(w) + 1) t ON t.w = d.w),
        |toks AS (
        |  SELECT doc_id, w, o FROM (
        |    SELECT doc_id,
        |      unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
        |      unnest(generate_series(1, len(regexp_split_to_array(lower(text), '\s+')))) AS o
        |    FROM documents WHERE doc_id <= 10) WHERE w <> ''),
        |enc AS (
        |  SELECT t.doc_id,
        |    list_concat(
        |      list_value((SELECT id FROM vocab WHERE piece = '[CLS]')),
        |      list_append(
        |        list_slice(flatten(list(s.ids ORDER BY t.o)), 1, 30),
        |        (SELECT id FROM vocab WHERE piece = '[SEP]'))) AS ids
        |  FROM toks t JOIN wseg s ON s.w = t.w GROUP BY t.doc_id)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  array_to_string(ids, ',') || repeat(',0', 32 - len(ids)) AS input_ids,
        |  array_to_string(list_transform(ids, x -> 1), ',')
        |    || repeat(',0', 32 - len(ids)) AS attention_mask
        |FROM enc ORDER BY doc_id""".stripMargin,

    // Expected dimensions recomputed from the generating arithmetic —
    // the engine side must parse them back out of real container bytes.
    // n_bytes are the SyntheticMedia format constants (png 33, jpeg 35,
    // gif 14).
    "mm_decode_probe" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  CAST(n_chars % 640 + 16 AS BIGINT) AS img_width,
        |  CAST(n_chars % 480 + 16 AS BIGINT) AS img_height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 35 ELSE 14 END AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id <= 60
        |ORDER BY media_id""".stripMargin,

    // Winnowing replay: same k-gram md5-low32 hashes, same w-window min,
    // same full-window filter (k=8, w=4; min text length k+w-1=11).
    "t_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id, p,
        |    CAST(md5_number_lower(substr(text, p + 1, 8)) & 4294967295 AS BIGINT) AS h
        |  FROM (
        |    SELECT doc_id, text, unnest(generate_series(0, length(text) - 8)) AS p
        |    FROM documents WHERE doc_id <= 50 AND length(text) >= 11)),
        |wmin AS (
        |  SELECT doc_id,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    count(h) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
        |  FROM g),
        |fps AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE cnt = 4)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, count(*) AS n_fp,
        |  CAST(sum(fp) AS BIGINT) AS fp_sum
        |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // O6: expected canonical positions generated from the lake schema
    // literals (same source the other profile oracles pin against).
    "o6_canonical_order" -> {
      val rows = Seq("customer", "orders", "part").flatMap { t =>
        lakeSchemas(t).map(_._1).sorted.zipWithIndex.map {
          case (c, i) => s"('$t', '$c', ${i + 1})"
        }
      }.mkString(",\n  ")
      s"""SELECT table_name, col_name, CAST(canon_pos AS BIGINT) AS canon_pos
         |FROM (VALUES
         |  $rows) v(table_name, col_name, canon_pos)
         |ORDER BY table_name, canon_pos""".stripMargin
    },

    // cleaned bytes pinned per doc via md5 — utf8proc NFC + RE2 replay
    // of the Java-Normalizer + Java-regex chain (shared dialect subset)
    "t_clean_normalize" ->
      s"""WITH c AS (SELECT doc_id, text || '$CleanTail' AS raw FROM documents),
         |d AS (SELECT doc_id, raw,
         |  trim(regexp_replace(regexp_replace(nfc_normalize(raw),
         |    '[\\x00-\\x08\\x0e-\\x1f\\x7f\\p{Cf}]', '', 'g'),
         |    '\\s+', ' ', 'g')) AS cleaned FROM c)
         |SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
         |  CAST(length(cleaned) AS BIGINT) AS len_clean,
         |  md5(cleaned) AS clean_md5
         |FROM d ORDER BY doc_id""".stripMargin,

    "p_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
        |    count(DISTINCT c_acctbal) AS l_div
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(class_size) AS BIGINT) AS n_rows,
        |  count(*) AS n_classes,
        |  CAST(min(class_size) AS BIGINT) AS k_anonymity,
        |  CAST(sum(CASE WHEN class_size = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_singletons,
        |  CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
        |    AS BIGINT) AS rows_below_k,
        |  round(CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
        |      AS DOUBLE) / CAST(sum(class_size) AS DOUBLE), 6) AS share_below_k,
        |  CAST(min(l_div) AS BIGINT) AS min_l_diversity,
        |  CAST(10 AS BIGINT) AS k
        |FROM cls""".stripMargin,

    // FULL quadratic cosine join — matching the engine's blocked exact
    // kernel certifies the blocking + integer dot arithmetic on this
    // corpus; the _postings entry certifies the L2AP prefix filter
    // lossless on a bounded slice with the same quadratic oracle
    "d_cosine_pairs" -> cosinePairsSqlFor("documents"),
    "d_cosine_auto" -> cosinePairsSqlFor("documents"),
    "d_cosine_postings" ->
      cosinePairsSqlFor("(SELECT * FROM documents WHERE doc_id <= 600)"),

    // exact replay of the next-fit-decreasing greedy fold (linear
    // recursion, the packSequences oracle discipline)
    // x_shard_plan: replay the consistent-hash ring — salted md5_low32
    // vnode/key positions, clockwise pick = argmin (pos − h) mod 2³²
    // with (shard, vnode) ties, per-shard counts + id checksums.
    "x_shard_plan" ->
      """WITH ring AS (
        |  SELECT s.shard, v.vnode,
        |    CAST(md5_number_lower(s.shard || ':' || v.vnode || ':ring0') & 4294967295 AS BIGINT) AS pos
        |  FROM range(0, 8) s(shard), range(0, 16) v(vnode)),
        |keys AS (
        |  SELECT doc_id,
        |    CAST(md5_number_lower(doc_id || ':key0') & 4294967295 AS BIGINT) AS h
        |  FROM documents),
        |asg AS (
        |  SELECT doc_id, shard FROM (
        |    SELECT k.doc_id, r.shard,
        |      row_number() OVER (PARTITION BY k.doc_id
        |        ORDER BY (r.pos - k.h + 4294967296) % 4294967296, r.shard, r.vnode) AS rn
        |    FROM keys k CROSS JOIN ring r)
        |  WHERE rn = 1)
        |SELECT shard, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM asg GROUP BY shard ORDER BY shard""".stripMargin,

    "x_compaction_plan" ->
      """WITH RECURSIVE f AS (
        |  SELECT source AS part, doc_id AS id, n_chars AS b,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents WHERE n_chars < 400),
        |rec AS (
        |  SELECT part, rn, id, b, CAST(0 AS BIGINT) AS bin,
        |         CAST(CASE WHEN 1000 - b > 0 THEN 1000 - b ELSE 0 END AS BIGINT) AS rem
        |  FROM f WHERE rn = 1
        |  UNION ALL
        |  SELECT f.part, f.rn, f.id, f.b,
        |    CASE WHEN f.b <= r.rem THEN r.bin ELSE r.bin + 1 END,
        |    CAST(CASE WHEN f.b <= r.rem THEN r.rem - f.b
        |         WHEN 1000 - f.b > 0 THEN 1000 - f.b ELSE 0 END AS BIGINT)
        |  FROM f JOIN rec r ON f.part = r.part AND f.rn = r.rn + 1),
        |allrows AS (
        |  SELECT part, bin, id, b FROM rec
        |  UNION ALL
        |  SELECT source, CAST(-1 AS BIGINT), doc_id, n_chars
        |  FROM documents WHERE n_chars >= 400)
        |SELECT part, bin, count(*) AS n_files, CAST(sum(b) AS BIGINT) AS bin_bytes,
        |  CAST(min(id) AS BIGINT) AS first_file, CAST(max(id) AS BIGINT) AS last_file
        |FROM allrows GROUP BY 1, 2 ORDER BY part, bin""".stripMargin,

    // ORC sink round-trip: the oracle aggregates the ORIGINAL parquet —
    // green iff the ORC write+read preserved every id and text char —
    // and replays the shard hash to count the reconciled shards
    "s_orc_roundtrip" ->
      """WITH base AS (SELECT lang,
        |    CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':orc0')
        |          & 4294967295) % 2 AS BIGINT) AS shard,
        |    doc_id, length(text) AS tc FROM documents),
        |ok AS (SELECT count(*) AS n_ok_shards
        |       FROM (SELECT DISTINCT lang, shard FROM base))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(tc) AS BIGINT) AS text_chars,
        |  (SELECT n_ok_shards FROM ok) AS n_ok_shards
        |FROM base GROUP BY lang ORDER BY lang""".stripMargin,

    // pow/round(…,6) replay: both engines evaluate IEEE-754 pow on the
    // same exactly-representable inputs (1/b with b a power of two,
    // i·5/100); 6-dp rounding absorbs any last-ULP libm divergence
    "d_lsh_plan" ->
      """WITH b AS (SELECT CAST(x AS BIGINT) AS bands,
        |    CAST(128 // x AS BIGINT) AS rows_per_band
        |  FROM generate_series(1, 128) t(x) WHERE 128 % x = 0),
        |g AS (SELECT CAST(x * 5 AS BIGINT) AS sim_pct
        |  FROM generate_series(1, 19) t(x))
        |SELECT bands, rows_per_band,
        |  round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS threshold_star,
        |  sim_pct,
        |  round(1.0 - pow(1.0 - pow(CAST(sim_pct AS DOUBLE) / 100.0,
        |    rows_per_band), bands), 6) AS p_candidate
        |FROM b CROSS JOIN g ORDER BY bands, sim_pct""".stripMargin,

    // RE2 \p{Script} mirrors Java \p{IsScript} (same Unicode property)
    "t_script_mix" ->
      """WITH per AS (SELECT lang AS grp, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\p{Latin}')) AS BIGINT) AS latin,
        |  CAST(len(regexp_extract_all(text, '\p{Han}')) AS BIGINT) AS han,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit,
        |  CAST(len(regexp_extract_all(text, '\s')) AS BIGINT) AS ws
        |  FROM documents)
        |SELECT grp, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  round(CAST(sum(latin) AS DOUBLE) / sum(n_chars), 6) AS latin_share,
        |  round(CAST(sum(han) AS DOUBLE) / sum(n_chars), 6) AS han_share,
        |  round(CAST(sum(digit) AS DOUBLE) / sum(n_chars), 6) AS digit_share,
        |  round(CAST(sum(ws) AS DOUBLE) / sum(n_chars), 6) AS ws_share,
        |  round(CAST(sum(n_chars) - sum(latin) - sum(han) - sum(digit)
        |    - sum(ws) AS DOUBLE) / sum(n_chars), 6) AS other_share
        |FROM per GROUP BY grp ORDER BY grp""".stripMargin,

    "a9_corr_probe" -> Seq(
      ("orders", "o_orderkey", "o_custkey"),
      ("orders", "o_orderkey", "o_totalprice"),
      ("lineitem", "l_quantity", "l_extendedprice"),
      ("events", "user_id", "value"))
      .map { case (tbl, x, y) =>
        s"SELECT '$tbl.$x~$y' AS pair, round(corr($x, $y), 6) AS corr_v FROM $tbl"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY pair")
  )
}
