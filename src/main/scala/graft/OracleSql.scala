package graft

/** DuckDB oracle SQL mirroring each SQL-expressible entry in
  * `SparkEntry.queries`. Aliases, rounding, and arithmetic paths match the
  * Spark implementations exactly (decimal-exact money sums, round-6 on
  * order-dependent double aggregates).
  */
object OracleSql {

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

  val all: Map[String, String] = Map(
    "s1_scan_topn" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",

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

    "t_token_freq" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
        |WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,

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

    "emb_stats" ->
      """SELECT label, count(*) AS n, round(avg(nrm), 5) AS avg_norm,
        |  round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
        |FROM (SELECT label,
        |        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |      FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,

    "ann_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rank
        |  FROM n q JOIN n c ON q.vec_id <= 10 AND c.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

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
