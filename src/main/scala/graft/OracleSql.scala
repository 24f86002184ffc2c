package graft

/** DuckDB-runnable oracle SQL for every SQL-expressible query in
  * [[Queries.all]]. Column names/types and the rounding of every float
  * column match the Spark implementations exactly (the driver sorts
  * columns by name and hash-compares values). Hash-family queries
  * (LSH/MinHash/SimHash/IVF replays) live in [[OracleHashSql]];
  * ann-family queries whose output is provably the brute top-k share
  * `knn_brute`'s SQL by equivalence (see [[knnBruteSql]]). ann_recall's
  * PQ method rides a k-means codebook that is not SQL-RECOMPUTABLE,
  * but it does not need to be: Verify inlines the TRAINED codebook
  * into the SQL ([[Queries.oracleSubstitutions]]) and DuckDB replays
  * encode + ADC from the stored constants — every gate query now has
  * a full value-level oracle.
  */
object OracleSql {

  private val simjoinJaccardSql =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      |  FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ni
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT ia AS id_a, ib AS id_b,
      |  ROUND(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni), 4) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
      |WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  private val decontaminateSql =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
      |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i FROM toks WHERE len(t) >= 4),
      |g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS gram FROM pos),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
      |SELECT g.doc_id, count(*) AS n_hits
      |FROM g JOIN bench USING (gram)
      |WHERE g.doc_id % 50 != 0
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  private val eventsSlidingSql =
    """WITH w AS (SELECT event_type, value,
      |  date_trunc('hour', ts) + to_minutes(30 * CAST(floor(extract('minute' FROM ts) / 30) AS INT)) AS w0
      |  FROM events),
      |ex AS (SELECT event_type, value,
      |  unnest([w0, w0 - INTERVAL 30 MINUTE]) AS ws FROM w)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
      |  count(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
      |FROM ex GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** cosine-vs-vec-0 scores CTE, parameterized by an extra predicate. */
  private def knnScores(where: String): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |pairs AS (SELECT e.vec_id, e.label, unnest(e.embedding) AS x, unnest(q.qe) AS y
       |          FROM embeddings e, q $where),
       |scores AS (SELECT vec_id, label,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM pairs GROUP BY vec_id, label)""".stripMargin

  /** Brute top-5 — shared verbatim by the ann-family queries whose
    * output is provably the brute result: ann_nsw / ann_hnsw (exact
    * rerank + recall 1.0), ann_pq (ADC shortlist + exact-rerank tail),
    * ann_ivf_kmeans (recall-driven probe width). The equivalence is
    * pinned Spark-side at the gate SFs by AnnEquivalenceSpec; here the
    * oracle checks the actual values independently. The hierarchical
    * graph machinery itself is additionally hash-exact via
    * `ann_hnsw_walk` ([[OracleHashSql]]): a recursive-CTE replay of the
    * greedy-descent walk over the PERSISTED HnswIndexStore adjacency.
    */
  private val knnBruteSql =
    s"""${knnScores("")}
       |SELECT vec_id, ROUND(s, 4) AS score FROM scores ORDER BY s DESC, vec_id LIMIT 5""".stripMargin

  private val knnBruteFilteredSql =
    s"""${knnScores("WHERE e.label = 3")}
       |SELECT vec_id, ROUND(s, 4) AS score FROM scores ORDER BY s DESC, vec_id LIMIT 5""".stripMargin

  /** MMR replay ([[graft.search.Mmr]]): the greedy λ=0.7 selection
    * unrolled as five argmax CTEs — step t scores every unselected
    * pool member as `0.7·rel − (1.0−0.7)·max sim-to-selected` and
    * takes the (mmr DESC, vec_id) top-1. Relevance and pairwise
    * similarities are rounded to 4 dp BEFORE the loop in both engines,
    * and the penalty weight is the same `1.0 - 0.7` subtraction (a
    * pre-simplified 0.3 literal is a DIFFERENT double), so the argmax
    * comparisons run on provably identical values.
    */
  private val searchMmrSql: String = {
    val k = 5
    val steps = (2 to k).map { t =>
      s"""sel$t AS (
         |  SELECT c.vec_id, c.rel, 0.7*c.rel - (1.0 - 0.7)*MAX(s.s) AS mmr
         |  FROM cand c
         |  JOIN sim s ON s.va = c.vec_id AND s.vb IN (SELECT vec_id FROM p${t - 1})
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM p${t - 1})
         |  GROUP BY c.vec_id, c.rel
         |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
         |p$t AS (SELECT vec_id FROM p${t - 1} UNION ALL SELECT vec_id FROM sel$t),""".stripMargin
    }.mkString("\n").stripSuffix(",") // p$k is defined-but-unused; the comma must go
    val unions = (1 to k)
      .map(t => s"SELECT $t::BIGINT AS rank, vec_id, rel AS relevance, " +
        s"ROUND(mmr, 4) AS mmr_score FROM sel$t")
      .mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
       |          FROM embeddings e, q WHERE e.vec_id <> 0),
       |scores AS (SELECT vec_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM pairs GROUP BY vec_id),
       |cand AS (SELECT vec_id, ROUND(s, 4) AS rel FROM scores ORDER BY s DESC, vec_id LIMIT 20),
       |cpairs AS (SELECT a.vec_id AS va, b.vec_id AS vb,
       |    unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
       |  FROM cand a JOIN cand b ON a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |sim0 AS (SELECT va, vb,
       |  ROUND(SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))), 4) AS s
       |  FROM cpairs GROUP BY va, vb),
       |sim AS (SELECT va, vb, s FROM sim0
       |        UNION ALL SELECT vb AS va, va AS vb, s FROM sim0),
       |sel1 AS (SELECT vec_id, rel, 0.7*rel AS mmr FROM cand
       |         ORDER BY rel DESC, vec_id LIMIT 1),
       |p1 AS (SELECT vec_id FROM sel1),
       |$steps
       |$unions
       |ORDER BY rank""".stripMargin
  }

  private val attributionSql =
    """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, count(*) AS n_pairs,
      |  count(DISTINCT c.click_id) AS n_clicks,
      |  count(DISTINCT p.purchase_id) AS n_purchases,
      |  ROUND(SUM(p.value), 2) AS sum_value
      |FROM p JOIN c ON c.user_id = p.user_id
      |  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
      |  AND c.click_ts <= p.purchase_ts
      |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin

  private val attributionOuterSql =
    """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, count(*) AS n_rows,
      |  count(c.click_id) AS n_matched,
      |  count(DISTINCT p.purchase_id) AS n_purchases,
      |  CAST(SUM(CASE WHEN c.click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      |FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
      |  AND c.click_ts <= p.purchase_ts
      |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin

  private val eventsSessionizeSql =
    """WITH flags AS (SELECT user_id, event_id, ts,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (SELECT user_id,
      |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flags)
      |SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin

  private val eventsFunnelSql =
    """WITH v AS (SELECT user_id, min(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
      |      JOIN v ON v.user_id = e.user_id AND e.ts > v.tv
      |      WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
      |      JOIN c ON c.user_id = e.user_id AND e.ts > c.tc
      |      WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT '1_view' AS step, count(*) AS n_users FROM v
      |UNION ALL SELECT '2_click', count(*) FROM c
      |UNION ALL SELECT '3_purchase', count(*) FROM p
      |ORDER BY step""".stripMargin

  private val eventsRetentionSql =
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
      |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
      |  date_diff('day', f.cohort, d.day) AS offset_d, count(*) AS n_users
      |FROM d JOIN f USING (user_id)
      |WHERE date_diff('day', f.cohort, d.day) <= 7
      |GROUP BY 1, 2 ORDER BY cohort_day, offset_d""".stripMargin

  /** The broadcast-kNN oracle family's shared CTE chain (cosine
    * scores → per-query rank): one query side defined by `qSelect`
    * (must expose `q_id` and `qe`; extra columns may feed the join
    * predicate), candidates from the embeddings table under
    * `joinPred`, cosines recomputed from scratch with the proven
    * parallel-unnest zip. Ends with `ranked` (q_id, c_id, s, rn).
    * One definition, four replays (knn_join_graph/graph_pagerank,
    * hard_negatives, knn_serve_stream, decontaminate_semantic) — the
    * dot/norm/rank arithmetic cannot drift between them.
    */
  private def cosineRankedCtes(qSelect: String, joinPred: String): String =
    s"""WITH q AS ($qSelect),
       |pairs AS (SELECT q.q_id, c.vec_id AS c_id,
       |  unnest(q.qe) AS x, unnest(c.embedding) AS y
       |  FROM q JOIN embeddings c
       |  ON $joinPred AND c.embedding IS NOT NULL),
       |scores AS (SELECT q_id, c_id,
       |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
       |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
       |  FROM pairs GROUP BY q_id, c_id),
       |ranked AS (SELECT q_id, c_id, s,
       |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM scores)""".stripMargin

  /** The 50-query exact kNN graph's CTE chain, shared by
    * knn_join_graph and graph_pagerank so the two can never disagree
    * about what the graph IS. */
  private val knnGraphRankedCtes = cosineRankedCtes(
    "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 50 AND embedding IS NOT NULL",
    "c.vec_id <> q.q_id")

  /** graph_pagerank: three unrolled power iterations of the simplified
    * recurrence r' = (1−d)/N + d·Σ r/outdeg over the kNN-graph edges.
    * The teleport constant is printed FROM the engine's own double
    * arithmetic (1 − 0.85 ≠ the decimal literal 0.15 in binary), so
    * both engines iterate bit-identical coefficients.
    */
  private def graphPagerankSql: String = {
    val d = 0.85
    val tp = 1 - d
    def iter(k: Int): String =
      s"""c$k AS (SELECT e.dst AS id, SUM(r${k - 1}.r / deg.outd) AS m
         |  FROM edges e JOIN r${k - 1} ON r${k - 1}.id = e.src
         |  JOIN deg ON deg.src = e.src GROUP BY 1),
         |r$k AS (SELECT nodes.id, $tp / (SELECT n FROM nn) + $d * COALESCE(c$k.m, 0.0) AS r
         |  FROM nodes LEFT JOIN c$k USING (id))""".stripMargin
    s"""$knnGraphRankedCtes,
       |edges AS (SELECT q_id AS src, c_id AS dst FROM ranked WHERE rn <= 3),
       |nodes AS (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |deg AS (SELECT src, count(*)::DOUBLE AS outd FROM edges GROUP BY 1),
       |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT id, ROUND(r, 6) + 0 AS rank FROM r3 ORDER BY id""".stripMargin
  }

  private val bpePairCountsSql =
    """WITH toks AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS w FROM documents),
      |wc AS (SELECT w, count(*)::BIGINT AS cnt FROM toks WHERE length(w) > 0 GROUP BY w),
      |interior AS (
      |  SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym, cnt
      |  FROM wc, (SELECT unnest(range(1, (SELECT max(length(w)) FROM wc))) AS i)
      |  WHERE i + 1 <= length(w)),
      |terminal AS (SELECT substr(w, length(w), 1) AS left_sym, '</w>' AS right_sym, cnt FROM wc),
      |pairs AS (SELECT * FROM interior UNION ALL SELECT * FROM terminal)
      |SELECT left_sym, right_sym, CAST(SUM(cnt) AS BIGINT) AS pair_freq
      |FROM pairs GROUP BY 1, 2
      |ORDER BY pair_freq DESC, left_sym, right_sym LIMIT 30""".stripMargin

  val all: Map[String, String] = Map(
    "events_funnel" -> eventsFunnelSql,
    // the stream rolls up to the identical shape — one oracle, two
    // implementations (the sessionize-family pattern)
    "events_funnel_stream" -> eventsFunnelSql,
    "bpe_pair_counts" -> bpePairCountsSql,
    "events_retention" -> eventsRetentionSql,
    "events_retention_stream" -> eventsRetentionSql,
    "knn_brute" -> knnBruteSql,
    "search_mmr" -> searchMmrSql,
    "ann_nsw" -> knnBruteSql,
    "ann_hnsw" -> knnBruteSql,
    // O12 through the registered HNSW tier: beam recall is exact at
    // the gate SFs (the ann_hnsw equivalence), the envelope carries
    // the at-rest tier's level — brute replay + the literal
    "search_o12_hnsw" ->
      s"""SELECT vec_id, score, 'hnsw_at_rest' AS index_used
         |FROM ($knnBruteSql)""".stripMargin,
    "ann_pq" -> knnBruteSql,
    // the rule-served PQ path: same trainer, ADC arithmetic and
    // 100-wide shortlist + exact rerank as ann_pq, so the same
    // brute-equivalence argument applies (AnnEquivalenceSpec asserts
    // shortlist survival; the gate's requires pin the staged rewrite)
    "ann_pq_rule" -> knnBruteSql,
    // the split-layout PQ serve: same trainer/ADC/shortlist/rerank as
    // ann_pq over the stored codes + pushed-IN float fetch, so the
    // same brute-equivalence argument (the gate's require pins the
    // pushed vec_id filter on the float scan)
    "ann_pq_split" -> knnBruteSql,
    "ann_pq_split_plan" -> knnBruteSql,
    "ann_pq_split_rule" -> knnBruteSql,
    // the rule-served SQ8 path (the registry's second scoring kind):
    // SQ8 is near-exact (<= 1/254 per-component error), so the 100-wide
    // quantized shortlist covers the exact top-5 with far more margin
    // than PQ's — the same brute-equivalence argument, asserted against
    // brute in LshProbeRewriteSpec; the gate's requires pin the staged
    // rewrite and its sq8_score stage
    "ann_sq8_rule" -> knnBruteSql,
    "ann_ivf_kmeans" -> knnBruteSql,

    "knn_brute_filtered" -> knnBruteFilteredSql,

    // r17, open thread (a) — the scoring kinds' filtered policy: at
    // sf0.01 the filtered pool (label = 3, ~50 of 500) is narrower
    // than the 100-wide shortlist, so the filter-first staged serve is
    // EXACTLY the filtered brute scan (the rerank is exact either way)
    // and both forms share its oracle; the gates' requires pin the
    // semi-join + staged-fetch mechanism
    "ann_pq_split_filtered" -> knnBruteFilteredSql,
    "ann_pq_split_filtered_rule" -> knnBruteFilteredSql,

    "knn_topk_per_label" ->
      s"""${knnScores("")},
         |ranked AS (SELECT vec_id, label, s,
         |  row_number() OVER (PARTITION BY label ORDER BY s DESC, vec_id) AS rn FROM scores)
         |SELECT label, rn, vec_id, ROUND(s, 4) AS score FROM ranked WHERE rn <= 3
         |ORDER BY label, rn""".stripMargin,

    "knn_topk_per_label_agg" ->
      s"""${knnScores("")},
         |ranked AS (SELECT vec_id, label, s,
         |  row_number() OVER (PARTITION BY label ORDER BY s DESC, vec_id) AS rn FROM scores)
         |SELECT label, rn, vec_id, ROUND(s, 4) AS score FROM ranked WHERE rn <= 3
         |ORDER BY label, rn""".stripMargin,

    "neardup_embedding" ->
      """WITH pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |  unnest(a.embedding) AS x, unnest(b.embedding) AS y
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |scores AS (SELECT ia, ib,
        |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
        |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
        |  FROM pairs GROUP BY ia, ib)
        |SELECT ia AS id_a, ib AS id_b, ROUND(s, 4) AS cos FROM scores
        |WHERE s >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "agg_count_by_label" ->
      "SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label ORDER BY label",

    "catalog_meta_samples" ->
      """SELECT source, count(*) AS n_docs,
        |  array_to_string(list_sort(list(DISTINCT lang))[:20], ',') AS langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_segment_revenue" ->
      """SELECT c_mktsegment, count(DISTINCT o_orderkey) AS n_orders,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "region_customers" ->
      """SELECT r_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "customers_with_orders" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "customers_without_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "top_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey LIMIT 100""".stripMargin,

    "page_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40""".stripMargin,

    "events_asof_orders" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "lineitem_quantiles" ->
      """SELECT l_returnflag, ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "sql_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice) FROM orders o2
        |                            WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  count(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // every event belongs to exactly two 1h/30min sliding windows:
    // the one starting at its 30-min floor and the one 30 min earlier
    "events_sliding" -> eventsSlidingSql,
    // the streaming twin replays the same table through a watermarked
    // readStream and must land on the identical window table
    "events_sliding_stream" -> eventsSlidingSql,

    "events_json_k" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k_bucket,
        |  count(*) AS n_events, ROUND(AVG(value), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "events_sessionize" -> eventsSessionizeSql,
    // the flatMapGroupsWithState replay's per-user rollup of emitted
    // closed sessions must land on the identical session table as the
    // batch lag/cumsum sessionization...
    "events_sessionize_stream" -> eventsSessionizeSql,
    // ...and so must the built-in session_window formulation — and the
    // same operator RUN AS A STREAM (native session-merging state
    // store, append mode): four independent implementations, one oracle
    "events_session_window_native" -> eventsSessionizeSql,
    "events_session_window_stream" -> eventsSessionizeSql,

    // the update-mode upsert sink's final (hour, type) table must
    // equal the plain batch hourly aggregate — keyed last-write-wins
    // makes incremental emission converge to it
    "events_hourly_upsert_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  count(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "events_pivot" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "set_ops_users" ->
      """SELECT user_id, 'click_and_purchase' AS segment FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT user_id, 'click_no_purchase' AS segment FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY segment, user_id""".stripMargin,

    "agg_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dedup_exact" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct,
        |  count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // paragraph (10-token block) keep-first dedup with reassembly:
    // block b of doc d survives iff (d, idx) is the lexicographic min
    // occurrence of b's text; kept_text_md5 hashes the space-joined
    // surviving blocks in order (NULL when nothing survives)
    "dedup_paragraph" ->
      """WITH docw AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents),
        |blk AS (
        |  SELECT doc_id, i AS idx,
        |    array_to_string(w[i*10+1 : least((i+1)*10, len(w))], ' ') AS b
        |  FROM docw, (SELECT unnest(range(0, (SELECT max((len(w)+9)//10) FROM docw))) AS i)
        |  WHERE i*10 < len(w)
        |    AND array_to_string(w[i*10+1 : least((i+1)*10, len(w))], ' ') <> ''),
        |firsts AS (SELECT b, min(struct_pack(d := doc_id, i := idx)) AS f
        |           FROM blk GROUP BY b),
        |kept AS (SELECT k.doc_id, k.idx, k.b
        |         FROM blk k JOIN firsts fs ON k.b = fs.b
        |         WHERE k.doc_id = fs.f.d AND k.idx = fs.f.i),
        |ka AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
        |         md5(string_agg(b, ' ' ORDER BY idx)) AS kept_text_md5
        |       FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*)::BIGINT AS n_blocks FROM blk GROUP BY doc_id)
        |SELECT t.doc_id, t.n_blocks, COALESCE(ka.n_kept, 0) AS n_kept,
        |  ROUND(COALESCE(ka.n_kept, 0)::DOUBLE / t.n_blocks, 4) AS kept_ratio,
        |  ka.kept_text_md5
        |FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // same in-query NFD construction (every 'a' -> 'a' + U+0301), then
    // DuckDB's nfc_normalize plays the part of UnicodeNormalize.nfc;
    // len() counts codepoints in both engines for BMP input
    "text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |    regexp_replace(text, 'a', 'a' || chr(769), 'g') AS nfd FROM documents),
        |c AS (SELECT doc_id, len(nfd)::BIGINT AS n_nfd,
        |    nfc_normalize(nfd) AS nfc FROM n)
        |SELECT doc_id, n_nfd, len(nfc)::BIGINT AS n_nfc,
        |  (n_nfd - len(nfc))::BIGINT AS n_composed, md5(nfc) AS nfc_md5
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_token_stats" ->
      """WITH t AS (SELECT lang, len(string_split_regex(trim(text), ' +')) AS n FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  ROUND(AVG(n), 4) AS avg_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // word 4-grams per doc (distinct within doc), benchmark split =
    // doc_id % 50 == 0; a training doc's n_hits counts its distinct
    // grams that appear anywhere in the benchmark split
    "decontaminate_ngram" -> decontaminateSql,
    // the Bloom-prefiltered engine path is exact-equivalent by
    // construction (the verify join removes every false positive), so
    // it shares the full value oracle verbatim
    "decontaminate_bloom" -> decontaminateSql,

    // TF-IDF smooth-idf top-3 terms per doc: score = tf * (ln((N+1)/
    // (df+1)) + 1) rounded to 4 dp, ranked by (score desc, term) —
    // df counts distinct docs per term, N counts all documents
    "tfidf_top_terms" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk WHERE len(term) > 0 GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |    ROUND(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0), 4) AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tf, df, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS term_rank FROM s)
        |SELECT doc_id, term_rank, term, tf, df, score
        |FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,

    // concat-then-chunk packing: running token total per (source,
    // 100k-doc id-range shard) in doc_id order, a doc lands in the
    // 512-token bin where it ends
    "pack_sequences" ->
      """WITH d AS (SELECT source, doc_id // 100000 AS shard, doc_id,
        |    len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens FROM documents),
        |c AS (SELECT source, shard, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT source, shard, CAST(FLOOR((cum - 1) / 512.0) AS BIGINT) AS bin_id,
        |  count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM c GROUP BY source, shard, bin_id ORDER BY source, shard, bin_id""".stripMargin,

    // distinct 8-token windows per doc as md5 digests; a window is
    // SHARED if >= 2 distinct docs contain it; per-doc coverage
    "dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i FROM toks WHERE len(t) >= 8),
        |g AS (SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS w FROM pos),
        |shared AS (SELECT w FROM g GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
        |per AS (SELECT doc_id, count(*) AS n_windows FROM g GROUP BY doc_id),
        |sh AS (SELECT g.doc_id, count(*) AS n_shared FROM g JOIN shared USING (w) GROUP BY g.doc_id)
        |SELECT p.doc_id, p.n_windows, s.n_shared,
        |  ROUND(s.n_shared / CAST(p.n_windows AS DOUBLE), 4) AS shared_frac
        |FROM per p JOIN sh s USING (doc_id) ORDER BY doc_id""".stripMargin,

    // unigram surprisal: every token occurrence scores
    // log2(total) - log2(count(token)); per-doc mean, 4-dp round
    "lm_score" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS n_w FROM tk GROUP BY tok),
        |tot AS (SELECT CAST(SUM(n_w) AS DOUBLE) AS total FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |  ROUND(AVG(log2(total) - log2(n_w)), 4) AS bits_per_token
        |FROM tk JOIN freq USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // tercile thresholds from exact interpolated percentiles of the
    // per-doc surprisal, bucketing by comparison
    "perplexity_buckets" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS n_w FROM tk GROUP BY tok),
        |tot AS (SELECT CAST(SUM(n_w) AS DOUBLE) AS total FROM freq),
        |scored AS (SELECT doc_id, count(*) AS n_tokens,
        |    ROUND(AVG(log2(total) - log2(n_w)), 4) AS bits
        |  FROM tk JOIN freq USING (tok) CROSS JOIN tot GROUP BY doc_id),
        |th AS (SELECT quantile_cont(bits, CAST(1 AS DOUBLE)/3) AS t1,
        |              quantile_cont(bits, CAST(2 AS DOUBLE)/3) AS t2 FROM scored)
        |SELECT CASE WHEN bits <= t1 THEN 'head' WHEN bits <= t2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  ROUND(AVG(bits), 4) AS avg_bits
        |FROM scored, th GROUP BY 1 ORDER BY bucket""".stripMargin,

    "mix_weights" ->
      """WITH per AS (SELECT lang, count(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, MIN(n_tokens) AS min_tokens FROM per)
        |SELECT lang, n_docs, n_tokens,
        |  ROUND(n_tokens / CAST(total_tokens AS DOUBLE), 4) AS share,
        |  ROUND(LEAST(1.0, CAST(min_tokens AS DOUBLE) / n_tokens), 4) AS weight
        |FROM per, tot ORDER BY lang""".stripMargin,

    // the streaming dedup sink must equal the ORIGINAL events table:
    // the redelivered duplicates all fall inside the watermark horizon,
    // so a leak double-counts the last hour and flips the hash
    "events_dedup_stream" ->
      """SELECT event_type, count(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_enrich_stream" ->
      """SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
        |  count(*) AS n_events, ROUND(SUM(e.value), 2) AS sum_value
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    // interval self-join attribution: one oracle for the batch join and
    // the stream-stream join — a pair dropped from streaming join state
    // or duplicated across micro-batches flips n_pairs/sum_value
    "events_attribution" -> attributionSql,
    "events_attribution_stream" -> attributionSql,

    // LEFT-OUTER variant: every purchasing user appears; the streaming
    // side may only emit a null-click row once the watermark closes the
    // purchase's match window — early emission double-counts, a missed
    // release drops the user
    "events_attribution_outer" -> attributionOuterSql,
    "events_attribution_outer_stream" -> attributionOuterSql,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents),
        |b AS (SELECT doc_id, w, list_transform(generate_series(1, greatest(len(w) - 1, 0)),
        |  i -> w[i] || ' ' || w[i+1]) AS bg FROM t)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |  ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS dup_word_ratio,
        |  CASE WHEN len(bg) > 0
        |       THEN ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |       ELSE 0.0 END AS dup_bigram_ratio
        |FROM b ORDER BY doc_id""".stripMargin,

    // TrainingOps.qualityLogit: the identical IEEE multiply-add chain
    // in the identical operand order — bit-identical doubles, so the
    // strict logit > 0.0 keep decision and the floor-e4 checksum agree
    // by construction (the knn-score trust model; no exp anywhere).
    "quality_logistic" ->
      """WITH t AS (SELECT doc_id, lang, trim(text) AS tt, string_split_regex(trim(text), ' +') AS w FROM documents),
        |m AS (SELECT doc_id, lang, CAST(len(w) AS DOUBLE) AS nt,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(tt, ' +', '', 'g')) AS DOUBLE) / len(w) END AS atl,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(w, x -> x IN ('the','is','and','of','to','a','in'))) AS DOUBLE) / len(w) END AS sr,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END AS dup
        |  FROM t),
        |l AS (SELECT doc_id, lang,
        |  0.05 * (nt - 56.0) + 2.0 * (atl - 4.5) - 6.0 * (sr - 0.06) - 3.0 * (dup - 0.54) AS logit
        |  FROM m)
        |SELECT lang, count(*) AS n_docs,
        |  count(*) FILTER (WHERE logit > 0.0) AS n_kept,
        |  CAST(SUM(doc_id) FILTER (WHERE logit > 0.0) AS BIGINT) AS kept_id_sum,
        |  CAST(SUM(CAST(floor(logit * 10000.0) AS BIGINT)) AS BIGINT) AS sum_logit_e4
        |FROM l GROUP BY lang ORDER BY lang""".stripMargin,

    // Queries.textPiiRedact: inject the same deterministic synthetic
    // PII (pure functions of doc_id), redact with the same three
    // ordered patterns (Java-regex ∩ RE2 dialect; 'g' = Spark's
    // always-global regexp_replace), pin the redacted text via the
    // same md5-prefix sum (DuckDB hex-literal cast == Spark conv base
    // 16 → 10 on the lowercase hex both engines emit).
    "text_pii_redact" ->
      """WITH aug AS (SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact u' || doc_id || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || (doc_id % 256) || '.' || ((doc_id // 256) % 256) || '.' || ((doc_id // 65536) % 256) ELSE '' END
        |    AS itext
        |  FROM documents),
        |red AS (SELECT doc_id, source, itext,
        |    regexp_replace(regexp_replace(regexp_replace(itext,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b555-[0-9]{4}\b', '[PHONE]', 'g'),
        |      '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS rtext
        |  FROM aug)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(itext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
        |  CAST(SUM(len(regexp_extract_all(itext, '\b555-[0-9]{4}\b'))) AS BIGINT) AS n_phones,
        |  CAST(SUM(len(regexp_extract_all(itext, '\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) AS BIGINT) AS n_ips,
        |  CAST(SUM(length(rtext)) AS BIGINT) AS red_len_sum,
        |  CAST(SUM(('0x' || substr(md5(rtext), 1, 8))::BIGINT) AS BIGINT) AS red_md5_sum
        |FROM red GROUP BY source ORDER BY source""".stripMargin,

    "quality_gate" ->
      """WITH t AS (SELECT lang, trim(text) AS tt, string_split_regex(trim(text), ' +') AS w FROM documents),
        |m AS (SELECT lang, len(w) AS nt,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(tt, ' +', '', 'g')) AS DOUBLE) / len(w) END AS atl,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(w, x -> x IN ('the','is','and','of','to','a','in'))) AS DOUBLE) / len(w) END AS sr
        |  FROM t)
        |SELECT lang, count(*) AS n_docs,
        |  count(*) FILTER (WHERE nt >= 30 AND atl >= 4.0 AND atl <= 5.0 AND sr <= 0.10) AS n_pass,
        |  ROUND(CAST(count(*) FILTER (WHERE nt >= 30 AND atl >= 4.0 AND atl <= 5.0 AND sr <= 0.10) AS DOUBLE)
        |        / count(*), 4) AS pass_rate
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, trim(text) AS tt, string_split_regex(trim(text), ' +') AS w FROM documents),
        |m AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(tt, ' +', '', 'g')) AS DOUBLE) / len(w) END AS avg_len,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(w, t -> t IN ('the','is','and','of','to','a','in'))) AS DOUBLE) / len(w) END AS stop_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, ROUND(avg_len, 4) AS avg_token_len,
        |  ROUND(stop_ratio, 4) AS stopword_ratio,
        |  ROUND(0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) + 0.5 * (1.0 - stop_ratio), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      """WITH toks AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS w FROM documents),
        |hits AS (SELECT doc_id, lang,
        |  len(list_filter(w, t -> t IN ('the','is','and','of','to'))) AS en,
        |  len(list_filter(w, t -> t IN ('der','und','ist','die','das'))) AS de,
        |  len(list_filter(w, t -> t IN ('el','la','que','de','y'))) AS es,
        |  len(list_filter(w, t -> t IN ('le','la','et','les','des'))) AS fr,
        |  len(list_filter(w, t -> t IN ('的','是','了','在','和'))) AS zh
        |  FROM toks),
        |pred AS (SELECT doc_id, lang, CASE
        |  WHEN greatest(en, de, es, fr, zh) <= 0 THEN 'und'
        |  WHEN en >= greatest(de, es, fr, zh) THEN 'en'
        |  WHEN de >= greatest(es, fr, zh) THEN 'de'
        |  WHEN es >= greatest(fr, zh) THEN 'es'
        |  WHEN fr >= zh THEN 'fr'
        |  ELSE 'zh' END AS predicted FROM hits)
        |SELECT lang, predicted, count(*) AS n_docs FROM pred
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    // Trained-classifier twin of lang_id: the oracle replays the
    // TRAINED Naive Bayes constants (Verify inlines them — the
    // PQ-codebook pattern) and recomputes every score as exact integer
    // arithmetic: Σ count·ilp + iprior, argmax ties to the smaller
    // label. Spark scores with the identical inlined longs, so the
    // comparison is bit-exact with no float-summation-order hazard.
    "classify_nb_lang" ->
      """WITH model(tok, mlang, ilp) AS (VALUES __NB_MODEL_VALUES__),
        |cls(clang, iprior) AS (VALUES __NB_CLASS_VALUES__),
        |toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents),
        |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
        |ts AS (SELECT doc_id, mlang, SUM(cnt * ilp) AS s
        |  FROM dt JOIN model USING (tok) GROUP BY doc_id, mlang),
        |sc AS (SELECT d.doc_id, c.clang,
        |    CAST(COALESCE(ts.s, 0) + c.iprior AS BIGINT) AS iscore
        |  FROM documents d CROSS JOIN cls c
        |  LEFT JOIN ts ON ts.doc_id = d.doc_id AND ts.mlang = c.clang),
        |rk AS (SELECT doc_id, clang, iscore,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY iscore DESC, clang) AS r FROM sc)
        |SELECT rk.doc_id, d.lang AS true_lang, rk.clang AS pred_lang, rk.iscore
        |FROM rk JOIN documents d USING (doc_id)
        |WHERE rk.r = 1 ORDER BY rk.doc_id""".stripMargin,

    "text_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), ' +')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_trigram_jaccard" ->
      """WITH toks AS (SELECT doc_id, source, string_split_regex(trim(text), ' +') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |  unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |keptsh AS (SELECT source, shingle FROM sh GROUP BY source, shingle
        |  HAVING count(*) <= 256),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ni
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  JOIN keptsh k ON k.source = a.source AND k.shingle = a.shingle
        |  GROUP BY 1, 2)
        |SELECT ia AS id_a, ib AS id_b,
        |  ROUND(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni), 4) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
        |WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // the exact global answer with NO blocking and NO cap — the
    // prefix-filtered engine must reproduce it bit-for-bit, which is
    // precisely the losslessness claim of the AllPairs/PPJoin bound
    "simjoin_prefix_jaccard" -> simjoinJaccardSql,
    // the collapsed composition is an execution strategy, not a
    // semantics change — one oracle serves both gates
    "simjoin_prefix_collapsed" -> simjoinJaccardSql,

    "multimodal_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + (strlen(text) % 57) * 16 AS BIGINT) AS width,
        |  CAST(64 + (strlen(text) % 37) * 16 AS BIGINT) AS height,
        |  CASE CAST(strlen(text) % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "crud_lifecycle" ->
      """SELECT source AS library_id, doc_id,
        |  CASE WHEN doc_id % 100 = 0 THEN 'updated-' || doc_id ELSE 'doc-' || doc_id END AS title
        |FROM documents WHERE source <> 'src0' ORDER BY doc_id""".stripMargin,

    "crud_versions" ->
      """SELECT source AS library_id,
        |  CAST(count(*) + SUM(CASE WHEN doc_id % 100 = 0 THEN 1 ELSE 0 END) AS INT) AS version
        |FROM documents WHERE source <> 'src0' GROUP BY source ORDER BY library_id""".stripMargin,

    "window_running_total" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
        |  ROUND(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
        |  ROUND(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "ntile_quartiles" ->
      """WITH q AS (SELECT c_acctbal,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile FROM customer)
        |SELECT quartile, count(*) AS n_cust,
        |  ROUND(MIN(c_acctbal), 2) AS min_bal, ROUND(MAX(c_acctbal), 2) AS max_bal
        |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin,

    "range_join_events_orders" ->
      """SELECT o_orderpriority, count(*) AS n_pairs,
        |  count(DISTINCT event_id) AS n_events
        |FROM events e JOIN orders o
        |  ON e.user_id = o.o_custkey
        | AND e.ts >= o.o_orderdate AND e.ts <= o.o_orderdate + INTERVAL 1 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "string_funcs_customers" ->
      """SELECT c_custkey, upper(c_name) AS uname,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  substr(c_name, 1, 8) AS prefix,
        |  c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS tag
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,

    "date_funcs_orders" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,

    "parts_by_brand" ->
      """SELECT p_brand, count(*) AS n_parts, count(DISTINCT p_type) AS n_types,
        |  ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  ROUND(MAX(p_retailprice), 2) AS max_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "supplier_balance_by_nation" ->
      """SELECT n_name, count(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // The synthetic P5 blob is a pure function of the ASCII text
    // (dims from n_chars, pixels = text bytes cycled), so the real
    // codec's outputs are recomputable in SQL.
    "multimodal_decode" ->
      """WITH m AS (SELECT doc_id, 16 + (n_chars % 16) AS w, 16 + (n_chars % 8) AS h
        |           FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(length('P5' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
        |    || chr(10) || '255' || chr(10)) + w * h AS BIGINT) AS n_bytes,
        |  'pgm' AS format
        |FROM m ORDER BY doc_id""".stripMargin,

    "multimodal_thumbnail" ->
      """WITH m AS (SELECT doc_id, text, n_chars AS n,
        |             16 + (n_chars % 16) AS w, 16 + (n_chars % 8) AS h FROM documents),
        |cells AS (
        |  SELECT doc_id,
        |    unicode(substr(text,
        |      CAST(((y.g * h // 12) * w + (x.g * w // 12)) % n AS INT) + 1, 1)) AS v
        |  FROM m, generate_series(0, 11) AS y(g), generate_series(0, 11) AS x(g))
        |SELECT doc_id, CAST(12 AS BIGINT) AS thumb_w, CAST(12 AS BIGINT) AS thumb_h,
        |  CAST(length('P5' || chr(10) || '12 12' || chr(10) || '255' || chr(10)) + 144 AS BIGINT) AS n_thumb_bytes,
        |  CAST(SUM(v) % 997 AS BIGINT) AS checksum
        |FROM cells GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // GV01 synthetic video: 4 + n%5 frames of (8 + n%8) x (8 + n%4)
    // P5 pixels, frame k = text bytes cycled with offset k; every 2nd
    // frame sampled, checksum = SUM(pixel) % 997 recomputed per cell.
    // GREATEST(n_chars, 1) mirrors the engine's max(bytes.length, 1)
    // clamp so an empty document can never divide by zero; like the
    // thumbnail oracle, unicode(char) == byte assumes ASCII text
    // (true of the fixtures; a non-ASCII corpus needs a bytes-level
    // replay instead)
    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id, text, GREATEST(n_chars, 1) AS n,
        |             4 + (GREATEST(n_chars, 1) % 5) AS f,
        |             8 + (GREATEST(n_chars, 1) % 8) AS w, 8 + (GREATEST(n_chars, 1) % 4) AS h
        |           FROM documents),
        |fr AS (SELECT doc_id, text, n, w, h, k.g AS frame_idx
        |       FROM m, generate_series(0, 7) AS k(g) WHERE k.g < f AND k.g % 2 = 0),
        |cells AS (SELECT doc_id, frame_idx, w, h,
        |            CASE WHEN text = '' THEN 0
        |                 ELSE unicode(substr(text, CAST((i.g + frame_idx) % n AS INT) + 1, 1)) END AS v
        |          FROM fr, generate_series(0, 164) AS i(g) WHERE i.g < w * h)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(SUM(v) % 997 AS BIGINT) AS checksum
        |FROM cells GROUP BY doc_id, frame_idx, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Synthetic WAV: 192 + n%64 16-bit samples, sample k =
    // (byte(k mod n) - 79) * 257; 64-sample windows. Sum-of-squares
    // stays integer (BIGINT cast dodges DuckDB's HUGEINT SUM) so the
    // one division + sqrt is bit-identical to the engine's; strict
    // zero crossings via lead() within the window. GREATEST(n_chars,1)
    // mirrors the engine's max(bytes.length,1) clamp; unicode(char) ==
    // byte assumes ASCII fixtures like the other media oracles.
    "multimodal_audio" ->
      """WITH m AS (SELECT doc_id, text, GREATEST(n_chars, 1) AS n,
        |             192 + (GREATEST(n_chars, 1) % 64) AS nsamp FROM documents),
        |s AS (SELECT doc_id, i.g AS k, i.g // 64 AS widx,
        |        (CASE WHEN text = '' THEN 0
        |              ELSE unicode(substr(text, CAST(i.g % n AS INT) + 1, 1)) END - 79) * 257 AS v
        |      FROM m, generate_series(0, 254) AS i(g) WHERE i.g < nsamp),
        |z AS (SELECT doc_id, widx, v,
        |        lead(v) OVER (PARTITION BY doc_id, widx ORDER BY k) AS nv
        |      FROM s)
        |SELECT doc_id, CAST(widx AS BIGINT) AS window_idx,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  ROUND(sqrt(CAST(SUM(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)), 4) AS rms,
        |  CAST(SUM(CASE WHEN nv IS NOT NULL AND v * nv < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak
        |FROM z GROUP BY doc_id, widx
        |ORDER BY doc_id, window_idx""".stripMargin,

    // multimodal_audio's decode→window replay, extended with the
    // threshold → islands (widx − rank constant within a run) →
    // per-clip rollup. The >= 8630 cut compares the UNROUNDED rms:
    // integer samples ⇒ bit-identical doubles on both engines.
    "multimodal_audio_segments" ->
      """WITH m AS (SELECT doc_id, text, GREATEST(n_chars, 1) AS n,
        |             192 + (GREATEST(n_chars, 1) % 64) AS nsamp FROM documents),
        |s AS (SELECT doc_id, i.g AS k, i.g // 64 AS widx,
        |        (CASE WHEN text = '' THEN 0
        |              ELSE unicode(substr(text, CAST(i.g % n AS INT) + 1, 1)) END - 79) * 257 AS v
        |      FROM m, generate_series(0, 254) AS i(g) WHERE i.g < nsamp),
        |w AS (SELECT doc_id, widx,
        |        sqrt(CAST(SUM(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)) AS rms
        |      FROM s GROUP BY doc_id, widx),
        |act AS (SELECT doc_id, widx FROM w WHERE rms >= 8630.0),
        |isl AS (SELECT doc_id, widx,
        |          widx - row_number() OVER (PARTITION BY doc_id ORDER BY widx) AS grp
        |        FROM act),
        |seg AS (SELECT doc_id, MIN(widx) AS seg_start, count(*) AS seg_len
        |        FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, count(*) AS n_segments,
        |  CAST(SUM(seg_len) AS BIGINT) AS n_active,
        |  CAST(MAX(seg_len) AS BIGINT) AS max_len,
        |  CAST(MIN(seg_start) AS BIGINT) AS first_start
        |FROM seg GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q5_local_supplier_revenue" ->
      """SELECT r_name, n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_returned
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS qty FROM lineitem
        |             GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey,
        |  ROUND(o_totalprice, 2) AS o_totalprice, ROUND(qty, 2) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // Q2 shape: the oracle keeps the CANONICAL correlated-subquery
    // text; the Spark side computes the same min via agg + broadcast
    // join-back. price = one IEEE division per row, MIN and = on the
    // raw doubles — both engines see bit-identical values
    "q2_min_cost_supplier" ->
      """WITH eu AS (
        |  SELECT l_partkey, s_suppkey, s_name, n_name,
        |         l_extendedprice / l_quantity AS price
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, n_name,
        |  CAST(ROUND(CAST(price AS DECIMAL(18,8)), 4) AS DOUBLE) + 0 AS unit_price
        |FROM eu JOIN part ON l_partkey = p_partkey
        |WHERE price = (SELECT MIN(e2.price) FROM eu e2
        |               WHERE e2.l_partkey = eu.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    // Q9 shape: synthetic supply cost 0.1 * p_retailprice * l_quantity
    // (no partsupp in the testdata); both profit terms are exact
    // <= 4-decimal values, summed as DECIMAL(18,4) in both engines
    "q9_profit_rollup" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |                 - CAST(0.1 * p_retailprice * l_quantity AS DECIMAL(18,4))), 2)
        |       AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    // Q21 shape: EXISTS / NOT EXISTS chain; "late" = shipped > 1000
    // days after the order date (no commit/receipt dates in the
    // testdata). Timestamps are midnights, so datediff agrees across
    // engines
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders   ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND datediff('day', o_orderdate, l1.l_shipdate) > 1000
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND datediff('day', o3.o_orderdate, l3.l_shipdate) > 1000)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    // Q13 shape: LEFT JOIN keeps order-less customers at count 0;
    // count(o_orderkey) skips nulls in both engines
    "q13_order_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q17 shape: per-part avg quantity is exact (integer-valued
    // doubles -> exact sum/count, one IEEE division), so the
    // correlated comparison sees identical doubles in both engines
    "q17_small_qty_revenue" ->
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2)
        |  AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,

    // Q19 shape: OR of three (brand, quantity-range) conjunctions
    "q19_disjunctive_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
        |  AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#4' AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#5' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // Q22 shape: scalar-avg subquery + NOT EXISTS on urgent orders
    // (nation key stands in for the canonical phone country code)
    "q22_sales_opportunity" ->
      // the above-average threshold is exact decimal arithmetic on
      // both sides: c_acctbal > sum/cnt as c_acctbal * cnt > sum
      // (an AVG over raw doubles is order-dependent per engine)
      """WITH pos AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_bal,
        |         COUNT(*) AS cnt_bal
        |  FROM customer
        |  WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 7, 11, 17, 21))
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE c_nationkey IN (1, 2, 3, 7, 11, 17, 21)
        |  AND CAST(c_acctbal AS DECIMAL(18,4)) * cnt_bal > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // Q4 shape: EXISTS on late shipments, counted by priority
    "q4_priority_checking" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND datediff('day', o_orderdate, l_shipdate) > 1000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Q12 shape: CASE-inside-aggregate over a ship-speed bucket
    "q12_ship_speed" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 1000
        |            THEN 'slow' ELSE 'fast' END AS speed_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY speed_class""".stripMargin,

    // Q14 shape: conditional-sum ratio; both sums exact DECIMAL(18,4),
    // one double division on identical values
    "q14_promo_revenue" ->
      """SELECT ROUND(100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
        |  4) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

    // Q15 shape: per-supplier quarter revenue, max-achiever join-back
    // on EXACT decimal sums
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // Q16 shape: distinct supplier counts per (brand, size), minus the
    // negative-balance supplier denylist
    "q16_part_supplier_counts" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    // Q20 shape: nested aggregate + join-back; integer-exact quantity
    // sums, one IEEE multiply for the 15% threshold
    "q20_dominant_suppliers" ->
      """WITH pair AS (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS pair_qty
        |              FROM lineitem GROUP BY 1, 2),
        |     tot  AS (SELECT l_partkey, SUM(l_quantity) AS part_qty
        |              FROM lineitem GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
        |FROM pair JOIN tot USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE pair_qty > 0.15 * part_qty
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,

    // Q6 shape: pure filtered-scan aggregate, all predicates pushed
    "q6_forecast_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2)
        |  AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // Q8 shape: one supplier nation's share of the ASIA market per
    // order year — conditional/total decimal sums, one double divide
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  ROUND(
        |    CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
        |          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
        |    6) AS mkt_share
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region    ON n2.n_regionkey = r_regionkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    // Q11 shape: HAVING against a fraction of the global total
    // (part revenue stands in for partsupp value)
    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS part_value
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey,
        |  CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value
        |FROM pv
        |WHERE CAST(part_value AS DOUBLE) >
        |  0.00075 * (SELECT CAST(SUM(part_value) AS DOUBLE) FROM pv)
        |ORDER BY part_value DESC, p_partkey""".stripMargin,

    "window_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal,
        |  ROUND(percent_rank() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey), 6) AS pr,
        |  ROUND(cume_dist() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey), 6) AS cd
        |FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin,

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
        |  ROUND(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  ROUND(last_value(o_totalprice) OVER w, 2) AS last_price
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // identical SQL text to the Spark-side spark.sql(...) call
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    // exact columns recomputed; the booleans are the engine's own
    // bounded-error claims about its sketches — the oracle asserts
    // them TRUE, so an out-of-bounds sketch turns the gate red
    "agg_sketches" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_users_ok,
        |  ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
        |  TRUE AS approx_p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_filter_events" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(*) FILTER (WHERE value > 50) AS n_high,
        |  ROUND(AVG(value) FILTER (WHERE value > 50), 4) AS avg_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "embedding_norm_stats" ->
      """WITH norms AS (SELECT label,
        |  sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  ROUND(AVG(nrm), 4) AS avg_norm,
        |  ROUND(MIN(nrm), 4) AS min_norm,
        |  ROUND(MAX(nrm), 4) AS max_norm
        |FROM norms GROUP BY label ORDER BY label""".stripMargin,

    // k-NN graph: every query row's top-3 cosine neighbors, ranked on
    // the RAW double cosine (identical mult/add order both engines)
    // with neighbor-id tiebreak, rounded only at output
    "knn_join_graph" ->
      s"""$knnGraphRankedCtes
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    "graph_pagerank" -> graphPagerankSql,

    // semantic decontamination: every (train, benchmark) cosine
    // recomputed from scratch; the flag derives from the 4-dp ROUNDED
    // score on both sides — raw-double thresholds would trust each
    // engine's aggregation order near the 0.3 cut
    "decontaminate_semantic" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id % 50 <> 0 AND embedding IS NOT NULL",
             "c.vec_id % 50 = 0")}
        |SELECT q_id AS vec_id, c_id AS bench_id, ROUND(s, 4) + 0 AS score,
        |  ROUND(s, 4) + 0 >= 0.3 AS flagged
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // streaming vector-search serving: all 5 requests' rankings
    // replayed from scratch — a request dropped, duplicated, or
    // cross-contaminated between micro-batches flips the hash
    "knn_serve_stream" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL",
             "c.vec_id <> q.q_id")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    // batched split-PQ serving (library + rule): exact per-request
    // rankings again — the wide-shortlist equivalence argument makes
    // the staged ADC serve brute-identical, so the same replay pins it
    "knn_serve_batched_pq" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL",
             "c.vec_id <> q.q_id")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    "knn_serve_batched_sq8" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL",
             "c.vec_id <> q.q_id")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    "knn_serve_batched_sq8_rule" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL",
             "c.vec_id <> q.q_id")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    "knn_serve_batched_pq_rule" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL",
             "c.vec_id <> q.q_id")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    // the FILTERED batched declaration over a guaranteeK pq_split
    // registration (r17, thread (a) at batch arity): the label
    // predicate rides the replay's join, so the oracle ranks exactly
    // the filtered pool per request — which the filter-first serve
    // matches bit-for-bit (pool ~50 << shortlist 300 at sf0.01)
    "knn_filtered_batched_pq_rule" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL",
             "c.vec_id <> q.q_id AND c.label = 3")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    // contrastive hard negatives: cross-label cosines recomputed from
    // scratch — a same-label pair leaking through the join predicate
    // (or a post-rank filter shorting a query below k) flips the hash
    "hard_negatives" ->
      s"""${cosineRankedCtes(
             "SELECT vec_id AS q_id, label AS q_label, embedding AS qe FROM embeddings WHERE vec_id < 20 AND embedding IS NOT NULL",
             "c.label <> q.q_label")}
        |SELECT q_id, rn, c_id AS neighbor_id, ROUND(s, 4) + 0 AS score
        |FROM ranked WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    // chars-per-token by language: exact integer sums, so the ratio
    // divides identical BIGINTs in both engines
    "token_fertility" ->
      """WITH t AS (SELECT lang, trim(text) AS tt,
        |  string_split_regex(trim(text), ' +') AS w FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(SUM(len(w)) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(regexp_replace(tt, ' +', '', 'g'))) AS BIGINT) AS n_chars,
        |  ROUND(CAST(SUM(length(regexp_replace(tt, ' +', '', 'g'))) AS DOUBLE)
        |    / SUM(len(w)), 4) AS chars_per_token
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // token-budget concentration: running share over the per-source
    // aggregate, largest-first with name tiebreak
    "token_budget" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens FROM per)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / (SELECT total_tokens FROM tot), 4) AS cum_frac
        |FROM per ORDER BY n_tokens DESC, source""".stripMargin,

    // quality_gate's feature formulation, widened with source/digest
    // and rolled into the per-source release report
    "corpus_datasheet" ->
      """WITH t AS (SELECT source, lang, doc_id, trim(text) AS tt, md5(text) AS digest,
        |    string_split_regex(trim(text), ' +') AS w FROM documents),
        |m AS (SELECT source, lang, doc_id, digest, len(w) AS nt,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(tt, ' +', '', 'g')) AS DOUBLE) / len(w) END AS atl,
        |  CASE WHEN len(w) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(w, x -> x IN ('the','is','and','of','to','a','in'))) AS DOUBLE) / len(w) END AS sr
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  count(DISTINCT lang) AS n_langs,
        |  count(*) - count(DISTINCT digest) AS n_dupes,
        |  count(*) FILTER (WHERE nt >= 30 AND atl >= 4.0 AND atl <= 5.0 AND sr <= 0.10) AS n_quality_pass,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS d1 FROM documents WHERE doc_id % 17 <> 0),
        |v2 AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END) AS d2
        |  FROM documents WHERE doc_id % 13 <> 0),
        |j AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, d1, d2
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id),
        |c AS (SELECT doc_id,
        |    CASE WHEN d1 IS NULL THEN 'added'
        |         WHEN d2 IS NULL THEN 'removed'
        |         WHEN d1 <> d2 THEN 'changed'
        |         ELSE 'unchanged' END AS change
        |  FROM j)
        |SELECT change, count(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM c GROUP BY change ORDER BY change""".stripMargin,

    // Z-order: re-interleave every bit in SQL — bit i of user_id at
    // position 2i, bit i of floor(value) at 2i+1, over 10 bits
    "zorder_layout" ->
      """WITH bpos AS (SELECT unnest(range(0, 10)) AS i),
        |src AS (SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v FROM events),
        |k AS (SELECT event_id, user_id, CAST(SUM(
        |    ((user_id // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i)) +
        |    ((v // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i + 1))) AS BIGINT) AS zkey
        |  FROM src CROSS JOIN bpos GROUP BY 1, 2)
        |SELECT zkey // 16384 AS zbucket, count(*) AS n_rows,
        |  MIN(zkey) AS zmin, MAX(zkey) AS zmax,
        |  CAST(SUM(user_id) AS BIGINT) AS uid_sum
        |FROM k GROUP BY 1 ORDER BY zbucket""".stripMargin,

    "events_anomaly" ->
      """WITH s AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        |  FROM events GROUP BY 1),
        |z AS (SELECT e.event_id, e.event_type, e.value, (e.value - s.mu) / s.sigma AS z
        |  FROM events e JOIN s USING (event_type))
        |SELECT event_id, event_type, ROUND(value, 2) AS value_r, ROUND(z, 3) + 0 AS z
        |FROM z ORDER BY abs(z) DESC, event_id LIMIT 20""".stripMargin,

    "knn_classify" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe, label AS tl FROM embeddings
        |  WHERE vec_id < 50 AND embedding IS NOT NULL),
        |pairs AS (SELECT q.q_id, q.tl, c.vec_id AS c_id, c.label AS nl,
        |  unnest(q.qe) AS x, unnest(c.embedding) AS y
        |  FROM q JOIN embeddings c
        |  ON c.vec_id >= 50 AND c.embedding IS NOT NULL),
        |scores AS (SELECT q_id, tl, c_id, nl,
        |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
        |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
        |  FROM pairs GROUP BY q_id, tl, c_id, nl),
        |ranked AS (SELECT q_id, tl, nl, s,
        |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rn FROM scores),
        |votes AS (SELECT q_id, tl, nl, count(*) AS n_votes
        |  FROM ranked WHERE rn <= 5 GROUP BY 1, 2, 3),
        |best AS (SELECT q_id, tl, nl, n_votes,
        |  row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, nl) AS vr FROM votes)
        |SELECT q_id, nl AS pred_label, n_votes, tl AS true_label,
        |  CAST(CASE WHEN nl = tl THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM best WHERE vr = 1 ORDER BY q_id""".stripMargin,

    // bottom-20 by cosine-to-own-label-centroid; centroids rounded to
    // 4 dp before the cosine (the embedding_pool contract) so both
    // engines rank identical doubles, vec_id tiebreak
    "embedding_outliers" ->
      """WITH flat AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
        |  unnest(embedding) AS x FROM embeddings WHERE embedding IS NOT NULL),
        |cent AS (SELECT label, pos, ROUND(AVG(CAST(x AS DOUBLE)), 4) + 0 AS cx
        |  FROM flat GROUP BY label, pos),
        |centl AS (SELECT label, list(cx ORDER BY pos) AS cl FROM cent GROUP BY label),
        |pairs AS (SELECT e.vec_id, e.label,
        |  unnest(e.embedding) AS x, unnest(c.cl) AS y
        |  FROM embeddings e JOIN centl c ON c.label = e.label
        |  WHERE e.embedding IS NOT NULL),
        |s AS (SELECT vec_id, label,
        |  SUM(CAST(x AS DOUBLE) * y) AS dot,
        |  SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS ne,
        |  SQRT(SUM(y * y)) AS nc
        |  FROM pairs GROUP BY vec_id, label),
        |sc AS (SELECT vec_id, label,
        |  CASE WHEN ne = 0 OR nc = 0 THEN 0.0 ELSE dot / (ne * nc) END AS cos FROM s)
        |SELECT vec_id, label, ROUND(cos, 4) + 0 AS cos_centroid
        |FROM sc ORDER BY cos, vec_id LIMIT 20""".stripMargin,

    // element-wise mean pooled per label; Spark's posexplode is
    // 0-based, DuckDB's generate_subscripts 1-based
    "embedding_pool" ->
      """WITH flat AS (SELECT label,
        |  generate_subscripts(embedding, 1) - 1 AS pos,
        |  unnest(embedding) AS x
        |  FROM embeddings WHERE embedding IS NOT NULL)
        |SELECT label, pos, count(*) AS n_vecs,
        |  ROUND(AVG(CAST(x AS DOUBLE)), 4) + 0 AS avg_x
        |FROM flat GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "ngram_top20" ->
      """WITH toks AS (SELECT string_split_regex(trim(text), ' +') AS w FROM documents),
        |bg AS (SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
        |  i -> w[i] || ' ' || w[i+1])) AS bigram FROM toks)
        |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "regex_extract_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, 'or[a-z]+'))) AS BIGINT) AS n_matches
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "agg_salted_skew" ->
      """SELECT event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same oracle text as events_pivot: the native .pivot() operator
    // must agree cell-for-cell with the conditional-aggregation form
    "events_pivot_native" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "chunk_documents" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents),
        |starts AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 15)) AS start FROM toks),
        |chunks AS (SELECT doc_id,
        |  CAST((start - 1) // 15 AS BIGINT) AS chunk_idx,
        |  list_slice(w, start, least(start + 19, len(w))) AS cw
        |  FROM starts)
        |SELECT doc_id, chunk_idx, CAST(len(cw) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(cw, ' ')) AS chunk_digest
        |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,

    "bm25_search" ->
      """WITH dl AS (SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS dl FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        |         FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |       WHERE term IN ('table', 'scan', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |scores AS (SELECT tf.doc_id,
        |  SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
        |      * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, ROUND(s, 4) AS score FROM scores
        |ORDER BY ROUND(s, 4) DESC, doc_id LIMIT 20""".stripMargin,

    "hybrid_rrf" ->
      """WITH dl AS (SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS dl FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        |         FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |       WHERE term IN ('table', 'scan', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |bscores AS (SELECT tf.doc_id,
        |  SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
        |      * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY tf.doc_id),
        |brank AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY ROUND(s, 6) DESC, doc_id) AS text_rank
        |  FROM bscores QUALIFY text_rank <= 50),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
        |          FROM embeddings e, q),
        |cscores AS (SELECT vec_id,
        |  SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)) /
        |  (SQRT(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) * SQRT(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS s
        |  FROM pairs GROUP BY vec_id),
        |crank AS (SELECT vec_id AS doc_id,
        |  row_number() OVER (ORDER BY ROUND(s, 6) DESC, vec_id) AS vec_rank
        |  FROM cscores QUALIFY vec_rank <= 50),
        |fused AS (SELECT doc_id,
        |  COALESCE(1.0 / (60 + text_rank), 0) + COALESCE(1.0 / (60 + vec_rank), 0) AS rrf,
        |  text_rank, vec_rank
        |  FROM brank FULL JOIN crank USING (doc_id))
        |SELECT doc_id, ROUND(rrf, 6) AS rrf, text_rank, vec_rank FROM fused
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
  ) ++ OracleHashSql.all
}
