package graft

import graft.OracleDefs._

/** DuckDB oracle SQL 1/3: pipeline, search surface, BPE, and indexed-query rows.
  * (Verbatim slice of the former SparkEntry.oracleSql literal.)
  */
private[graft] object OraclesA {
  def oracleSql: Map[String, String] = Map(

    "x_bpe_train" -> bpeTrainOracle,

    "x_bpe_apply" -> bpeApplyOracle,
    // the apply oracle as a subquery, re-keyed by language
    "x_bpe_fertility" ->
      s"""WITH base AS ($bpeApplyOracle)
         |SELECT d.lang, CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
         |  round(CAST(sum(b.n_tokens) AS DOUBLE)
         |    / CAST(sum(length(d.text)) AS DOUBLE), 6) AS tokens_per_char
         |FROM base b JOIN documents d ON d.doc_id = b.doc_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "s1_scan_events" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
         FROM events ORDER BY event_id""",
    "s2_incremental_scan" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events
         WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id""",
    "f3_shard_modulo" ->
      """SELECT event_id, user_id FROM events WHERE user_id % 8 = 3
         ORDER BY event_id""",
    "p1_flatten" ->
      """SELECT doc_id, source AS metadata_author, n_chars AS metadata_len, lang
         FROM documents ORDER BY doc_id""",
    "p2_stringify" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey AS VARCHAR) AS orderkey_str,
           CAST(l_linenumber AS VARCHAR) AS linenumber_str,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS quantity_str,
           CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS VARCHAR) AS shipdate_days,
           CAST(epoch_ms(l_shipdate) AS VARCHAR) AS shipdate_ms,
           l_returnflag AS returnflag_str
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "p3_rename" ->
      """SELECT doc_id, text, lang, source AS origin, n_chars AS char_count
         FROM documents ORDER BY doc_id""",
    "p4_drop_prefix" ->
      """SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id""",
    "p7_poison_filter" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 <> 0
         ORDER BY event_id""",
    "c1_cdc_classify" ->
      """SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS _action
         FROM events WHERE event_type <> 'view' ORDER BY event_id""",
    "c2_cdc_compact" ->
      """SELECT user_id, event_id AS last_event_id,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS final_action
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
               FROM events WHERE event_type <> 'view') t
         WHERE rn = 1 ORDER BY user_id""",
    // version ordinal + half-open validity interval per key
    "c8_scd2" ->
      """SELECT user_id, version, event_id, valid_from_us, valid_to_us,
           valid_to_us IS NULL AS is_current
         FROM (SELECT user_id, event_id,
             CAST(row_number() OVER w AS BIGINT) AS version,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER w AS valid_to_us
           FROM events WHERE event_type <> 'view'
           WINDOW w AS (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id)) t
         ORDER BY user_id, version""",
    "c4_delete_keyset" ->
      """SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_orderkey NOT IN
           (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "c7_cdc_merge" ->
      """SELECT user_id, event_id AS last_event_id, value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
               FROM events WHERE event_type <> 'view') t
         WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""",
    "b1_batching" ->
      """SELECT batch_id, count(*) AS n_docs, min(event_id) AS first_id,
           max(event_id) AS last_id
         FROM (SELECT event_id,
                 CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 1000)
                   AS BIGINT) AS batch_id
               FROM events) t
         GROUP BY batch_id ORDER BY batch_id""",
    "q_term" ->
      """SELECT doc_id, lang, source FROM documents WHERE lang = 'en'
         ORDER BY doc_id""",
    "q_term_in_set" ->
      """SELECT doc_id, lang FROM documents WHERE lang IN ('de', 'fr')
         ORDER BY doc_id""",
    "q_match_text" ->
      """SELECT doc_id FROM documents
         WHERE list_has_any(string_split(lower(text), ' '), ['merge', 'window'])
         ORDER BY doc_id""",
    "q_match_ranked" ->
      """SELECT doc_id, score FROM (
           SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
             + len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
             + len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS score
           FROM documents) t
         WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20""",
    // BM25 mirror: identical constants (k1=1.2, b=0.75, Lucene idf),
    // identical FIXED term order, one final round(6) absorbing ln-library
    // ULP differences. dl/tf/N/df are integer-exact in double, avgdl is
    // an exact-integer sum ÷ count — aggregation order cannot perturb
    // either engine's stats.
    "q_match_bm25" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s)
         SELECT doc_id, round(score, 6) AS bm25 FROM z WHERE score > 0
         ORDER BY bm25 DESC, doc_id LIMIT 20""",
    // the BM25 window replayed (rounded-score cut at 50), then the
    // phrase-boost rescore over the window only
    "q_rescore" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s),
         w AS (SELECT doc_id, round(score, 6) AS bm25 FROM z WHERE score > 0
           ORDER BY round(score, 6) DESC, doc_id LIMIT 50),
         p AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
           FROM documents),
         g AS (SELECT doc_id,
             CAST(len(list_filter(list_transform(
               range(greatest(len(ws) - 1, 0)),
               i -> ws[i + 1] || ' ' || ws[i + 2]),
               x -> x = 'window scan')) AS DOUBLE) AS ptf
           FROM p)
         SELECT w.doc_id, bm25, round(bm25 + 0.5 * ptf, 6) AS rescored
         FROM w JOIN g ON w.doc_id = g.doc_id
         ORDER BY rescored DESC, w.doc_id LIMIT 20""",
    // two BM25 clauses scored independently (each rounded 6dp like the
    // engine's leg frames), then max + 0.3·(sum − max), rounded again;
    // the indexed twin shares the oracle (same contract, pruned layout)
    "q_dis_max" -> disMaxOracle,

    // positive-clause BM25 (leg-rounded like the engine), halved by the
    // negative-term CASE, re-rounded — downrank, never exclude
    "q_boosting" ->
      """WITH t AS (SELECT doc_id,
             list_contains(list_filter(string_split(lower(text), ' '),
               x -> x <> ''), 'stream') AS neg,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1
           FROM t),
         z AS (SELECT doc_id, neg,
             round(ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
               AS c0
           FROM t, s)
         SELECT doc_id,
           round(CASE WHEN neg THEN c0 * 0.5 ELSE c0 END, 6) AS score
         FROM z WHERE c0 > 0
         ORDER BY score DESC, doc_id LIMIT 20""",

    "q_dis_max_indexed" -> disMaxOracle,

    // BM25 leg rounded 6dp first (the engine's leg-frame convention),
    // then × the Gaussian decay on n_chars, re-rounded; σ² mirrors the
    // engine's ES calibration −scale²/(2 ln decay) term-for-term
    "q_function_score" ->
      """WITH t AS (SELECT doc_id, n_chars,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id, n_chars,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s),
         r AS (SELECT doc_id, n_chars, round(score, 6) AS bm25
           FROM z WHERE score > 0)
         SELECT doc_id,
           round(bm25 * exp(
             -pow(greatest(0.0, abs(CAST(n_chars AS DOUBLE) - 0.0) - 500.0), 2)
             / (2.0 * (-(2000.0 * 2000.0) / (2.0 * ln(0.5))))), 6) AS score
         FROM r ORDER BY score DESC, doc_id LIMIT 20""",

    // filter context: uniform boost, no statistics
    "q_constant_score" ->
      """SELECT doc_id, 1.2 AS score FROM documents
         WHERE list_contains(list_filter(string_split(lower(text), ' '),
                 x -> x <> ''), 'merge')
           AND list_contains(list_filter(string_split(lower(text), ' '),
                 x -> x <> ''), 'window')
         ORDER BY doc_id""",

    // JLH over document frequencies, arithmetic mirrored term-for-term
    "q_significant_terms" ->
      """WITH toks AS (SELECT doc_id, lang = 'de' AS fg,
             unnest(list_distinct(list_filter(string_split(lower(text), ' '),
               x -> x <> ''))) AS term
           FROM documents),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS DOUBLE)
               AS fgn
           FROM documents),
         t AS (SELECT term, CAST(count(*) AS DOUBLE) AS bgdf,
             CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS DOUBLE) AS fgdf
           FROM toks GROUP BY term),
         z AS (SELECT term, CAST(fgdf AS BIGINT) AS fg_count,
             CAST(bgdf AS BIGINT) AS bg_count,
             round((fgdf / fgn - bgdf / n) * ((fgdf / fgn) / (bgdf / n)), 6)
               AS score
           FROM t, n WHERE fgdf >= 5)
         SELECT term, fg_count, bg_count, score FROM z WHERE score > 0
         ORDER BY score DESC, term LIMIT 20""",

    // indexed twin: serving off the postings may never change the answer
    "q_significant_terms_indexed" ->
      """WITH toks AS (SELECT doc_id, lang = 'de' AS fg,
             unnest(list_distinct(list_filter(string_split(lower(text), ' '),
               x -> x <> ''))) AS term
           FROM documents),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS DOUBLE)
               AS fgn
           FROM documents),
         t AS (SELECT term, CAST(count(*) AS DOUBLE) AS bgdf,
             CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS DOUBLE) AS fgdf
           FROM toks GROUP BY term),
         z AS (SELECT term, CAST(fgdf AS BIGINT) AS fg_count,
             CAST(bgdf AS BIGINT) AS bg_count,
             round((fgdf / fgn - bgdf / n) * ((fgdf / fgn) / (bgdf / n)), 6)
               AS score
           FROM t, n WHERE fgdf >= 5)
         SELECT term, fg_count, bg_count, score FROM z WHERE score > 0
         ORDER BY score DESC, term LIMIT 20""",

    // exact long tail: vocabulary doc-frequency agg, threshold filter
    "q_rare_terms" ->
      """WITH t AS (SELECT unnest(list_distinct(list_filter(
             string_split(lower(text), ' '), x -> x <> ''))) AS term
           FROM documents)
         SELECT term, count(*) AS doc_count FROM t GROUP BY term
         HAVING count(*) <= 380 ORDER BY doc_count, term LIMIT 20""",

    // per-filter and pairwise-intersection counts; empty buckets absent
    "q_adjacency_matrix" ->
      """WITH m AS (SELECT lang = 'en' AS f_en,
             list_contains(string_split(lower(text), ' '), 'merge')
               AS f_merge,
             list_contains(string_split(lower(text), ' '), 'window')
               AS f_window
           FROM documents),
         k AS (
           SELECT 'en' AS key, count(*) FILTER (f_en) AS doc_count FROM m
           UNION ALL SELECT 'en&merge', count(*) FILTER (f_en AND f_merge)
             FROM m
           UNION ALL SELECT 'en&window', count(*) FILTER (f_en AND f_window)
             FROM m
           UNION ALL SELECT 'merge', count(*) FILTER (f_merge) FROM m
           UNION ALL SELECT 'merge&window',
             count(*) FILTER (f_merge AND f_window) FROM m
           UNION ALL SELECT 'window', count(*) FILTER (f_window) FROM m)
         SELECT key, doc_count FROM k WHERE doc_count > 0 ORDER BY key""",

    // terms agg over a key tuple, count-desc then keys-asc cut
    "q_multi_terms" ->
      """SELECT lang, source, count(*) AS doc_count FROM documents
         GROUP BY lang, source
         ORDER BY doc_count DESC, lang, source LIMIT 10""",

    // typed JSON runtime field, aggregated like a stored column
    "q_json_extract" ->
      """SELECT event_type, count(k) AS n, min(k) AS min_k,
           max(k) AS max_k, CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events) t
         GROUP BY 1 ORDER BY 1""",

    // the canonicalization chain mirrored step-for-step ('g' flag:
    // DuckDB replaces first-only by default, Spark replaces all)
    "x_url_canon" ->
      """WITH u AS (SELECT doc_id,
             'HTTPS://WWW.Site' || CAST(doc_id % 10 AS VARCHAR) ||
             '.Example.com/Path' || CAST(doc_id % 5 AS VARCHAR) ||
             '/?utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR) ||
             '&utm_campaign=x#frag' AS url
           FROM documents),
         s0 AS (SELECT doc_id,
             regexp_replace(url, '#.*$', '', 'g') AS u FROM u),
         s1 AS (SELECT doc_id,
             lower(regexp_extract(u, '^([^:/?#]+://[^/?#]*)', 1)) ||
             regexp_replace(u, '^[^:/?#]+://[^/?#]*', '', 'g') AS u
           FROM s0),
         s2 AS (SELECT doc_id,
             regexp_replace(u, '^(https?://)www\.', '\1', 'g') AS u
           FROM s1),
         s3 AS (SELECT doc_id,
             regexp_replace(u, '&(utm_[a-z]+|ref)=[^&]*', '', 'g') AS u
           FROM s2),
         s4 AS (SELECT doc_id,
             regexp_replace(u, '\?(utm_[a-z]+|ref)=[^&]*&', '?', 'g') AS u
           FROM s3),
         s5 AS (SELECT doc_id,
             regexp_replace(u, '\?(utm_[a-z]+|ref)=[^&]*$', '', 'g') AS u
           FROM s4),
         c AS (SELECT doc_id,
             regexp_replace(u, '/\?', '?', 'g') AS canonical FROM s5)
         SELECT canonical, count(*) AS n_dups, min(doc_id) AS keeper
         FROM c GROUP BY 1 ORDER BY 1""",

    // the re-layout must lose nothing: ≡ the raw-table 2-D filter
    "x_zorder" ->
      """SELECT doc_id, n_chars, CAST(doc_id * 37 % 1000 AS INT) AS x
         FROM documents
         WHERE doc_id * 37 % 1000 >= 100 AND doc_id * 37 % 1000 < 300
           AND n_chars >= 500 AND n_chars < 1000
         ORDER BY doc_id""",

    // violation semantics mirrored rule-for-rule (see QualityRules doc)
    "x_quality_rules" ->
      """WITH v AS (
           SELECT 'orderkey_not_null' AS rule,
             count(*) FILTER (l_orderkey IS NULL) AS n_violations
           FROM lineitem
           UNION ALL
           SELECT 'quantity_1_50', count(*) FILTER (l_quantity IS NOT NULL
             AND (l_quantity < 1.0 OR l_quantity > 50.0)) FROM lineitem
           UNION ALL
           SELECT 'discount_0_01', count(*) FILTER (l_discount IS NOT NULL
             AND (l_discount < 0.0 OR l_discount > 0.1)) FROM lineitem
           UNION ALL
           SELECT 'price_positive', count(*) FILTER
             (NOT coalesce(l_extendedprice > 0, FALSE)) FROM lineitem
           UNION ALL
           SELECT 'pk_order_line',
             count(*) - count(DISTINCT (l_orderkey, l_linenumber))
           FROM lineitem
           UNION ALL
           SELECT 'fk_orders', count(*) FROM lineitem l
           WHERE NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_orderkey = l.l_orderkey))
         SELECT rule, n_violations, n_violations = 0 AS passed
         FROM v ORDER BY rule""",

    // same constants/idf as q_match_bm25; per-term legs surfaced
    "q_explain_score" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS c0,
             ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS c1
           FROM t, s)
         SELECT doc_id, round(c0, 6) AS c_merge, round(c1, 6) AS c_window,
           round(c0 + c1, 6) AS bm25
         FROM z WHERE c0 + c1 > 0
         ORDER BY bm25 DESC, doc_id LIMIT 15""",

    // per query: tf ranking → binary judgments → p@10 / MRR / decimal-
    // summed DCG over ideal fold (left fold ≡ Spark's 0-seeded fold)
    "x_rank_eval" ->
      """WITH d AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         s1 AS (SELECT doc_id,
             len(list_filter(w, x -> x = 'merge'))
               + len(list_filter(w, x -> x = 'window'))
               + len(list_filter(w, x -> x = 'scan')) AS score,
             (list_contains(w, 'merge') AND list_contains(w, 'window')
               AND list_contains(w, 'scan')) AS isrel
           FROM d),
         r1 AS (SELECT doc_id, CAST(isrel AS INT) AS rel,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
           FROM s1 WHERE score > 0),
         t1 AS (SELECT rel, rk FROM r1 WHERE rk <= 10),
         n1 AS (SELECT count(*) AS nrel FROM s1 WHERE isrel),
         m1 AS (SELECT 'merge window scan' AS query,
             round(sum(rel) / 10.0, 6) AS p_10,
             round(coalesce(1.0 / min(CASE WHEN rel > 0 THEN rk END), 0.0),
               6) AS mrr,
             sum(CAST(round(rel / log2(rk + 1), 12) AS DECIMAL(20,12)))
               AS dcg
           FROM t1),
         i1 AS (SELECT CASE WHEN least(nrel, 10) >= 1 THEN
             list_reduce(list_transform(range(1, least(nrel, 10) + 1),
               i -> 1.0 / log2(CAST(i AS DOUBLE) + 1)), (a, b) -> a + b)
             ELSE 0.0 END AS idcg FROM n1),
         q1 AS (SELECT query, p_10, mrr,
             round(CASE WHEN idcg > 0 THEN CAST(dcg AS DOUBLE) / idcg
               ELSE 0.0 END, 6) AS ndcg_10
           FROM m1, i1),
         s2 AS (SELECT doc_id,
             len(list_filter(w, x -> x = 'stream'))
               + len(list_filter(w, x -> x = 'data')) AS score,
             (list_contains(w, 'stream') AND list_contains(w, 'data'))
               AS isrel
           FROM d),
         r2 AS (SELECT doc_id, CAST(isrel AS INT) AS rel,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
           FROM s2 WHERE score > 0),
         t2 AS (SELECT rel, rk FROM r2 WHERE rk <= 10),
         n2 AS (SELECT count(*) AS nrel FROM s2 WHERE isrel),
         m2 AS (SELECT 'stream data' AS query,
             round(sum(rel) / 10.0, 6) AS p_10,
             round(coalesce(1.0 / min(CASE WHEN rel > 0 THEN rk END), 0.0),
               6) AS mrr,
             sum(CAST(round(rel / log2(rk + 1), 12) AS DECIMAL(20,12)))
               AS dcg
           FROM t2),
         i2 AS (SELECT CASE WHEN least(nrel, 10) >= 1 THEN
             list_reduce(list_transform(range(1, least(nrel, 10) + 1),
               i -> 1.0 / log2(CAST(i AS DOUBLE) + 1)), (a, b) -> a + b)
             ELSE 0.0 END AS idcg FROM n2),
         q2 AS (SELECT query, p_10, mrr,
             round(CASE WHEN idcg > 0 THEN CAST(dcg AS DOUBLE) / idcg
               ELSE 0.0 END, 6) AS ndcg_10
           FROM m2, i2)
         SELECT * FROM q1 UNION ALL SELECT * FROM q2 ORDER BY query""",

    // the date-math ladder mirrored as interval arithmetic
    "q_date_math" ->
      """WITH n AS (SELECT max(ts) AS now FROM events),
         b AS (SELECT date_trunc('day', now - INTERVAL 7 DAY) AS f,
             date_trunc('day', now) AS t FROM n)
         SELECT event_type, count(*) AS n_events
         FROM events, b WHERE ts >= b.f AND ts < b.t
         GROUP BY event_type ORDER BY event_type""",

    // per-token best correction: (distance, df desc, term) rank
    "q_phrase_suggest" ->
      """WITH v AS (SELECT term, count(*) AS df FROM (
             SELECT doc_id, unnest(list_distinct(list_filter(
               string_split(lower(text), ' '), x -> x <> ''))) AS term
             FROM documents) t GROUP BY term),
         q AS (SELECT * FROM (VALUES (0, 'mrge'), (1, 'windw'),
             (2, 'scan')) t(pos, token)),
         c AS (SELECT q.pos, q.token, v.term, v.df,
             levenshtein(q.token, v.term) AS d
           FROM q JOIN v ON levenshtein(q.token, v.term) <= 1),
         r AS (SELECT pos, token, term, df,
             row_number() OVER (PARTITION BY pos
               ORDER BY d, df DESC, term) AS rk
           FROM c)
         SELECT q.pos, q.token, r.term AS suggestion, r.df
         FROM q LEFT JOIN r ON r.pos = q.pos AND r.rk = 1
         ORDER BY q.pos""",

    // the parsed boolean tree mirrored clause-for-clause
    "q_query_string" ->
      """WITH t AS (SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
           FROM documents)
         SELECT doc_id, lang FROM t
         WHERE lang = 'de'
           AND (list_contains(toks, 'merge')
             OR contains(' ' || array_to_string(toks, ' ') || ' ',
                  ' window scan '))
           AND NOT len(list_filter(toks,
                 w -> starts_with(w, 'filter'))) > 0
         ORDER BY doc_id""",

    // the lenient degraded semantics: bag-of-terms AND
    "q_simple_query_string" ->
      """WITH t AS (SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
           FROM documents)
         SELECT doc_id, lang FROM t
         WHERE list_contains(toks, 'merge')
           AND list_contains(toks, 'window')
           AND list_contains(toks, 'scan')
         ORDER BY doc_id""",

    // min |pa-pb|-1 over the pair's position lists, either order
    "q_intervals_unordered" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS w
           FROM documents),
         p AS (SELECT doc_id, unnest(w) AS term,
             unnest(generate_series(0, len(w) - 1)) AS pos
           FROM t),
         a AS (SELECT doc_id, pos FROM p WHERE term = 'merge'),
         b AS (SELECT doc_id, pos FROM p WHERE term = 'window'),
         g AS (SELECT a.doc_id,
             CAST(min(abs(a.pos - b.pos) - 1) AS INTEGER) AS best_gap
           FROM a JOIN b ON a.doc_id = b.doc_id GROUP BY a.doc_id)
         SELECT doc_id, best_gap FROM g WHERE best_gap <= 3
         ORDER BY doc_id""",

    // field group scopes lang; q.op=OR adjacency inside the text group
    "q_query_string_grouped" ->
      """WITH t AS (SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
           FROM documents)
         SELECT doc_id, lang FROM t
         WHERE (lang = 'de' OR lang = 'en')
           AND (list_contains(toks, 'merge')
             OR contains(' ' || array_to_string(toks, ' ') || ' ',
                  ' window scan '))
           AND NOT len(list_filter(toks,
                 w -> starts_with(w, 'filter'))) > 0
         ORDER BY doc_id""",

    // apriori level-2: frequent singles pruned first, then pair counts
    "q_frequent_pairs" ->
      """WITH dt AS (SELECT DISTINCT doc_id, term FROM (
             SELECT doc_id, unnest(list_filter(
               string_split(lower(text), ' '), x -> x <> '')) AS term
             FROM documents)),
         f AS (SELECT term FROM dt GROUP BY term
           HAVING count(*) >= 30),
         p AS (SELECT dt.doc_id, dt.term FROM dt JOIN f USING (term)),
         pr AS (SELECT a.term AS term_a, b.term AS term_b,
             count(*) AS support
           FROM p a JOIN p b
             ON a.doc_id = b.doc_id AND a.term < b.term
           GROUP BY 1, 2 HAVING count(*) >= 30)
         SELECT term_a, term_b, support FROM pr
         ORDER BY support DESC, term_a, term_b LIMIT 20""",

    // digit runs -> '#', first-5-token pattern key, >= 2 docs
    "q_categorize_text" ->
      """WITH s AS (SELECT doc_id,
             regexp_replace(lower(text), '[0-9]+', '#', 'g') AS sig
           FROM documents),
         k AS (SELECT doc_id, array_to_string(list_filter(
             string_split(sig, ' '), x -> x <> '')[1:5], ' ') AS pattern
           FROM s)
         SELECT pattern, count(*) AS n_docs,
           min(doc_id) AS example_doc
         FROM k GROUP BY pattern HAVING count(*) >= 2
         ORDER BY n_docs DESC, pattern""",

    // md5-ordered deterministic sample, per-lang occupancy cap
    "q_sampler" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, h FROM (
             SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             FROM documents) t
           WHERE rk <= 20 ORDER BY h, doc_id LIMIT 60) s
         ORDER BY doc_id""",

    // named buckets (multi-membership) + the _other_ bucket
    "q_filters_agg" ->
      """WITH m AS (SELECT coalesce(lang = 'de', false) AS f_de,
             coalesce(list_contains(string_split(lower(text), ' '),
               'merge'), false) AS f_merge,
             coalesce(list_contains(string_split(lower(text), ' '),
               'window'), false) AS f_window
           FROM documents),
         k AS (SELECT 'de_docs' AS key, count(*) FILTER (f_de)
             AS doc_count FROM m
           UNION ALL SELECT 'has_merge', count(*) FILTER (f_merge) FROM m
           UNION ALL SELECT 'has_window', count(*) FILTER (f_window) FROM m
           UNION ALL SELECT '_other_',
             count(*) FILTER (NOT f_de AND NOT f_merge AND NOT f_window)
             FROM m)
         SELECT key, doc_count FROM k WHERE doc_count > 0 ORDER BY key""",

    // arbitrary [from, to) edges with a decimal-exact sub-agg
    "q_range_agg" ->
      """SELECT CASE
           WHEN n_chars < 600 THEN '*-600'
           WHEN n_chars >= 600 AND n_chars < 1200 THEN '600-1200'
           ELSE '1200-*' END AS bucket,
           count(*) AS doc_count,
           round(CAST(sum(CAST(n_chars AS DECIMAL(20,0))) AS DOUBLE)
             / count(*), 6) AS avg_chars
         FROM documents GROUP BY 1 ORDER BY bucket""",

    // representative docs per bucket via the per-key rank window
    "q_top_hits" ->
      """SELECT lang, rk, doc_id, n_chars FROM (
           SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id) AS rk
           FROM documents) t
         WHERE rk <= 2 ORDER BY lang, rk""",

    // terms ordered by the sub-agg, exact under one global agg
    "q_terms_by_subagg" ->
      """SELECT source, count(*) AS doc_count,
           round(CAST(sum(CAST(n_chars AS DECIMAL(20,0))) AS DOUBLE)
             / count(*), 6) AS avg_chars
         FROM documents GROUP BY source
         ORDER BY avg_chars DESC, source LIMIT 5""",

    // ES floor bucket-key convention; empty buckets absent
    "q_histogram" ->
      """SELECT CAST(floor(n_chars / 250) * 250 AS BIGINT) AS bucket,
           count(*) AS doc_count
         FROM documents GROUP BY 1 ORDER BY bucket""",

    // bucket_sort: rank buckets by the sub-agg, then from=1 size=3
    "q_bucket_sort" ->
      """WITH b AS (SELECT source, count(*) AS n_docs,
             round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
           FROM documents GROUP BY source),
         r AS (SELECT source, n_docs, avg_chars,
             row_number() OVER (ORDER BY avg_chars DESC, source) AS rk
           FROM b)
         SELECT source, n_docs, avg_chars, rk FROM r
         WHERE rk > 1 AND rk <= 4 ORDER BY rk""",

    // rate agg: weekly buckets rescaled to per-day rates
    "q_rate_agg" ->
      """SELECT epoch_us(date_trunc('week', ts)) AS bucket_us,
           count(*) AS n_events,
           round(count(*) / 7.0, 6) AS events_per_day,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6)
             AS value_per_day
         FROM events GROUP BY 1 ORDER BY bucket_us""",

    // stats over the sibling buckets' decimal sums; doubles at the end
    "q_stats_bucket" ->
      """WITH b AS (SELECT date_trunc('week', ts) AS bucket,
             sum(CAST(value AS DECIMAL(12,2))) AS sv
           FROM events GROUP BY 1)
         SELECT count(*) AS n_buckets,
           round(CAST(min(sv) AS DOUBLE), 6) AS min_sum,
           round(CAST(max(sv) AS DOUBLE), 6) AS max_sum,
           round(CAST(sum(sv) AS DOUBLE), 6) AS total_sum,
           round(CAST(sum(sv) AS DOUBLE) / count(*), 6) AS avg_sum
         FROM b""",

    // terms agg with the missing bucket: nulls planted identically
    "q_terms_missing" ->
      """SELECT coalesce(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END,
           '(missing)') AS lang, count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY n_docs DESC, lang""",
    "q_exists" ->
      """SELECT vec_id FROM embeddings
         WHERE vec_id % 13 <> 0 AND embedding IS NOT NULL
         ORDER BY vec_id""",

    // the rung CASE mirrors the operator's integer ladder arithmetic
    "q_auto_histogram" ->
      """WITH s AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS mn,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS mx FROM events),
         r AS (SELECT CASE
             WHEN (mx - mn) // 60 + 1 <= 40 THEN 60
             WHEN (mx - mn) // 3600 + 1 <= 40 THEN 3600
             WHEN (mx - mn) // 86400 + 1 <= 40 THEN 86400
             ELSE 604800 END AS rung FROM s)
         SELECT CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(ts)) AS BIGINT) % rung AS bucket_s,
           count(*) AS doc_count, CAST(rung AS BIGINT) AS interval_s
         FROM events, r GROUP BY 1, 3 ORDER BY 1""",

    // length stats in exact integers; entropy decimal-summed per
    // (lang, char) — the KL/CE order-independence convention
    "q_string_stats" ->
      """WITH ch0 AS (SELECT lang, unnest(string_split(text, '')) AS ch
             FROM documents),
         cc AS (SELECT lang, ch, CAST(count(*) AS DOUBLE) AS c
           FROM ch0 WHERE ch <> '' GROUP BY 1, 2),
         tt AS (SELECT lang, sum(c) AS t FROM cc GROUP BY 1),
         ee AS (SELECT cc.lang,
             CAST(round(-(c / t) * log2(c / t), 9) AS DECIMAL(18,9)) AS e
           FROM cc JOIN tt ON cc.lang = tt.lang),
         en AS (SELECT lang, round(CAST(sum(e) AS DOUBLE), 6) AS entropy
           FROM ee GROUP BY 1),
         base AS (SELECT lang, count(*) AS n_docs,
             CAST(min(length(text)) AS BIGINT) AS min_length,
             CAST(max(length(text)) AS BIGINT) AS max_length,
             round(CAST(sum(length(text)) AS DOUBLE) / count(*), 6)
               AS avg_length
           FROM documents GROUP BY 1)
         SELECT base.lang, n_docs, min_length, max_length, avg_length,
           entropy
         FROM base JOIN en ON base.lang = en.lang ORDER BY base.lang""",

    // saturation: boost·S/(S+pivot); non-positive features never match
    "q_rank_feature" ->
      """SELECT doc_id, round(1.5 * n_chars / (n_chars + 1000.0), 6)
           AS score
         FROM documents WHERE n_chars > 0
         ORDER BY score DESC, doc_id LIMIT 20""",

    // linear decay around the origin: boost·pivot/(pivot+|x−origin|)
    "q_distance_feature" ->
      """SELECT doc_id, round(2.0 * 500.0 / (500.0 + abs(n_chars - 1000.0)),
           6) AS score
         FROM documents ORDER BY score DESC, doc_id LIMIT 20""",

    // pins first in listed order, organic integer-tf ranking follows
    "q_pinned" ->
      """WITH pin AS (SELECT doc_id, TRUE AS pinned,
             CAST(0 AS BIGINT) AS score,
             list_position([42, 7, 99], doc_id) AS ord
           FROM documents WHERE doc_id IN (42, 7, 99)),
         org AS (SELECT doc_id, FALSE AS pinned,
             CAST(len(list_filter(string_split(lower(text), ' '),
                 w -> w = 'merge'))
               + len(list_filter(string_split(lower(text), ' '),
                 w -> w = 'window'))
               + len(list_filter(string_split(lower(text), ' '),
                 w -> w = 'scan')) AS BIGINT) AS score
           FROM documents WHERE doc_id NOT IN (42, 7, 99)),
         u AS (SELECT doc_id, pinned, score, 0 AS grp, ord FROM pin
           UNION ALL
           SELECT doc_id, pinned, score, 1, 0 FROM org WHERE score > 0)
         SELECT doc_id, pinned, score FROM u
         ORDER BY grp, ord, score DESC, doc_id LIMIT 15""",

    // per-document minimum-should-match, no clamping (ES terms_set)
    "q_terms_set" ->
      """SELECT doc_id, matched, required FROM (
           SELECT doc_id,
             CAST(CAST(list_contains(string_split(lower(text), ' '),
                   'merge') AS INT)
               + CAST(list_contains(string_split(lower(text), ' '),
                   'window') AS INT)
               + CAST(list_contains(string_split(lower(text), ' '),
                   'filter') AS INT) AS BIGINT) AS matched,
             CAST(n_chars % 3 + 1 AS BIGINT) AS required
           FROM documents) t
         WHERE matched >= required ORDER BY doc_id""",

    // term clauses + a prefix clause on the last token, OR'd
    "q_match_bool_prefix" ->
      """SELECT doc_id, score FROM (
           SELECT doc_id,
             CAST(CAST(list_contains(string_split(lower(text), ' '),
                   'window') AS INT)
               + CAST(len(list_filter(string_split(lower(text), ' '),
                   w -> starts_with(w, 'mer'))) > 0 AS INT)
             AS BIGINT) AS score
           FROM documents) t
         WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 30""",

    "q_has_child" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         ORDER BY o_orderkey""",

    "q_has_parent" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
         ORDER BY l_orderkey, l_linenumber""",

    "q_date_histogram" ->
      """SELECT epoch_us(date_trunc('week', ts)) AS bucket_us,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY bucket_us""",

    "q_range" ->
      """SELECT doc_id, n_chars FROM documents
         WHERE n_chars >= 500 AND n_chars < 1500 ORDER BY doc_id""",
    "q_facets" ->
      """SELECT lang, count(*) AS n_docs FROM documents
         WHERE list_has_any(string_split(lower(text), ' '),
           ['merge', 'window'])
         GROUP BY 1 ORDER BY n_docs DESC, lang LIMIT 5""",
    // cursor page 2 ≡ rows 11-20 of the full ranking (the OFFSET form;
    // the Spark side gets there via the (score, id) cursor instead)
    "q_composite_agg" ->
      """SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang, source
         HAVING lang > 'de' OR (lang = 'de' AND source > 'web')
         ORDER BY lang, source LIMIT 5""",

    "q_search_after" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s)
         SELECT doc_id, round(score, 6) AS bm25 FROM z WHERE score > 0
         ORDER BY bm25 DESC, doc_id LIMIT 10 OFFSET 10""",
    // ordered proximity: positions p1 < p2 with p2 − p1 − 1 ≤ slop(1);
    // 1-based vs 0-based positions cancel in the difference
    "q_span_near" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         p AS (SELECT doc_id, unnest(w) AS term,
             generate_subscripts(w, 1) AS pos
           FROM t),
         a AS (SELECT doc_id, pos FROM p WHERE term = 'stream'),
         b AS (SELECT doc_id, pos FROM p WHERE term = 'data')
         SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b
           ON a.doc_id = b.doc_id
         WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 1
         ORDER BY a.doc_id""",
    // span_or: each clause re-derived as its own ordered-proximity
    // exists, matched-clause count per doc
    "q_span_or" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         p AS (SELECT doc_id, unnest(w) AS term,
             generate_subscripts(w, 1) AS pos
           FROM t),
         c1 AS (SELECT DISTINCT a.doc_id FROM
             (SELECT doc_id, pos FROM p WHERE term = 'stream') a
           JOIN (SELECT doc_id, pos FROM p WHERE term = 'data') b
             ON a.doc_id = b.doc_id
           WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 1),
         c2 AS (SELECT DISTINCT a.doc_id FROM
             (SELECT doc_id, pos FROM p WHERE term = 'merge') a
           JOIN (SELECT doc_id, pos FROM p WHERE term = 'window') b
             ON a.doc_id = b.doc_id
           WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 2),
         u AS (SELECT doc_id FROM c1 UNION ALL SELECT doc_id FROM c2)
         SELECT doc_id, CAST(count(*) AS INT) AS n_clauses
         FROM u GROUP BY doc_id ORDER BY doc_id""",
    // containment over ALL qualifying big spans; 1-based subscripts,
    // relative position arithmetic only
    "q_span_within" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         p AS (SELECT doc_id, unnest(w) AS term,
             generate_subscripts(w, 1) AS pos
           FROM t),
         a AS (SELECT doc_id, pos FROM p WHERE term = 'stream'),
         b AS (SELECT doc_id, pos FROM p WHERE term = 'data'),
         l AS (SELECT doc_id, pos FROM p WHERE term = 'merge')
         SELECT DISTINCT a.doc_id AS doc_id FROM a
         JOIN b ON a.doc_id = b.doc_id
         JOIN l ON l.doc_id = a.doc_id
         WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 10
           AND l.pos >= a.pos AND l.pos <= b.pos
         ORDER BY a.doc_id""",
    "q_suggest" ->
      """SELECT term, CAST(sum(c) AS BIGINT) AS freq FROM (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             x -> x <> '')) AS term, 1 AS c
           FROM documents)
         WHERE starts_with(term, 's')
         GROUP BY term ORDER BY freq DESC, term LIMIT 4""",
    // 0-based Spark pos < 3 ≡ 1-based subscripts pos <= 3
    "q_span_first" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         p AS (SELECT doc_id, unnest(w) AS term,
             generate_subscripts(w, 1) AS pos
           FROM t)
         SELECT DISTINCT doc_id FROM p
         WHERE term = 'merge' AND pos <= 3
         ORDER BY doc_id""",
    // a 'scan' position survives iff NO 'merge' within ±1 (left-join
    // against the exclusion window, keep null-matched rows)
    "q_span_not" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         p AS (SELECT doc_id, unnest(w) AS term,
             generate_subscripts(w, 1) AS pos
           FROM t),
         a AS (SELECT doc_id, pos FROM p WHERE term = 'scan'),
         b AS (SELECT doc_id, pos FROM p WHERE term = 'merge')
         SELECT DISTINCT a.doc_id AS doc_id FROM a LEFT JOIN b
           ON a.doc_id = b.doc_id
           AND b.pos BETWEEN a.pos - 1 AND a.pos + 1
         WHERE b.pos IS NULL
         ORDER BY a.doc_id""",
    // full postings dump: lateral unnest of the tokenized text, exact tf
    "x_inverted_postings" ->
      """SELECT term, doc_id, tf FROM (
           SELECT t.term AS term, d.doc_id AS doc_id,
             CAST(count(*) AS INTEGER) AS tf
           FROM documents d,
             unnest(list_filter(string_split(lower(d.text), ' '), x -> x <> ''))
               AS t(term)
           GROUP BY 1, 2)
         ORDER BY term, doc_id""",
    // the index-accelerated path must reproduce the corpus-scan BM25
    // exactly — same oracle as q_match_bm25
    // the incrementally-maintained index must reproduce the full-corpus
    // BM25 bit-for-bit once its deltas resolve — identical oracle
    "x_bm25_incremental" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s)
         SELECT doc_id, round(score, 6) AS bm25 FROM z WHERE score > 0
         ORDER BY bm25 DESC, doc_id LIMIT 20""",
    "x_bm25_indexed" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s)
         SELECT doc_id, round(score, 6) AS bm25 FROM z WHERE score > 0
         ORDER BY bm25 DESC, doc_id LIMIT 20""",
    // the oracle skips the bounding box (it never excludes an in-radius
    // point) and mirrors the haversine term-for-term
    // antimeridian-crossing box: the lon leg wraps (>= min OR <= max)
    "q_geo_bbox" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents)
         SELECT doc_id, lat, lon FROM p
         WHERE lat >= 50.0 AND lat <= 80.0
           AND (lon >= 170.0 OR lon <= -140.0)
         ORDER BY doc_id""",
    "x_geo_radius" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         dkm AS (SELECT doc_id, lat, lon,
             round(2 * 6371.0088 * asin(sqrt(
               sin(radians(26.0 - lat) / 2) * sin(radians(26.0 - lat) / 2)
               + cos(radians(lat)) * cos(radians(26.0))
               * sin(radians(93.0 - lon) / 2) * sin(radians(93.0 - lon) / 2))),
               3) AS dist_km
           FROM p)
         SELECT doc_id, lat, lon, dist_km FROM dkm
         WHERE dist_km <= 1500.0 ORDER BY doc_id""",
    "x_geo_knn" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents)
         SELECT doc_id,
           round(2 * 6371.0088 * asin(sqrt(
             sin(radians(40.0 - lat) / 2) * sin(radians(40.0 - lat) / 2)
             + cos(radians(lat)) * cos(radians(40.0))
             * sin(radians(-74.0 - lon) / 2) * sin(radians(-74.0 - lon) / 2))),
             3) AS dist_km
         FROM p ORDER BY dist_km, doc_id LIMIT 15""",
    // indexed geo twins: byte-identical result contract to the scan forms
    "x_geo_join_indexed" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         c(center_id, clat, clon) AS (VALUES
           (1, -48.0, -89.0), (2, 7.5, 47.5), (3, 70.4, -157.8)),
         d AS (SELECT center_id, doc_id,
             2 * 6371.0088 * asin(sqrt(
               sin(radians(clat - lat) / 2) * sin(radians(clat - lat) / 2)
               + cos(radians(lat)) * cos(radians(clat))
               * sin(radians(clon - lon) / 2) * sin(radians(clon - lon) / 2)))
               AS dist
           FROM p, c)
         SELECT CAST(center_id AS BIGINT) AS center_id, doc_id,
           round(dist, 3) AS dist_km
         FROM d WHERE dist <= 1500.0
         ORDER BY center_id, doc_id""",
    "x_geo_radius_indexed" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         dkm AS (SELECT doc_id, lat, lon,
             round(2 * 6371.0088 * asin(sqrt(
               sin(radians(26.0 - lat) / 2) * sin(radians(26.0 - lat) / 2)
               + cos(radians(lat)) * cos(radians(26.0))
               * sin(radians(93.0 - lon) / 2) * sin(radians(93.0 - lon) / 2))),
               3) AS dist_km
           FROM p)
         SELECT doc_id, lat, lon, dist_km FROM dkm
         WHERE dist_km <= 1500.0 ORDER BY doc_id""",
    "x_geo_knn_indexed" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents)
         SELECT doc_id,
           round(2 * 6371.0088 * asin(sqrt(
             sin(radians(40.0 - lat) / 2) * sin(radians(40.0 - lat) / 2)
             + cos(radians(lat)) * cos(radians(40.0))
             * sin(radians(-74.0 - lon) / 2) * sin(radians(-74.0 - lon) / 2))),
             3) AS dist_km
         FROM p ORDER BY dist_km, doc_id LIMIT 15""",
    // live survivor set: ids ≥ 30 at original positions minus the
    // in-disc tombstones [290,300), plus ids < 10 at their re-upserted
    // (moved-into-the-disc) positions
    "x_geo_upsert" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         live AS (
           SELECT doc_id, lat, lon FROM p
           WHERE doc_id >= 30 AND NOT (doc_id >= 290 AND doc_id < 300)
           UNION ALL
           SELECT doc_id, lat / 4 + 47 AS lat, lon / 2 + 183 AS lon
           FROM p WHERE doc_id < 10),
         dkm AS (SELECT doc_id, lat, lon,
             round(2 * 6371.0088 * asin(sqrt(
               sin(radians(26.0 - lat) / 2) * sin(radians(26.0 - lat) / 2)
               + cos(radians(lat)) * cos(radians(26.0))
               * sin(radians(93.0 - lon) / 2) * sin(radians(93.0 - lon) / 2))),
               3) AS dist_km
           FROM live)
         SELECT doc_id, lat, lon, dist_km FROM dkm
         WHERE dist_km <= 1500.0 ORDER BY doc_id""",
    // live count after upsert(<20, supersede) + delete(<5); the 30°
    // lattice holds 7 lat rows × 12 lon cols = 84 cells; one upsert +
    // one delete pending in the commit log
    "x_geo_stats" ->
      """SELECT CAST(count(*) - 5 AS BIGINT) AS n_points,
           CAST(84 AS BIGINT) AS n_cells,
           TRUE AS skew_ok, TRUE AS max_consistent,
           CAST(2 AS BIGINT) AS n_pending_commits
         FROM documents""",
    // ray casting unrolled edge-for-edge with identical literal
    // arithmetic — pure comparisons and one division, no rounding needed
    "x_geo_polygon" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         c AS (SELECT doc_id, lat, lon,
             (CASE WHEN (-25.0 > lat) <> (5.0 > lat) THEN
                CASE WHEN lon < ((-10.0) - (-10.0)) * (lat - (-25.0))
                  / (5.0 - (-25.0)) + (-10.0) THEN 1 ELSE 0 END ELSE 0 END)
             + (CASE WHEN (5.0 > lat) <> (25.0 > lat) THEN
                CASE WHEN lon < (60.0 - (-10.0)) * (lat - 5.0)
                  / (25.0 - 5.0) + (-10.0) THEN 1 ELSE 0 END ELSE 0 END)
             + (CASE WHEN (25.0 > lat) <> (-5.0 > lat) THEN
                CASE WHEN lon < (60.0 - 60.0) * (lat - 25.0)
                  / (-5.0 - 25.0) + 60.0 THEN 1 ELSE 0 END ELSE 0 END)
             + (CASE WHEN (-5.0 > lat) <> (-25.0 > lat) THEN
                CASE WHEN lon < ((-10.0) - 60.0) * (lat - (-5.0))
                  / (-25.0 - (-5.0)) + 60.0 THEN 1 ELSE 0 END ELSE 0 END)
               AS crossings
           FROM p)
         SELECT doc_id, lat, lon FROM c
         WHERE crossings % 2 = 1 ORDER BY doc_id""",
    // band membership keyed on the SAME 3dp-rounded distance both sides
    "x_geo_distance_agg" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         d AS (SELECT doc_id,
             round(2 * 6371.0088 * asin(sqrt(
               sin(radians(40.0 - lat) / 2) * sin(radians(40.0 - lat) / 2)
               + cos(radians(lat)) * cos(radians(40.0))
               * sin(radians(-74.0 - lon) / 2) * sin(radians(-74.0 - lon) / 2))),
               3) AS dist_km
           FROM p),
         b AS (SELECT CASE WHEN dist_km <= 2000.0 THEN '0-2000'
             WHEN dist_km <= 5000.0 THEN '2000-5000'
             WHEN dist_km <= 10000.0 THEN '5000-10000'
             ELSE '10000+' END AS band, dist_km
           FROM d)
         SELECT band, count(*) AS n_points,
           min(dist_km) AS min_km, max(dist_km) AS max_km
         FROM b GROUP BY band ORDER BY band""",

    // same floor lattice; decimal sums + one double division per mean
    "x_geo_grid_agg" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents)
         SELECT CAST(floor(lat / 15.0) AS INT) AS lat_cell,
           CAST(floor(lon / 15.0) AS INT) AS lon_cell,
           count(*) AS n_points,
           round(CAST(sum(CAST(lat AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS mean_lat,
           round(CAST(sum(CAST(lon AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS mean_lon
         FROM p GROUP BY 1, 2 ORDER BY lat_cell, lon_cell""",

    // bounding box exact min/max; centroid via the decimal-sum mean
    "x_geo_bounds" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents)
         SELECT doc_id % 4 AS g, count(*) AS n,
           min(lat) AS min_lat, max(lat) AS max_lat,
           min(lon) AS min_lon, max(lon) AS max_lon,
           round(CAST(sum(CAST(lat AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS centroid_lat,
           round(CAST(sum(CAST(lon AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS centroid_lon
         FROM p GROUP BY 1 ORDER BY g""",

    // bbox cell pruning may never change the answer: x_geo_polygon's
    // oracle verbatim
    "x_geo_polygon_indexed" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         c AS (SELECT doc_id, lat, lon,
             (CASE WHEN (-25.0 > lat) <> (5.0 > lat) THEN
                CASE WHEN lon < ((-10.0) - (-10.0)) * (lat - (-25.0))
                  / (5.0 - (-25.0)) + (-10.0) THEN 1 ELSE 0 END ELSE 0 END)
             + (CASE WHEN (5.0 > lat) <> (25.0 > lat) THEN
                CASE WHEN lon < (60.0 - (-10.0)) * (lat - 5.0)
                  / (25.0 - 5.0) + (-10.0) THEN 1 ELSE 0 END ELSE 0 END)
             + (CASE WHEN (25.0 > lat) <> (-5.0 > lat) THEN
                CASE WHEN lon < (60.0 - 60.0) * (lat - 25.0)
                  / (-5.0 - 25.0) + 60.0 THEN 1 ELSE 0 END ELSE 0 END)
             + (CASE WHEN (-5.0 > lat) <> (-25.0 > lat) THEN
                CASE WHEN lon < ((-10.0) - 60.0) * (lat - (-5.0))
                  / (-25.0 - (-5.0)) + 60.0 THEN 1 ELSE 0 END ELSE 0 END)
               AS crossings
           FROM p)
         SELECT doc_id, lat, lon FROM c
         WHERE crossings % 2 = 1 ORDER BY doc_id""",
    // brute-force oracle: the equi-join operator must equal the cross
    // product filtered by the same haversine (filter on the unrounded
    // distance, round only for the compare — mirroring the Spark side)
    "x_geo_join" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         c(center_id, clat, clon) AS (VALUES
           (1, -48.0, -89.0), (2, 7.5, 47.5), (3, 70.4, -157.8)),
         d AS (SELECT center_id, doc_id,
             2 * 6371.0088 * asin(sqrt(
               sin(radians(clat - lat) / 2) * sin(radians(clat - lat) / 2)
               + cos(radians(lat)) * cos(radians(clat))
               * sin(radians(clon - lon) / 2) * sin(radians(clon - lon) / 2)))
               AS dist
           FROM p, c)
         SELECT CAST(center_id AS BIGINT) AS center_id, doc_id,
           round(dist, 3) AS dist_km
         FROM d WHERE dist <= 1500.0
         ORDER BY center_id, doc_id""",
    // per-center exact rank on the 3dp-rounded distance with id
    // tie-break — the x_geo_knn cut, one partition per center
    "x_geo_knn_join" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         c(center_id, clat, clon) AS (VALUES
           (1, 40.0, -74.0), (2, -33.9, 151.2), (3, 64.1, -21.9)),
         d AS (SELECT center_id, doc_id,
             round(2 * 6371.0088 * asin(sqrt(
               sin(radians(clat - lat) / 2) * sin(radians(clat - lat) / 2)
               + cos(radians(lat)) * cos(radians(clat))
               * sin(radians(clon - lon) / 2) * sin(radians(clon - lon) / 2))),
               3) AS dist_km
           FROM p, c),
         r AS (SELECT center_id, doc_id, dist_km,
             row_number() OVER (PARTITION BY center_id
               ORDER BY dist_km, doc_id) AS rk
           FROM d)
         SELECT CAST(center_id AS BIGINT) AS center_id, doc_id, dist_km,
           CAST(rk AS INT) AS rk
         FROM r WHERE rk <= 5 ORDER BY center_id, rk""",
    // the DataFrame-centers overload answers the same per-center rank —
    // centers drawn FROM the corpus (every ~101st document)
    "x_geo_knn_join_df" ->
      """WITH p AS (SELECT doc_id,
             CAST(doc_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(doc_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM documents),
         c AS (SELECT doc_id AS center_id, lat AS clat, lon AS clon
           FROM p WHERE doc_id % 101 = 0),
         d AS (SELECT center_id, doc_id,
             round(2 * 6371.0088 * asin(sqrt(
               sin(radians(clat - lat) / 2) * sin(radians(clat - lat) / 2)
               + cos(radians(lat)) * cos(radians(clat))
               * sin(radians(clon - lon) / 2) * sin(radians(clon - lon) / 2))),
               3) AS dist_km
           FROM p, c),
         r AS (SELECT center_id, doc_id, dist_km,
             row_number() OVER (PARTITION BY center_id
               ORDER BY dist_km, doc_id) AS rk
           FROM d)
         SELECT center_id, doc_id, dist_km, CAST(rk AS INT) AS rk
         FROM r WHERE rk <= 5 ORDER BY center_id, rk""",
    "x_collapse" ->
      """WITH z AS (SELECT doc_id, source,
             len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
             + len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
             + len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS score
           FROM documents),
         best AS (SELECT source, doc_id, score FROM (
             SELECT source, doc_id, score,
               row_number() OVER (PARTITION BY source
                 ORDER BY score DESC, doc_id) AS rk
             FROM z WHERE score > 0)
           WHERE rk = 1)
         SELECT source, doc_id, score FROM best
         ORDER BY score DESC, source LIMIT 5""",
    // boosted BM25 mirror: each clause's full contrib × its boost, MUST
    // tf > 0, MUST_NOT tf = 0, 6dp round before ranking
    "x_bool_ranked" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'slow'))
               AS DOUBLE) AS tfn
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id, tf0, tfn,
             (ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 1.0
             + (ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 2.0
             + (ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 0.5
               AS score
           FROM t, s)
         SELECT doc_id, round(score, 6) AS score FROM z
         WHERE tf0 > 0 AND tfn = 0 AND score > 0
         ORDER BY round(score, 6) DESC, doc_id LIMIT 20""",
    // stage 1 reuses the x_bm25_indexed scoring CTE cut at 50 by the
    // 6dp-rounded score; stage 2 reranks those ids by exact cosine
    "x_rerank" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM t),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM t, s),
         cand AS (SELECT doc_id FROM z WHERE score > 0
           ORDER BY round(score, 6) DESC, doc_id LIMIT 50),
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         SELECT c.doc_id AS doc_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.qv AS DOUBLE[])), 6) AS cosine
         FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                         CAST(q.qv AS DOUBLE[])) DESC, c.doc_id
         LIMIT 10""",
    // relational BM25 over a (query, term) VALUES relation; rank by the
    // 6dp-ROUNDED score (the Spark side rounds before ranking too)
    "x_bm25_batch" ->
      """WITH qt(query_id, term) AS (VALUES
           ('q0', 'merge'), ('q0', 'window'),
           ('q1', 'stream'), ('q1', 'data'), ('q1', 'scan')),
         toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfn
           FROM toks GROUP BY 1),
         dl AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl
           FROM documents),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS nn, avg(dl) AS avgdl
           FROM dl),
         contrib AS (SELECT qt.query_id, tf.doc_id,
             ln(1 + (st.nn - dfq.dfn + 0.5) / (dfq.dfn + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
           FROM qt JOIN tf USING (term) JOIN dfq USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id, st),
         z AS (SELECT query_id, doc_id, sum(c) AS s FROM contrib
           GROUP BY 1, 2),
         r AS (SELECT query_id, doc_id, round(s, 6) AS bm25,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(s, 6) DESC, doc_id) AS rk
           FROM z WHERE s > 0)
         SELECT query_id, CAST(rk AS INT) AS rk, doc_id, bm25
         FROM r WHERE rk <= 5 ORDER BY query_id, rk""",
    // MLT mirror: tfidf term selection (round-6 + term tie-break) as a
    // CTE, then the RELATIONAL BM25 form (terms join postings join norms
    // — the indexed scorer's shape) over full-corpus stats, source
    // excluded from results but not from N/avgdl/df
    "x_mlt" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfn
           FROM toks GROUP BY 1),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         q AS (SELECT term FROM (
             SELECT tf.term, round(tf.tf * ln(n.n / dfq.dfn), 6) AS s
             FROM tf JOIN dfq USING (term), n WHERE tf.doc_id = 0)
           ORDER BY s DESC, term LIMIT 5),
         dl AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl
           FROM documents),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS nn, avg(dl) AS avgdl
           FROM dl),
         contrib AS (SELECT tf.doc_id,
             ln(1 + (st.nn - dfq.dfn + 0.5) / (dfq.dfn + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
           FROM q JOIN tf USING (term) JOIN dfq USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id, st),
         z AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY 1)
         SELECT doc_id, round(score, 6) AS bm25 FROM z
         WHERE score > 0 AND doc_id <> 0
         ORDER BY bm25 DESC, doc_id LIMIT 10""",
    "agg_quantile_sketch" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
         FROM lineitem""",
    // numeric min/max render as 6dp fixed-point (the StatsStore partial
    // type), strings as plain min/max — both engine-portable
    "x_profile_quantiles" ->
      """SELECT 'doc_id' AS col_name, count(doc_id) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok FROM documents
         UNION ALL
         SELECT 'n_chars', count(n_chars), TRUE, TRUE FROM documents
         ORDER BY col_name""",
    "x_profile_incremental" ->
      """SELECT col_name, n_nonnull, n_null, min_v, max_v, TRUE AS dist_ok
         FROM (
           SELECT 'o_custkey' AS col_name,
             CAST(count(o_custkey) AS BIGINT) AS n_nonnull,
             CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
             CAST(CAST(min(o_custkey) AS DECIMAL(38,6)) AS VARCHAR) AS min_v,
             CAST(CAST(max(o_custkey) AS DECIMAL(38,6)) AS VARCHAR) AS max_v
           FROM orders
           UNION ALL
           SELECT 'o_orderkey',
             CAST(count(o_orderkey) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(CAST(min(o_orderkey) AS DECIMAL(38,6)) AS VARCHAR),
             CAST(CAST(max(o_orderkey) AS DECIMAL(38,6)) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus',
             CAST(count(o_orderstatus) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(min(o_orderstatus) AS VARCHAR),
             CAST(max(o_orderstatus) AS VARCHAR)
           FROM orders)
         ORDER BY col_name""",
    "x_profile" ->
      """SELECT col_name, n_nonnull, n_null, min_v, max_v, TRUE AS dist_ok
         FROM (
           SELECT 'o_custkey' AS col_name,
             CAST(count(o_custkey) AS BIGINT) AS n_nonnull,
             CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
             CAST(min(o_custkey) AS VARCHAR) AS min_v,
             CAST(max(o_custkey) AS VARCHAR) AS max_v
           FROM orders
           UNION ALL
           SELECT 'o_orderkey',
             CAST(count(o_orderkey) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(min(o_orderkey) AS VARCHAR),
             CAST(max(o_orderkey) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus',
             CAST(count(o_orderstatus) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
             CAST(min(o_orderstatus) AS VARCHAR),
             CAST(max(o_orderstatus) AS VARCHAR)
           FROM orders)
         ORDER BY col_name""",
    // BooleanQuery mirror: MUST ∧ ¬MUST_NOT ∧ (should-hits ≥ msm); the
    // indexed form shares the oracle — scan ≡ indexed is part of the gate
    "q_bool" ->
      """SELECT doc_id FROM (SELECT doc_id,
           string_split(lower(text), ' ') AS w FROM documents)
         WHERE list_contains(w, 'merge')
           AND NOT list_contains(w, 'window')
           AND (CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(w, 'scan') THEN 1 ELSE 0 END) >= 1
         ORDER BY doc_id""",
    "q_bool_indexed" ->
      """SELECT doc_id FROM (SELECT doc_id,
           string_split(lower(text), ' ') AS w FROM documents)
         WHERE list_contains(w, 'merge')
           AND NOT list_contains(w, 'window')
           AND (CASE WHEN list_contains(w, 'stream') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(w, 'scan') THEN 1 ELSE 0 END) >= 1
         ORDER BY doc_id""",
    // the JSONL round-trip must reproduce the table; the two poison
    // lines exist only to prove they DON'T surface here
    "s_jsonl_scan" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    "s_jsonl_gz_scan" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    // jsonl drop -> poison-contract source -> bucketed index sink ->
    // term query off the index ≡ the same predicate over the raw table
    "p_e2e_ingest_query" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE lang = 'en' ORDER BY doc_id""",
    // the oracle recomputes the RFC-4180 decoration the gate appended to
    // every row; the 2 hand-planted poison records ride as a constant
    "s_csv_scan" ->
      """SELECT doc_id,
           text || ', "quoted",' || chr(10) || 'line2' AS text,
           lang, n_chars, CAST(2 AS BIGINT) AS n_dlq
         FROM documents ORDER BY doc_id""",
    "s_orc_scan" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",
    // the OCF round-trip must reproduce the source columns exactly (the
    // gate's read schema reorders lang before text — column order is
    // resolution, not luck)
    "s_avro_scan" ->
      """SELECT doc_id, lang, text, n_chars FROM documents
         ORDER BY doc_id""",
    // logical-type OCF round-trip (date/timestamp-micros/decimal):
    // date and decimal stringified in BOTH engines purely for dtype
    // parity at the comparator (see the query-side comment); the
    // timestamp rides as a real timestamp column
    "s_avro_logical" ->
      """SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate_s,
           o_orderdate AS ots,
           CAST(CAST(o_totalprice AS DECIMAL(14,4)) AS VARCHAR) AS price_s
         FROM orders ORDER BY o_orderkey""",
    // identical arithmetic shape: mean = s1/c, var = s2/c − mean²,
    // z = (n − mean)/sqrt(var); // is DuckDB floor-div like Spark DIV
    "x_spike" ->
      """WITH hourly AS (SELECT event_type,
             epoch_us(ts) // 3600000000 AS bucket, count(*) AS n
           FROM events GROUP BY 1, 2),
         t AS (SELECT event_type, bucket, n,
             sum(n) OVER w AS s1, sum(n * n) OVER w AS s2,
             count(*) OVER w AS c
           FROM hourly
           WINDOW w AS (PARTITION BY event_type ORDER BY bucket
             RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT event_type, bucket, n,
             CASE WHEN c >= 12
                 AND (CAST(s2 AS DOUBLE) / c
                   - (CAST(s1 AS DOUBLE) / c) * (CAST(s1 AS DOUBLE) / c)) > 0
               THEN round((n - CAST(s1 AS DOUBLE) / c)
                 / sqrt(CAST(s2 AS DOUBLE) / c
                   - (CAST(s1 AS DOUBLE) / c) * (CAST(s1 AS DOUBLE) / c)), 6)
               ELSE NULL END AS z
           FROM t)
         SELECT event_type, bucket, n, z,
           coalesce(z >= 3.0, FALSE) AS spike
         FROM z ORDER BY event_type, bucket""",
    "x_quality_rank_by_source" ->
      """SELECT doc_id, source,
           round(percent_rank() OVER (
             PARTITION BY source ORDER BY n_chars, doc_id), 6) AS pr
         FROM documents ORDER BY doc_id""",
    // registered queries as a VALUES relation; a (doc, query) pair
    // survives when every must term hits, ≥ msm should terms hit
    // (Lucene default: 1 when must-less, else 0; must-less saturates
    // to ≥1), and no must_not term does
    "q_percolate" ->
      """WITH q(query_id, must, should, must_not, msm) AS (VALUES
           ('alert_merge', ['merge', 'window'], CAST([] AS VARCHAR[]),
             ['scan'], -1),
           ('alert_stream', ['stream', 'data'], CAST([] AS VARCHAR[]),
             CAST([] AS VARCHAR[]), -1),
           ('alert_common', ['the'], CAST([] AS VARCHAR[]),
             CAST([] AS VARCHAR[]), -1),
           ('alert_topic', CAST([] AS VARCHAR[]),
             ['merge', 'stream', 'query'], CAST([] AS VARCHAR[]), 2),
           ('alert_any', CAST([] AS VARCHAR[]), ['window', 'scan'],
             CAST([] AS VARCHAR[]), -1)),
         qe AS (SELECT query_id, must, should, must_not,
             CASE WHEN len(must) = 0
               THEN greatest(CASE WHEN msm >= 0 THEN msm ELSE 1 END, 1)
               ELSE CASE WHEN msm >= 0 THEN msm ELSE 0 END END AS eff
           FROM q),
         t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents)
         SELECT t.doc_id, qe.query_id FROM t, qe
         WHERE len(list_filter(qe.must, m -> list_contains(t.w, m)))
                 = len(qe.must)
           AND len(list_filter(qe.should, m -> list_contains(t.w, m)))
                 >= qe.eff
           AND len(list_filter(qe.must_not, m -> list_contains(t.w, m))) = 0
         ORDER BY doc_id, query_id""",
    // list_position is NULL on no-match in DuckDB (0 in Spark — both
    // filtered); 1-based inclusive list slice mirrors slice(start, len)
    "q_highlight" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents),
         p AS (SELECT doc_id, w, list_position(w, 'merge') AS pos FROM t)
         SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           array_to_string(w[greatest(1, pos - 2):least(len(w), pos + 2)],
             ' ') AS snippet
         FROM p WHERE pos IS NOT NULL AND pos > 0 ORDER BY doc_id""",
    // rate derivation mirrored term-for-term (round-6 before floor pins
    // the integer permille); md5-56 keep-set as in every sampler
    "x_temp_sample" ->
      """WITH s AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
           FROM documents GROUP BY 1),
         t AS (SELECT sum(pow(n, 0.5)) AS z, sum(n) AS nn FROM s),
         r AS (SELECT source,
             least(1000, greatest(0, CAST(floor(round(
               1000.0 * (0.5 * nn) * (pow(n, 0.5) / z) / n, 6))
               AS BIGINT))) AS pm
           FROM s, t)
         SELECT d.doc_id, d.source FROM documents d
         JOIN r ON d.source = r.source
         WHERE (md5_number_lower(CAST(d.doc_id AS VARCHAR))
           % 72057594037927936) % 1000 < r.pm
         ORDER BY doc_id""",
    // tokenize-rejoin-pad mirrors matchPhrase's boundary-safe normalize
    "q_match_phrase" ->
      """SELECT doc_id FROM (
           SELECT doc_id,
             ' ' || array_to_string(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               ' ') || ' ' AS norm
           FROM documents)
         WHERE contains(norm, ' stream data ') ORDER BY doc_id""",
    // no trailing pad: the last fragment may continue into its token;
    // the indexed twin shares the oracle (same contract, pruned layout)
    "q_match_phrase_prefix" ->
      """SELECT doc_id FROM (
           SELECT doc_id,
             ' ' || array_to_string(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               ' ') || ' ' AS norm
           FROM documents)
         WHERE contains(norm, ' stream da') ORDER BY doc_id""",
    "q_phrase_prefix_indexed" ->
      """SELECT doc_id FROM (
           SELECT doc_id,
             ' ' || array_to_string(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               ' ') || ' ' AS norm
           FROM documents)
         WHERE contains(norm, ' stream da') ORDER BY doc_id""",
    "q_term_prefix" ->
      """SELECT doc_id FROM documents
         WHERE len(list_filter(string_split(lower(text), ' '),
           x -> starts_with(x, 'merg'))) > 0
         ORDER BY doc_id""",
    // glob m?rge* ≡ anchored regex m.rge.* (full-token match)
    "q_wildcard" ->
      """SELECT doc_id FROM documents
         WHERE len(list_filter(string_split(lower(text), ' '),
           x -> regexp_full_match(x, 'm.rge.*'))) > 0
         ORDER BY doc_id""",
    // indexed wildcard ≡ the scan-form membership
    "q_wildcard_indexed" ->
      """SELECT doc_id FROM documents
         WHERE len(list_filter(string_split(lower(text), ' '),
           x -> regexp_full_match(x, 'm.rge.*'))) > 0
         ORDER BY doc_id""",
    "q_regex" ->
      """SELECT doc_id FROM documents
         WHERE len(list_filter(string_split(lower(text), ' '),
           x -> regexp_full_match(x, '(scan|merge)s?'))) > 0
         ORDER BY doc_id""",
    // indexed prefix ≡ the scan-form membership
    "q_prefix_indexed" ->
      """SELECT doc_id FROM documents
         WHERE len(list_filter(string_split(lower(text), ' '),
           x -> starts_with(x, 'merg'))) > 0
         ORDER BY doc_id""",
    // vocabulary-scan fuzzy ≡ per-token scan form
    "q_fuzzy_indexed" ->
      """SELECT doc_id FROM documents
         WHERE len(list_filter(string_split(lower(text), ' '),
           x -> x <> '' AND levenshtein(x, 'mergs') <= 1)) > 0
         ORDER BY doc_id""",
    // the live incremental view nets out to the full corpus (bogus
    // phrase-bearing doc tombstoned) — scan-form membership oracle
    "x_phrase_incremental" ->
      """SELECT doc_id FROM (
           SELECT doc_id,
             ' ' || array_to_string(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               ' ') || ' ' AS norm
           FROM documents)
         WHERE contains(norm, ' stream data ') ORDER BY doc_id""",
    // indexed phrase search ≡ the scan-form membership
    "q_phrase_indexed" ->
      """SELECT doc_id FROM (
           SELECT doc_id,
             ' ' || array_to_string(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               ' ') || ' ' AS norm
           FROM documents)
         WHERE contains(norm, ' stream data ') ORDER BY doc_id""",
    "q_match_all" ->
      """SELECT doc_id, source FROM documents ORDER BY doc_id""",
  )
}
