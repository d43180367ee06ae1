package graft

import graft.OracleDefs._

/** DuckDB oracle SQL 3/3: corpus, joins, windows, aggs, streaming-twin rows.
  * (Verbatim slice of the former SparkEntry.oracleSql literal.)
  */
private[graft] object OraclesC {
  def oracleSql: Map[String, String] = Map(
    "ws_distinct" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
         FROM events GROUP BY 1 ORDER BY hour_us""",
    // surviving key set — which duplicate-group row survives is
    // arrival-order-dependent by dropDuplicates contract
    "ws_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    // micro-batched blocklist ≡ whole-corpus blocklist (projection
    // commutes with batching); hits in pattern-list order
    "ws_blocklist" ->
      """WITH m AS (SELECT doc_id,
             list_filter(['scan', 'window scan', 'merge window'],
               p -> contains(lower(text), p)) AS hits
           FROM documents)
         SELECT doc_id, CAST(len(hits) AS INT) AS n_matched,
           coalesce(array_to_string(hits, ','), '') AS matched_terms,
           len(hits) > 0 AS blocked
         FROM m ORDER BY doc_id""",
    // sketch-vs-exact bands self-verify engine-side (the
    // agg_quantile_sketch convention); buckets and counts are exact
    "ws_quantile" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           count(*) AS n_events, TRUE AS p50_ok, TRUE AS p90_ok
         FROM events GROUP BY 1 ORDER BY hour_us""",
    // knnJoin shape + label exclusion; same row_number mirror
    "x_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
             label AS q_label
           FROM embeddings WHERE vec_id < 5),
         z AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS c
           FROM embeddings e, q
           WHERE e.label <> q.q_label),
         r AS (SELECT query_id, vec_id, c,
             row_number() OVER (PARTITION BY query_id
               ORDER BY c DESC, vec_id) AS rk
           FROM z)
         SELECT query_id, CAST(rk AS INT) AS rk, vec_id,
           round(c, 6) AS cosine
         FROM r WHERE rk <= 5 ORDER BY query_id, rk""",
    "x_knn_join" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
         z AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS c
           FROM embeddings e, q),
         r AS (SELECT query_id, vec_id, c,
             row_number() OVER (PARTITION BY query_id
               ORDER BY c DESC, vec_id) AS rk
           FROM z)
         SELECT query_id, CAST(rk AS INT) AS rk, vec_id,
           round(c, 6) AS cosine
         FROM r WHERE rk <= 5 ORDER BY query_id, rk""",
    "x_embed_project" -> embedProjectOracle,
    "x_sim_mmr" -> mmrOracle,
    // the raw string rebuilt from chr() codepoints (decomposed e+0301,
    // U+00DC, Greek capitals), then DuckDB's own canonicalization
    // pipeline: nfc_normalize -> lower -> \s+ collapse -> trim
    "x_text_normalize" ->
      """WITH r AS (SELECT doc_id,
             '  Cafe' || chr(769) || ' ' || chr(9) || ' ' ||
             chr(220) || 'BER ' ||
             chr(931) || chr(921) || chr(915) || chr(924) || chr(913) ||
             '  ' || upper(coalesce(text, '')) AS raw
           FROM documents),
         n AS (SELECT doc_id, raw,
             trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g'))
               AS normalized
           FROM r)
         SELECT doc_id, normalized,
           CAST(length(raw) AS INT) AS n_chars_before,
           CAST(length(normalized) AS INT) AS n_chars_after
         FROM n ORDER BY doc_id""",
    // shortlist-replay: rank by the 6dp-rounded 16-dim prefix cosine
    // (id tie-break), keep 100, rescore full-dim, cut to 10 — the
    // operator's exact contract, no recall assumption
    "x_sim_mrl" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             round(list_cosine_similarity(CAST(embedding[1:16] AS DOUBLE[]),
               qv[1:16]), 6) AS tc
           FROM embeddings, q WHERE embedding IS NOT NULL),
         pool AS (SELECT vec_id, e FROM z ORDER BY tc DESC, vec_id LIMIT 100)
         SELECT vec_id,
           round(list_cosine_similarity(e, (SELECT qv FROM q)), 6) AS cosine
         FROM pool
         ORDER BY list_cosine_similarity(e, (SELECT qv FROM q)) DESC, vec_id
         LIMIT 10""",
    "x_sim_binary" -> simBinaryOracle,
    "x_embed_norm" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE embedding IS NOT NULL),
         n AS (SELECT vec_id, e,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nb
           FROM t)
         SELECT vec_id, round(nb, 6) AS norm_before,
           round(CASE WHEN nb = 0 THEN 0
             ELSE sqrt(list_sum(list_transform(
               list_transform(e, x -> x / nb), x -> x * x))) END, 6)
             AS norm_after,
           round(CASE WHEN nb = 0 THEN e[1] ELSE e[1] / nb END, 6) AS c0
         FROM n ORDER BY vec_id""",
    "x_dedup_windowed" ->
      """SELECT user_id, epoch_us(date_trunc('hour', ts)) AS window_us,
           min(event_id) AS first_id, count(*) AS n_window
         FROM events GROUP BY 1, 2 ORDER BY user_id, window_us""",
    "x_bloom_prune" ->
      """SELECT event_id, user_id FROM events
         WHERE event_type = 'purchase'
           AND user_id IN
             (SELECT user_id FROM events WHERE event_type = 'error')
         ORDER BY event_id""",
    "x_sketch_distinct" ->
      """SELECT count(DISTINCT user_id) AS n_users, TRUE AS users_ok,
           count(DISTINCT event_type) AS n_types, TRUE AS types_ok
         FROM events""",
    // the salt must be invisible: ≡ a plain join + group
    "x_skew_join" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_events
           FROM events GROUP BY 1)
         SELECT e.user_id, count(*) AS n, max(d.user_events) AS user_events,
           CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM events e JOIN dim d ON d.user_id = e.user_id
         GROUP BY 1 ORDER BY 1""",
    "x_skew_agg" ->
      """SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           count(value) AS n,
           CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
           CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the synthetic props carry one key 'k' with an int value; string
    // comparison semantics (min/max lexicographic) match the Spark side
    "x_json_profile" ->
      """WITH v AS (SELECT regexp_extract(props, '"k": (\d+)', 1) AS val
           FROM events WHERE props IS NOT NULL)
         SELECT 'k' AS key, count(*) AS n_present,
           min(val) AS min_value, max(val) AS max_value,
           TRUE AS values_ok
         FROM v""",
    "x_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 604800000000 AS p FROM events),
         c AS (SELECT user_id, min(p) AS cohort FROM a GROUP BY 1)
         SELECT c.cohort, a.p - c.cohort AS "offset", count(*) AS n_users
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY cohort, "offset"""",
    "x_text_ttr" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
           FROM documents)
         SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
           CASE WHEN len(w) = 0 THEN 0.0
             ELSE round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
           END AS ttr
         FROM t ORDER BY doc_id""",
    "x_text_entropy" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM tf GROUP BY 1),
         e AS (SELECT tf.doc_id,
             CAST(round(-(c / n) * ln(c / n), 9) AS DECIMAL(18,9)) AS contrib
           FROM tf JOIN dl ON tf.doc_id = dl.doc_id)
         SELECT doc_id, round(CAST(sum(contrib) AS DOUBLE), 6) AS entropy
         FROM e GROUP BY doc_id ORDER BY doc_id""",
    // the n-gram dedup family's shingle convention (raw text, short-doc
    // collapse); df > 1 means "appears in another doc" since (doc, g)
    // pairs are distinct
    "x_memorization" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3
                 THEN [array_to_string(w, ' ')]
                 ELSE list_transform(range(1, len(w)-1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS w
               FROM documents))),
         dfq AS (SELECT g, count(*) AS dfn FROM sh GROUP BY 1)
         SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN dfn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           round(CAST(sum(CASE WHEN dfn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS shared_frac
         FROM sh JOIN dfq USING (g)
         GROUP BY sh.doc_id ORDER BY doc_id""",
    // same 9dp-decimal contribution discipline as x_text_entropy;
    // p_s and p computed with the identical expression shape
    "x_source_kl" ->
      """WITH toks AS (SELECT source AS src,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
           FROM documents),
         cs AS (SELECT src, term, count(*) AS c FROM toks GROUP BY 1, 2),
         ns AS (SELECT src, sum(c) AS ns FROM cs GROUP BY 1),
         cf AS (SELECT term, sum(c) AS cf FROM cs GROUP BY 1),
         t AS (SELECT sum(cf) AS t FROM cf),
         e AS (SELECT cs.src,
             ns.ns,
             CAST(round((CAST(c AS DOUBLE) / ns)
               * ln((CAST(c AS DOUBLE) / ns) / (CAST(cf AS DOUBLE) / t)), 9)
               AS DECIMAL(18,9)) AS contrib
           FROM cs JOIN ns USING (src) JOIN cf USING (term), t)
         SELECT src AS source, CAST(max(ns) AS BIGINT) AS n_tokens,
           round(CAST(sum(contrib) AS DOUBLE), 6) AS kl
         FROM e GROUP BY src ORDER BY source""",
    // corpus unigram model from the SAME tokenization; 9dp-decimal
    // contribution sum (order-independent), final mean in double
    "x_unigram_ce" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
         cf AS (SELECT term, sum(c) AS cf FROM tf GROUP BY 1),
         tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS t FROM cf),
         e AS (SELECT tf.doc_id,
             CAST(round(tf.c * -ln(CAST(cf.cf AS DOUBLE) / t), 9)
               AS DECIMAL(18,9)) AS contrib,
             tf.c
           FROM tf JOIN cf USING (term) CROSS JOIN tot)
         SELECT doc_id,
           round(CAST(sum(contrib) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             AS unigram_ce
         FROM e GROUP BY doc_id ORDER BY doc_id""",
    "x_heavy_hitters" ->
      """SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             x -> x <> '')) AS term
           FROM documents)
         GROUP BY term ORDER BY n DESC, term""",
    // integer-exact bucket boundaries; the pow2 chain mirrors the
    // engine's threshold chain literally
    "x_pad_waste" -> {
      val p2chain = (0 to 20).map(i => s"WHEN l <= ${1 << i} THEN ${1 << i}")
        .mkString(" ")
      s"""WITH l AS (SELECT len(list_filter(string_split(text, ' '),
             x -> x <> '')) AS l
           FROM documents),
         b AS (SELECT l, CASE $p2chain END AS p2,
             l + (64 - l % 64) % 64 AS m64
           FROM l WHERE l > 0),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(l) AS BIGINT) AS real_t, CAST(max(l) AS BIGINT) AS mx,
             CAST(sum(p2) AS BIGINT) AS sp2,
             CAST(sum(m64) AS BIGINT) AS sm64
           FROM b)
         SELECT policy, n AS n_docs, real_t AS real_tokens, padded_tokens,
           round((padded_tokens - real_t) / CAST(padded_tokens AS DOUBLE), 6)
             AS waste_frac
         FROM (
           SELECT 'global_max' AS policy, n, real_t, n * mx AS padded_tokens
             FROM a
           UNION ALL
           SELECT 'mult64', n, real_t, sm64 FROM a
           UNION ALL
           SELECT 'pow2', n, real_t, sp2 FROM a)
         ORDER BY policy"""
    },

    // the same 9dp-decimal moment sums and closed-form fit
    "x_zipf" ->
      """WITH tc AS (SELECT t, count(*) AS c FROM (SELECT
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS t
           FROM documents) GROUP BY 1),
         pts AS (SELECT
             round(ln(CAST(row_number() OVER
               (ORDER BY c DESC, t) AS DOUBLE)), 9) AS x,
             round(ln(CAST(c AS DOUBLE)), 9) AS y
           FROM tc),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS DOUBLE)
               AS sxy,
             CAST(sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS DOUBLE)
               AS sxx,
             CAST(sum(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS DOUBLE)
               AS syy
           FROM pts)
         SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
             ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
         FROM s""",

    // the merged per-batch grids must equal the whole-corpus grid, so
    // the SAME whole-corpus rebuild gates the streaming union
    "ws_countmin" ->
      """WITH toks AS (SELECT
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS t
           FROM documents),
         tc AS (SELECT t, count(*) AS c FROM toks GROUP BY 1),
         cells AS (SELECT tr.r,
             md5_number_lower(CAST(tr.r AS VARCHAR) || ':' || t)
               % 72057594037927936 % 16 AS bucket,
             sum(c) AS n
           FROM tc CROSS JOIN range(4) tr(r) GROUP BY 1, 2),
         p(term) AS (VALUES ('join'), ('hash'), ('scan'), ('filter'),
           ('zzz_absent')),
         pb AS (SELECT term, tr.r,
             md5_number_lower(CAST(tr.r AS VARCHAR) || ':' || term)
               % 72057594037927936 % 16 AS bucket
           FROM p CROSS JOIN range(4) tr(r))
         SELECT term, CAST(min(coalesce(n, 0)) AS BIGINT) AS est
         FROM pb LEFT JOIN cells USING (r, bucket) GROUP BY 1
         ORDER BY term""",

    // count-min rebuilt cell-for-cell from the md5-56 convention
    "x_sketch_countmin" ->
      """WITH toks AS (SELECT
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS t
           FROM documents),
         tc AS (SELECT t, count(*) AS c FROM toks GROUP BY 1),
         cells AS (SELECT tr.r,
             md5_number_lower(CAST(tr.r AS VARCHAR) || ':' || t)
               % 72057594037927936 % 16 AS bucket,
             sum(c) AS n
           FROM tc CROSS JOIN range(4) tr(r) GROUP BY 1, 2),
         p(term) AS (VALUES ('join'), ('hash'), ('scan'), ('filter'),
           ('zzz_absent')),
         pb AS (SELECT term, tr.r,
             md5_number_lower(CAST(tr.r AS VARCHAR) || ':' || term)
               % 72057594037927936 % 16 AS bucket
           FROM p CROSS JOIN range(4) tr(r)),
         e AS (SELECT term, min(coalesce(n, 0)) AS est
           FROM pb LEFT JOIN cells USING (r, bucket) GROUP BY 1)
         SELECT term, CAST(est AS BIGINT) AS est,
           CAST(coalesce(tc.c, 0) AS BIGINT) AS true_count,
           CAST(est - coalesce(tc.c, 0) AS BIGINT) AS overcount
         FROM e LEFT JOIN tc ON tc.t = e.term ORDER BY term""",

    // arithmetic mirrors the Spark side term-for-term: (1 - 0.8) is
    // COMPUTED (not written 0.2) so both engines use the identical double
    "x_bigram_ce" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
           FROM documents),
         alltok AS (SELECT doc_id, unnest(ts) AS term FROM toks
           WHERE len(ts) > 0),
         cf AS (SELECT term, count(*) AS cf FROM alltok GROUP BY 1),
         tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS t FROM cf),
         f1 AS (SELECT doc_id, ts[1] AS term, count(*) AS c FROM toks
           WHERE len(ts) > 0 GROUP BY 1, 2),
         bpos AS (SELECT doc_id, b.prev AS prev, b.term AS term
           FROM (SELECT doc_id, unnest(list_transform(range(2, len(ts) + 1),
               i -> struct_pack(prev := ts[i - 1], term := ts[i]))) AS b
             FROM toks WHERE len(ts) >= 2)),
         cfb AS (SELECT prev, term, count(*) AS cfb FROM bpos GROUP BY 1, 2),
         r1 AS (SELECT doc_id, prev, term, count(*) AS c FROM bpos
           GROUP BY 1, 2, 3),
         e1 AS (SELECT f1.doc_id,
             CAST(round(f1.c * -ln(CAST(cf.cf AS DOUBLE) / t), 9)
               AS DECIMAL(18,9)) AS contrib,
             f1.c AS c
           FROM f1 JOIN cf USING (term) CROSS JOIN tot),
         e2 AS (SELECT r1.doc_id,
             CAST(round(r1.c * -ln(
                 0.8 * (CAST(cfb.cfb AS DOUBLE) / CAST(cp.cf AS DOUBLE)) +
                 (1 - 0.8) * (CAST(cu.cf AS DOUBLE) / t)), 9)
               AS DECIMAL(18,9)) AS contrib,
             r1.c AS c
           FROM r1 JOIN cfb USING (prev, term)
             JOIN cf cp ON cp.term = r1.prev
             JOIN cf cu ON cu.term = r1.term
             CROSS JOIN tot)
         SELECT doc_id,
           round(CAST(sum(contrib) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             AS bigram_ce
         FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
         GROUP BY doc_id ORDER BY doc_id""",
    "x_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1 FROM events e
           JOIN v ON e.user_id = v.user_id AND epoch_us(e.ts) > v.t0
           WHERE e.event_type = 'click' GROUP BY 1),
         p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
           JOIN c ON e.user_id = c.user_id AND epoch_us(e.ts) > c.t1
           WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT
           (SELECT count(*) FROM v) AS n_view,
           (SELECT CAST(sum(user_id) AS BIGINT) FROM v) AS users_sum_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT CAST(sum(user_id) AS BIGINT) FROM c) AS users_sum_click,
           (SELECT count(*) FROM p) AS n_purchase,
           (SELECT CAST(sum(user_id) AS BIGINT) FROM p) AS users_sum_purchase""",
    "x_source_overlap" ->
      """WITH f AS (SELECT DISTINCT
             md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fp, source
           FROM documents),
         s AS (SELECT source, count(*) AS n FROM f GROUP BY 1),
         p AS (SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_shared
           FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
           GROUP BY 1, 2)
         SELECT source_a, source_b, n_shared, sa.n AS n_a, sb.n AS n_b,
           round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6)
             AS jaccard
         FROM p JOIN s sa ON sa.source = source_a
                JOIN s sb ON sb.source = source_b
         ORDER BY source_a, source_b""",
    "x_sketch_union" ->
      """SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n, TRUE AS est_ok
         FROM documents""",
    "x_quality_rank" ->
      """SELECT doc_id, n_chars,
           round(CAST(percent_rank() OVER (ORDER BY n_chars, doc_id)
             AS DOUBLE), 6) AS pr
         FROM documents ORDER BY doc_id""",
    // mirrored best/worst rankings joined on (group, rank)
    "x_preference_pairs" ->
      """WITH ranked AS (
           SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id ASC) AS rb,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars ASC, doc_id DESC) AS rw,
             count(*) OVER (PARTITION BY source) // 2 AS half
           FROM documents)
         SELECT c.source, c.rb AS pair_rank, c.doc_id AS chosen_id,
           r.doc_id AS rejected_id, c.n_chars - r.n_chars AS margin
         FROM ranked c JOIN ranked r ON c.source = r.source AND c.rb = r.rw
         WHERE c.rb <= c.half AND c.rb <= 50
           AND r.rw <= r.half AND r.rw <= 50
         ORDER BY c.source, c.rb""",
    "x_text_domains" ->
      """WITH p AS (SELECT doc_id,
             text || ' see https://site' || (doc_id % 7)
               || '.example.com/p/' || doc_id
               || ' and https://common.org/x' AS text
           FROM documents),
         h AS (SELECT doc_id, lower(unnest(regexp_extract_all(text,
             'https?://([^/ :]+)', 1))) AS domain FROM p)
         SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_mentions
         FROM h GROUP BY domain ORDER BY domain""",
    "x_mix_epochs" ->
      """WITH r AS (SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 1000
                         WHEN 'src2' THEN 500 ELSE 0 END AS rate,
             (md5_number_lower(CAST(doc_id AS VARCHAR))
               % 72057594037927936) % 1000 AS h
           FROM documents),
         c AS (SELECT doc_id, source,
             rate // 1000 + CASE WHEN h < rate % 1000 THEN 1 ELSE 0 END AS n
           FROM r)
         SELECT doc_id, source, CAST(unnest(range(0, n)) AS BIGINT) AS epoch
         FROM c WHERE n > 0 ORDER BY doc_id, epoch""",
    "x_sessionize_spread" ->
      """SELECT event_id, user_id, ts_us,
           CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_idx
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts)) > 43200000000
               THEN 1 ELSE 0 END AS st
           FROM events)
         ORDER BY user_id, ts_us""",
    "x_sessionize" ->
      """SELECT event_id, user_id, ts_us,
           CAST(sum(st) OVER (PARTITION BY user_id ORDER BY ts_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_idx
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts)) > 43200000000
               THEN 1 ELSE 0 END AS st
           FROM events)
         ORDER BY user_id, ts_us""",
    "x_rolling_active" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
             AS n_window
         FROM events ORDER BY user_id, ts_us""",
    "x_funnel_window" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1 FROM events e
           JOIN v ON e.user_id = v.user_id AND epoch_us(e.ts) > v.t0
             AND epoch_us(e.ts) <= v.t0 + 259200000000
           WHERE e.event_type = 'click' GROUP BY 1),
         p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
           JOIN c ON e.user_id = c.user_id AND epoch_us(e.ts) > c.t1
             AND epoch_us(e.ts) <= c.t1 + 259200000000
           WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT
           (SELECT count(*) FROM v) AS n_view,
           (SELECT CAST(sum(user_id) AS BIGINT) FROM v) AS users_sum_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT CAST(sum(user_id) AS BIGINT) FROM c) AS users_sum_click,
           (SELECT count(*) FROM p) AS n_purchase,
           (SELECT CAST(sum(user_id) AS BIGINT) FROM p) AS users_sum_purchase""",
    "x_quality_floor" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n_tokens
           FROM documents),
         p AS (SELECT quantile_cont(CAST(n_tokens AS DOUBLE), 0.25) AS p25
           FROM t)
         SELECT doc_id, n_tokens, round(p25, 6) AS p25 FROM t, p
         WHERE CAST(n_tokens AS DOUBLE) >= p25 ORDER BY doc_id""",
    "x_len_hist" ->
      """WITH t AS (SELECT
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n
           FROM documents)
         SELECT n // 20 AS bucket, count(*) AS n_docs,
           min(n) AS min_tokens, max(n) AS max_tokens,
           CAST(sum(n) AS BIGINT) AS sum_tokens
         FROM t GROUP BY 1 ORDER BY bucket""",
    "x_tfidf" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, count(DISTINCT doc_id) AS dfn FROM toks
           GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         s AS (SELECT doc_id, term, tf * ln(CAST(n AS DOUBLE) / dfn) AS score
           FROM tf JOIN dfq USING (term), n),
         r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rk
           FROM s)
         SELECT doc_id, CAST(rk AS INT) AS rk, term,
           round(score, 6) AS tfidf
         FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",
    // parallel unnest zips value with its 1-based position
    "x_embed_centroid" ->
      """SELECT label, CAST(dim AS INTEGER) AS dim, round(avg(v), 6) AS c
         FROM (SELECT label,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(embedding) AS v
           FROM embeddings WHERE embedding IS NOT NULL)
         GROUP BY label, dim ORDER BY label, dim""",
    "x_curation" ->
      """WITH q AS (SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_filter(string_split(lower(text), ' '),
               w -> w IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
               / len(string_split(text, ' ')) AS swr
           FROM documents),
         kept AS (SELECT doc_id, text, n_tokens FROM q
           WHERE n_tokens >= 30 AND swr < 0.5),
         dedup AS (SELECT doc_id, text, n_tokens FROM (
             SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM kept) t WHERE rn = 1),
         s AS (SELECT doc_id, n_tokens,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de_s,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('the','and','of','to','is','in','that','it'))) AS en_s,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('el','los','las','es','una','en','que','por'))) AS es_s,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('le','la','les','et','est','une','dans','que'))) AS fr_s,
           len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('的','是','了','在','和','有','我','不'))) AS zh_s
         FROM dedup)
         SELECT doc_id, CASE
           WHEN de_s > 0 AND de_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'de'
           WHEN en_s > 0 AND en_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'en'
           WHEN es_s > 0 AND es_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'es'
           WHEN fr_s > 0 AND fr_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'fr'
           WHEN zh_s > 0 AND zh_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'zh'
           ELSE 'und' END AS pred_lang, n_tokens
         FROM s ORDER BY doc_id""",
    "x_asof_join" ->
      """SELECT p.user_id, epoch_us(p.ts) AS ts_us, p.event_id,
              p.value AS purchase_value, c.value AS click_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    // latest prior click, then the 1-hour bound nulls stale carries;
    // ties mirror the operator's greatest-payload rule
    "x_asof_tolerance" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             value AS purchase_value FROM events
           WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS cts,
             value AS click_value FROM events WHERE event_type = 'click'),
         a AS (SELECT p.user_id, p.ts_us, p.event_id, p.purchase_value,
             c.cts, c.click_value,
             row_number() OVER (PARTITION BY p.event_id
               ORDER BY c.cts DESC, c.click_value DESC) AS rk
           FROM p LEFT JOIN c
             ON c.user_id = p.user_id AND c.cts <= p.ts_us)
         SELECT user_id, ts_us, event_id, purchase_value,
           CASE WHEN ts_us - cts <= 3600000000 THEN click_value END
             AS click_value
         FROM a WHERE rk = 1 ORDER BY event_id""",

    // the interval-membership mirror: partitioned intervals admit at
    // most one version per view
    "x_temporal_enrich" ->
      """WITH ch AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
           FROM events WHERE event_type <> 'view'),
         v AS (SELECT user_id,
             CAST(row_number() OVER w AS BIGINT) AS version,
             ts_us AS valid_from, lead(ts_us) OVER w AS valid_to
           FROM ch
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         vw AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
           FROM events WHERE event_type = 'view')
         SELECT vw.user_id, vw.ts_us, vw.event_id, v.version
         FROM vw LEFT JOIN v ON v.user_id = vw.user_id
           AND vw.ts_us >= v.valid_from
           AND (v.valid_to IS NULL OR vw.ts_us < v.valid_to)
         ORDER BY vw.event_id""",

    "x_range_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 600000000
         ORDER BY purchase_id, click_id""",
    "j3_top_orders" ->
      """SELECT o_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
             AS DOUBLE) AS revenue,
           count(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "j5_nation_revenue" ->
      """SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
             AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY n_name""",
    // Q7 shape: bilateral revenue by ship year, decimal-exact
    "j13_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) -
                     CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_rows
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // Q8 shape: one nation's share of PROMO revenue into ASIA, by year
    "j14_market_share" ->
      """WITH rev AS (
           SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) -
                CAST(l_discount AS DECIMAL(12,2))) AS volume,
             n1.n_name AS supp_nation
           FROM lineitem
           JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region   ON n2.n_regionkey = r_regionkey
                        AND r_name = 'ASIA'
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey)
         SELECT CAST(o_year AS INT) AS o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                     THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
           count(*) AS n_rows
         FROM rev GROUP BY 1 ORDER BY 1""",
    // Q2 shape: per-part regional minimum cost, decimal-exact equality
    "j15_min_cost_supplier" ->
      """WITH cost AS (SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(12,2))) AS c
           FROM lineitem GROUP BY 1, 2),
         eligible AS (SELECT cost.*, s_name, n_name FROM cost
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
         mn AS (SELECT l_partkey, min(c) AS mc FROM eligible GROUP BY 1)
         SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name,
           n_name, CAST(c AS DOUBLE) AS cost
         FROM eligible JOIN mn USING (l_partkey)
         JOIN part ON l_partkey = p_partkey
           AND p_type = 'STANDARD' AND p_size <= 10
         WHERE c = mc
         ORDER BY p_partkey, s_suppkey""",
    // Q18 shape: orders whose total quantity clears a HAVING threshold
    "j16_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
         SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
         FROM orders JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey""",
    // Q19 shape: three OR'd brand/size/quantity conjunctions
    "j17_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1 AS DECIMAL(12,2)) -
                          CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_rows
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
    // Q4 shape: EXISTS = semi join, once per order
    "j4_priority_wait" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         GROUP BY 1 ORDER BY 1""",

    // Q15 shape: the revenue view feeds both the max and the filter
    "j18_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l_discount AS DECIMAL(12,2)))) AS r
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE r = (SELECT max(r) FROM rev)
         ORDER BY s_suppkey""",

    // Q10 shape: returned revenue per customer, top 20
    "j20_returned_customers" ->
      """WITH rc AS (SELECT o_custkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           WHERE o_orderdate >= TIMESTAMP '1995-10-01'
             AND o_orderdate < TIMESTAMP '1996-01-01'
             AND l_returnflag = 'R'
           GROUP BY 1)
         SELECT c_custkey, c_name, n_name, c_acctbal, revenue
         FROM rc JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    // Q12 shape: conditional counts per group
    "j21_shipstatus_priority" ->
      """SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY 1""",

    // Q16 shape: anti-join exclusion + distinct suppliers per attrs
    "j23_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#45'
           AND p_type NOT LIKE 'MEDIUM%'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    // Q9 shape: decimal-exact profit per (nation, year)
    "j19_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) -
                CAST(l_discount AS DECIMAL(12,2))) -
               CAST(p_retailprice AS DECIMAL(12,2)) *
               CAST(l_quantity AS DECIMAL(12,2)) *
               CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_type = 'ECONOMY'
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",

    // Q14 shape: conditional promo share per ship month
    "j22_promo_share" ->
      """WITH m AS (SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us,
             sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l_discount AS DECIMAL(12,2)))
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (CAST(1 AS DECIMAL(12,2)) -
                CAST(l_discount AS DECIMAL(12,2)))) AS allrev
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1)
         SELECT month_us,
           round(100.0 * CAST(promo AS DOUBLE) / CAST(allrev AS DOUBLE), 6)
             AS promo_share,
           CAST(promo AS DOUBLE) AS promo_revenue
         FROM m ORDER BY month_us""",

    // Q11 shape: per-part value vs a scaled global scalar
    "j24_value_parts" ->
      """WITH rev AS (SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l_discount AS DECIMAL(12,2)))) AS v
           FROM lineitem GROUP BY 1)
         SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
         FROM rev
         WHERE CAST(v AS DOUBLE) >
           1.5 * (SELECT CAST(sum(v) AS DOUBLE) FROM rev)
             / (SELECT count(*) FROM rev)
         ORDER BY part_value DESC, p_partkey""",

    "j6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
         FROM lineitem
         WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    // Q17 shape: per-part decimal-avg threshold, exact decimal revenue
    "j7_small_qty_revenue" ->
      """WITH pp AS (SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_qty
           FROM lineitem GROUP BY l_partkey)
         SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
             AS DOUBLE) / 7.0, 2) AS avg_yearly,
           count(*) AS n_rows
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
         JOIN pp ON lineitem.l_partkey = pp.l_partkey
         WHERE l_quantity < 0.2 * avg_qty""",
    // Q13 shape: zero-inclusive per-customer order counts, then the
    // distribution over counts
    "j9_order_count_dist" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS custdist
         FROM pc GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    // Q22 shape: above-average balance, no big urgent order, per nation
    "j10_idle_customers" ->
      """WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)))
             AS DOUBLE) / count(*) AS avg_bal
           FROM customer WHERE c_acctbal > 0)
         SELECT c_nationkey, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS total_bal
         FROM customer, a
         WHERE c_acctbal > avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderpriority = '1-URGENT' AND o_totalprice > 50000)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    // Q21 shape: exists + not-exists over the same late-lineitem frame
    "j11_waiting_suppliers" ->
      """WITH l AS (
           SELECT l_orderkey, l_suppkey,
                  (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F')
         SELECT s_name, count(*) AS numwait
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
         JOIN l l1 ON l1.l_suppkey = s_suppkey AND l1.late
         WHERE EXISTS (SELECT 1 FROM l l2
                 WHERE l2.l_orderkey = l1.l_orderkey
                   AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM l l3
                 WHERE l3.l_orderkey = l1.l_orderkey
                   AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
         GROUP BY s_name ORDER BY numwait DESC, s_name""",
    // Q20 shape: nested IN with a correlated per-part decimal threshold
    "j12_dominant_suppliers" ->
      """WITH sp AS (
           SELECT l_suppkey, l_partkey,
                  sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
           FROM lineitem
           WHERE l_partkey IN
             (SELECT p_partkey FROM part WHERE p_name LIKE 's%')
           GROUP BY l_suppkey, l_partkey),
         tot AS (SELECT l_partkey, sum(qty) AS total FROM sp GROUP BY 1),
         qual AS (
           SELECT l_suppkey, count(*) AS n_parts
           FROM sp JOIN tot ON sp.l_partkey = tot.l_partkey
           WHERE 8 * qty > total
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, n_parts
         FROM supplier JOIN qual ON l_suppkey = s_suppkey
         ORDER BY s_suppkey""",
    "w1_running_total" ->
      """SELECT o_custkey, o_orderkey,
           row_number() OVER w AS order_rank,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "w2_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    // unique (value, id) order keys → integer-exact rank arithmetic
    "w3_rank_funcs" ->
      """SELECT event_id, event_type,
           round(percent_rank() OVER w, 9) AS pr,
           round(cume_dist() OVER w, 9) AS cd,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
         ORDER BY event_id""",
    // grid completion + LOCF over bucket space; leading gaps stay null
    "x_gap_fill" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value
           FROM events GROUP BY 1, 2),
         b AS (SELECT min(bucket) AS mn, max(bucket) AS mx FROM h),
         g AS (SELECT k.event_type,
             unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS bucket
           FROM (SELECT DISTINCT event_type FROM h) k, b),
         j AS (SELECT g.event_type, g.bucket, h.value,
             h.value IS NULL AS filled
           FROM g LEFT JOIN h
             ON h.event_type = g.event_type AND h.bucket = g.bucket)
         SELECT event_type, epoch_us(bucket) AS hour_us,
           last_value(value IGNORE NULLS) OVER (PARTITION BY event_type
             ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS sum_value,
           filled
         FROM j ORDER BY event_type, hour_us""",
    "set_ops" ->
      """(SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase' AND value > 200.0
          EXCEPT
          SELECT DISTINCT user_id FROM events
          WHERE event_type = 'error' AND value > 250.0)
         INTERSECT
         SELECT DISTINCT user_id FROM events
         WHERE event_type = 'click' AND value > 150.0
         ORDER BY user_id""",
    // pivot: explicit CASE sums, one column per status value
    "agg_pivot" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F'
             THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
           CAST(sum(CASE WHEN l_linestatus = 'O'
             THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS O
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // unpivot: UNION ALL with literal measure names
    "agg_unpivot" ->
      """WITH m AS (SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value
         FROM m
         UNION ALL
         SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value
         FROM m
         ORDER BY l_returnflag, measure""",
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY flag, status""",
    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_linestatus))
         ORDER BY flag, status""",
    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY flag, status""",
    "agg_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_stats" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // exact integer power sums, identical double arithmetic after —
    // explicit moments dodge the sample-vs-population bias conventions
    "agg_moments" ->
      """WITH s AS (SELECT count(*) AS n,
             sum(n_chars) AS s1,
             sum(n_chars * n_chars) AS s2,
             sum(n_chars * n_chars * n_chars) AS s3,
             sum(n_chars * n_chars * n_chars * n_chars) AS s4
           FROM documents),
         m AS (SELECT n,
             CAST(s1 AS DOUBLE) / n AS mean,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
           FROM s),
         c AS (SELECT n, mean,
             r2 - mean * mean AS m2,
             r3 - mean * r2 * 3 + mean * mean * mean * 2 AS m3,
             r4 - mean * r3 * 4 + mean * mean * r2 * 6
               - mean * mean * mean * mean * 3 AS m4
           FROM m)
         SELECT n, round(mean, 6) AS mean,
           round(m2, 6) AS variance,
           round(m3 / pow(m2, 1.5), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS kurtosis
         FROM c""",
    // exact integer-count arithmetic in double — 0/1 sums are exact
    "agg_percentile_ranks" ->
      """SELECT l_returnflag,
           round(count(*) FILTER (l_quantity <= 10) * 100.0 / count(*), 6)
             AS pr_10,
           round(count(*) FILTER (l_quantity <= 25) * 100.0 / count(*), 6)
             AS pr_25
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // five-number summary; quantile_cont is the same type-7 linear
    // interpolation Spark's exact percentile uses
    "agg_boxplot" ->
      """SELECT l_returnflag, min(l_quantity) AS q_min,
           round(quantile_cont(l_quantity, 0.25), 6) AS q1,
           round(quantile_cont(l_quantity, 0.5), 6) AS q2,
           round(quantile_cont(l_quantity, 0.75), 6) AS q3,
           max(l_quantity) AS q_max
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Welch t + Satterthwaite df from exact cent-unit sums
    "agg_ttest" ->
      """WITH t AS (SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
               AS DECIMAL(18,0)) AS q
           FROM lineitem),
         g AS (SELECT
             count(*) FILTER (l_returnflag = 'A') AS n1,
             count(*) FILTER (l_returnflag = 'N') AS n2,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN q END)
               AS DOUBLE) AS s1,
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN q END)
               AS DOUBLE) AS s2,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN q*q END)
               AS DOUBLE) AS ss1,
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN q*q END)
               AS DOUBLE) AS ss2
           FROM t),
         z AS (SELECT n1, n2,
             (CAST(n1 AS DOUBLE) * ss1 - s1 * s1)
               / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1))
               / 10000.0 AS v1,
             (CAST(n2 AS DOUBLE) * ss2 - s2 * s2)
               / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1))
               / 10000.0 AS v2,
             s1 / CAST(n1 AS DOUBLE) / 100.0 AS m1,
             s2 / CAST(n2 AS DOUBLE) / 100.0 AS m2
           FROM g)
         SELECT n1, n2, round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
              + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df
         FROM z""",

    // exact percentile of deviations from the per-group exact median
    "agg_mad" ->
      """WITH med AS (SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS m
           FROM lineitem GROUP BY 1)
         SELECT l.l_returnflag,
           round(quantile_cont(abs(l.l_quantity - med.m), 0.5), 6) AS mad
         FROM lineitem l JOIN med ON med.l_returnflag = l.l_returnflag
         GROUP BY 1 ORDER BY 1""",

    // exact integer product sums, one final double ratio
    "agg_weighted_avg" ->
      """WITH t AS (SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS DECIMAL(18,0)) AS p,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
               AS DECIMAL(18,0)) AS q
           FROM lineitem)
         SELECT l_returnflag,
           round(CAST(sum(p * q) AS DOUBLE) / CAST(sum(q) AS DOUBLE)
             / 100.0, 6) AS weighted_price
         FROM t GROUP BY 1 ORDER BY 1""",

    // moments from exact integer (cent-unit) power sums; scale-0
    // decimal→double casts are single correctly-rounded conversions,
    // then the same IEEE op sequence as the Spark side
    "agg_matrix_stats" ->
      """WITH t AS (SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
               AS DECIMAL(18,0)) AS q,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS DECIMAL(18,0)) AS p,
             CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
               AS DECIMAL(18,0)) AS d2
           FROM lineitem),
         g AS (SELECT l_returnflag, count(*) AS n,
             CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
             CAST(sum(d2) AS DOUBLE) AS sd,
             CAST(sum(q*q) AS DOUBLE) AS sqq,
             CAST(sum(p*p) AS DOUBLE) AS spp,
             CAST(sum(d2*d2) AS DOUBLE) AS sdd,
             CAST(sum(q*p) AS DOUBLE) AS sqp,
             CAST(sum(q*d2) AS DOUBLE) AS sqd,
             CAST(sum(p*d2) AS DOUBLE) AS spd
           FROM t GROUP BY 1),
         a AS (SELECT l_returnflag, n,
             CAST(n AS DOUBLE) * sqq - sq * sq AS aq,
             CAST(n AS DOUBLE) * spp - sp * sp AS ap,
             CAST(n AS DOUBLE) * sdd - sd * sd AS ad,
             CAST(n AS DOUBLE) * sqp - sq * sp AS aqp,
             CAST(n AS DOUBLE) * sqd - sq * sd AS aqd,
             CAST(n AS DOUBLE) * spd - sp * sd AS apd
           FROM g)
         SELECT l_returnflag, n,
           round(aq / CAST(n * (n - 1) AS DOUBLE) / 10000.0, 6) AS var_q,
           round(ap / CAST(n * (n - 1) AS DOUBLE) / 10000.0, 2) AS var_p,
           round(ad / CAST(n * (n - 1) AS DOUBLE) / 10000.0, 9) AS var_d,
           round(aqp / sqrt(aq * ap), 6) AS corr_qp,
           round(aqd / sqrt(aq * ad), 6) AS corr_qd,
           round(apd / sqrt(ap * ad), 6) AS corr_pd
         FROM a ORDER BY l_returnflag""",
    // derivative/moving_avg computed over the full histogram, selector
    // applied AFTER (the ES pipeline-agg evaluation order)
    "q_pipeline_aggs" ->
      """WITH b AS (SELECT epoch_us(date_trunc('week', ts)) AS bucket_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1),
         p AS (SELECT bucket_us, n_events, sum_value,
             sum_value - lag(sum_value) OVER (ORDER BY bucket_us)
               AS derivative,
             round(avg(sum_value) OVER (ORDER BY bucket_us
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
           FROM b)
         SELECT bucket_us, n_events, sum_value, derivative, moving_avg
         FROM p WHERE n_events >= 50 ORDER BY bucket_us""",
    // serial_diff / moving extremes / exact trailing median / EMA-fold
    "q_pipeline_aggs2" ->
      """WITH b AS (SELECT epoch_us(date_trunc('week', ts)) AS bucket_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1),
         p AS (SELECT bucket_us, n_events, sum_value,
             sum_value - lag(sum_value, 2) OVER w AS serial_diff,
             min(sum_value) OVER w3 AS moving_min,
             max(sum_value) OVER w3 AS moving_max,
             round(quantile_cont(sum_value, 0.5) OVER w3, 6)
               AS moving_median,
             list(sum_value) OVER (ORDER BY bucket_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
           FROM b
           WINDOW w AS (ORDER BY bucket_us),
             w3 AS (ORDER BY bucket_us
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         SELECT bucket_us, n_events, sum_value, serial_diff, moving_min,
           moving_max, moving_median,
           round(list_reduce(h, (acc, x) -> 0.5 * x + 0.5 * acc), 6) AS ema
         FROM p ORDER BY bucket_us""",
    // CUSUM as a recursive CTE; moments from exact decimal sums
    "q_cusum" ->
      """WITH RECURSIVE
         b AS (SELECT epoch_us(date_trunc('week', ts)) AS t,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS y
           FROM events GROUP BY 1),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(CAST(y AS DECIMAL(24,6))
               * CAST(y AS DECIMAL(24,6)) AS DECIMAL(38,12)))
               AS DOUBLE) AS ss
           FROM b),
         o AS (SELECT t, y, row_number() OVER (ORDER BY t) AS i FROM b),
         m AS (SELECT s / n AS mu,
             sqrt((n * ss - s * s) / (n * (n - 1))) AS sigma FROM st),
         c(i, sp, sn) AS (
           SELECT o.i, greatest(0.0, o.y - m.mu),
             greatest(0.0, m.mu - o.y)
           FROM o, m WHERE o.i = 1
           UNION ALL
           SELECT o.i, greatest(0.0, c.sp + (o.y - m.mu)),
             greatest(0.0, c.sn + (m.mu - o.y))
           FROM c JOIN o ON o.i = c.i + 1, m)
         SELECT o.t AS bucket_us, o.y, round(c.sp, 6) AS cusum_pos,
           round(c.sn, 6) AS cusum_neg,
           (c.sp > 2 * m.sigma OR c.sn > 2 * m.sigma) AS changepoint
         FROM o JOIN c ON c.i = o.i, m ORDER BY bucket_us""",

    // the HW recursion replayed as a recursive CTE: the seasonal list
    // rotates (s[2:] || [s']), l' textually expanded into the trend and
    // seasonal updates exactly as the engine's fold expands it
    "x_holt_winters" ->
      """WITH RECURSIVE
         b AS (SELECT epoch_us(date_trunc('day', ts)) AS t,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS y
           FROM events GROUP BY 1),
         o AS (SELECT t, y, row_number() OVER (ORDER BY t) AS i FROM b),
         init AS (SELECT list(y ORDER BY i) AS ys FROM o WHERE i <= 7),
         z AS (SELECT list_reduce(ys, (a, b) -> a + b) / 7 AS l0,
             list_transform(ys,
               v -> v - list_reduce(ys, (a, b) -> a + b) / 7) AS s0
           FROM init),
         h(i, l, tr, s) AS (
           SELECT CAST(7 AS BIGINT), l0, CAST(0.0 AS DOUBLE), s0 FROM z
           UNION ALL
           SELECT o.i,
             0.5 * (o.y - h.s[1]) + 0.5 * (h.l + h.tr),
             0.25 * ((0.5 * (o.y - h.s[1]) + 0.5 * (h.l + h.tr)) - h.l)
               + 0.75 * h.tr,
             h.s[2:] || [0.25 * (o.y -
               (0.5 * (o.y - h.s[1]) + 0.5 * (h.l + h.tr)))
               + 0.75 * h.s[1]]
           FROM h JOIN o ON o.i = h.i + 1)
         SELECT o.t AS bucket_us, o.y AS y, round(h.l, 6) AS level,
           round(h.tr, 6) AS trend, round(h.s[7], 6) AS seasonal,
           round(h.l + h.tr + h.s[1], 6) AS forecast_next
         FROM o JOIN h ON h.i = o.i WHERE o.i > 7 ORDER BY bucket_us""",

    // the same recursion as a recursive CTE; l' expanded identically
    // in the trend update on both sides
    "q_holt" ->
      """WITH RECURSIVE
         b AS (SELECT epoch_us(date_trunc('week', ts)) AS t,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS y
           FROM events GROUP BY 1),
         o AS (SELECT t, y, row_number() OVER (ORDER BY t) AS i FROM b),
         h(i, l, tr) AS (
           SELECT CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM o WHERE i = 1
           UNION ALL
           SELECT o.i, 0.5 * o.y + 0.5 * (h.l + h.tr),
             0.3 * ((0.5 * o.y + 0.5 * (h.l + h.tr)) - h.l) + 0.7 * h.tr
           FROM h JOIN o ON o.i = h.i + 1)
         SELECT o.t AS bucket_us, o.y AS sum_value,
           round(h.l, 6) AS level, round(h.tr, 6) AS trend,
           round(h.l + h.tr, 6) AS forecast_next
         FROM o JOIN h ON h.i = o.i ORDER BY bucket_us""",

    // running distinct = running sum of first-seen counts
    "q_cumulative_cardinality" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS n_users
           FROM events GROUP BY 1),
         fs AS (SELECT user_id, min(date_trunc('day', ts)) AS day
           FROM events GROUP BY 1),
         nb AS (SELECT day, count(*) AS n_new FROM fs GROUP BY 1),
         j AS (SELECT d.day, d.n_users, coalesce(nb.n_new, 0) AS n_new
           FROM daily d LEFT JOIN nb ON nb.day = d.day)
         SELECT epoch_us(day) AS day_us, n_users, n_new,
           CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
         FROM j ORDER BY day_us""",
    // per-fence daily entry counts; haversine mirrored from x_geo_join
    "ws_geofence" ->
      """WITH p AS (SELECT epoch_us(date_trunc('day', ts)) AS day_us,
             CAST(event_id * 37 % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
             CAST(event_id * 91 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
           FROM events),
         f(fence_id, flat, flon, fr) AS (VALUES
           (1, 40.0, -74.0, 1500.0), (2, 5.0, 179.0, 2000.0),
           (3, -84.0, 10.0, 2500.0))
         SELECT day_us, CAST(fence_id AS BIGINT) AS fence_id,
           count(*) AS n_events
         FROM p, f
         WHERE 2 * 6371.0088 * asin(sqrt(
             sin(radians(flat - lat) / 2) * sin(radians(flat - lat) / 2)
             + cos(radians(lat)) * cos(radians(flat))
             * sin(radians(flon - lon) / 2) * sin(radians(flon - lon) / 2)))
           <= fr
         GROUP BY day_us, fence_id ORDER BY day_us, fence_id""",
    "ws_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
         FROM events
         GROUP BY 1, 2 ORDER BY hour_us, event_type""",
    // the oracle replays the SAME arrival schedule: watermark before
    // batch b = ms-truncated max event time over batches < b minus 30
    // minutes; a row is late iff its hour-window END <= that watermark
    "ws_late" ->
      """WITH arr AS (SELECT epoch_us(ts) AS tsu,
             CAST(datepart('day', ts) AS BIGINT)
               + CASE WHEN event_id % 37 = 0 THEN 2 ELSE 0 END AS b
           FROM events),
         bm AS (SELECT b, max(tsu) AS mx FROM arr GROUP BY b),
         wm AS (SELECT b,
             (max(mx) OVER (ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              // 1000 - 1800000) * 1000 AS wmu
           FROM bm),
         r AS (SELECT a.tsu // 3600000000 * 3600000000 AS hour_us,
             a.tsu // 3600000000 * 3600000000 + 3600000000 AS wend,
             w.wmu
           FROM arr a JOIN wm w ON a.b = w.b)
         SELECT hour_us, count(*) AS n_total,
           CAST(sum(CASE WHEN wmu IS NOT NULL AND wend <= wmu
             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
         FROM r GROUP BY 1 ORDER BY hour_us""",
    // k ≥ domain ⇒ Misra–Gries is exact ≡ per-hour GROUP BY counts
    "ws_heavy_hitters" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           count(*) AS n
         FROM events
         GROUP BY 1, 2 ORDER BY hour_us, event_type""",
    "ws_hopping" ->
      """WITH e AS (SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 1800000000 AS s0 FROM events),
         x AS (SELECT event_type,
             unnest([s0, s0 - 1800000000]) AS start_us FROM e)
         SELECT start_us, event_type, count(*) AS n FROM x
         GROUP BY 1, 2 ORDER BY start_us, event_type""",
    "x_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS next_type
           FROM events)
         SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n
         FROM o WHERE next_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY from_type, to_type""",
    // Gaps-and-islands: a session breaks when the gap to the previous
    // event is >= 12h (Spark's session windows are half-open [start,
    // last+gap) — an event landing EXACTLY at the end starts a new one).
    "ws_session" ->
      """WITH d AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         g AS (SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS grp
           FROM d)
         SELECT user_id, epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts) + INTERVAL 12 HOUR) AS end_us,
           count(*) AS n_events
         FROM g GROUP BY user_id, grp ORDER BY user_id, start_us""",
    "x_interval_join" ->
      """SELECT l.event_id AS purchase_id, r.event_id AS click_id, l.user_id
         FROM events l JOIN events r ON l.user_id = r.user_id
           AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
         WHERE l.event_type = 'purchase' AND r.event_type = 'click'
         ORDER BY purchase_id, click_id""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
             AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
  )
}
