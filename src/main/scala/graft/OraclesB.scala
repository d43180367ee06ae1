package graft

import graft.OracleDefs._

/** DuckDB oracle SQL 2/3: documents, dedup, graph, vector, multimodal rows.
  * (Verbatim slice of the former SparkEntry.oracleSql literal.)
  */
private[graft] object OraclesB {
  def oracleSql: Map[String, String] = Map(
    "p_documents" ->
      """WITH f AS (
           SELECT CAST(doc_id AS VARCHAR) AS _id, 'doc_id' AS fname,
                  CAST(doc_id AS VARCHAR) AS fval FROM documents
           UNION ALL SELECT CAST(doc_id AS VARCHAR), 'text', text FROM documents
           UNION ALL SELECT CAST(doc_id AS VARCHAR), 'lang', lang FROM documents
           UNION ALL SELECT CAST(doc_id AS VARCHAR), 'origin', source FROM documents)
         SELECT _id, fname, fval FROM f ORDER BY _id, fname""",
    "x_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    // winnowing: same shingle family as x_dedup_ngram, md5-56 hashes,
    // min per 4-window, per-doc distinct
    "x_winnowing" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS wd
           FROM documents),
         sh AS (SELECT doc_id,
             CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
               ELSE list_transform(range(1, len(wd) - 1),
                 i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2]) END AS gs
           FROM t),
         h AS (SELECT doc_id, list_transform(gs,
             g -> CAST(md5_number_lower(g) % 72057594037927936
               AS BIGINT)) AS hs
           FROM sh),
         f AS (SELECT doc_id,
             CASE WHEN len(hs) < 4 THEN [list_min(hs)]
               ELSE list_distinct(list_transform(
                 range(1, len(hs) - 4 + 2),
                 i -> list_min(hs[i:i+3]))) END AS fps
           FROM h)
         SELECT doc_id, unnest(fps) AS fingerprint FROM f
         ORDER BY doc_id, fingerprint""",
    // soft dedup: planted duplicate clusters weigh 1/n each
    "x_dedup_soft" ->
      """WITH p AS (SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 10000000, text FROM documents
           WHERE doc_id % 10 = 0),
         c AS (SELECT text, count(*) AS n FROM p GROUP BY text)
         SELECT p.doc_id, c.n AS cluster_size,
           round(1.0::DOUBLE / c.n, 6) AS weight
         FROM p JOIN c ON p.text = c.text ORDER BY p.doc_id""",
    // duplicate spans: df>=2 5-gram positions folded into maximal runs
    // (gaps-and-islands), span text sliced from the token array
    "x_dedup_spans" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         posu AS (SELECT doc_id, len(w) AS n, w,
             unnest(generate_series(0, greatest(len(w) - 5, 0))) AS pos
           FROM t WHERE len(w) > 0),
         shing AS (SELECT doc_id, n, pos,
             CASE WHEN n < 5 THEN array_to_string(w, ' ')
                  ELSE array_to_string(w[pos + 1 : pos + 5], ' ')
             END AS sh
           FROM posu),
         dup AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS c
             FROM shing GROUP BY sh) WHERE c >= 2),
         hits AS (SELECT s.doc_id, s.n, s.pos
           FROM shing s JOIN dup USING (sh)),
         runs AS (SELECT doc_id, n, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
           FROM hits),
         agg AS (SELECT doc_id, any_value(n) AS n,
             min(pos) AS span_start,
             max(pos) - min(pos) + 5 AS rawlen
           FROM runs GROUP BY doc_id, grp)
         SELECT a.doc_id AS doc_id,
           CAST(span_start AS INT) AS span_start,
           CAST(least(rawlen, n - span_start) AS INT) AS span_tokens,
           array_to_string(
             w[span_start + 1 : span_start + least(rawlen, n - span_start)],
             ' ') AS span_text
         FROM agg a JOIN t USING (doc_id)
         ORDER BY doc_id, span_start""",
    "x_dedup_ngram" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
         SELECT id_a, id_b,
           CAST(common AS DOUBLE) / (ca.n + cb.n - common) AS jaccard
         FROM pairs
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5
         ORDER BY id_a, id_b""",
    // prefix filtering gates COMPLETENESS: the oracle is the naive
    // all-token self-join (no prune) at the same threshold — identical
    // output proves the rare-token prefix candidates lost nothing
    "x_dedup_prefix_filter" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS common
           FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(CAST(common AS DOUBLE) / (ca.n + cb.n - common), 6)
             AS jaccard
         FROM pairs
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE round(CAST(common AS DOUBLE) / (ca.n + cb.n - common), 6)
           >= 0.8
         ORDER BY id_a, id_b""",

    // containment normalizes by the SMALLER shingle set
    "x_dedup_containment" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS common
           FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         j AS (SELECT id_a, id_b, common, ca.n AS na, cb.n AS nb
           FROM pairs
           JOIN cnt ca ON ca.doc_id = id_a
           JOIN cnt cb ON cb.doc_id = id_b)
         SELECT CASE WHEN na <= nb THEN id_a ELSE id_b END AS id_small,
           CASE WHEN na <= nb THEN id_b ELSE id_a END AS id_big,
           round(CAST(common AS DOUBLE) / least(na, nb), 6) AS containment
         FROM j
         WHERE round(CAST(common AS DOUBLE) / least(na, nb), 6) >= 0.3
         ORDER BY id_small, id_big""",
    "x_dedup_clusters" ->
      """WITH RECURSIVE
         sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM p
             JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
             WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs),
         walk(id, reach) AS (
             SELECT doc_id, doc_id FROM documents
             UNION
             SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
         SELECT id, min(reach) AS root FROM walk GROUP BY id ORDER BY id""",
    // the same recursive walk, extended with per-cluster token ranking
    "x_cluster_labels" ->
      """WITH RECURSIVE
         sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM p
             JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
             WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             UNION SELECT id_b, id_a FROM pairs),
         walk(id, reach) AS (
             SELECT doc_id, doc_id FROM documents
             UNION
             SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
         roots AS (SELECT id, min(reach) AS root FROM walk GROUP BY id),
         sizes AS (SELECT root, count(*) AS n_docs FROM roots
             GROUP BY root HAVING count(*) >= 2),
         tok AS (SELECT r.root, s.n_docs,
             unnest(list_filter(string_split(lower(d.text), ' '),
               x -> x <> '')) AS term
           FROM roots r
           JOIN sizes s ON s.root = r.root
           JOIN documents d ON d.doc_id = r.id),
         tf AS (SELECT root, n_docs, term, count(*) AS term_count
             FROM tok GROUP BY 1, 2, 3),
         rk AS (SELECT root, n_docs, term, term_count,
             row_number() OVER (PARTITION BY root
               ORDER BY term_count DESC, term) AS rk
           FROM tf)
         SELECT root AS cluster_id, n_docs, term, term_count, rk
         FROM rk WHERE rk <= 3 ORDER BY cluster_id, rk""",
    // the identical closed form unrolled: r_{t+1}(v) = (1-d)/n +
    // d·Σ r_t(u)/outdeg(u) over in-edges, five iterations
    "x_pagerank" ->
      """WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             count(*) AS ni FROM documents),
         e AS (SELECT doc_id AS src,
             (doc_id * 7 + 1) % (SELECT ni FROM nn) AS dst FROM documents
           UNION ALL
           SELECT doc_id, (doc_id * 13 + 5) % (SELECT ni FROM nn)
             FROM documents),
         deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
           FROM e GROUP BY src),
         r0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM nn) AS r
           FROM documents),
         r1 AS (SELECT d.doc_id AS id, (1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r0 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id),
         r2 AS (SELECT d.doc_id AS id, (1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r1 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id),
         r3 AS (SELECT d.doc_id AS id, (1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r2 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id),
         r4 AS (SELECT d.doc_id AS id, (1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r3 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id),
         r5 AS (SELECT d.doc_id AS id, (1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r4 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id)
         SELECT id, round(r, 8) AS rank FROM r5 ORDER BY id""",
    // the personalized teleport unrolled: mass lands only on the topic
    // (lang='de') slice, |T| the teleport denominator
    "x_pagerank_topic" ->
      """WITH nn AS (SELECT count(*) AS ni,
             CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS DOUBLE)
               AS t
           FROM documents),
         e AS (SELECT doc_id AS src,
             (doc_id * 7 + 1) % (SELECT ni FROM nn) AS dst FROM documents
           UNION ALL
           SELECT doc_id, (doc_id * 13 + 5) % (SELECT ni FROM nn)
             FROM documents),
         deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
           FROM e GROUP BY src),
         r0 AS (SELECT doc_id AS id, CASE WHEN lang = 'de'
             THEN 1.0 / (SELECT t FROM nn) ELSE 0.0 END AS r
           FROM documents),
         r1 AS (SELECT d.doc_id AS id, CASE WHEN d.lang = 'de'
             THEN (1 - 0.85) / (SELECT t FROM nn) ELSE 0.0 END
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r0 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id, d.lang),
         r2 AS (SELECT d.doc_id AS id, CASE WHEN d.lang = 'de'
             THEN (1 - 0.85) / (SELECT t FROM nn) ELSE 0.0 END
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r1 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id, d.lang),
         r3 AS (SELECT d.doc_id AS id, CASE WHEN d.lang = 'de'
             THEN (1 - 0.85) / (SELECT t FROM nn) ELSE 0.0 END
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r2 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id, d.lang),
         r4 AS (SELECT d.doc_id AS id, CASE WHEN d.lang = 'de'
             THEN (1 - 0.85) / (SELECT t FROM nn) ELSE 0.0 END
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r3 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id, d.lang),
         r5 AS (SELECT d.doc_id AS id, CASE WHEN d.lang = 'de'
             THEN (1 - 0.85) / (SELECT t FROM nn) ELSE 0.0 END
             + 0.85 * coalesce(sum(p.r / deg.outdeg), 0) AS r
           FROM documents d
           LEFT JOIN e ON e.dst = d.doc_id
           LEFT JOIN r4 p ON p.id = e.src
           LEFT JOIN deg ON deg.src = e.src
           GROUP BY d.doc_id, d.lang)
         SELECT id, round(r, 8) AS rank FROM r5 ORDER BY id""",

    // BFS as a recursive CTE: UNION dedupe + the hop bound terminate it;
    // min(dist) is the first-reach distance
    "x_shortest_path" ->
      """WITH RECURSIVE
         nn AS (SELECT count(*) AS n FROM documents),
         e AS (SELECT doc_id AS src,
             (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst FROM documents
           UNION ALL
           SELECT doc_id, (doc_id * 13 + 5) % (SELECT n FROM nn)
             FROM documents),
         b(id, dist) AS (
           SELECT doc_id, CAST(0 AS BIGINT) FROM documents
           WHERE doc_id % 97 = 0
           UNION
           SELECT e.dst, b.dist + 1 FROM b JOIN e ON e.src = b.id
           WHERE b.dist < 6)
         SELECT id, min(dist) AS dist FROM b GROUP BY id ORDER BY id""",

    // each triangle a<b<c counted once: wedge at a, closure on (b,c)
    "x_triangle_count" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         ed AS (SELECT doc_id AS src,
             (doc_id * doc_id + 3) % (SELECT n FROM nn) AS dst
           FROM documents
           UNION ALL
           SELECT doc_id, (doc_id * 7 + 1) % (SELECT n FROM nn)
             FROM documents),
         u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM ed WHERE src <> dst)
         SELECT count(*) AS n_triangles
         FROM u e1
         JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b
         JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b""",

    // left join keeps zero-in-degree nodes at degree 0
    "x_degree_dist" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         ind AS (SELECT (doc_id * doc_id + 3) % (SELECT n FROM nn) AS id
           FROM documents),
         cnt AS (SELECT d.doc_id AS id, count(i.id) AS degree
           FROM documents d LEFT JOIN ind i ON i.id = d.doc_id
           GROUP BY 1)
         SELECT degree, count(*) AS n_nodes FROM cnt
         GROUP BY 1 ORDER BY 1""",

    // walk steps unrolled; md5_56 neighbor choice mirrored exactly
    "x_random_walk" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         e AS (SELECT DISTINCT src, dst FROM (
             SELECT doc_id AS src,
               (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
             FROM documents
             UNION ALL
             SELECT doc_id, (doc_id * 13 + 5) % (SELECT n FROM nn)
               FROM documents)),
         rk AS (SELECT src, dst,
             CAST(row_number() OVER (PARTITION BY src ORDER BY dst)
               AS BIGINT) - 1 AS rk,
             count(*) OVER (PARTITION BY src) AS deg FROM e),
         w0 AS (SELECT doc_id AS start, doc_id AS node FROM documents
           WHERE doc_id % 97 = 0),
         w1 AS (SELECT w.start, r.dst AS node FROM w0 w JOIN rk r
           ON r.src = w.node
           AND r.rk = (md5_number_lower(CAST(w.start AS VARCHAR) || ':1')
             % 72057594037927936) % r.deg),
         w2 AS (SELECT w.start, r.dst AS node FROM w1 w JOIN rk r
           ON r.src = w.node
           AND r.rk = (md5_number_lower(CAST(w.start AS VARCHAR) || ':2')
             % 72057594037927936) % r.deg),
         w3 AS (SELECT w.start, r.dst AS node FROM w2 w JOIN rk r
           ON r.src = w.node
           AND r.rk = (md5_number_lower(CAST(w.start AS VARCHAR) || ':3')
             % 72057594037927936) % r.deg),
         w4 AS (SELECT w.start, r.dst AS node FROM w3 w JOIN rk r
           ON r.src = w.node
           AND r.rk = (md5_number_lower(CAST(w.start AS VARCHAR) || ':4')
             % 72057594037927936) % r.deg)
         SELECT start, 0 AS step, node FROM w0
         UNION ALL SELECT start, 1, node FROM w1
         UNION ALL SELECT start, 2, node FROM w2
         UNION ALL SELECT start, 3, node FROM w3
         UNION ALL SELECT start, 4, node FROM w4
         ORDER BY start, step, node""",

    // HITS unrolled: per layer, 12dp-rounded decimal propagation sums,
    // exact decimal L1 normalizer, one double division — the operator's
    // arithmetic mirrored term for term
    "x_hits" ->
      """WITH nn AS (SELECT count(*) AS ni FROM documents),
         nd AS (SELECT CAST(ni AS DOUBLE) AS n FROM nn),
         e AS (SELECT doc_id AS src,
             (doc_id * doc_id + 3) % (SELECT ni FROM nn) AS dst
           FROM documents
           UNION ALL
           SELECT doc_id, (doc_id * 7 + 1) % (SELECT ni FROM nn)
             FROM documents),
         h0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM nd) AS v
           FROM documents),
         a1r AS (SELECT e.dst AS id,
             sum(CAST(round(h0.v, 12) AS DECIMAL(26,12))) AS r
           FROM e JOIN h0 ON h0.id = e.src GROUP BY e.dst),
         a1t AS (SELECT sum(r) AS t FROM a1r),
         a1 AS (SELECT d.doc_id AS id,
             coalesce(CAST(a1r.r AS DOUBLE)
               / CAST((SELECT t FROM a1t) AS DOUBLE), 0.0) AS v
           FROM documents d LEFT JOIN a1r ON a1r.id = d.doc_id),
         h1r AS (SELECT e.src AS id,
             sum(CAST(round(a1.v, 12) AS DECIMAL(26,12))) AS r
           FROM e JOIN a1 ON a1.id = e.dst GROUP BY e.src),
         h1t AS (SELECT sum(r) AS t FROM h1r),
         h1 AS (SELECT d.doc_id AS id,
             coalesce(CAST(h1r.r AS DOUBLE)
               / CAST((SELECT t FROM h1t) AS DOUBLE), 0.0) AS v
           FROM documents d LEFT JOIN h1r ON h1r.id = d.doc_id),
         a2r AS (SELECT e.dst AS id,
             sum(CAST(round(h1.v, 12) AS DECIMAL(26,12))) AS r
           FROM e JOIN h1 ON h1.id = e.src GROUP BY e.dst),
         a2t AS (SELECT sum(r) AS t FROM a2r),
         a2 AS (SELECT d.doc_id AS id,
             coalesce(CAST(a2r.r AS DOUBLE)
               / CAST((SELECT t FROM a2t) AS DOUBLE), 0.0) AS v
           FROM documents d LEFT JOIN a2r ON a2r.id = d.doc_id),
         h2r AS (SELECT e.src AS id,
             sum(CAST(round(a2.v, 12) AS DECIMAL(26,12))) AS r
           FROM e JOIN a2 ON a2.id = e.dst GROUP BY e.src),
         h2t AS (SELECT sum(r) AS t FROM h2r),
         h2 AS (SELECT d.doc_id AS id,
             coalesce(CAST(h2r.r AS DOUBLE)
               / CAST((SELECT t FROM h2t) AS DOUBLE), 0.0) AS v
           FROM documents d LEFT JOIN h2r ON h2r.id = d.doc_id)
         SELECT a2.id, round(a2.v, 8) AS auth, round(h2.v, 8) AS hub
         FROM a2 JOIN h2 ON h2.id = a2.id ORDER BY a2.id""",
    "x_dedup_passages" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         u AS (SELECT doc_id, len(w) AS n, w, unnest(range(0, len(w), 10)) AS s
           FROM t WHERE len(w) > 0),
         f AS (SELECT doc_id, CAST(s // 10 AS INT) AS chunk_id,
             array_to_string(w[s+1:s+10], ' ') AS chunk_text,
             md5(array_to_string(w[s+1:s+10], ' ')) AS fp
           FROM u),
         r AS (SELECT doc_id, chunk_id, chunk_text,
             row_number() OVER (PARTITION BY fp
               ORDER BY doc_id, chunk_id) AS rk
           FROM f),
         kept AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(chunk_text, ' ' ORDER BY chunk_id) AS dedup_text
           FROM r WHERE rk = 1 GROUP BY doc_id),
         tot AS (SELECT doc_id, count(*) AS n_passages FROM f GROUP BY doc_id)
         SELECT t.doc_id, t.n_passages, COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.dedup_text, '') AS dedup_text
         FROM tot t LEFT JOIN kept k USING (doc_id) ORDER BY t.doc_id""",
    "x_dedup_keep_best" ->
      """WITH f AS (SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS cluster
           FROM documents),
         r AS (SELECT cluster, doc_id, n_chars,
             row_number() OVER (PARTITION BY cluster
               ORDER BY n_chars DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY cluster) AS n_members
           FROM f)
         SELECT cluster, doc_id, n_chars, n_members FROM r
         WHERE rk = 1 ORDER BY cluster""",
    "x_dedup_embed" ->
      """WITH z AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS c
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(c, 6) AS cosine FROM z
         WHERE c >= 0.4 ORDER BY id_a, id_b""",
    // pruning may never change the answer: same oracle as x_dedup_embed
    "x_dedup_embed_pruned" ->
      """WITH z AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS c
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(c, 6) AS cosine FROM z
         WHERE c >= 0.4 ORDER BY id_a, id_b""",
    // min-label reachability over the exact pair graph (the
    // x_dedup_clusters walk, on cosine edges)
    "x_dedup_embed_clusters" ->
      """WITH RECURSIVE
         z AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])) >= 0.4),
         edges AS (SELECT id_a AS src, id_b AS dst FROM z
             UNION SELECT id_b, id_a FROM z),
         walk(id, reach) AS (
             SELECT vec_id, vec_id FROM embeddings
             UNION
             SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
         SELECT id, min(reach) AS root FROM walk GROUP BY id ORDER BY id""",
    "x_hybrid" ->
      """WITH tt AS (SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r_text
           FROM (SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
                 AS score
             FROM documents) t
           WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 50),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0),
         vt AS (SELECT doc_id,
             row_number() OVER (ORDER BY c DESC, doc_id) AS r_vec
           FROM (SELECT vec_id AS doc_id,
               list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS c
             FROM embeddings, q) z
           ORDER BY c DESC, doc_id LIMIT 50),
         f AS (SELECT COALESCE(tt.doc_id, vt.doc_id) AS doc_id,
             COALESCE(CAST(1 AS DOUBLE) / (60 + r_text), 0)
               + COALESCE(CAST(1 AS DOUBLE) / (60 + r_vec), 0) AS rrf
           FROM tt FULL OUTER JOIN vt ON tt.doc_id = vt.doc_id)
         SELECT doc_id, round(rrf, 9) AS rrf FROM f
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    // min-max within each top-50 window, 0.7/0.3 weighted sum; vec leg
    // cut and normalized on the rounded cosine
    "q_hybrid_linear" ->
      """WITH tt AS (SELECT doc_id, CAST(score AS DOUBLE) AS st
           FROM (SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
                 AS score
             FROM documents) t
           WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 50),
         ts AS (SELECT min(st) AS tmn, max(st) AS tmx FROM tt),
         tn AS (SELECT doc_id, CASE WHEN tmx > tmn
             THEN round((st - tmn) / (tmx - tmn), 6) ELSE 1.0 END AS nt
           FROM tt, ts),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0),
         vt AS (SELECT vec_id AS doc_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv),
               6) AS c
           FROM embeddings, q
           ORDER BY c DESC, doc_id LIMIT 50),
         vs AS (SELECT min(c) AS vmn, max(c) AS vmx FROM vt),
         vn AS (SELECT doc_id, CASE WHEN vmx > vmn
             THEN round((c - vmn) / (vmx - vmn), 6) ELSE 1.0 END AS nv
           FROM vt, vs)
         SELECT COALESCE(tn.doc_id, vn.doc_id) AS doc_id,
           round(0.7 * COALESCE(nt, 0.0) + 0.3 * COALESCE(nv, 0.0), 6)
             AS score
         FROM tn FULL OUTER JOIN vn ON tn.doc_id = vn.doc_id
         ORDER BY score DESC, doc_id LIMIT 10""",

    "x_maxsim" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 3),
         z AS (SELECT e.label, q.qid,
             max(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv))
               AS m
           FROM embeddings e, q GROUP BY e.label, q.qid)
         SELECT label,
           CAST(sum(CAST(round(m, 6) AS DECIMAL(16,6))) AS DOUBLE) AS maxsim
         FROM z GROUP BY label ORDER BY label""",
    // same fusion as x_hybrid, but the text leg is BM25 (the indexed
    // scorer ranks by the round-6 score, so the rank here does too)
    "x_hybrid_indexed" ->
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
         tt AS (SELECT doc_id,
             row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
               AS r_text
           FROM z WHERE score > 0
           ORDER BY round(score, 6) DESC, doc_id LIMIT 50),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0),
         vt AS (SELECT doc_id,
             row_number() OVER (ORDER BY c DESC, doc_id) AS r_vec
           FROM (SELECT vec_id AS doc_id,
               list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS c
             FROM embeddings, q) z2
           ORDER BY c DESC, doc_id LIMIT 50),
         f AS (SELECT COALESCE(tt.doc_id, vt.doc_id) AS doc_id,
             COALESCE(CAST(1 AS DOUBLE) / (60 + r_text), 0)
               + COALESCE(CAST(1 AS DOUBLE) / (60 + r_vec), 0) AS rrf
           FROM tt FULL OUTER JOIN vt ON tt.doc_id = vt.doc_id)
         SELECT doc_id, round(rrf, 9) AS rrf FROM f
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    "x_quantize" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS m
           FROM embeddings),
         dq AS (SELECT vec_id, e,
             CASE WHEN m = 0 THEN list_transform(e, x -> 0.0)
             ELSE list_transform(e, x ->
               GREATEST(LEAST(floor(x / (m / 127.0) + 0.5), 127.0), -127.0)
                 * (m / 127.0)) END AS d
           FROM base),
         q AS (SELECT d AS qd FROM dq WHERE vec_id = 0),
         z AS (SELECT vec_id, list_cosine_similarity(d, qd) AS c,
             list_cosine_similarity(e, d) AS f
           FROM dq, q)
         SELECT vec_id, round(c, 6) AS q_cosine, round(f, 6) AS fidelity
         FROM z ORDER BY c DESC, vec_id LIMIT 10""",
    // the appended index, fully probed, is exact — same oracle as the
    // brute-force top-k
    "x_sim_ivf_append" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) AS c
           FROM embeddings, q)
         SELECT vec_id, round(c, 6) AS cosine FROM z
         ORDER BY c DESC, vec_id LIMIT 10""",
    // survivors of the upsert/delete history: ids >=30 with original
    // vectors, ids <10 with the re-upserted (negated) vectors; full
    // probe is exact over that corpus
    "x_sim_ivf_upsert" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 30
           UNION ALL
           SELECT vec_id, list_transform(embedding, x -> -x) AS embedding
           FROM embeddings WHERE vec_id < 10),
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) AS c
           FROM corpus, q)
         SELECT vec_id, round(c, 6) AS cosine FROM z
         ORDER BY c DESC, vec_id LIMIT 10""",
    // two deltas touch ids [0,60): 50 re-upserted, 10 deleted; base =
    // full corpus, live = base − 10; compaction recommendation is the
    // deterministic threshold form (n_deltas ≥ 8 or touched ≥ 20% of base)
    "x_postings_stats" ->
      """SELECT CAST(count(*) - 10 AS BIGINT) AS n_live_docs,
           CAST(count(*) AS BIGINT) AS n_base_docs,
           CAST(60 AS BIGINT) AS n_touched_docs,
           CAST(10 AS BIGINT) AS n_tombstones,
           CAST(2 AS BIGINT) AS n_deltas,
           (2 >= 8 OR 60 >= 0.2 * count(*)) AS compact_recommended
         FROM documents""",
    // live count after supersede(<20) + delete(<5); k=8 cells; one
    // upsert + one delete pending in the commit log
    "x_sim_ivf_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(8 AS BIGINT) AS n_cells,
           TRUE AS skew_ok, TRUE AS max_consistent,
           CAST(2 AS BIGINT) AS n_pending_commits
         FROM embeddings WHERE embedding IS NOT NULL AND vec_id >= 5""",
    "x_sim_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) AS c
           FROM embeddings, q)
         SELECT vec_id, round(c, 6) AS cosine FROM z
         ORDER BY c DESC, vec_id LIMIT 10""",
    // the PQ ADC pool + exact rescore must BE the exact answer — the
    // x_sim_quantized convention, query vec 1
    "x_sim_pq" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
         z AS (SELECT vec_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) AS c
           FROM embeddings, q)
         SELECT vec_id, round(c, 6) AS cosine FROM z
         ORDER BY c DESC, vec_id LIMIT 10""",
    // the quantized-pool + rescore answer must BE the exact answer —
    // same oracle as x_sim_topk
    "x_sim_quantized" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) AS c
           FROM embeddings, q)
         SELECT vec_id, round(c, 6) AS cosine FROM z
         ORDER BY c DESC, vec_id LIMIT 10""",
    "x_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '),
             w -> length(w))) AS DOUBLE)
             / len(string_split(text, ' ')) AS mean_token_len,
           CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
             AS DOUBLE) / length(text) AS punct_ratio,
           CAST(len(list_filter(string_split(lower(text), ' '),
             w -> w IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio
         FROM documents ORDER BY doc_id""",
    "x_text_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))
             AS piece_tokens
         FROM documents ORDER BY doc_id""",
    "x_text_langid" ->
      """WITH s AS (SELECT doc_id,
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
         FROM documents)
         SELECT doc_id, CASE
           WHEN de_s > 0 AND de_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'de'
           WHEN en_s > 0 AND en_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'en'
           WHEN es_s > 0 AND es_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'es'
           WHEN fr_s > 0 AND fr_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'fr'
           WHEN zh_s > 0 AND zh_s >= greatest(de_s, en_s, es_s, fr_s, zh_s) THEN 'zh'
           ELSE 'und' END AS pred_lang
         FROM s ORDER BY doc_id""",
    "x_text_pii" ->
      """WITH p AS (SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
               || '@example.com or https://ex.com/p/'
               || CAST(doc_id AS VARCHAR) || ' call 555-123-4567' AS text
           FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
           len(regexp_extract_all(text,
             '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
         FROM p ORDER BY doc_id""",
    "x_text_repetition" ->
      """WITH sh AS (SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w)-1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
           FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents)),
         c AS (SELECT doc_id, g, count(*) AS k FROM sh GROUP BY 1, 2)
         SELECT doc_id, CAST(max(k) AS DOUBLE) / CAST(sum(k) AS DOUBLE)
           AS repetition
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "x_text_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             string_split(lower(text), ' '))), ' ')) AS fingerprint
         FROM documents ORDER BY doc_id""",
    // Zipf head mass at candidate vocab sizes; (tf desc, term) ranking
    "x_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(list_filter(
             string_split(lower(text), ' '), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
         tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tokens,
             count(*) AS n_terms FROM tf),
         r AS (SELECT term, tf,
             row_number() OVER (ORDER BY tf DESC, term) AS rk FROM tf),
         v AS (SELECT unnest([100, 1000]) AS vocab_size)
         SELECT v.vocab_size,
           max(tot.n_terms) AS n_terms,
           CAST(sum(r.tf) AS BIGINT) AS covered_tokens,
           max(tot.total_tokens) AS total_tokens,
           round(CAST(sum(r.tf) AS DOUBLE) / max(tot.total_tokens), 6)
             AS coverage
         FROM r, tot, v WHERE r.rk <= v.vocab_size
         GROUP BY v.vocab_size ORDER BY vocab_size""",
    "x_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           substring(base64(encode(text)), 1, 16) AS b64_head
         FROM documents ORDER BY doc_id""",
    // the decode stub derives features from md5_number_lower(text):
    // unsigned 64-bit math reproduced here exactly (UBIGINT % and //)
    "x_multimodal_features" ->
      """WITH f AS (SELECT doc_id AS id, md5_number_lower(text) AS l,
             CAST(1 + (md5_number_lower(text) // 65536) % 8 AS INT) AS nf
           FROM documents)
         SELECT id, CAST(16 + l % 64 AS INT) AS width,
           CAST(16 + (l // 256) % 64 AS INT) AS height,
           nf AS n_frames,
           CAST(l % 1000000007 AS BIGINT) AS checksum,
           CAST(range(0, nf, 2) AS VARCHAR) AS sampled_frames
         FROM f ORDER BY id""",
    // both generators rebuilt from md5-56; confusion counts replayed
    "x_dedup_eval" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS wd
           FROM documents),
         shg AS (SELECT doc_id,
             CASE WHEN len(wd) < 3 THEN [array_to_string(wd, ' ')]
               ELSE list_transform(range(1, len(wd) - 1),
                 i -> wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2]) END AS gs
           FROM t),
         h AS (SELECT doc_id, list_transform(gs,
             g -> CAST(md5_number_lower(g) % 72057594037927936
               AS BIGINT)) AS hs
           FROM shg),
         f AS (SELECT doc_id,
             CASE WHEN len(hs) < 4 THEN [list_min(hs)]
               ELSE list_distinct(list_transform(
                 range(1, len(hs) - 4 + 2),
                 i -> list_min(hs[i:i+3]))) END AS fps
           FROM h),
         fp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM f),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint
             AND a.doc_id < b.doc_id),
         sh AS (SELECT DISTINCT doc_id, g FROM
           (SELECT doc_id, unnest(gs) AS g FROM shg)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS common
           FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         truth AS (SELECT id_a, id_b FROM pairs
           JOIN cnt ca ON ca.doc_id = id_a
           JOIN cnt cb ON cb.doc_id = id_b
           WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.3),
         hits AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
         SELECT
           (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM hits) AS n_hits,
           round((SELECT count(*) FROM hits) /
             CAST((SELECT count(*) FROM truth) AS DOUBLE), 6) AS recall,
           round((SELECT count(*) FROM hits) /
             CAST((SELECT count(*) FROM cand) AS DOUBLE), 6) AS precision""",

    // edit-distance verify over the exact-Jaccard candidate set
    "x_dedup_edit" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
         cand AS (SELECT id_a, id_b FROM pairs
             JOIN cnt ca ON ca.doc_id = id_a
             JOIN cnt cb ON cb.doc_id = id_b
             WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.3)
         SELECT id_a, id_b,
           CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS edit_distance
         FROM cand
         JOIN documents ta ON ta.doc_id = id_a
         JOIN documents tb ON tb.doc_id = id_b
         WHERE levenshtein(ta.text, tb.text) <= 6
         ORDER BY id_a, id_b""",
    "x_dedup_minhash" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
         SELECT count(*) AS n_exact, TRUE AS recall_ok, TRUE AS precision_ok
         FROM pairs
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5""",
    "x_dedup_incremental_build" ->
      """SELECT count(*) AS n_docs, CAST(count(*) * 8 AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS n_pending_commits,
           FALSE AS compact_recommended
         FROM documents""",
    "x_dedup_incremental_probe" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
         SELECT count(*) AS n_verified
         FROM pairs
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5
           AND (id_a % 5 = 4 OR id_b % 5 = 4)""",
    "x_signature_stats" ->
      """SELECT count(*) AS n_docs, CAST(count(*) * 8 AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS n_pending_commits,
           FALSE AS compact_recommended, TRUE AS compact_ran
         FROM documents""",
    "x_dedup_simhash" ->
      """WITH sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
             FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents))),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
         SELECT count(*) AS n_exact, TRUE AS recall_ok
         FROM pairs
         JOIN cnt ca ON ca.doc_id = id_a
         JOIN cnt cb ON cb.doc_id = id_b
         WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= 0.5""",
    "x_sim_ann" ->
      """SELECT CAST(10 AS BIGINT) AS n_results, TRUE AS self_found,
           TRUE AS recall_ok""",
    "x_sim_ivf" ->
      """SELECT CAST(10 AS BIGINT) AS n_results, TRUE AS recall_ok""",
    "x_sim_ivf_persisted" ->
      """SELECT CAST(10 AS BIGINT) AS n_results, TRUE AS recall_ok""",
    // dims recomputed straight from the source columns: the engine must
    // round-trip them through real header bytes and the byte parser
    "x_multimodal_sniff" ->
      """SELECT doc_id AS id,
           CASE WHEN doc_id % 11 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           CASE WHEN doc_id % 11 = 0 THEN NULL
                ELSE CAST(n_chars % 512 + 1 AS INTEGER) END AS width,
           CASE WHEN doc_id % 11 = 0 THEN NULL
                ELSE CAST(doc_id % 512 + 1 AS INTEGER) END AS height
         FROM documents ORDER BY doc_id""",
    // EBML walk recomputed from columns: duration ticks = doc_id%300+1
    // at TimestampScale 1e9 ns, so duration_s is the integer-valued
    // double; track flags from the planted entries; every 7th doc is
    // non-EBML and sniffs to nulls
    "x_multimodal_sniff_ebml" ->
      """SELECT doc_id AS id,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN 'mkv' ELSE 'webm' END AS format,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(doc_id % 300 + 1 AS DOUBLE) END AS duration_s,
           CASE WHEN doc_id % 7 = 0 THEN NULL ELSE true END AS has_video,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE doc_id % 3 = 0 END AS has_audio
         FROM documents ORDER BY id""",
    // MP3/ADTS frame math recomputed from doc_id: n = doc_id%5+1
    // frames, 1152 (mp3) / 1024 (aac) samples per frame at 44100 Hz
    "x_multimodal_sniff_audio" ->
      """SELECT doc_id AS id,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'aac' END AS format,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(44100 AS INTEGER) END AS sample_rate,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(doc_id % 5 + 1 AS BIGINT) END AS n_frames,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0
                  THEN round((doc_id % 5 + 1) * 1152.0 / 44100, 6)
                ELSE round((doc_id % 5 + 1) * 1024.0 / 44100, 6)
           END AS duration_s
         FROM documents ORDER BY id""",
    // real FLAC encode->decode: sample stats recomputed from doc_id —
    // even ids a constant block (rms = |v|), odd ids the 8-sample ramp
    "x_multimodal_flac" ->
      """SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 50 + 1 AS BIGINT)
                ELSE CAST(8 AS BIGINT) END AS n_frames,
           CASE WHEN doc_id % 2 = 0 THEN round(abs(CAST(doc_id % 1000 - 500 AS DOUBLE)), 6)
                ELSE round(sqrt(list_sum(list_transform(range(8),
                       i -> CAST((doc_id * 31 + i * 7) % 2000 - 1000 AS DOUBLE) ** 2)) / 8.0), 6)
           END AS rms
         FROM documents ORDER BY id""",
    // FLAC encode -> decode -> FFT: the peak bin is the planted tone's
    "x_audio_spectrum" ->
      """SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(256 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 300 ORDER BY id""",
    // AVI walk + per-frame JPEG decode: structure exact, luma bounded
    "x_video_frames" ->
      """SELECT doc_id AS id, CAST(f AS INTEGER) AS frame_idx,
           CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           true AS luma_ok
         FROM documents, range(3) t(f)
         WHERE doc_id < 120 ORDER BY id, frame_idx""",
    // island structure stated from the planted (id+g)%3 pattern
    "x_audio_utterances" ->
      """WITH u AS (
           SELECT doc_id, 0 AS utt_idx,
             CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 4 ELSE 2 END
               AS start_frame
           FROM documents WHERE doc_id < 250
           UNION ALL
           SELECT doc_id, 1, 6 FROM documents
           WHERE doc_id < 250 AND doc_id % 3 = 0)
         SELECT doc_id AS id, CAST(utt_idx AS INTEGER) AS utt_idx,
           CAST(start_frame AS INTEGER) AS start_frame,
           CAST(start_frame + 1 AS INTEGER) AS end_frame,
           CAST(2 AS INTEGER) AS n_frames
         FROM u ORDER BY id, utt_idx""",
    // mel band per tone: the public formula evaluated once and frozen
    "x_audio_mfcc" ->
      """SELECT doc_id AS id,
           CAST(([1,1,1,1,1,1,2,2,2,2,2,2,3,3,3,3,3,3,
                  4,4,4,4,4,4,4,4,5,5,5,5])[doc_id % 30 + 1]
             AS INTEGER) AS dominant_band,
           CAST(10 AS INTEGER) AS n_coef
         FROM documents WHERE doc_id < 300 ORDER BY id""",
    // lossless path: frame RMS replayed exactly, same op order + round
    "x_audio_vad" ->
      """SELECT doc_id AS id, CAST(f AS INTEGER) AS frame_idx,
           CAST(64 AS INTEGER) AS n,
           round(sqrt(list_sum(list_transform(range(0, 64), i ->
             CAST(CASE WHEN (doc_id + f) % 3 = 0
               THEN (doc_id * 31 + (f * 64 + i) * 7) % 2000 - 1000
               ELSE (doc_id + f * 64 + i) % 20 - 10 END AS DOUBLE) ** 2))
             / 64.0), 6) AS rms,
           round(sqrt(list_sum(list_transform(range(0, 64), i ->
             CAST(CASE WHEN (doc_id + f) % 3 = 0
               THEN (doc_id * 31 + (f * 64 + i) * 7) % 2000 - 1000
               ELSE (doc_id + f * 64 + i) % 20 - 10 END AS DOUBLE) ** 2))
             / 64.0), 6) >= 100.0 AS active
         FROM documents, range(4) t(f)
         WHERE doc_id < 250 ORDER BY id, frame_idx""",
    // own-spec ADPCM encode -> own decode -> FFT: peak survives 4:1
    "x_audio_adpcm" ->
      """SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(256 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 300 ORDER BY id""",
    // own-spec MP3 Layer III encode -> own decode -> FFT: peak survives
    // the lossy perceptual-transform loop; n = 2 frames minus the
    // fixed codec-delay skip
    "x_audio_mp3" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 300 ORDER BY id""",
    // the 32 kHz MPEG-1 leg: pins the 22-band long sfb table (incl.
    // the 550 boundary) through the full encode/decode loop
    "x_audio_mp3_32k" ->
      """SELECT doc_id AS id,
           CAST(32000 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the short-block leg of the own MP3 codec: every granule
    // block_type 2 (short sfb tables + reorder + 3x12 IMDCT tiling)
    "x_audio_mp3_short" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the mixed-block leg of the own MP3 codec: two long subbands
    // under a short granule, tones across the long/short seam
    "x_audio_mp3_mixed" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the stereo leg of the own MP3 codec: mid/side joint stereo,
    // channel-0 (left) peak recovered through the MS matrix
    "x_audio_mp3_stereo" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the intensity joint-stereo leg of the own MP3 codec: positions
    // at the exact tan(60°) ratio, left peak through the channel-0 path
    "x_audio_mp3_intensity" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the LSF leg of the own MP3 codec: 22.05 kHz one-granule frames,
    // live scalefactors through the LSF slen decomposition
    "x_audio_mp3_lsf" ->
      """SELECT doc_id AS id,
           CAST(22050 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the MS+intensity leg (mode_extension 3): mid/side below the
    // bound, exact-angle positions above
    "x_audio_mp3_ms_intensity" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the LSF short-block leg: 13818-3 slen partitions, live short
    // scalefactors through one-granule 22.05 kHz frames
    "x_audio_mp3_lsf_short" ->
      """SELECT doc_id AS id,
           CAST(22050 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // the LSF mixed-block leg: 6 long bands + short 3-12 under the
    // 6+9+9+9 slen partition, tones across the seam
    "x_audio_mp3_lsf_mixed" ->
      """SELECT doc_id AS id,
           CAST(22050 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // mixed-block intensity (mode_extension 1 on mixed granules): long
    // positions below the seam, per-window short positions above, both
    // at the exact tan(60°) ratio
    "x_audio_mp3_mixed_intensity" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // mixed + mode_extension 3: mid/side below the bound on mixed
    // granules, exact-angle intensity positions above
    "x_audio_mp3_mixed_ms" ->
      """SELECT doc_id AS id,
           CAST(44100 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(1152 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // third-party LSF stream (vendored gsutil fixture, digital silence):
    // 45 frames x 576 minus the 1152-sample codec-delay skip = exactly
    // 43 analysis frames of 576, each with RMS 0 — any decoder misparse
    // shifts the frame count or the rms
    "x_audio_mp3_interop" ->
      """SELECT d.doc_id AS id, CAST(f.range AS INTEGER) AS frame_idx,
           CAST(576 AS INTEGER) AS n, CAST(0.0 AS DOUBLE) AS rms,
           CAST(FALSE AS BOOLEAN) AS active
         FROM documents d CROSS JOIN range(43) f
         WHERE d.doc_id < 40 ORDER BY id, frame_idx""",
    // G.711 encode -> JDK ULAW decode -> FFT: peak survives companding
    "x_audio_g711" ->
      """SELECT doc_id AS id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(doc_id % 30 + 1 AS INTEGER) AS peak_bin,
           CAST(256 AS BIGINT) AS n_samples
         FROM documents WHERE doc_id < 300 ORDER BY id""",
    // bilinear resize of a constant raster IS the constant
    "x_image_resize" ->
      """SELECT doc_id AS id,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           round(CAST(doc_id * 11 % 256 AS DOUBLE), 6) AS mean_luma
         FROM documents WHERE doc_id < 150 ORDER BY id""",
    // 4x4 patch means of the planted gradient, exact integer sums
    "x_image_patches" ->
      """SELECT doc_id AS id,
           CAST(pr * 4 + pc AS INTEGER) AS patch_idx,
           CAST(pr AS INTEGER) AS patch_row,
           CAST(pc AS INTEGER) AS patch_col,
           round(list_sum(list_transform(range(16), t ->
             CAST((doc_id * 3 + (pr * 4 + t // 4) * 16 + pc * 4 + t % 4)
               % 256 AS DOUBLE))) / 16.0, 6) AS mean_luma
         FROM documents, range(4) a(pr), range(4) b(pc)
         WHERE doc_id < 150 ORDER BY id, patch_idx""",
    // PNG encode->decode roundtrip: dims and exact mean luma from id
    "x_image_decode" ->
      """SELECT doc_id AS id,
           CAST(doc_id % 9 + 8 AS INTEGER) AS width,
           CAST(doc_id % 7 + 8 AS INTEGER) AS height,
           round(CAST(doc_id * 7 % 256 AS DOUBLE), 6) AS mean_luma
         FROM documents WHERE doc_id < 200 ORDER BY id""",
    // perceptual near-dup pair structure from id arithmetic: within-group
    // pairs only; hamming 2 exactly when one side carries the 2-cell flip
    "x_image_dedup" ->
      """WITH ids AS (SELECT doc_id, (doc_id // 40) % 4 = 3 AS flipped
                      FROM documents WHERE doc_id < 320)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(CASE WHEN a.flipped <> b.flipped THEN 2 ELSE 0 END AS INTEGER)
             AS hamming
         FROM ids a JOIN ids b
           ON a.doc_id % 40 = b.doc_id % 40 AND a.doc_id < b.doc_id
         ORDER BY id_a, id_b""",
    // rotation invariant: pair distances from the RAW embeddings (same
    // ascending-index double arithmetic); preservation asserted Spark-side
    "x_embed_pca" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(sqrt(list_sum(list_transform(range(1, 65), i ->
             (CAST(a.embedding[i] AS DOUBLE)
              - CAST(b.embedding[i] AS DOUBLE)) ** 2))), 6) AS dist,
           true AS preserved
         FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 100
         WHERE a.vec_id < 100
         ORDER BY id_a""",
    // 50-long chains: every node's component root is its chain head
    "x_connected_components" ->
      """SELECT doc_id AS id, CAST((doc_id // 50) * 50 AS BIGINT) AS root
         FROM documents ORDER BY id""",
    // within-group clip pairs only, perceptually identical across noise
    "x_video_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 240)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(3 AS INTEGER) AS n_frames,
           CAST(0 AS INTEGER) AS max_hamming
         FROM ids a JOIN ids b
           ON a.doc_id % 30 = b.doc_id % 30 AND a.doc_id < b.doc_id
         ORDER BY id_a, id_b""",
    // same blocking, same candidate join, same (bit-exact) JW scores
    "x_fuzzy_linkage" ->
      """WITH p AS (SELECT p_partkey AS id, p_name AS nm FROM part
                    WHERE p_partkey <= 400),
         keys AS (SELECT id, nm, k FROM p,
           UNNEST(list_distinct([substr(nm, 1, 8),
             substr(nm, greatest(length(nm) - 7, 1), 8)])) AS t(k)),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.nm AS na, b.nm AS nb
           FROM keys a JOIN keys b ON a.k = b.k AND a.id < b.id)
         SELECT id_a, id_b,
           round(jaro_winkler_similarity(na, nb), 6) AS similarity
         FROM cand WHERE jaro_winkler_similarity(na, nb) >= 0.92
         ORDER BY id_a, id_b""",
    // FLAC STREAMINFO / Ogg-Opus granule math recomputed from doc_id;
    // opus total = granule - preskip, duration = total / 48000
    "x_multimodal_sniff_container" ->
      """SELECT doc_id AS id,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'opus' END AS format,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN CAST(44100 AS INTEGER)
                ELSE CAST(48000 AS INTEGER) END AS sample_rate,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(2 AS INTEGER) END AS channels,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0
                  THEN CAST((doc_id % 300 + 1) * 44100 AS BIGINT)
                ELSE CAST((doc_id % 100 + 1) * 4800 AS BIGINT)
           END AS total_samples,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 2 = 0 THEN
                  round(CAST((doc_id % 300 + 1) * 44100 AS DOUBLE) / 44100, 6)
                ELSE round(CAST((doc_id % 100 + 1) * 4800 AS DOUBLE) / 48000, 6)
           END AS duration_s
         FROM documents ORDER BY id""",
    // centroids = per-(label, dim) averages rounded 6dp, argmax by
    // (rounded cosine desc, label asc) — the engine's exact recipe
    "x_classify_centroid" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE embedding IS NOT NULL),
         d AS (SELECT label,
             unnest(generate_series(1, len(v))) AS dim, unnest(v) AS x
           FROM e),
         cd AS (SELECT label, dim, round(avg(x), 6) AS c
           FROM d GROUP BY label, dim),
         cents AS (SELECT label, list(c ORDER BY dim) AS cv
           FROM cd GROUP BY label),
         sims AS (SELECT e.vec_id, cents.label,
             round(list_cosine_similarity(e.v, cv), 6) AS s
           FROM e, cents),
         best AS (SELECT vec_id, label, s,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY s DESC, label) AS rn
           FROM sims)
         SELECT vec_id, label AS label_pred, s AS cosine
         FROM best WHERE rn = 1 ORDER BY vec_id""",
    // own-label centroid cosine, per-label exact lower-decile flag —
    // same 6dp centroid recipe as x_classify_centroid
    "x_embed_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings
           WHERE embedding IS NOT NULL AND label IS NOT NULL),
         d AS (SELECT label,
             unnest(generate_series(1, len(v))) AS dim, unnest(v) AS x
           FROM e),
         cd AS (SELECT label, dim, round(avg(x), 6) AS c
           FROM d GROUP BY label, dim),
         cents AS (SELECT label, list(c ORDER BY dim) AS cv
           FROM cd GROUP BY label),
         s AS (SELECT e.vec_id, e.label,
             round(list_cosine_similarity(e.v, cents.cv), 6) AS cosine
           FROM e JOIN cents ON e.label = cents.label),
         t AS (SELECT label, round(quantile_cont(cosine, 0.1), 6)
             AS threshold
           FROM s GROUP BY label)
         SELECT s.vec_id, s.label, s.cosine, t.threshold,
           s.cosine < t.threshold AS outlier
         FROM s JOIN t ON s.label = t.label ORDER BY s.vec_id""",
    // a FULL oracle (not a recall gate): the radius prune is exact
    "x_sim_radius" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) AS c
           FROM embeddings, q)
         SELECT vec_id, round(c, 6) AS cosine FROM z
         WHERE c >= 0.4 ORDER BY vec_id""",
    "x_decontaminate" ->
      """WITH sh AS (SELECT doc_id, source, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(
             range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
           FROM (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents)),
         b AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'),
         hits AS (SELECT t.doc_id, count(DISTINCT t.g) AS n_shared
           FROM sh t JOIN b ON t.g = b.g
           WHERE t.source <> 'src0' GROUP BY t.doc_id)
         SELECT d.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
           COALESCE(h.n_shared, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         WHERE d.source <> 'src0' ORDER BY d.doc_id""",
    // dirty-fraction triage: distinct-trigram denominator per doc,
    // probe-hit numerator, severity on the ROUNDED fraction
    "x_contamination_frac" ->
      """WITH t AS (SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         shg AS (SELECT doc_id, source,
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS gs
           FROM t),
         b AS (SELECT DISTINCT unnest(gs) AS g FROM shg
           WHERE source = 'src0'),
         tr AS (SELECT doc_id, len(list_distinct(gs)) AS n_shingles,
             gs
           FROM shg WHERE source <> 'src0'),
         hits AS (SELECT u.doc_id, count(DISTINCT u.g) AS n_shared
           FROM (SELECT doc_id, unnest(gs) AS g FROM tr) u
           JOIN b ON u.g = b.g GROUP BY 1)
         SELECT tr.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           round(COALESCE(h.n_shared, 0) / CAST(n_shingles AS DOUBLE), 6)
             AS shared_frac,
           CASE WHEN round(COALESCE(h.n_shared, 0) /
               CAST(n_shingles AS DOUBLE), 6) >= 0.5 THEN 'heavy'
             WHEN round(COALESCE(h.n_shared, 0) /
               CAST(n_shingles AS DOUBLE), 6) >= 0.1 THEN 'partial'
             ELSE 'clean' END AS severity
         FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
         ORDER BY tr.doc_id""",

    // semantic decontamination: max cosine to the eval slice, flag on
    // the ROUNDED value (both engines agree at the boundary)
    "x_decontaminate_embed" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 20 <> 0
             AND embedding IS NOT NULL),
         e AS (SELECT CAST(embedding AS DOUBLE[]) AS ev
           FROM embeddings WHERE vec_id % 20 = 0
             AND embedding IS NOT NULL),
         m AS (SELECT t.vec_id, max(list_cosine_similarity(t.v, e.ev))
             AS mc
           FROM t, e GROUP BY t.vec_id)
         SELECT vec_id, round(mc, 6) AS max_cosine,
           round(mc, 6) >= 0.9 AS contaminated
         FROM m ORDER BY vec_id""",
    "x_pack" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s
           FROM t)
         SELECT doc_id, n_tokens, s // 512 AS bin_id FROM c ORDER BY doc_id""",
    "x_pack_text" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s
           FROM t),
         p AS (SELECT doc_id, n_tokens, s // 512 AS bin_id FROM c)
         SELECT p.bin_id, count(*) AS n_docs,
           CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
           string_agg(d.text, ' ' ORDER BY d.doc_id) AS seq_text
         FROM p JOIN documents d ON p.doc_id = d.doc_id
         GROUP BY p.bin_id ORDER BY p.bin_id""",
    "x_balance" ->
      """WITH h AS (SELECT doc_id, source,
             (md5_number_lower(CAST(doc_id AS VARCHAR))
               % 72057594037927936) AS hv
           FROM documents),
         r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
           FROM h)
         SELECT source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM r WHERE rk <= 10 GROUP BY source ORDER BY source""",
    "x_sample" ->
      """SELECT source, count(*) AS n_kept FROM documents
         WHERE (md5_number_lower(CAST(doc_id AS VARCHAR))
           % 72057594037927936) % 1000 < 200
         GROUP BY source ORDER BY source""",
    // per-(doc, position) md5-56 mask decision replayed bit-for-bit;
    // positions are 0-based to match the transform index
    "x_mask_tokens" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         x AS (SELECT doc_id, len(w) AS n_tokens,
             unnest(w) AS tok,
             unnest(generate_series(0, len(w) - 1)) AS pos
           FROM t),
         m AS (SELECT doc_id, n_tokens, pos,
             CASE WHEN (md5_number_lower(doc_id || ':' || pos)
                 % 72057594037927936) % 1000 < 150
               THEN '<mask>' ELSE tok END AS tok2
           FROM x)
         SELECT doc_id,
           CAST(any_value(n_tokens) AS INTEGER) AS n_tokens,
           CAST(sum(CASE WHEN tok2 = '<mask>' THEN 1 ELSE 0 END)
             AS INTEGER) AS n_masked,
           array_to_string(list(tok2 ORDER BY pos), ' ') AS masked_text
         FROM m GROUP BY doc_id ORDER BY doc_id""",
    // multi_match: per-field token tf recomputed, greatest/sum combine
    "q_multi_match" ->
      """WITH s AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'de'))
               AS DOUBLE) AS ts,
             CAST(len(list_filter(string_split(lower(lang), ' '), w -> w = 'merge'))
               + len(list_filter(string_split(lower(lang), ' '), w -> w = 'window'))
               + len(list_filter(string_split(lower(lang), ' '), w -> w = 'de'))
               AS DOUBLE) AS ls
           FROM documents)
         SELECT doc_id, greatest(ts * 1.0, ls * 3.0) AS score
         FROM s WHERE greatest(ts * 1.0, ls * 3.0) > 0
         ORDER BY score DESC, doc_id LIMIT 20""",
    "q_multi_match_most" ->
      """WITH s AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               + len(list_filter(string_split(lower(text), ' '), w -> w = 'de'))
               AS DOUBLE) AS ts,
             CAST(len(list_filter(string_split(lower(lang), ' '), w -> w = 'merge'))
               + len(list_filter(string_split(lower(lang), ' '), w -> w = 'window'))
               + len(list_filter(string_split(lower(lang), ' '), w -> w = 'de'))
               AS DOUBLE) AS ls
           FROM documents)
         SELECT doc_id, ts * 1.0 + ls * 3.0 AS score
         FROM s WHERE ts * 1.0 + ls * 3.0 > 0
         ORDER BY score DESC, doc_id LIMIT 20""",
    // combined_fields: weighted tf/dl sums into ONE BM25 (shared idf);
    // identical constants/order/6dp round as q_match_bm25
    "q_combined_fields" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         u AS (SELECT doc_id,
             2.0 * len(list_slice(toks, 1, 5)) + 1.0 * len(toks) AS dl,
             2.0 * len(list_filter(list_slice(toks, 1, 5), w -> w = 'merge'))
               + 1.0 * len(list_filter(toks, w -> w = 'merge')) AS tf0,
             2.0 * len(list_filter(list_slice(toks, 1, 5), w -> w = 'window'))
               + 1.0 * len(list_filter(toks, w -> w = 'window')) AS tf1,
             2.0 * len(list_filter(list_slice(toks, 1, 5), w -> w = 'scan'))
               + 1.0 * len(list_filter(toks, w -> w = 'scan')) AS tf2
           FROM t),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
           FROM u),
         z AS (SELECT doc_id,
             ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               AS score
           FROM u, s)
         SELECT doc_id, round(score, 6) AS score FROM z WHERE score > 0
         ORDER BY score DESC, doc_id LIMIT 20""",
    // terms lookup: the IN-set is read from one stored document
    // sparse dot product over query-term postings; same impact formula,
    // 6dp-rounded contributions summed as decimals
    "q_sparse_vector" ->
      """WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS t
           FROM documents),
         q(t, w) AS (VALUES ('merge', 1.5), ('window', 1.0),
           ('scan', 0.7), ('data', 0.3)),
         tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
           FROM toks WHERE t IN (SELECT t FROM q) GROUP BY 1, 2),
         df AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf
           GROUP BY 1),
         c AS (SELECT tf.doc_id,
             CAST(round(q.w * round((1.0 + ln(tf.tf)) *
               ln(1.0 + n.n / df.df), 6), 6) AS DECIMAL(18,6)) AS contrib
           FROM tf JOIN df USING (t) JOIN q USING (t), n)
         SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS score
         FROM c GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""",

    // indexed serving must equal the corpus scan: same oracle arithmetic
    "q_sparse_vector_indexed" ->
      """WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         toks AS (SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS t
           FROM documents),
         q(t, w) AS (VALUES ('merge', 1.5), ('window', 1.0),
           ('scan', 0.7), ('data', 0.3)),
         tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
           FROM toks WHERE t IN (SELECT t FROM q) GROUP BY 1, 2),
         df AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf
           GROUP BY 1),
         c AS (SELECT tf.doc_id,
             CAST(round(q.w * round((1.0 + ln(tf.tf)) *
               ln(1.0 + n.n / df.df), 6), 6) AS DECIMAL(18,6)) AS contrib
           FROM tf JOIN df USING (t) JOIN q USING (t), n)
         SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS score
         FROM c GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""",

    // nested semantics = both predicates on the SAME lineitem row
    "q_nested" ->
      """SELECT l_orderkey AS o_orderkey, count(*) AS n_hits,
           string_agg(CAST(l_linenumber AS VARCHAR), ','
             ORDER BY l_linenumber) AS hit_lines
         FROM lineitem
         WHERE l_quantity >= 45 AND l_discount >= 0.08
         GROUP BY 1 ORDER BY 1""",

    "q_terms_lookup" ->
      """SELECT doc_id, lang FROM documents
         WHERE lang IN (SELECT lang FROM documents WHERE doc_id = 123)
         ORDER BY doc_id""",
    // random_score: md5-56 sampling hash of 'seed:id', mod 10^6, scaled
    "q_random_score" ->
      """SELECT doc_id,
           round(CAST((md5_number_lower('7:' || CAST(doc_id AS VARCHAR))
             % 72057594037927936) % 1000000 AS DOUBLE) / 1000000.0, 6)
             AS score
         FROM documents
         WHERE list_has_any(string_split(lower(text), ' '), ['merge', 'window'])
         ORDER BY score DESC, doc_id LIMIT 20""",
    // DSIR: same explode → hash-bin → smoothed log-ratio pipeline;
    // 9dp-rounded ratios fixed as decimal, per-doc sums exact
    "x_dsir" ->
      """WITH toks AS (SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
           FROM documents),
         feat AS (
           SELECT doc_id, source, unnest(ts) AS f FROM toks
           UNION ALL
           SELECT doc_id, source,
             unnest(list_transform(range(2, len(ts) + 1),
               i -> ts[i - 1] || ' ' || ts[i])) AS f
           FROM toks WHERE len(ts) >= 2),
         fb AS (SELECT doc_id, source,
             (md5_number_lower(f) % 72057594037927936) % 256 AS b
           FROM feat),
         pdc AS (SELECT doc_id, source, b, count(*) AS c
           FROM fb GROUP BY 1, 2, 3),
         stats AS (SELECT b,
             sum(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS ct,
             sum(c) AS cr
           FROM pdc GROUP BY 1),
         tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM stats),
         ratio AS (SELECT b,
             CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE))
                      - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)),
               9) AS DECIMAL(18,9)) AS lr
           FROM stats CROSS JOIN tot)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
           round(CAST(sum(CAST(c AS DECIMAL(18,9)) * lr) AS DOUBLE), 6)
             AS weight
         FROM pdc JOIN ratio USING (b)
         WHERE source <> 'src0'
         GROUP BY doc_id
         ORDER BY weight DESC, doc_id LIMIT 50""",
    // mixture reweighting: identical double pipeline, decimal-exact
    // normalizer (one libm exp per source absorbed by the 6dp round)
    "x_mix_reweight" ->
      """WITH per AS (SELECT source, count(*) AS n, sum(n_chars) AS sc
           FROM documents GROUP BY source),
         t AS (SELECT sum(n) AS tot FROM per),
         base AS (SELECT source,
             CAST(n AS DOUBLE) / tot AS weight,
             CAST(sc AS DOUBLE) / n / 1000.0 AS loss
           FROM per, t),
         r AS (SELECT source, weight, loss,
             CAST(round(weight * exp(0.5 * loss), 6) AS DECIMAL(18,6))
               AS raw
           FROM base),
         tt AS (SELECT sum(raw) AS total FROM r)
         SELECT source, round(weight, 6) AS weight,
           round(loss, 6) AS loss,
           round(CAST(raw AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS new_weight
         FROM r, tt ORDER BY source""",
    // blocklist: per-pattern contains() in pattern order
    "x_blocklist" ->
      """WITH m AS (SELECT doc_id,
             list_filter(['merge', 'window scan', 'qqqabsent', 'stream'],
               p -> contains(lower(text), p)) AS hits
           FROM documents)
         SELECT doc_id, CAST(len(hits) AS INT) AS n_matched,
           coalesce(array_to_string(hits, ','), '') AS matched_terms,
           len(hits) > 0 AS blocked
         FROM m ORDER BY doc_id""",
    // span corruption recomputed from doc_id: fired stride-4 segments
    // (md5-56 bucket), span length 1-3 from the sibling hash, sentinel
    // rank by segment order; masked text drops in-span tokens behind
    // the sentinel, targets = sentinel+span pairs + closing sentinel
    "x_mask_spans" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         seg AS (SELECT doc_id, w,
             unnest(generate_series(0, (len(w) - 1) // 4)) AS j
           FROM t WHERE len(w) > 0),
         fired AS (SELECT doc_id, w, j,
             CAST(1 + (md5_number_lower(doc_id || ':' || j || ':l')
               % 72057594037927936) % 3 AS INT) AS len
           FROM seg
           WHERE (md5_number_lower(doc_id || ':' || j || ':s')
               % 72057594037927936) % 1000 < 300),
         ranked AS (SELECT doc_id, w, j, len,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY j) - 1
               AS INT) AS k
           FROM fired),
         pos AS (SELECT doc_id, unnest(w) AS tok,
             unnest(generate_series(0, len(w) - 1)) AS i
           FROM t),
         mt AS (SELECT p.doc_id, p.i,
             CASE WHEN r.j IS NOT NULL AND p.i = r.j * 4
                    THEN '<extra_id_' || r.k || '>'
                  WHEN r.j IS NOT NULL THEN NULL
                  ELSE p.tok END AS tok2
           FROM pos p LEFT JOIN ranked r
             ON p.doc_id = r.doc_id AND p.i // 4 = r.j
               AND p.i - r.j * 4 < r.len),
         masked AS (SELECT doc_id,
             array_to_string(list(tok2 ORDER BY i)
               FILTER (tok2 IS NOT NULL), ' ') AS masked_text
           FROM mt GROUP BY doc_id),
         tg AS (SELECT doc_id, k, '<extra_id_' || k || '> ' ||
               array_to_string(w[j * 4 + 1 : j * 4 + len], ' ') AS piece
           FROM ranked),
         tgt AS (SELECT doc_id, CAST(count(*) AS INT) AS n_spans,
             array_to_string(list(piece ORDER BY k), ' ') AS tp
           FROM tg GROUP BY doc_id)
         SELECT t.doc_id AS doc_id, CAST(len(w) AS INT) AS n_tokens,
           coalesce(n_spans, 0) AS n_spans,
           coalesce(masked_text, '') AS masked_text,
           CASE WHEN tp IS NULL THEN '<extra_id_0>'
                ELSE tp || ' <extra_id_' || n_spans || '>'
           END AS targets_text
         FROM t LEFT JOIN masked ON t.doc_id = masked.doc_id
           LEFT JOIN tgt ON t.doc_id = tgt.doc_id
         ORDER BY t.doc_id""",
    "x_chunk" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         u AS (SELECT doc_id, len(w) AS n, w, unnest(range(0, len(w), 40)) AS s
           FROM t WHERE len(w) > 0)
         SELECT doc_id, CAST(s // 40 AS INT) AS chunk_id,
           array_to_string(w[s+1:s+50], ' ') AS chunk_text,
           CAST(LEAST(50, n - s) AS INT) AS n_chunk_tokens
         FROM u ORDER BY doc_id, chunk_id""",
    "x_corpus_diff" ->
      """WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents
           WHERE doc_id < 450),
         b AS (SELECT doc_id,
             md5(CASE WHEN doc_id < 150 THEN text || ' v2' ELSE text END)
               AS hb
           FROM documents WHERE doc_id >= 50)
         SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN ha IS NOT DISTINCT FROM hb THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         ORDER BY doc_id""",
    "q_match_all_terms" ->
      """SELECT doc_id FROM (SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
         FROM documents)
         WHERE list_contains(w, 'merge') AND list_contains(w, 'window')
           AND list_contains(w, 'scan')
         ORDER BY doc_id""",
    // per-source reproducible shuffle, then round-robin across sources
    "x_interleave" ->
      """WITH r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY
               md5_number_lower(CAST(doc_id AS VARCHAR))
                 % 72057594037927936, doc_id) AS rank_in_source
           FROM documents)
         SELECT row_number() OVER (ORDER BY rank_in_source, source)
             AS position,
           doc_id, source, rank_in_source
         FROM r ORDER BY position""",

    "x_train_order" ->
      """SELECT row_number() OVER (ORDER BY h, doc_id) AS train_order,
           doc_id, source
         FROM (SELECT doc_id, source,
             (md5_number_lower(CAST(doc_id AS VARCHAR))
               % 72057594037927936) AS h
           FROM documents)
         ORDER BY train_order""",
    "x_split" ->
      """SELECT doc_id,
           CASE WHEN h < 100 THEN 'test'
                WHEN h < 200 THEN 'val'
                ELSE 'train' END AS split
         FROM (SELECT doc_id,
             (md5_number_lower(CAST(doc_id AS VARCHAR))
               % 72057594037927936) % 1000 AS h
           FROM documents) ORDER BY doc_id""",
    "x_split_leakage" ->
      """SELECT doc_id, fingerprint,
           CASE WHEN h < 100 THEN 'test'
                WHEN h < 200 THEN 'val'
                ELSE 'train' END AS split
         FROM (SELECT doc_id, fingerprint,
             (md5_number_lower(fingerprint) % 72057594037927936) % 1000 AS h
           FROM (SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                 string_split(lower(text), ' '))), ' ')) AS fingerprint
             FROM documents)) ORDER BY doc_id""",
    // u = (md5_56 + 1)/2^56 is an exact dyadic rational; -ln(u)/w rounds
    // at 9dp before the rank so libm ULP cannot reorder the cut
    "x_weighted_sample" ->
      """SELECT doc_id, n_chars, priority FROM (
           SELECT doc_id, n_chars,
             round(-ln((CAST((md5_number_lower(CAST(doc_id AS VARCHAR))
                 % 72057594037927936) AS DOUBLE) + 1.0) / 72057594037927936.0)
               / CAST(n_chars AS DOUBLE), 9) AS priority
           FROM documents)
         ORDER BY priority, doc_id LIMIT 100""",
    "x_quota_sample" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source, row_number() OVER (PARTITION BY source
               ORDER BY (md5_number_lower(CAST(doc_id AS VARCHAR))
                 % 72057594037927936), doc_id) AS rk
           FROM documents)
         WHERE rk <= CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 12
                     ELSE 8 END
         ORDER BY doc_id""",
    "x_mix" ->
      """SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT doc_id, source,
             (md5_number_lower(CAST(doc_id AS VARCHAR))
               % 72057594037927936) % 1000 AS h
           FROM documents)
         WHERE h < CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 500
                               WHEN 'src2' THEN 250 ELSE 100 END
         GROUP BY source ORDER BY source""",
    "x_token_budget" ->
      """WITH t AS (SELECT doc_id, source, text,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n_tokens,
             (md5_number_lower(CAST(doc_id AS VARCHAR))
               % 72057594037927936) AS h
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS tokens_before
           FROM t)
         SELECT doc_id, source, n_tokens, tokens_before FROM c
         WHERE tokens_before < 600 ORDER BY doc_id""",
    "x_boilerplate" ->
      """WITH sh AS (SELECT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)-1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS ngram
           FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
             FROM documents)),
         pd AS (SELECT doc_id, ngram, count(*) AS c FROM sh GROUP BY 1, 2),
         agg AS (SELECT ngram, CAST(sum(c) AS BIGINT) AS n_total,
             count(*) AS n_docs
           FROM pd GROUP BY 1)
         SELECT CAST(row_number() OVER (ORDER BY n_total DESC, ngram) AS INT)
             AS rk, ngram, n_total, n_docs
         FROM agg ORDER BY n_total DESC, ngram LIMIT 20""",
    // full-probe indexed KNN ≡ the corpus-scan knnJoin answer
    "x_knn_indexed" ->
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
    // training-leg gate: the counts come from the data, the quality
    // booleans are Spark-side assertions over the trained model
    // (codes in range / reconstruction MSE beats the global-mean
    // baseline) — the x_signature_stats value-asserting convention
    "x_pq_train" ->
      """SELECT count(*) AS n_train, TRUE AS codes_valid,
           TRUE AS mse_improves
         FROM embeddings WHERE embedding IS NOT NULL""",

    // pq pool + exact rescore must BE the exact per-query top-5
    "x_pq_knn_join" ->
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

    // the filtered top-k ranks over the RESTRICTED corpus
    "x_knn_filtered" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
         z AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS c
           FROM embeddings e, q WHERE e.label % 2 = 0),
         r AS (SELECT query_id, vec_id, c,
             row_number() OVER (PARTITION BY query_id
               ORDER BY c DESC, vec_id) AS rk
           FROM z)
         SELECT query_id, CAST(rk AS INT) AS rk, vec_id,
           round(c, 6) AS cosine
         FROM r WHERE rk <= 5 ORDER BY query_id, rk""",
  )
}
