package graft

/** Shared DuckDB-oracle builders referenced by several oracle rows (and,
  * for [[bpeApplyMerges]], by the BPE query bodies themselves).
  * (Moved verbatim from SparkEntry in the registry split.)
  */
private[graft] object OracleDefs {
  /** `q_dis_max` / `q_dis_max_indexed` oracle: two BM25 clauses scored
    * independently (each rounded 6dp like the engine's leg frames),
    * then max + 0.3·(sum − max), rounded again. One string, two gates —
    * the indexed form's contract IS scan-equality.
    */
  val disMaxOracle: String =
    """WITH t AS (SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS DOUBLE) AS dl,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'merge'))
               AS DOUBLE) AS tf0,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'window'))
               AS DOUBLE) AS tf1,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'scan'))
               AS DOUBLE) AS tf2,
             CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'stream'))
               AS DOUBLE) AS tf3
           FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
             CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
           FROM t),
         z AS (SELECT doc_id,
             round(ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
               AS c0,
             round(ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n - df3 + 0.5) / (df3 + 0.5))
               * (tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
               AS c1
           FROM t, s)
         SELECT doc_id, round(greatest(c0, c1)
             + 0.3 * (c0 + c1 - greatest(c0, c1)), 6) AS dismax
         FROM z WHERE c0 > 0 OR c1 > 0
         ORDER BY dismax DESC, doc_id LIMIT 20"""

  /** `x_sim_binary` oracle: the packed sign bits rebuilt as a 64-term
    * sum of disjoint CASE bit values (disjoint bits ⇒ addition ≡ OR,
    * incl. the sign bit as the MinValue literal), Hamming via DuckDB's
    * own xor + bit_count, rescoring with the established
    * list_cosine_similarity ≡ cosineFast 6dp convention.
    */
  def simBinaryOracle: String = {
    val bits = (0 until 64).map(i =>
      s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH sigs AS (SELECT vec_id, embedding, $bits AS sig
         FROM embeddings WHERE embedding IS NOT NULL),
       q AS (SELECT sig AS qsig, embedding AS qv FROM sigs WHERE vec_id = 0),
       h AS (SELECT vec_id, CAST(bit_count(xor(sig, qsig)) AS INT)
           AS hamming, embedding, qv
         FROM sigs, q),
       r AS (SELECT *, row_number() OVER (ORDER BY hamming, vec_id) AS hr
         FROM h)
       SELECT vec_id, hamming,
         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
           CAST(qv AS DOUBLE[])), 6) AS cosine
       FROM r WHERE hr <= 20
       ORDER BY cosine DESC, vec_id LIMIT 10"""
  }

  /** `x_embed_project` oracle: the SAME Achlioptas sign matrix the
    * operator derives (seed 7, 64 -> 16, md5-56 convention), unrolled
    * into explicit left-associated add/subtract chains so the double
    * summation ORDER matches the Spark expression term for term —
    * bit-identical up to the shared 6dp round.
    */
  /** `x_sim_mmr` oracle: the greedy MMR loop REPLAYED as unrolled SQL
    * stages — pick i is the score-argmax over candidates not yet in
    * sel(i−1), with the diversity penalty the max 6dp-rounded cosine
    * against the selected set; ties break on ascending id, exactly the
    * operator's contract. λ=0.75 so 1−λ is the same double here and in
    * the JVM.
    */
  def mmrOracle: String = {
    val stages = (2 to 5).map { i =>
      s"""pick$i AS (
         |  SELECT $i AS rk, c.cand_id, c.vec,
         |    round(0.75 * c.rel - 0.25 * (
         |      SELECT max(round(list_cosine_similarity(
         |        CAST(c.vec AS DOUBLE[]), CAST(s.vec AS DOUBLE[])), 6))
         |      FROM sel${i - 1} s), 6) AS score,
         |    c.rel
         |  FROM cand c
         |  WHERE c.cand_id NOT IN (SELECT cand_id FROM sel${i - 1})
         |  ORDER BY score DESC, c.cand_id LIMIT 1),
         |sel$i AS (SELECT * FROM sel${i - 1}
         |  UNION ALL SELECT rk, cand_id, vec, score, rel FROM pick$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT vec_id AS cand_id,
       |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
       |      CAST(qv AS DOUBLE[])), 6) AS rel,
       |    embedding AS vec
       |  FROM embeddings, q
       |  WHERE embedding IS NOT NULL
       |  ORDER BY rel DESC, cand_id LIMIT 20),
       |pick1 AS (
       |  SELECT 1 AS rk, cand_id, vec, round(0.75 * rel, 6) AS score, rel
       |  FROM cand ORDER BY score DESC, cand_id LIMIT 1),
       |sel1 AS (SELECT * FROM pick1),
       |$stages
       |SELECT rk, cand_id, score AS mmr_score FROM sel5 ORDER BY rk"""
      .stripMargin
  }

  def embedProjectOracle: String = {
    val signs = operators.Similarity.projectionSigns(7, 64, 16)
    val scale = math.sqrt(3.0 / 16)
    val comps = (0 until 16).map { j =>
      val terms = (0 until 64).flatMap { i =>
        signs(j)(i) match {
          case 1 => Some(s"CAST(embedding[${i + 1}] AS DOUBLE)")
          case -1 => Some(s"-CAST(embedding[${i + 1}] AS DOUBLE)")
          case _ => None
        }
      }
      val sum = if (terms.isEmpty) "0.0" else terms.mkString(" + ")
      s"round($scale * ($sum), 6)"
    }
    s"""WITH p AS (SELECT vec_id, [${comps.mkString(", ")}] AS proj
         FROM embeddings WHERE embedding IS NOT NULL)
       SELECT vec_id,
         CAST(generate_subscripts(proj, 1) - 1 AS INT) AS dim,
         unnest(proj) AS value
       FROM p ORDER BY vec_id, dim"""
  }

  /** Fixed merge table for `x_bpe_apply` — collision-free by
    * construction: every output (th, the, in, an, and, er, on, re) is a
    * new string, never equal to a part of an earlier merge, so applying
    * ranks in order can never re-create an already-processed pair and
    * the rank-order oracle matches the expression's fixpoint loop.
    */
  val bpeApplyMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"))

  /** `x_bpe_apply` oracle: one merge pass per rank, each pass one SQL
    * `replace` on the delimited symbol string (see [[bpeTrainOracle]]
    * for why replace IS the greedy merge-every-occurrence pass).
    * Words are chr(31)-delimited code points joined by chr(30), so no
    * replace pattern can span a word boundary; the final token list is
    * the chr(31) split minus empties and boundary markers.
    */
  def bpeApplyOracle: String = {
    val stages = bpeApplyMerges.zipWithIndex.map { case ((a, b), i) =>
      s"""d${i + 1} AS (SELECT doc_id,
         |  replace(s, chr(31) || '$a' || chr(31) || '$b' || chr(31),
         |             chr(31) || '$a$b' || chr(31)) AS s FROM d$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)),
       |      '\\s+'), x -> x <> '') AS ws
       |  FROM documents),
       |d0 AS (
       |  SELECT doc_id, array_to_string(list_transform(ws,
       |      w -> chr(31) || array_to_string(regexp_extract_all(w,
       |        '(?s).'), chr(31)) || chr(31)), chr(30)) AS s
       |  FROM t),
       |$stages,
       |tk AS (SELECT doc_id, list_filter(string_split(s, chr(31)),
       |    x -> x <> '' AND x <> chr(30)) AS tk
       |  FROM d${bpeApplyMerges.size})
       |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       |  array_to_string(tk, ' ') AS tok_str
       |FROM tk ORDER BY doc_id""".stripMargin
  }

  /** `x_bpe_train` oracle: BPE training with its 8-iteration argmax loop
    * UNROLLED into chained CTE stages (nMerges is a plan literal — the
    * same plan-time-unroll trick as `inPolygon`'s per-edge expressions).
    * Each word's symbol array is a chr(31)-delimited string, so the
    * greedy merge fold is ONE SQL `replace`: replace scans left-to-right
    * over non-overlapping occurrences and resumes AFTER each
    * replacement — exactly BPE's merge-every-occurrence pass, and the
    * outer separators in pattern and replacement keep symbol boundaries
    * intact across adjacent matches (`␟a␟a␟a␟` → `␟aa␟a␟`). chr(31)
    * never occurs in the corpus; a collision would fail the gate
    * loudly, not silently.
    */
  def bpeTrainOracle: String = {
    val stages = (1 to 8).map { k =>
      val p = k - 1
      s"""pairs$k AS (
         |  SELECT p[1] AS a, p[2] AS b, sum(n) AS wgt
         |  FROM (
         |    SELECT unnest([[sy[i], sy[i+1]]
         |        FOR i IN generate_series(1, len(sy)-1)]) AS p, n
         |    FROM (SELECT list_filter(string_split(s, chr(31)),
         |        x -> x <> '') AS sy, n FROM vocab$p)
         |    WHERE len(sy) >= 2)
         |  GROUP BY 1, 2),
         |m$k AS (SELECT a, b FROM pairs$k ORDER BY wgt DESC, a, b LIMIT 1),
         |vocab$k AS (
         |  SELECT replace(s, chr(31) || m.a || chr(31) || m.b || chr(31),
         |                    chr(31) || m.a || m.b || chr(31)) AS s, n
         |  FROM vocab$p, m$k m)""".stripMargin
    }.mkString(",\n")
    val union = (1 to 8)
      .map(k => s"SELECT $k AS rank, a, b FROM m$k")
      .mkString("\nUNION ALL ")
    s"""WITH toks AS (
       |  SELECT list_filter(regexp_split_to_array(trim(lower(text)),
       |      '\\s+'), x -> x <> '') AS ws
       |  FROM documents),
       |vocab0 AS (
       |  SELECT chr(31) || array_to_string(regexp_extract_all(w,
       |      '(?s).'), chr(31)) || chr(31) AS s, count(*) AS n
       |  FROM (SELECT unnest(ws) AS w FROM toks)
       |  GROUP BY 1),
       |$stages
       |SELECT * FROM ($union) ORDER BY rank""".stripMargin
  }

}
