package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query shapes the ingested documents must serve (SURVEY §2.6): the
  * reference's E2E tests assert match-all scan, term (point) lookup,
  * set-membership, full-text match, and field retrieval incl. multi-valued
  * fields. These are thin Column combinators over the searchable view —
  * Catalyst pushes the predicates into the scan.
  */
object DocQueries {

  /** Query-side tokenization shared by every match query: lowercase with
    * `Locale.ROOT` — the same fold [[graft.functions.TermFreqStats]] and
    * the document side use; the default-locale `toLowerCase` would
    * tokenize differently on e.g. a Turkish JVM — whitespace split,
    * empties dropped.
    */
  private[sink] def queryTokens(query: String): Seq[String] =
    query.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq

  /** One query term's BM25 contribution (Lucene `BM25Similarity`):
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))`. ONE definition shared by the
    * corpus-scan and inverted-index scorers (and mirrored by the SQL
    * oracles) — the spec-pinned scan ≡ indexed equality depends on the
    * formula living in exactly one place.
    */
  private[sink] def bm25Contrib(tf: Column, df: Column, n: Column,
      avgdl: Column, dl: Column, k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
    idf * (tf * (k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
  }

  /** MatchAllQuery — full scan. */
  def matchAll(index: DataFrame): DataFrame = index

  /** TermQuery — exact point lookup on an ATOM field. */
  def term(index: DataFrame, field: String, value: String): DataFrame =
    index.filter(col(field) === lit(value))

  /** TermInSetQuery — set membership (also the delete-predicate shape). */
  def termInSet(index: DataFrame, field: String, values: Seq[String]): DataFrame =
    index.filter(col(field).isin(values: _*))

  /** PrefixQuery — the document matches if any token of the field starts
    * with `prefix` (Lucene PrefixQuery over a tokenized field). Same
    * single-space tokenization convention; pure projection + filter.
    * The index-served twin is [[InvertedIndex.prefixSearch]], where the
    * prefix becomes a pushed `StringStartsWith` on the term-sorted
    * layout.
    */
  def termPrefix(index: DataFrame, field: String, prefix: String): DataFrame = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    require(p.nonEmpty, "prefix query needs a non-empty prefix")
    // an empty token can't start with a non-empty prefix — no filter needed
    index.filter(exists(split(lower(col(field)), " "), t => t.startsWith(p)))
  }

  /** Lucene glob → anchored Java/RE2-portable regexp: `*` → `.*`, `?` →
    * `.`, every other char matched literally (regex metacharacters
    * escaped one-by-one — the portable subset; no `\Q...\E`, which RE2
    * engines running the oracle side don't support).
    */
  private[sink] def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** WildcardQuery — glob over whole tokens (`*` any run, `?` one char,
    * all else literal; Lucene WildcardQuery semantics). The glob
    * compiles to ONE anchored regexp evaluated per token — a codegen'd
    * projection, no UDF. Index-served twin:
    * [[InvertedIndex.wildcardSearch]], where the glob's literal prefix
    * prunes the term-sorted postings before the regexp runs.
    */
  def matchWildcard(index: DataFrame, field: String, pattern: String): DataFrame = {
    val p = pattern.toLowerCase(java.util.Locale.ROOT)
    require(p.exists(c => c != '*' && c != '?'),
      "wildcard query needs at least one literal character")
    val re = globToRegex(p)
    index.filter(exists(split(lower(col(field)), " "), t => t.rlike(re)))
  }

  /** RegexpQuery — the document matches if any token matches the regexp
    * in FULL (Lucene RegexpQuery anchors the automaton at both ends; the
    * explicit `^(?:…)$` here reproduces that). Keep patterns to the
    * RE2-portable subset — the same expression must be evaluable by any
    * engine auditing the corpus.
    */
  def matchRegexp(index: DataFrame, field: String, regex: String): DataFrame = {
    require(regex.nonEmpty, "regexp query needs a non-empty pattern")
    val re = s"^(?:$regex)$$"
    index.filter(exists(split(lower(col(field)), " "), t => t.rlike(re)))
  }

  /** FuzzyQuery — the document matches if any token is within `maxEdits`
    * Levenshtein distance of the query term (Lucene FuzzyQuery). The
    * scan form evaluates the distance per token; the index-served twin
    * ([[InvertedIndex.fuzzySearch]]) evaluates it over the VOCABULARY
    * instead — Lucene's term-dictionary automaton expressed as a
    * vocabulary-sized scan.
    */
  def matchFuzzy(index: DataFrame, field: String, term: String,
      maxEdits: Int = 1): DataFrame = {
    val q = term.toLowerCase(java.util.Locale.ROOT)
    require(q.nonEmpty, "fuzzy query needs a non-empty term")
    index.filter(exists(split(lower(col(field)), " "),
      t => t =!= lit("") && levenshtein(t, lit(q)) <= maxEdits))
  }

  /** MatchQuery — whitespace-tokenized full-text match: document matches if
    * any token of the field equals any query token (OR semantics, the
    * Lucene MatchQuery default).
    */
  def matchText(index: DataFrame, field: String, query: String): DataFrame = {
    val qTokens = queryTokens(query)
    // single-space split: the ONE corpus tokenization convention shared
    // with TermFreqStats, InvertedIndex.postings, and the SQL oracles —
    // a \s+ split here would match tokens BM25/postings score as tf=0
    val fieldTokens = split(lower(col(field)), " ")
    index.filter(
      arrays_overlap(fieldTokens, array(qTokens.map(lit): _*)))
  }

  /** BooleanQuery with MUST clauses — the document matches only if EVERY
    * query token appears in the field (Lucene's conjunctive form; the OR
    * default is [[matchText]]). Same single-space tokenization
    * convention; pure projection + filter, no shuffle.
    */
  def matchAllTerms(index: DataFrame, field: String, query: String): DataFrame = {
    val qTokens = queryTokens(query)
    require(qTokens.nonEmpty, "conjunctive match needs a non-empty query")
    val fieldTokens = split(lower(col(field)), " ")
    index.filter(qTokens
      .map(t => array_contains(fieldTokens, t))
      .reduce(_ && _))
  }

  /** Normalized clause sets + effective minimum-should-match, shared by
    * the scan-form [[boolQuery]] and the index-served
    * [[InvertedIndex.boolSearch]] — the spec-pinned scan ≡ indexed
    * equality depends on ONE definition of the clause semantics. Clause
    * terms are folded with the corpus tokenization convention
    * (`Locale.ROOT` lowercase) and deduplicated (a clause repeated twice
    * is one clause, as in Lucene's clause set). The Lucene default for
    * `minimumShouldMatch` is applied here: with no MUST clauses a
    * document must still match at least one SHOULD clause (otherwise the
    * query would match the whole corpus), so the effective msm is
    * clamped to ≥1 when MUST is empty; with MUST clauses present the
    * default is 0 (SHOULD only boosts, membership comes from MUST).
    */
  private[sink] def boolClauses(must: Seq[String], should: Seq[String],
      mustNot: Seq[String], minimumShouldMatch: Int)
      : (Seq[String], Seq[String], Seq[String], Int) = {
    def norm(ts: Seq[String]): Seq[String] =
      ts.map(_.toLowerCase(java.util.Locale.ROOT).trim).filter(_.nonEmpty).distinct
    val (m, sh, mn) = (norm(must), norm(should), norm(mustNot))
    require(m.nonEmpty || sh.nonEmpty,
      "boolean query needs at least one MUST or SHOULD clause " +
        "(a pure MUST_NOT query has no matching set)")
    val msm = if (minimumShouldMatch >= 0) minimumShouldMatch
      else if (m.isEmpty) 1 else 0
    val effective = if (m.isEmpty) math.max(msm, 1) else msm
    (m, sh, mn, effective)
  }

  /** BooleanQuery — Lucene's full clause composition: every MUST term
    * required, every MUST_NOT term forbidden, and at least
    * `minimumShouldMatch` of the SHOULD terms present (default: Lucene's
    * — 1 when there are no MUST clauses, else 0; see [[boolClauses]]).
    * `minimumShouldMatch > |should|` matches nothing, as in Lucene.
    * Pure projection + filter over the corpus tokenization convention —
    * no shuffle; the index-served twin is [[InvertedIndex.boolSearch]].
    */
  def boolQuery(index: DataFrame, field: String,
      must: Seq[String] = Nil, should: Seq[String] = Nil,
      mustNot: Seq[String] = Nil, minimumShouldMatch: Int = -1): DataFrame = {
    val (m, sh, mn, msm) = boolClauses(must, should, mustNot, minimumShouldMatch)
    val w = split(lower(col(field)), " ")
    val preds =
      m.map(t => array_contains(w, t)) ++
        mn.map(t => !array_contains(w, t)) ++
        (if (sh.isEmpty || msm == 0) Nil
         else Seq(sh.map(t => when(array_contains(w, t), 1).otherwise(0))
           .reduce(_ + _) >= msm))
    index.filter(preds.reduce(_ && _))
  }

  /** PhraseQuery — the query tokens must appear CONSECUTIVELY in the
    * field (Lucene PhraseQuery, slop 0). Token-boundary-safe via the
    * space-padding trick: pad both the tokenized-and-rejoined field and
    * the phrase with spaces, then substring-match — "merge window" must
    * not match inside "submerge windows". Tokenization is the shared
    * corpus convention (single-space split, empties dropped — same as
    * BM25/postings), so phrase matches and term scores always agree on
    * what a token is. Pure projection + filter, no shuffle.
    */
  def matchPhrase(index: DataFrame, field: String, phrase: String): DataFrame = {
    val qTokens = queryTokens(phrase)
    require(qTokens.nonEmpty, "phrase match needs a non-empty phrase")
    val normalized = concat(lit(" "),
      array_join(filter(split(lower(col(field)), " "), t => t =!= lit("")), " "),
      lit(" "))
    index.filter(normalized.contains(" " + qTokens.mkString(" ") + " "))
  }

  /** MatchPhrasePrefix (Elasticsearch's `match_phrase_prefix` /
    * autocomplete-as-you-type): all tokens but the last must appear
    * CONSECUTIVELY, and the last query token PREFIX-matches the next
    * token — "merge wind" hits "merge window". Same space-padding trick
    * as [[matchPhrase]], with the trailing pad dropped so the final
    * token may continue: a leading space before the last fragment
    * guarantees it starts a token. Pure projection + filter, no
    * shuffle; a single-token query degrades to term-prefix.
    */
  def matchPhrasePrefix(index: DataFrame, field: String,
      phrase: String): DataFrame = {
    val qTokens = queryTokens(phrase)
    require(qTokens.nonEmpty, "phrase-prefix match needs a non-empty phrase")
    val normalized = concat(lit(" "),
      array_join(filter(split(lower(col(field)), " "), t => t =!= lit("")), " "),
      lit(" "))
    index.filter(normalized.contains(" " + qTokens.mkString(" ")))
  }

  /** Snippet highlighting (Lucene's highlighter, deterministic core):
    * for documents containing `term`, the 1-based token position of its
    * FIRST occurrence and a snippet of ±`context` tokens around it —
    * what a search UI shows under each hit. Tokenization is the shared
    * corpus convention; clamping at the document edges keeps the snippet
    * inside the token stream. Pure projection + filter, no shuffle.
    */
  def highlightTerm(index: DataFrame, idCol: String, field: String,
      term: String, context: Int = 2): DataFrame = {
    val t = term.toLowerCase(java.util.Locale.ROOT)
    require(t.nonEmpty && !t.contains(' '),
      s"highlight needs a single non-empty term, got '$term'")
    require(context >= 0, s"context must be non-negative, got $context")
    val w = filter(split(lower(col(field)), " "), x => x =!= lit(""))
    val start = greatest(lit(1L), col("pos") - context)
    val len = least(size(col("_w")).cast("long"), col("pos") + context) -
      start + 1
    index.select(col(idCol), w.as("_w"),
        array_position(w, t).as("pos"))
      .filter(col("pos") > 0)
      .select(col(idCol), col("pos"),
        array_join(slice(col("_w"), start.cast("int"), len.cast("int")), " ")
          .as("snippet"))
  }

  /** Percolation ("reverse search" — Elasticsearch's percolator /
    * Lucene Monitor): REGISTERED queries are data, and each incoming
    * document returns the queries it matches — the alerting/routing
    * shape. A registered query is `(query_id, must, must_not)` plus
    * optional `should` / `minimum_should_match` columns: all `must`
    * terms required, no `must_not` term present, and at least msm of
    * the `should` terms present — with [[boolClauses]]' Lucene defaults
    * (msm −1 ⇒ 1 when there are no MUST clauses, else 0; a MUST-less
    * query's msm saturates up to 1). Clause SETS — duplicates collapse.
    * A query with NEITHER must NOR should clauses fails LOUDLY (a
    * driver-side fail-fast over the small queries side) rather than
    * silently diverging between a match-nothing engine and a
    * match-everything oracle.
    *
    * The relational inversion that makes this scale: queries × docs is
    * never a cross product. Each query's MUST and SHOULD clauses explode
    * once (queries-table-sized), join the docs' distinct (doc, term)
    * pairs ON TERM, and a (doc, query) pair survives when its matched
    * MUST count equals the query's clause count AND its matched SHOULD
    * count reaches msm; MUST_NOT hits leave by left_anti. Every
    * surviving pair shares ≥1 term with its query (msm ≥ 1 whenever
    * must is empty), so the term-keyed join loses nothing. Every stage
    * is map-side combinable — a million registered alerts against a
    * firehose is joins and counts, not a per-doc query loop.
    */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame): DataFrame = {
    val required = Seq("query_id", "must", "must_not")
    required.foreach(c => require(queries.columns.contains(c),
      s"queries must have columns $required, got ${queries.columns.toSeq}"))
    val shCol = if (queries.columns.contains("should")) col("should")
      else array().cast("array<string>")
    val msmCol = if (queries.columns.contains("minimum_should_match"))
      col("minimum_should_match").cast("int") else lit(-1)
    val docTerms = docs.select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    // Empty-clause check, DRIVER-side: queries are the small side by
    // design (registered alerts, not the firehose), so one filter +
    // limit(1) job fails fast — no reliance on the optimizer continuing
    // to evaluate an always-true assert_true Filter for every row (a
    // future rule pruning that Filter would silently re-open the
    // engine-matches-nothing vs oracle-matches-everything divergence).
    val invalid = queries.select(col("query_id"),
        (size(array_distinct(col("must"))) +
          size(array_distinct(coalesce(shCol,
            array().cast("array<string>"))))).as("_nc"))
      .filter(col("_nc") <= 0).limit(1).collect()
    invalid.headOption.foreach(r => throw new IllegalArgumentException(
      s"percolate: query '${r.get(0)}' has no MUST or SHOULD clauses"))
    val qMeta = queries.select(col("query_id"),
        array_distinct(col("must")).as("_m"),
        array_distinct(coalesce(shCol, array().cast("array<string>")))
          .as("_sh"), msmCol.as("_msm0"))
      .select(col("query_id"), col("_m"), col("_sh"),
        size(col("_m")).as("_n_must"),
        when(col("_msm0") >= 0, col("_msm0"))
          .otherwise(when(size(col("_m")) === 0, 1).otherwise(0))
          .as("_msm1"))
      .withColumn("_msm", when(size(col("_m")) === 0,
        greatest(col("_msm1"), lit(1))).otherwise(col("_msm1")))
    val qClauses =
      qMeta.select(col("query_id"), col("_n_must"), col("_msm"),
          explode(col("_m")).as("term"), lit(1).as("_is_must"))
        .union(qMeta.select(col("query_id"), col("_n_must"), col("_msm"),
          explode(col("_sh")).as("term"), lit(0).as("_is_must")))
    val matched = docTerms.join(qClauses, "term")
      .groupBy(col(idCol), col("query_id"), col("_n_must"), col("_msm"))
      .agg(sum(col("_is_must")).as("_mh"),
        sum(lit(1) - col("_is_must")).as("_shh"))
      .filter(col("_mh") === col("_n_must") && col("_shh") >= col("_msm"))
      .select(col(idCol), col("query_id"))
    val notHits = docTerms.join(
      queries.select(col("query_id"),
        explode(array_distinct(col("must_not"))).as("term")), "term")
      .select(col(idCol), col("query_id")).distinct()
    matched.join(notHits, Seq(idCol, "query_id"), "left_anti")
  }

  /** Field collapsing (Lucene CollapsingTopDocsCollector / the search
    * "collapse" feature): ONE representative document per group — the
    * group's best by `(score desc, id asc)` — then the top `k` groups
    * ranked by their representative's score. Input is any scored frame
    * (e.g. [[matchTextRanked]] / BM25 output joined back to its group
    * column); output `(groupCol, idCol, scoreCol)`.
    *
    * The per-group best is a lexicographic `min(struct(-score, id))`
    * HASH aggregate — the `Dedup.keepBestPerCluster` discipline: a group
    * with a million hits costs one row per partition in the shuffle,
    * where the window-rank formulation would funnel every hit through
    * one task. Top-k plans as TakeOrderedAndProject.
    */
  def collapseTop(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    scored.groupBy(col(groupCol))
      .agg(min(struct((col(scoreCol) * -1).as("_ns"),
        col(idCol).as("_id"))).as("_b"))
      .select(col(groupCol), (col("_b._ns") * -1).as(scoreCol),
        col("_b._id").as(idCol))
      .orderBy(col(scoreCol).desc, col(groupCol))
      .limit(k)
      .select(groupCol, idCol, scoreCol)
  }

  /** Field retrieval — projection of requested fields. */
  def retrieve(index: DataFrame, fields: Seq[String]): DataFrame =
    index.select(fields.map(col): _*)

  /** BM25-ranked MatchQuery — Lucene's default `BM25Similarity` scoring
    * (k1/b are its defaults): per-term
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))`, summed over the query terms in
    * a FIXED order so scores are engine-reproducible.
    *
    * At scale: tokenization + per-term tf is one projection; the corpus
    * stats (N, avgdl, per-term df — all exact integer sums, so partial-
    * aggregation order cannot perturb them) are ONE tiny aggregate row
    * broadcast back to the scorers; top-k is TakeOrderedAndProject. No
    * shuffle ever carries more than the stats row.
    */
  def matchTextBM25(index: DataFrame, idCol: String, field: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(index, idCol, field, query, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)

  /** Score explanation (the ES `_explain` API shape): the BM25 top-k
    * with PER-TERM contribution columns (`c_<term>`, 6dp each) riding
    * the same scoring projection — "which term carried this hit"
    * relevance debugging with NO second scoring pass: the contributions
    * are the very expressions the total folds over (so `bm25` equals
    * their unrounded sum, rounded once — legs round independently).
    */
  def explainBm25(index: DataFrame, idCol: String, field: String,
      query: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val qTokens = queryTokens(query).distinct
    require(qTokens.nonEmpty, "BM25 explain needs a non-empty query")
    val stats0 = graft.functions.TextExpressions.termFreqStats(col(field), qTokens)
    val perDoc: Seq[Column] =
      col("_s.dl").cast("double").as("_dl") +:
        qTokens.indices.map(i =>
          element_at(col("_s.tf"), i + 1).cast("double").as(s"_tf$i"))
    val base = index.select(col(idCol), stats0.as("_s"))
      .select(col(idCol) +: perDoc: _*)
    val aggCols: Seq[Column] =
      count(lit(1)).cast("double").as("_n") +:
        avg(col("_dl")).as("_avgdl") +:
        qTokens.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1).otherwise(0)).cast("double")
            .as(s"_df$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    def contrib(i: Int) = bm25Contrib(col(s"_tf$i"), col(s"_df$i"),
      col("_n"), col("_avgdl"), col("_dl"), k1, b)
    val total = qTokens.indices.map(contrib).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .filter(total > 0)
      .select(col(idCol) +:
        qTokens.indices.map(i =>
          round(contrib(i), 6).as(s"c_${qTokens(i)}")) :+
        round(total, 6).as("bm25"): _*)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** All positive BM25 scores for `query` — the un-limited body shared
    * by [[matchTextBM25]] (top-k), [[searchAfter]] (cursor page) and
    * [[functionScoreGauss]] (which threads `extraCols` through so the
    * decay field survives the scoring projection).
    */
  private def bm25Scores(index: DataFrame, idCol: String, field: String,
      query: String, k1: Double, b: Double,
      extraCols: Seq[String] = Nil): DataFrame = {
    val qTokens = queryTokens(query).distinct
    require(qTokens.nonEmpty, "BM25 needs a non-empty query")
    // ONE tokenization pass per row ([[graft.functions.TermFreqStats]];
    // the composed `size(filter(split(...)))` form re-split the document
    // once per derived column, interpreted). The two-step projection keeps
    // CollapseProject from re-inlining the non-cheap stats expression.
    val stats0 = graft.functions.TextExpressions.termFreqStats(col(field), qTokens)
    val perDoc: Seq[Column] =
      col("_s.dl").cast("double").as("_dl") +:
        qTokens.indices.map(i =>
          element_at(col("_s.tf"), i + 1).cast("double").as(s"_tf$i"))
    val keep = col(idCol) +: extraCols.map(col)
    val base = index.select(keep :+ stats0.as("_s"): _*)
      .select(keep ++ perDoc: _*)
    val aggCols: Seq[Column] =
      count(lit(1)).cast("double").as("_n") +:
        avg(col("_dl")).as("_avgdl") +:
        qTokens.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1).otherwise(0)).cast("double").as(s"_df$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val score = qTokens.indices.map(i =>
      bm25Contrib(col(s"_tf$i"), col(s"_df$i"), col("_n"),
        col("_avgdl"), col("_dl"), k1, b)).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(keep :+ score.as("_score"): _*)
      .filter(col("_score") > 0)
      .select(keep :+ round(col("_score"), 6).as("bm25"): _*)
  }

  /** FunctionScoreQuery with a Gaussian decay (the Lucene/ES
    * `function_score` + `gauss` shape): relevance × a distance decay on
    * a numeric document field — "relevant AND recent/short/near". The
    * multiplier is `exp(−max(0, |v−origin|−offset)² / (2σ²))` with
    * `σ² = −scale² / (2 ln decay)`, ES's calibration: the factor is
    * exactly `decay` at distance `scale` beyond the `offset` plateau.
    *
    * Determinism contract: the BM25 leg is rounded 6dp first (the same
    * leg-frame convention as [[disMaxSearch]]), then the product is
    * rounded 6dp — both mirrored by the oracle. At scale this adds ONE
    * codegen'd projection to the BM25 plan: no extra shuffle, no join
    * (the decay field rides the scoring projection).
    */
  def functionScoreGauss(index: DataFrame, idCol: String, field: String,
      query: String, valueCol: String, origin: Double, scale: Double,
      offset: Double, decay: Double, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(decay > 0 && decay < 1, s"decay must be in (0, 1), got $decay")
    require(offset >= 0, s"offset must be non-negative, got $offset")
    val sigma2 = -scale * scale / (2.0 * math.log(decay))
    val dist = greatest(lit(0.0),
      abs(col(valueCol).cast("double") - lit(origin)) - lit(offset))
    bm25Scores(index, idCol, field, query, k1, b, Seq(valueCol))
      .select(col(idCol),
        round(col("bm25") * exp(-(dist * dist) / lit(2.0 * sigma2)), 6)
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BoostingQuery (Lucene): rank by the positive query's BM25 score,
    * DEMOTED by `demoteFactor` when any negative term matches — unlike
    * `must_not`, a negative match downranks instead of excluding (the
    * "penalize reprints/stubs without hiding them" scorer). Choose a
    * demote factor with an exact binary representation (0.5, 0.25) for
    * engine-reproducible scores. Scale shape: the positive leg is the
    * shared BM25 body (hits only); the negative test is one projection
    * over the same index joined id-keyed to the hits — never a second
    * corpus pass.
    */
  def boostingSearch(index: DataFrame, idCol: String, field: String,
      positive: String, negative: Seq[String], demoteFactor: Double,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(negative.nonEmpty, "boosting query needs negative terms")
    require(demoteFactor >= 0.0 && demoteFactor <= 1.0,
      s"demoteFactor must be in [0, 1], got $demoteFactor")
    require(k > 0, s"k must be positive, got $k")
    val negTerms = negative.map(_.toLowerCase(java.util.Locale.ROOT).trim)
      .filter(_.nonEmpty)
    require(negTerms.nonEmpty, "boosting query needs non-empty negative terms")
    val w = split(lower(col(field)), " ")
    val negPred = negTerms.map(t => array_contains(w, t)).reduce(_ || _)
    index.select(col(idCol), negPred.as("_neg"))
      .join(bm25Scores(index, idCol, field, positive, k1, b), idCol)
      .select(col(idCol),
        round(when(col("_neg"), col("bm25") * demoteFactor)
          .otherwise(col("bm25")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** DisjunctionMaxQuery (Lucene DisMax): per-doc score =
    * `max(clause scores) + tieBreaker · (sum − max)`, each clause an
    * independent BM25 text query. The max picks the best clause
    * (field/phrasing) while the tie-breaker rewards multi-clause
    * agreement without letting coordinate overlap dominate — the
    * classic multi-field search scorer. Docs matching ANY clause rank.
    *
    * Scale shape: one BM25 pass per clause (each a pushed term-set
    * scan), then id-keyed full-outer joins over the handful of clause
    * frames — positive-score rows only, so the joins carry hits, not
    * the corpus. Leg scores are 6dp-rounded before combining and the
    * final score 6dp-rounded before ranking (engine-reproducible cut).
    */
  def disMaxSearch(index: DataFrame, idCol: String, field: String,
      clauses: Seq[String], tieBreaker: Double, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(clauses.nonEmpty, "disMax needs at least one clause")
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tieBreaker must be in [0, 1], got $tieBreaker")
    require(k > 0, s"k must be positive, got $k")
    val legs = clauses.zipWithIndex.map { case (q, i) =>
      bm25Scores(index, idCol, field, q, k1, b)
        .select(col(idCol), col("bm25").as(s"_c$i"))
    }
    val joined = legs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val cs = clauses.indices.map(i => coalesce(col(s"_c$i"), lit(0.0)))
    val mx = cs.reduce(greatest(_, _))
    val sm = cs.reduce(_ + _)
    joined.select(col(idCol),
        round(mx + lit(tieBreaker) * (sm - mx), 6).as("dismax"))
      .orderBy(col("dismax").desc, col(idCol))
      .limit(k)
  }

  /** Cursor pagination (Lucene `searchAfter`): the next `k` BM25 hits
    * STRICTLY after the cursor `(afterScore, afterId)` in the ranking's
    * total order `(bm25 desc, id asc)`. Stateless — the cursor is the
    * last hit of the previous page, so deep paging never materializes
    * or re-skips earlier pages (the offset-pagination scale trap: OFFSET
    * n still SORTS n + k rows; a cursor keeps every page a top-k).
    */
  def searchAfter(index: DataFrame, idCol: String, field: String,
      query: String, afterScore: Double, afterId: Long, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(index, idCol, field, query, k1, b)
      .filter(col("bm25") < afterScore ||
        (col("bm25") === afterScore && col(idCol) > afterId))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)

  /** CompositeAggregation (ES composite agg): one `size`-bucket PAGE of
    * the `groupCols` bucket space with `aggs` per bucket, in bucket-key
    * order, strictly after the `afterKey` cursor (`None` = first page;
    * the cursor is the last bucket key of the previous page, one value
    * per group column). The aggs twin of [[searchAfter]]: the after-key
    * filter is a lexicographic predicate on the GROUPED frame, so no
    * page materializes the full bucket space anywhere and the page cut
    * is TakeOrderedAndProject over bucket-count rows, never doc-count —
    * deep bucket paging at 100 TB costs one hash agg + top-`size` per
    * page. Concatenating pages until one comes back short reassembles
    * the exact bucket space (spec-pinned).
    */
  def compositeAfter(docs: DataFrame, groupCols: Seq[String],
      aggs: Seq[Column], afterKey: Option[Seq[Any]], size: Int): DataFrame = {
    require(groupCols.nonEmpty, "compositeAfter needs at least one group column")
    require(aggs.nonEmpty, "compositeAfter needs at least one aggregate")
    require(size > 0, s"size must be positive, got $size")
    afterKey.foreach(k => require(k.size == groupCols.size,
      s"afterKey must carry one value per group column " +
        s"(${groupCols.size}), got ${k.size}"))
    val grouped = docs
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // strict lexicographic "key > afterKey": key_i wins on the first
    // column that differs — (k1 > a1) OR (k1 = a1 AND k2 > a2) OR …
    val paged = afterKey.fold(grouped) { ak =>
      val pred = groupCols.zip(ak).zipWithIndex.map { case ((g, a), i) =>
        groupCols.take(i).zip(ak.take(i))
          .map { case (pg, pa) => col(pg) === lit(pa) }
          .foldLeft(col(g) > lit(a))((acc, eq) => eq && acc)
      }.reduce(_ || _)
      grouped.filter(pred)
    }
    paged.orderBy(groupCols.map(col): _*).limit(size)
  }

  /** RangeQuery (Lucene Point/TermRangeQuery): field within the given
    * bounds, either side optional, inclusivity per side. Pure pushed
    * predicate — on a persisted layout this prunes at row-group min/max
    * before it ever evaluates per row.
    */
  def range(index: DataFrame, field: String,
      lower: Option[Any] = None, upper: Option[Any] = None,
      includeLower: Boolean = true, includeUpper: Boolean = true): DataFrame = {
    require(lower.nonEmpty || upper.nonEmpty,
      "range query needs at least one bound")
    val lo = lower.map(v =>
      if (includeLower) col(field) >= lit(v) else col(field) > lit(v))
    val hi = upper.map(v =>
      if (includeUpper) col(field) <= lit(v) else col(field) < lit(v))
    index.filter((lo.toSeq ++ hi.toSeq).reduce(_ && _))
  }

  /** Facet counts (Lucene facets): per-value document counts of
    * `facetField` over an already-filtered result set, top-`k` by
    * `(count desc, value asc)`. One map-side-combinable aggregate +
    * TakeOrderedAndProject — never materializes the full result list.
    */
  def facetCounts(matching: DataFrame, facetField: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    matching.groupBy(col(facetField))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col(facetField))
      .limit(k)
  }

  /** More-like-this (Lucene's MoreLikeThis): the source document's most
    * characteristic terms — top `topTerms` by TF-IDF against the corpus,
    * ranked by `(round(score, 6) desc, term)` so the selection boundary
    * is engine-reproducible — become an OR query, BM25-ranked over the
    * FULL corpus stats (the source doc stays in N/avgdl/df, as Lucene
    * scores it), with the source itself excluded from the results.
    *
    * Scale shape: the source's term vector is one filtered aggregate;
    * document frequencies are the vocabulary-sized dictionary (term-keyed
    * join, never broadcast); the selected query — at most `topTerms`
    * strings — is the ONLY driver-side state (the k-centroids pattern);
    * scoring reuses [[InvertedIndex.bm25Search]], which reads only the
    * query terms' postings on a persisted index.
    */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      sourceId: Long, topTerms: Int = 5, k: Int = 10): DataFrame = {
    require(topTerms > 0, s"topTerms must be positive, got $topTerms")
    require(k > 0, s"k must be positive, got $k")
    val toks = docs.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
        .as("term"))
    val tf = toks.filter(col(idCol) === sourceId)
      .groupBy("term").agg(count(lit(1)).as("_tf"))
    val dfreq = toks.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("_df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val terms = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col("term"),
        round(col("_tf") * log(col("_n").cast("double") / col("_df")), 6)
          .as("_s"))
      .orderBy(col("_s").desc, col("term")).limit(topTerms)
      .select("term").collect().map(_.getString(0)).toSeq
    require(terms.nonEmpty,
      s"moreLikeThis: source doc $sourceId has no tokens (or does not exist)")
    InvertedIndex.bm25Search(
        InvertedIndex.postings(docs, idCol, textCol),
        InvertedIndex.docLengths(docs, idCol, textCol),
        terms.mkString(" "), k + 1)
      .filter(col("doc_id") =!= sourceId)
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** Ranked MatchQuery: term-frequency score over the query tokens
    * (the deterministic core of Lucene's ranking — integer tf, so results
    * are engine-exact; idf/norms are corpus-dependent refinements).
    */
  def matchTextRanked(index: DataFrame, field: String, query: String,
      k: Int): DataFrame = {
    val qTokens = queryTokens(query)
    // empty query → empty result (same contract as matchText), not a
    // reduce-on-empty crash
    val scored =
      if (qTokens.isEmpty) index.withColumn("score", lit(0))
      else {
        // one tokenization pass (TermFreqStats), duplicated query tokens
        // still count double via the index mapping
        val distinctToks = qTokens.distinct
        val score = qTokens.map(t =>
          element_at(col("_s.tf"), distinctToks.indexOf(t) + 1))
          .reduce(_ + _)
        index
          .withColumn("_s",
            graft.functions.TextExpressions.termFreqStats(col(field), distinctToks))
          .withColumn("score", score)
          .drop("_s")
      }
    scored.filter(col("score") > 0)
      .orderBy(col("score").desc, col(index.columns.head))
      .limit(k)
  }

  /** CombinedFieldsQuery (ES `combined_fields`): term-centric scoring
    * that treats several same-analyzer fields as ONE synthetic field —
    * per ES's documented model, a field with weight w contributes as if
    * its text were repeated w times: combined
    * `tf(t) = Σ_f w_f·tf_f(t)`, combined length `dl = Σ_f w_f·dl_f`,
    * and BM25 runs over THOSE (one df/avgdl over the combined view).
    * This is the pre-field-centric alternative to
    * [[multiMatch]]'s best_fields/most_fields: a term matching in any
    * field feeds one score, so idf saturation is shared. Integer
    * weights keep every combined tf/dl an exact integer in double —
    * corpus stats are then exact sums and the score is
    * engine-reproducible up to the shared 6dp round, term accumulation
    * in fixed query order.
    *
    * Scale shape: one [[graft.functions.TermFreqStats]] pass per field
    * (projection), ONE tiny stats row broadcast back, and a
    * TakeOrderedAndProject cut — the matchTextBM25 plan with a wider
    * projection, no extra shuffle.
    */
  def combinedFields(index: DataFrame, idCol: String,
      fields: Seq[(String, Double)], query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fields.nonEmpty, "combined_fields needs at least one field")
    require(fields.forall(_._2 >= 1.0),
      s"combined_fields weights must be >= 1 (ES constraint), got $fields")
    val qTokens = queryTokens(query).distinct
    require(qTokens.nonEmpty, "combined_fields needs a non-empty query")
    val base0 = fields.foldLeft(index) { case (df, (f, _)) =>
      df.withColumn(s"_cf_$f",
        graft.functions.TextExpressions.termFreqStats(col(f), qTokens))
    }
    val dl = fields.map { case (f, w) =>
      col(s"_cf_$f").getField("dl").cast("double") * lit(w) }.reduce(_ + _)
    def tfC(i: Int): Column = fields.map { case (f, w) =>
      element_at(col(s"_cf_$f").getField("tf"), i + 1).cast("double") *
        lit(w) }.reduce(_ + _)
    val base = base0.select(col(idCol) +: dl.as("_dl") +:
      qTokens.indices.map(i => tfC(i).as(s"_tf$i")): _*)
    val aggCols: Seq[Column] =
      count(lit(1)).cast("double").as("_n") +:
        avg(col("_dl")).as("_avgdl") +:
        qTokens.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1).otherwise(0)).cast("double")
            .as(s"_df$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val total = qTokens.indices.map(i =>
      bm25Contrib(col(s"_tf$i"), col(s"_df$i"), col("_n"), col("_avgdl"),
        col("_dl"), k1, b)).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .filter(total > 0)
      .select(col(idCol), round(total, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** TermsLookup query (the ES `terms` lookup form): the membership
    * set is not written in the query — it is read from ONE stored
    * document's field (`GET index/id` → `path`), then the terms filter
    * runs with those values. "Docs sharing this doc's language/tags."
    * ES fetches the lookup doc with a client-side GET; Spark-first the
    * fetch is an id-pruned one-row frame (the id predicate pushes to
    * the scan) and the membership test a broadcast left-semi join — no
    * driver round-trip, and the build side is one row regardless of
    * corpus size.
    */
  def termsLookup(index: DataFrame, idCol: String, lookupId: Long,
      pathCol: String, field: String): DataFrame = {
    val lk = index.filter(col(idCol) === lookupId)
      .select(col(pathCol).as("_lk")).limit(1)
    index.join(broadcast(lk), col(field) === col("_lk"), "left_semi")
  }

  /** `function_score` with `random_score` (ES): a deterministic
    * per-document pseudo-random score in [0, 1) derived from
    * (seed, id) — reproducible shuffling for sampled serving / A-B
    * bucketing, NOT an RNG: the same (seed, id) scores identically on
    * any engine, executor, or retry. Hash family is the corpus-wide
    * md5-56 sampling convention ([[graft.operators.Corpus.sampleHash]]),
    * reduced mod 10^6 and scaled — integer-exact before one shared
    * division. Matching docs ([[matchText]] recall) ranked by
    * (score desc, id), top `k` via TakeOrderedAndProject; pure
    * projection otherwise.
    */
  def randomScoreQuery(index: DataFrame, idCol: String, field: String,
      query: String, seed: Int, k: Int): DataFrame =
    matchText(index, field, query)
      .select(col(idCol), round(
        (graft.operators.Corpus.sampleHash(
          concat_ws(":", lit(seed), col(idCol))) % 1000000L)
          .cast("double") / 1000000.0, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** MultiMatchQuery (ES `multi_match`): ONE analyzed query scored
    * against several fields with per-field boosts — `best_fields`
    * takes the max boosted per-field score (the dis_max "single best
    * field wins" semantics), `most_fields` sums them ("every matching
    * field adds evidence"). Per-field scores are [[matchTextRanked]]'s
    * integer term frequencies × exact double boosts, so combined
    * scores are engine-exact without rounding. Returns the input
    * columns plus `score` for docs with score > 0, ranked
    * (score desc, first column), top `k`.
    *
    * Scale shape: one [[graft.functions.TermFreqStats]] pass per
    * field (pure projection), a greatest/sum combine, and a
    * TakeOrderedAndProject cut — no shuffle before the top-k merge.
    */
  def multiMatch(index: DataFrame, fields: Seq[(String, Double)],
      query: String, mode: String, k: Int): DataFrame = {
    require(fields.nonEmpty, "multi_match needs at least one field")
    require(mode == "best_fields" || mode == "most_fields",
      s"mode must be best_fields or most_fields, got $mode")
    val qTokens = queryTokens(query)
    val distinctToks = qTokens.distinct
    val scored =
      if (qTokens.isEmpty) index.withColumn("score", lit(0.0))
      else {
        val base = fields.foldLeft(index) { case (df, (f, _)) =>
          df.withColumn(s"_mm_$f", graft.functions.TextExpressions
            .termFreqStats(col(f), distinctToks))
        }
        def fieldScore(f: String): Column = qTokens.map(t =>
          element_at(col(s"_mm_$f").getField("tf"),
            distinctToks.indexOf(t) + 1)).reduce(_ + _)
        val boosted = fields.map { case (f, b) =>
          fieldScore(f).cast("double") * lit(b) }
        val combined =
          if (mode == "best_fields")
            (if (boosted.size == 1) boosted.head else greatest(boosted: _*))
          else boosted.reduce(_ + _)
        base.withColumn("score", combined)
          .drop(fields.map(f => s"_mm_${f._1}"): _*)
      }
    scored.filter(col("score") > 0)
      .orderBy(col("score").desc, col(index.columns.head))
      .limit(k)
  }

  /** SignificantTermsAggregation (ES): terms over-represented in the
    * FOREGROUND (docs matching `fgPredicate`) relative to the whole
    * corpus as background, scored by JLH —
    * `(fgPct − bgPct) · (fgPct / bgPct)` over document frequencies
    * (each term counted once per doc). "What is characteristic of this
    * slice" — source drift, niche vocabularies, contamination signals.
    *
    * One pass: the foreground flag rides the term explode, so fg and bg
    * document frequencies come out of the SAME vocabulary-sized hash
    * aggregate (map-side combinable) — never a second corpus scan. The
    * two corpus totals are one tiny broadcast row. `minDocCount` guards
    * the classic significant-terms trap: a term appearing once, in the
    * foreground, scores arbitrarily high on any ratio metric.
    */
  def significantTerms(docs: DataFrame, idCol: String, textCol: String,
      fgPredicate: Column, minDocCount: Int, k: Int): DataFrame = {
    require(minDocCount >= 1, s"minDocCount must be >= 1, got $minDocCount")
    val totals = docs.agg(count(lit(1)).cast("double").as("_n"),
      sum(when(fgPredicate, 1).otherwise(0)).cast("double").as("_fgn"))
    val termDf = docs
      .select(fgPredicate.as("_fg"),
        explode(array_distinct(split(lower(col(textCol)), " "))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).cast("double").as("_bgdf"),
        sum(when(col("_fg"), 1).otherwise(0)).cast("double").as("_fgdf"))
      .filter(col("_fgdf") >= minDocCount)
    termDf.crossJoin(broadcast(totals))
      .select(col("term"),
        col("_fgdf").cast("long").as("fg_count"),
        col("_bgdf").cast("long").as("bg_count"),
        round((col("_fgdf") / col("_fgn") - col("_bgdf") / col("_n")) *
          ((col("_fgdf") / col("_fgn")) / (col("_bgdf") / col("_n"))), 6)
          .as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("term"))
      .limit(k)
  }

  /** RareTerms aggregation (ES `rare_terms`): the LONG-TAIL complement
    * of a terms agg — terms whose document frequency is at most
    * `maxDocCount`, rarest first `(doc_count asc, term asc)`, up to
    * `k`. ES documents the naive "terms agg ordered count-ascending"
    * as unboundedly wrong at scale (each shard's local tail misses the
    * global one); the exact distributed form is the vocabulary-sized
    * document-frequency aggregate with the threshold filter — one
    * map-side-combinable pass, no per-shard top-k error to bound.
    */
  def rareTerms(docs: DataFrame, textCol: String, maxDocCount: Long,
      k: Int): DataFrame = {
    require(maxDocCount >= 1, s"maxDocCount must be >= 1, got $maxDocCount")
    require(k > 0, s"k must be positive, got $k")
    docs
      .select(explode(array_distinct(split(lower(col(textCol)), " ")))
        .as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("doc_count"))
      .filter(col("doc_count") <= maxDocCount)
      .orderBy(col("doc_count"), col("term"))
      .limit(k)
  }

  /** AdjacencyMatrix aggregation (ES `adjacency_matrix`): for named
    * filters, the document count of each filter and of each pairwise
    * intersection, keyed `name` / `nameA&nameB` (names in the given
    * order — the ES key convention). ONE corpus pass: each document
    * projects the array of filter names it matches (plan-literal
    * predicates), singles and ordered pairs are generated from that
    * array with higher-order functions, and a hash aggregate counts
    * keys — never a per-pair corpus scan or a self-join. Pair count is
    * O(filters²) per MATCHING doc only. Empty buckets are absent (ES
    * semantics).
    */
  def adjacencyMatrix(docs: DataFrame,
      filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "adjacencyMatrix needs at least one filter")
    require(filters.map(_._1).distinct.size == filters.size,
      "filter names must be unique")
    require(filters.forall(!_._1.contains("&")),
      "filter names must not contain '&' (the intersection key separator)")
    val matched = filter(
      array(filters.map { case (name, pred) =>
        when(pred, lit(name)).otherwise(lit(null).cast("string"))
      }: _*),
      x => x.isNotNull)
    val pairs = flatten(transform(matched, (x, i) =>
      transform(slice(matched, i + lit(2), size(matched)),
        y => concat(x, lit("&"), y))))
    docs
      .select(explode(concat(matched, pairs)).as("key"))
      .groupBy("key").agg(count(lit(1)).as("doc_count"))
      .orderBy("key")
  }

  /** RankFeature query (ES `rank_feature`, saturation function):
    * `score = boost · S/(S+pivot)` over a positive numeric feature —
    * the static-signal ranker (pagerank, url_length, freshness score)
    * with diminishing returns built in: the pivot is the feature value
    * scoring exactly `boost/2`. Docs without a positive feature never
    * match (ES semantics). Pure projection + TakeOrderedAndProject —
    * no corpus statistics, no shuffle beyond the top-k.
    */
  def rankFeature(docs: DataFrame, idCol: String, field: String,
      pivot: Double, boost: Double = 1.0, k: Int = 10): DataFrame = {
    require(pivot > 0, s"pivot must be positive, got $pivot")
    require(k > 0, s"k must be positive, got $k")
    docs.filter(col(field) > 0)
      .select(col(idCol),
        round(lit(boost) * col(field) / (col(field) + lit(pivot)), 6)
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** DistanceFeature query (ES `distance_feature`): `score = boost ·
    * pivot / (pivot + |x − origin|)` — rank by PROXIMITY to an origin
    * on a numeric/date axis (recency boosts, "near this price point"),
    * the linear-decay sibling of [[functionScoreGauss]]. Same shape:
    * one projection + top-k.
    */
  def distanceFeature(docs: DataFrame, idCol: String, field: String,
      origin: Double, pivot: Double, boost: Double = 1.0,
      k: Int = 10): DataFrame = {
    require(pivot > 0, s"pivot must be positive, got $pivot")
    require(k > 0, s"k must be positive, got $k")
    docs.select(col(idCol),
        round(lit(boost) * lit(pivot) /
          (lit(pivot) + abs(col(field) - lit(origin))), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Pinned query (ES `pinned`): the given ids rank first IN THE GIVEN
    * ORDER — whether or not they match the organic query (ES matches
    * them by id) — and the organic ranking follows with the pinned ids
    * excluded. Sponsored results / editorial curation over any organic
    * ranking. The pinned id list is a bounded plan literal (the
    * k-centroids contract); both legs cut to `k` total. Organic scoring
    * is the deterministic integer tf core ([[matchTextRanked]]).
    */
  def pinnedSearch(docs: DataFrame, idCol: String, textCol: String,
      query: String, pinnedIds: Seq[Long], k: Int): DataFrame = {
    require(pinnedIds.nonEmpty, "pinnedSearch needs at least one pinned id")
    require(pinnedIds.distinct.size == pinnedIds.size,
      "pinned ids must be unique")
    require(k > 0, s"k must be positive, got $k")
    val pinArr = lit(pinnedIds.toArray)
    val pinned = docs
      .filter(col(idCol).isInCollection(pinnedIds))
      .select(col(idCol).as("doc_id"), lit(true).as("pinned"),
        lit(0).as("_grp"),
        array_position(pinArr, col(idCol)).as("_ord"), lit(0L).as("score"))
    // over-fetch by the pin count: exclusion may evict up to
    // |pinnedIds| rows from the organic top-k
    val organic = matchTextRanked(docs.select(col(idCol), col(textCol)),
        textCol, query, k + pinnedIds.size)
      .filter(!col(idCol).isInCollection(pinnedIds))
      .select(col(idCol).as("doc_id"), lit(false).as("pinned"),
        lit(1).as("_grp"), lit(0L).as("_ord"), col("score").cast("long"))
    pinned.unionByName(organic)
      .orderBy(col("_grp"), col("_ord"), col("score").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "pinned", "score")
  }

  /** TermsSet query (ES `terms_set`): a doc matches when at least
    * `requiredCol` — its PER-DOCUMENT minimum-should-match, a field or
    * expression (ES's `minimum_should_match_field`) — of the query
    * terms appear in its token set. A required count above the term
    * count can never match (ES semantics — no clamping). One projection
    * computing the matched count per doc; the terms are plan literals.
    */
  def termsSetQuery(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], requiredCol: Column): DataFrame = {
    require(terms.nonEmpty, "termsSetQuery needs at least one term")
    require(terms.distinct.size == terms.size, "terms must be unique")
    val toks = split(lower(col(textCol)), " ")
    val matched = terms.map(t =>
      when(array_contains(toks, t), 1).otherwise(0)).reduce(_ + _)
    docs.select(col(idCol), matched.cast("long").as("matched"),
        requiredCol.cast("long").as("required"))
      .filter(col("matched") >= col("required"))
  }

  /** MatchBoolPrefix query (ES `match_bool_prefix`): every query token
    * is a term clause and the LAST is a prefix clause, OR'd as a bool
    * `should` — the search-as-you-type shape where the final word is
    * still being typed. Score = matched clause count (the deterministic
    * integer core, the [[matchTextRanked]] convention). One projection
    * over the token array; prefix tested with a higher-order `exists`.
    */
  def matchBoolPrefix(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int): DataFrame = {
    val qs = queryTokens(query)
    require(qs.nonEmpty, "matchBoolPrefix needs a non-empty query")
    require(k > 0, s"k must be positive, got $k")
    val toks = split(lower(col(textCol)), " ")
    val fullClauses = qs.init.map(t =>
      when(array_contains(toks, t), 1).otherwise(0))
    val prefixClause =
      when(exists(toks, x => x.startsWith(qs.last)), 1).otherwise(0)
    val score = (fullClauses :+ prefixClause).reduce(_ + _)
    docs.select(col(idCol), score.cast("long").as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** MultiTerms aggregation (ES `multi_terms`): top-`k` COMPOSITE keys
    * by document count — the terms agg over a key tuple, where a plain
    * terms agg on a concatenated string would lose the per-column
    * typing and ordering. One map-side-combinable hash aggregate on the
    * tuple + TakeOrderedAndProject; ties broken by the key columns
    * ascending so the cut is engine-reproducible.
    */
  def multiTerms(docs: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    require(keyCols.nonEmpty, "multiTerms needs at least one key column")
    require(k > 0, s"k must be positive, got $k")
    docs.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc +: keyCols.map(col): _*)
      .limit(k)
  }

  /** Histogram aggregation (ES numeric `histogram`): fixed-interval
    * buckets keyed `floor(value/interval)·interval` (the ES bucket-key
    * convention, correct for negatives too), empty buckets absent,
    * `minDocCount` prunes thin ones. One hash aggregate over a pure
    * projection — never a sort over the value space.
    */
  def histogram(docs: DataFrame, field: String, interval: Long,
      minDocCount: Long = 1): DataFrame = {
    require(interval > 0, s"interval must be positive, got $interval")
    require(minDocCount >= 1, s"minDocCount must be >= 1, got $minDocCount")
    docs
      .groupBy((floor(col(field) / interval) * interval).as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .filter(col("doc_count") >= minDocCount)
      .orderBy("bucket")
  }

  /** AutoDateHistogram (ES `auto_date_histogram`, fixed-interval rung
    * ladder): picks the FINEST rung whose bucket count over the data's
    * time span stays within `targetBuckets`, then aggregates on it —
    * "give me a readable histogram" without hand-tuning the interval.
    * The span probe is one min/max aggregate whose single row is the
    * only driver-side state (the cursor convention); rung choice is
    * integer arithmetic both engines mirror exactly. Buckets are
    * epoch-aligned (`epoch − epoch mod rung`), the fixed-interval
    * analogue of calendar alignment.
    */
  def autoDateHistogram(docs: DataFrame, tsCol: String,
      targetBuckets: Int,
      rungsSeconds: Seq[Long] = Seq(60L, 3600L, 86400L, 604800L)): DataFrame = {
    require(targetBuckets > 0,
      s"targetBuckets must be positive, got $targetBuckets")
    require(rungsSeconds.nonEmpty && rungsSeconds == rungsSeconds.sorted,
      "rungsSeconds must be a non-empty ascending ladder")
    val row = docs.agg(
      min(unix_timestamp(col(tsCol))).as("_mn"),
      max(unix_timestamp(col(tsCol))).as("_mx")).head()
    require(!row.isNullAt(0), "autoDateHistogram: no rows (or all-null ts)")
    val span = row.getLong(1) - row.getLong(0)
    val rung = rungsSeconds
      .find(r => span / r + 1 <= targetBuckets)
      .getOrElse(rungsSeconds.last)
    val epoch = unix_timestamp(col(tsCol))
    docs
      .groupBy((epoch - pmod(epoch, lit(rung))).as("bucket_s"))
      .agg(count(lit(1)).as("doc_count"))
      .withColumn("interval_s", lit(rung))
      .orderBy("bucket_s")
  }

  /** Ranking evaluation (the ES `_rank_eval` API): precision@k, MRR,
    * and binary nDCG@k of a ranking against relevance judgments — the
    * offline search-quality loop every relevance change runs before it
    * ships. `rankings` carries `(query, rk, doc_id)` (rk 1-based, ≤ k
    * rows per query — the bounded output of any gated ranked query);
    * `judgments` carries `(query, doc_id, rel)` with binary rel.
    *
    * Determinism: the DCG sum runs over ≤ k rows but still sums
    * DOUBLES, so contributions round to 12 dp and sum as decimals (the
    * KL convention); the ideal DCG folds a `sequence` literal left to
    * right. Unjudged ranked docs count rel 0 (the ES default); queries
    * with no relevant docs at all score 0 across the board rather than
    * dividing by zero.
    *
    * Scale shape: one join of the (queries × k)-row ranking frame
    * against judgments, two small hash aggs — evaluation cost scales
    * with the judgment set, never the corpus.
    */
  def rankEval(rankings: DataFrame, judgments: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val j = judgments.select(col("query"), col("doc_id"),
      col("rel").cast("double").as("_rel"))
    val nRel = j.filter(col("_rel") > 0)
      .groupBy("query").agg(count(lit(1)).as("_nrel"))
    val joined = rankings.filter(col("rk") <= k)
      .join(j, Seq("query", "doc_id"), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0.0)))
    val perQuery = joined.groupBy("query").agg(
      round(sum("_rel") / k, 6).as("p_at_k"),
      min(when(col("_rel") > 0, col("rk"))).as("_first"),
      sum(round(col("_rel") / log2(col("rk") + 1), 12)
        .cast("decimal(20,12)")).as("_dcg"))
    perQuery.join(nRel, Seq("query"), "left")
      .withColumn("_ideal", coalesce(least(col("_nrel"), lit(k)), lit(0L)))
      // sequence(1, 0) would generate DESCENDING — guard the empty case
      .withColumn("_idcg", when(col("_ideal") >= 1, aggregate(
        sequence(lit(1L), col("_ideal")), lit(0.0),
        (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1)))
        .otherwise(lit(0.0)))
      .select(col("query"),
        col("p_at_k"),
        round(coalesce(lit(1.0) / col("_first"), lit(0.0)), 6).as("mrr"),
        round(when(col("_idcg") > 0,
          col("_dcg").cast("double") / col("_idcg")).otherwise(lit(0.0)), 6)
          .as(s"ndcg_at_k"))
  }

  /** Phrase suggester ("did you mean", ES `phrase`/`term` suggester):
    * for each query token, the best correction among vocabulary terms
    * within `maxEdits` Levenshtein distance, ranked `(edit distance
    * asc, document frequency desc, term asc)` — an exact token is its
    * own distance-0 candidate, so known words only get "corrected" to
    * themselves. Tokens with no candidate in range keep a null
    * suggestion (surfaced, not dropped — the caller decides whether an
    * unmatchable token voids the query).
    *
    * Scale shape: ONE vocabulary-sized document-frequency aggregate;
    * the query tokens (a bounded literal frame) broadcast against it
    * with the distance predicate; best-per-token is a lexicographic
    * min(struct) hash agg — never a window over the vocabulary.
    */
  def phraseSuggest(docs: DataFrame, idCol: String, textCol: String,
      query: String, maxEdits: Int = 1): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 3,
      s"maxEdits must be in [1, 3], got $maxEdits")
    val qs = queryTokens(query)
    require(qs.nonEmpty, "phraseSuggest needs a non-empty query")
    import docs.sparkSession.implicits._
    val q = qs.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("pos", "token")
    val vocab = docs
      .select(col(idCol),
        explode(array_distinct(split(lower(col(textCol)), " "))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val best = vocab
      .join(broadcast(q),
        levenshtein(col("token"), col("term")) <= maxEdits)
      .groupBy("pos", "token")
      .agg(min(struct(
        levenshtein(col("token"), col("term")).as("d"),
        (-col("df")).as("negdf"), col("term").as("t"))).as("_b"))
      .select(col("pos"), col("token"), col("_b.t").as("suggestion"),
        (-col("_b.negdf")).as("df"))
    q.join(best, Seq("pos", "token"), "left").orderBy("pos")
  }

  /** Sampler / DiversifiedSampler aggregation (ES `sampler` +
    * `diversified_sampler`): a deterministic `shardSize`-doc sample in
    * `md5(id)` order — the repo's reproducible keep-set convention, so
    * the exact sample is auditable in any engine — with at most
    * `maxDocsPerValue` docs per `diversityCol` value (the
    * de-boilerplating knob: one viral domain cannot flood the sample
    * downstream aggs run over). The per-value cap is a window rank
    * partitioned by the diversity key (hash-ordered, so WHICH docs
    * survive the cap is also deterministic); the global cut is
    * TakeOrderedAndProject in hash order.
    */
  def diversifiedSampler(docs: DataFrame, idCol: String,
      diversityCol: String, maxDocsPerValue: Int,
      shardSize: Int): DataFrame = {
    require(maxDocsPerValue > 0,
      s"maxDocsPerValue must be positive, got $maxDocsPerValue")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(diversityCol)).orderBy(col("_h"), col(idCol))
    docs.withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxDocsPerValue)
      .orderBy(col("_h"), col(idCol))
      .limit(shardSize)
      .drop("_h", "_rk")
  }

  /** StringStats aggregation (ES `string_stats` with `show_distribution`
    * semantics folded into one Shannon-entropy number): per group —
    * document count, min/max/avg length, and the character-distribution
    * entropy `−Σ p·log2 p` over every character the group's field
    * content contains. Lengths aggregate exactly in integers (the avg
    * divides two exact integers in double — deterministic); entropy
    * contributions are per-(group, char) — an alphabet-sized frame —
    * rounded to 9 dp and summed as decimals so the sum is
    * order-independent across partitions and engines (the KL/CE
    * convention).
    */
  def stringStats(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val base = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        min(length(col(textCol))).cast("long").as("min_length"),
        max(length(col(textCol))).cast("long").as("max_length"),
        round(sum(length(col(textCol))).cast("double") / count(lit(1)), 6)
          .as("avg_length"))
    val chars = docs
      .select(col(groupCol), explode(split(col(textCol), "")).as("_ch"))
      .filter(col("_ch") =!= "")
      .groupBy(col(groupCol), col("_ch"))
      .agg(count(lit(1)).cast("double").as("_c"))
    val totals = chars.groupBy(col(groupCol)).agg(sum("_c").as("_t"))
    val ent = chars.join(totals, groupCol)
      .select(col(groupCol),
        round(-(col("_c") / col("_t")) * log2(col("_c") / col("_t")), 9)
          .cast("decimal(18,9)").as("_e"))
      .groupBy(col(groupCol))
      .agg(round(sum("_e").cast("double"), 6).as("entropy"))
    base.join(ent, groupCol).orderBy(groupCol)
  }

  /** ES `sparse_vector` query — the learned-sparse (SPLADE/ELSER-style)
    * serving shape: the query is a small term→weight map, each document
    * a sparse impact vector, and the score the dot product
    * `Σ_{t∈q} q_w(t)·d_w(t)`. In production the weights come from a
    * trained expansion model; here the doc-side impact is the standard
    * `(1+ln tf)·ln(1+N/df)` so the whole pipeline stays
    * engine-derivable — the SERVING shape (what this operator is) is
    * identical either way.
    *
    * Scale shape: this is postings-based retrieval, not a per-doc scan
    * of the full vocabulary — tokens are pruned to the query's terms
    * BEFORE the first shuffle (a literal IN on the exploded stream), so
    * the (doc, term) aggregate and everything after it carry only rows
    * for the ≤|q| query terms. df comes from that pruned frame (≤|q|
    * rows, broadcast back), N is one scalar row, the final cut
    * TakeOrderedAndProject. No full-corpus join anywhere; cost scales
    * with the query terms' posting lists, as an inverted index would.
    *
    * Determinism: per-(doc, term) contributions round to 6dp and sum as
    * exact decimals (order-free), ties break ascending id. Returns
    * `(idCol, score)`, top `k`.
    */
  def sparseVectorQuery(docs: DataFrame, idCol: String, textCol: String,
      queryWeights: Seq[(String, Double)], k: Int): DataFrame = {
    require(queryWeights.nonEmpty, "sparse_vector needs query weights")
    require(queryWeights.map(_._1).distinct.size == queryWeights.size,
      "duplicate term in query weights")
    val spark = docs.sparkSession
    val n = docs.agg(count(lit(1)).cast("double").as("_n"))
    val tf = docs
      .select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
          .as("_t"))
      .filter(col("_t").isin(queryWeights.map(_._1): _*))
      .groupBy(col(idCol), col("_t"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dfreq = tf.groupBy(col("_t"))
      .agg(count(lit(1)).cast("double").as("_df"))
      .withColumnRenamed("_t", "_dt")
    val qw = spark.createDataFrame(queryWeights).toDF("_qt", "_qw")
    tf.join(broadcast(dfreq), col("_t") === col("_dt"))
      .join(broadcast(qw), col("_t") === col("_qt"))
      .crossJoin(broadcast(n))
      .select(col(idCol),
        round(col("_qw") * round((lit(1.0) + log(col("_tf"))) *
          log(lit(1.0) + col("_n") / col("_df")), 6), 6)
          .cast("decimal(18,6)").as("_c"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** ES `nested` query with `inner_hits`: `predicate` must hold on ONE
    * nested document — every conjunct on the SAME array element — which
    * is exactly what the flattened (object-mapping) form gets wrong: a
    * flattened index matches when each conjunct hits ANY element, so
    * `qty >= 45 AND disc >= 0.08` would match an order whose big line
    * and discounted line are different lines. The parent keeps only
    * elements satisfying the predicate (`inner_hits`), parents with
    * none drop out.
    *
    * Scale shape: a pure per-row array `filter` projection over the
    * parent table — no explode, no shuffle, no join; ES pays a
    * block-join against separately indexed nested docs here. Arrays are
    * the parent's own nested collection (bounded per parent by the data
    * model), so per-row work is element count, not corpus size.
    */
  def nestedQuery(parents: DataFrame, arrayCol: String,
      predicate: Column => Column): DataFrame =
    parents
      .withColumn("inner_hits", filter(col(arrayCol), predicate))
      .filter(size(col("inner_hits")) > 0)
}
