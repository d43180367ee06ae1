package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed inverted-index build + index-accelerated ranked retrieval.
  *
  * The reference's sink is a Lucene index (nrtsearch): every ingested
  * document lands in postings lists and queries touch only the postings of
  * their terms. [[DocQueries]] gives the query *semantics* over a document
  * view; this module adds the *index structure* itself, Spark-native:
  *
  *   - [[postings]] — the flat `(term, doc_id, tf)` table. Deliberately
  *     NOT `term → array<(doc,tf)>`: a stop word's postings list at 100 TB
  *     is billions of entries, and a single array row of that size is
  *     undistributable (one task, one buffer). The flat layout keeps every
  *     operation a partitioned aggregate/join, skew handled by AQE, and —
  *     persisted sorted/bucketed by `term` — a query term becomes a pushed
  *     predicate that prunes row groups instead of scanning the corpus
  *     (Lucene's seek-to-term, expressed as parquet min/max pruning).
  *   - [[termStats]] — per-term `df`/`cf` (the term dictionary).
  *   - [[docLengths]] — per-doc token count (Lucene's norms file).
  *   - [[bm25Search]] — BM25 over the postings of the QUERY TERMS only:
  *     the classic corpus-scan form ([[DocQueries.matchTextBM25]]) reads
  *     every document per query; this reads `Σ df(q_i)` postings rows —
  *     at 100 TB that is the difference between a full scan and a pruned
  *     point lookup. Scores are identical (same Lucene BM25 formula and
  *     stats; `InvertedIndexSpec` asserts equality with the scan form).
  *
  * Tokenization is the corpus convention shared with the SQL oracles and
  * [[graft.functions.TermFreqStats]]: lowercase, single-space split, empty
  * tokens dropped.
  */
object InvertedIndex {

  /** Build the flat postings table `(term string, doc_id, tf int)` from
    * `(idCol, textCol)` documents. One explode + one aggregate: partial
    * (map-side) counting collapses each document's repeated terms before
    * the single `(term, doc_id)` shuffle.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
    docs.select(col(idCol).as("doc_id"), explode(toks).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("int").as("tf"))
  }

  /** Term dictionary: per-term document frequency and collection
    * frequency. One aggregate over the postings, map-side combinable.
    */
  def termStats(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(
      count(lit(1)).cast("int").as("df"),
      sum("tf").cast("long").as("cf"))

  /** Per-document token counts `(doc_id, dl int)` — the norms the scorer
    * needs. Stored beside the postings at build time so queries never
    * re-tokenize the corpus.
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(filter(split(lower(col(textCol)), " "), t => t =!= lit("")))
        .as("dl"))

  /** Positional postings `(term, doc_id, positions array<int>)`: the
    * token offsets of every term occurrence in its document's filtered
    * token stream — Lucene's position data, enabling phrase queries off
    * the index ([[phraseSearch]]) instead of a corpus scan
    * ([[DocQueries.matchPhrase]]). Positions are sorted (collect_list
    * order is shuffle-dependent; the sort restores determinism). Same
    * layout discipline as [[postings]]: flat rows, one array per
    * (term, doc) — bounded by a doc's occurrences of ONE term, never a
    * corpus-sized list — persisted term-sorted via [[writePostings]] so
    * a query term prunes to its row groups.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
    docs.select(col(idCol).as("doc_id"), posexplode(toks).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos").cast("int"))).as("positions"))
  }

  /** Exact-phrase (slop 0) search over a positional index: documents
    * containing the query tokens at CONSECUTIVE positions, with the
    * occurrence count (overlapping occurrences counted, like Lucene's
    * PhraseQuery). Matches [[DocQueries.matchPhrase]]'s membership
    * exactly (same tokenizer, spec-pinned).
    *
    * Scale shape: one leg per query token reads ONLY that term's
    * postings (an equality predicate on the term-sorted layout — row-
    * group pruning), aligns its positions to the phrase start
    * (`pos - i`), and the legs equi-join on `(doc, start)` — each join
    * only SHRINKS the candidate set, and every leg is df(term)-sized,
    * never corpus-sized. Single-token phrases skip the join entirely.
    */
  def phraseSearch(positional: DataFrame, phrase: String): DataFrame = {
    val qTokens = DocQueries.queryTokens(phrase)
    require(qTokens.nonEmpty, "phrase search needs a non-empty phrase")
    val legs = qTokens.zipWithIndex.map { case (t, i) =>
      positional.filter(col("term") === t)
        .select(col("doc_id"), explode(col("positions")).as("_p"))
        .select(col("doc_id"), (col("_p") - i).as("_p"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "_p")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** MatchPhrasePrefix off the positional index
    * ([[DocQueries.matchPhrasePrefix]] served from the layout): the
    * leading tokens are exact phrase legs (start-aligned equi-joins, as
    * in [[phraseSearch]]), and the LAST token is a PREFIX leg — a
    * pushed `StringStartsWith` on the term-sorted postings, its
    * positions aligned to sit right after the leading run. A
    * single-token query is a pure pushed-prefix scan. Every leg stays
    * df-sized; the joins only shrink.
    */
  def phrasePrefixSearch(positional: DataFrame, phrase: String): DataFrame = {
    val qTokens = DocQueries.queryTokens(phrase)
    require(qTokens.nonEmpty, "phrase-prefix search needs a non-empty phrase")
    val init = qTokens.init
    val lastLeg = positional.filter(col("term").startsWith(qTokens.last))
      .select(col("doc_id"), explode(col("positions")).as("_p"))
      .select(col("doc_id"), (col("_p") - init.size).as("_p"))
    val legs = init.zipWithIndex.map { case (t, i) =>
      positional.filter(col("term") === t)
        .select(col("doc_id"), explode(col("positions")).as("_p"))
        .select(col("doc_id"), (col("_p") - i).as("_p"))
    } :+ lastLeg
    legs.reduce((a, b) => a.join(b, Seq("doc_id", "_p")))
      .select("doc_id").distinct()
  }

  /** Ordered proximity search (Lucene SpanNearQuery, inOrder = true)
    * over the positional index: documents where the query tokens appear
    * IN ORDER with at most `slop` non-query tokens interleaved — i.e.
    * positions `p_1 < p_2 < … < p_k` with `p_k − p_1 − (k−1) ≤ slop`.
    * `slop = 0` is exactly [[phraseSearch]]'s membership (spec-pinned).
    *
    * Scale shape: like [[phraseSearch]], one df(term)-sized leg per
    * query token (pushed term predicate on the term-sorted layout), but
    * legs join on `(doc, ordered-position-range)` instead of exact
    * alignment: each join keeps `(doc, first-position, last-position)`
    * and SHRINKS the candidate set; the slop bound is one final filter.
    * Returns distinct matching `doc_id`s.
    */
  def spanNearSearch(positional: DataFrame, phrase: String,
      slop: Int): DataFrame = {
    require(slop >= 0, s"slop must be non-negative, got $slop")
    val qTokens = DocQueries.queryTokens(phrase)
    require(qTokens.nonEmpty, "span-near search needs a non-empty phrase")
    val legs = qTokens.map { t =>
      positional.filter(col("term") === t)
        .select(col("doc_id"), explode(col("positions")).as("_p"))
    }
    val spans = legs.zipWithIndex.drop(1).foldLeft(
      legs.head.select(col("doc_id"), col("_p").as("_first"),
        col("_p").as("_last"))) { case (acc, (leg, _)) =>
      // Greedy earliest-next: keep only min(_next) per (doc, _first).
      // Minimizing _last at every leg preserves existence under the
      // final ordered-slop predicate (exchange argument) and bounds the
      // intermediate to first-leg positions — without it a doc repeating
      // the query terms m times materializes ~m^k tuples before the
      // slop filter.
      acc.join(leg.withColumnRenamed("_p", "_next"), Seq("doc_id"))
        .filter(col("_next") > col("_last"))
        .groupBy(col("doc_id"), col("_first"))
        .agg(min(col("_next")).as("_last"))
        .select(col("doc_id"), col("_first"), col("_last"))
    }
    spans.filter(col("_last") - col("_first") - (qTokens.size - 1) <= slop)
      .select("doc_id").distinct()
  }

  /** Unordered proximity for a term pair (ES `intervals` `all_of`
    * with `ordered: false`, Lucene SpanNearQuery `inOrder=false`):
    * documents where the two terms co-occur within `maxGaps`
    * intervening tokens IN EITHER ORDER, with the best (minimal) gap —
    * the "these words near each other" query a user means when word
    * order is incidental ([[spanNearSearch]] is its ordered sibling).
    * Returns `(doc_id, best_gap)`.
    *
    * Scale shape: two pruned term legs (equality on the term-sorted
    * layout — row-group pruning), one per-doc equi-join of occurrence
    * lists — tf(t1) × tf(t2) pairs PER DOC, bounded by per-doc term
    * frequency, never corpus-sized — and a map-side-combinable min
    * aggregate.
    */
  def spanUnorderedSearch(positional: DataFrame, t1: String, t2: String,
      maxGaps: Int): DataFrame = {
    require(maxGaps >= 0, s"maxGaps must be non-negative, got $maxGaps")
    require(t1 != t2, "spanUnorderedSearch needs two distinct terms")
    def leg(t: String, as: String) = positional
      .filter(col("term") === t)
      .select(col("doc_id"), explode(col("positions")).as(as))
    leg(t1, "_pa").join(leg(t2, "_pb"), Seq("doc_id"))
      .select(col("doc_id"), (abs(col("_pa") - col("_pb")) - 1).as("_g"))
      .groupBy("doc_id").agg(min(col("_g")).as("best_gap"))
      .filter(col("best_gap") <= maxGaps)
  }

  /** SpanOrQuery (Lucene SpanOrQuery / ES span_or): the UNION of span
    * clauses — a document matches when ANY ordered-proximity clause
    * ([[spanNearSearch]] semantics) matches; reports how many clauses
    * matched, the per-doc evidence ES surfaces via matched_queries.
    * Returns `(doc_id, n_clauses)`.
    *
    * Scale shape: each clause runs its own pruned spanNear plan
    * (df(term)-sized legs, never corpus scans); the union is one
    * id-keyed count aggregate over at most clauses × matching-docs
    * rows, map-side combinable.
    */
  def spanOrSearch(positional: DataFrame,
      clauses: Seq[(String, Int)]): DataFrame = {
    require(clauses.nonEmpty, "span-or needs at least one clause")
    clauses.map { case (phrase, slop) =>
      spanNearSearch(positional, phrase, slop)
    }.reduce(_.unionByName(_))
      .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_clauses"))
  }

  /** SpanFirstQuery off the positional index: the term must occur within
    * the first `end` token positions (Lucene SpanFirstQuery — a span
    * ending at or before `end`; for a single-term span that is 0-based
    * position < `end`). One pruned term leg, one array predicate — the
    * "match in title/lead" heuristic when fields are flattened into one
    * token stream.
    */
  def spanFirstSearch(positional: DataFrame, term: String,
      end: Int): DataFrame = {
    val t = term.toLowerCase(java.util.Locale.ROOT)
    require(t.nonEmpty, "span-first search needs a non-empty term")
    require(end > 0, s"end must be positive, got $end")
    positional.filter(col("term") === t)
      .filter(exists(col("positions"), p => p < end))
      .select("doc_id").distinct()
  }

  /** SpanNotQuery off the positional index: documents with an occurrence
    * of `include` having NO occurrence of `exclude` within `pre`
    * positions before or `post` after (Lucene SpanNotQuery's
    * pre/post-window exclusion). Two pruned term legs; the include leg
    * explodes to positions, the exclude leg stays one array row per doc,
    * and the window test is one array predicate per (position, doc) —
    * no position × position join. A doc with no `exclude` occurrences
    * matches wherever `include` does.
    */
  /** SpanWithin/SpanContaining (Lucene `SpanWithinQuery` /
    * `SpanContainingQuery` — the same DOCUMENT set, they differ only in
    * which span is returned for scoring): docs where an occurrence of
    * `littleTerm` lies INSIDE some span of the big pair `(bigA …
    * bigB)` within `slop`. Deliberately evaluated over ALL qualifying
    * big spans — the greedy earliest-next collapse [[spanNearSearch]]
    * uses would miss a little term sitting inside a wider-than-minimal
    * span. Three pruned postings legs joined on doc id; pair fan-out
    * per doc is bounded by term frequency × the slop window.
    */
  def spanWithinSearch(positional: DataFrame, littleTerm: String,
      bigA: String, bigB: String, slop: Int): DataFrame = {
    require(slop >= 0, s"slop must be non-negative, got $slop")
    val Seq(lt, a, b) = Seq(littleTerm, bigA, bigB)
      .map(_.toLowerCase(java.util.Locale.ROOT))
    require(lt.nonEmpty && a.nonEmpty && b.nonEmpty,
      "span-within search needs non-empty terms")
    def leg(t: String, as: String) = positional.filter(col("term") === t)
      .select(col("doc_id"), explode(col("positions")).as(as))
    leg(a, "_a").join(leg(b, "_b"), "doc_id")
      .filter(col("_b") > col("_a") && col("_b") - col("_a") - 1 <= slop)
      .join(leg(lt, "_l"), "doc_id")
      .filter(col("_l") >= col("_a") && col("_l") <= col("_b"))
      .select("doc_id").distinct()
  }

  def spanNotSearch(positional: DataFrame, include: String, exclude: String,
      pre: Int = 0, post: Int = 0): DataFrame = {
    val inc = include.toLowerCase(java.util.Locale.ROOT)
    val exc = exclude.toLowerCase(java.util.Locale.ROOT)
    require(inc.nonEmpty && exc.nonEmpty,
      "span-not search needs non-empty include and exclude terms")
    require(pre >= 0 && post >= 0,
      s"pre/post must be non-negative, got $pre/$post")
    val a = positional.filter(col("term") === inc)
      .select(col("doc_id"), explode(col("positions")).as("_pa"))
    val b = positional.filter(col("term") === exc)
      .select(col("doc_id"), col("positions").as("_pb"))
    a.join(b, Seq("doc_id"), "left")
      .filter(col("_pb").isNull ||
        !exists(col("_pb"),
          q => q >= col("_pa") - pre && q <= col("_pa") + post))
      .select("doc_id").distinct()
  }

  /** PrefixQuery off the index: matching docs via the postings whose
    * term starts with `prefix`. On the term-sorted layout the predicate
    * pushes as `StringStartsWith` — parquet min/max skips every row
    * group outside the prefix's term range, Lucene's seek-to-prefix
    * (spec-pinned). One distinct over the surviving postings rows.
    */
  def prefixSearch(postings: DataFrame, prefix: String): DataFrame = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    require(p.nonEmpty, "prefix search needs a non-empty prefix")
    postings.filter(col("term").startsWith(p))
      .select("doc_id").distinct()
  }

  /** Completion suggester off the index: the top-`k` vocabulary terms
    * under `prefix`, ranked by corpus frequency (Lucene suggesters rank
    * by weight; cf is the standard default) with the term itself as the
    * deterministic tie-break. The prefix pushes as `StringStartsWith`
    * onto the term-sorted postings (row-group seek), the aggregation is
    * surviving-vocabulary-sized, and top-k plans as
    * TakeOrderedAndProject — suggestion latency tracks the prefix's
    * vocabulary slice, not the corpus.
    */
  def suggest(postings: DataFrame, prefix: String, k: Int): DataFrame = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    require(p.nonEmpty, "suggest needs a non-empty prefix")
    require(k > 0, s"k must be positive, got $k")
    postings.filter(col("term").startsWith(p))
      .groupBy("term").agg(sum(col("tf").cast("long")).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(k)
  }

  /** FuzzyQuery off the index: terms within `maxEdits` Levenshtein
    * distance of `term` are found by scanning the VOCABULARY (the
    * distinct-term dictionary — vocabulary-sized, not corpus-sized:
    * Lucene's FST automaton walk expressed relationally), then their
    * postings are gathered by a broadcast semi-join. Returns matching
    * `doc_id`s.
    */
  def fuzzySearch(postings: DataFrame, term: String,
      maxEdits: Int = 1): DataFrame = {
    val q = term.toLowerCase(java.util.Locale.ROOT)
    require(q.nonEmpty, "fuzzy search needs a non-empty term")
    val vocab = postings.select("term").distinct()
      .filter(levenshtein(col("term"), lit(q)) <= maxEdits)
    postings.join(broadcast(vocab), Seq("term"), "left_semi")
      .select("doc_id").distinct()
  }

  /** WildcardQuery off the index — Lucene runs the glob automaton over
    * the term dictionary seeking from its literal prefix; relationally
    * that is: the glob's literal prefix pushes as `StringStartsWith`
    * onto the term-sorted postings (row-group seek, same as
    * [[prefixSearch]]), the anchored regexp then runs over the PRUNED
    * vocabulary (distinct surviving terms), and matching terms' postings
    * are gathered by broadcast semi-join. A glob with no literal prefix
    * (leading `*`/`?`) degrades to a full vocabulary scan — still
    * vocabulary-sized, never corpus-sized.
    */
  def wildcardSearch(postings: DataFrame, pattern: String): DataFrame = {
    val p = pattern.toLowerCase(java.util.Locale.ROOT)
    require(p.exists(c => c != '*' && c != '?'),
      "wildcard search needs at least one literal character")
    val litPrefix = p.takeWhile(c => c != '*' && c != '?')
    val pruned =
      if (litPrefix.nonEmpty) postings.filter(col("term").startsWith(litPrefix))
      else postings
    val re = DocQueries.globToRegex(p)
    val vocab = pruned.select("term").distinct().filter(col("term").rlike(re))
    pruned.join(broadcast(vocab), Seq("term"), "left_semi")
      .select("doc_id").distinct()
  }

  /** RegexpQuery off the index: full-match regexp over the vocabulary,
    * with any leading literal run (`[a-z0-9]+` before the first
    * metacharacter) pushed as the prefix prune — Lucene extracts the
    * common prefix from the compiled automaton; this textual stand-in
    * must refuse when an alternation could bypass the leading run
    * (`wind.w|scan` has NO common prefix), so any `|` in the pattern
    * disables the prune — correctness first, the vocabulary scan is
    * still vocabulary-sized.
    */
  def regexpSearch(postings: DataFrame, regex: String): DataFrame = {
    require(regex.nonEmpty, "regexp search needs a non-empty pattern")
    val litPrefix =
      if (regex.contains('|')) ""
      else {
        val run = regex.takeWhile(c => c.isLetterOrDigit)
        // a quantifier on the run's LAST char can make it optional —
        // 'scans?' must still match 'scan', 'a*b' matches 'b', 'a{0,2}b'
        // matches 'b' — so drop that char from the mandatory prefix.
        // '+' requires >=1 occurrence and preserves the full run.
        regex.drop(run.length).headOption match {
          case Some('?') | Some('*') | Some('{') => run.dropRight(1)
          case _ => run
        }
      }
    val pruned =
      if (litPrefix.nonEmpty) postings.filter(col("term").startsWith(litPrefix))
      else postings
    val vocab = pruned.select("term").distinct()
      .filter(col("term").rlike(s"^(?:$regex)$$"))
    pruned.join(broadcast(vocab), Seq("term"), "left_semi")
      .select("doc_id").distinct()
  }

  /** BATCH BM25 retrieval — N queries answered in ONE pass over the
    * postings (the batch-serving shape; the text twin of
    * `VectorIndex.knnSearch`). Identical per-term scoring to
    * [[bm25Search]]; the postings filter is the UNION of every query's
    * terms (one pushed semi-join for the whole batch), document scores
    * fan out per query AFTER the df/norms joins, and per-query top-k is
    * the bounded `TopKByScore` aggregate — no per-query window, no
    * corpus re-scan per query. Scores round to 6dp BEFORE ranking so
    * the (score, id) order is engine-reproducible.
    *
    * Output: `(queryIdCol, rk, doc_id, bm25)`, `rk ∈ [1, k]`.
    */
  def bm25SearchBatch(postings: DataFrame, docLens: DataFrame,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qTerms = queries.select(col(queryIdCol),
      explode(array_distinct(filter(split(lower(col(queryTextCol)), " "),
        t => t =!= lit("")))).as("term"))
    val terms = qTerms.select("term").distinct()
    val qp = postings.join(broadcast(terms), Seq("term"), "left_semi")
    val dfPerTerm = qp.groupBy("term")
      .agg(count(lit(1)).cast("double").as("_df"))
    val stats = docLens.agg(count(lit(1)).cast("double").as("_n"),
      avg(col("dl").cast("double")).as("_avgdl"))
    val contrib = DocQueries.bm25Contrib(col("tf").cast("double"),
      col("_df"), col("_n"), col("_avgdl"), col("dl").cast("double"), k1, b)
    val scored = qp
      .join(broadcast(dfPerTerm), "term")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(qTerms), Seq("term"))
      .select(col(queryIdCol), col("doc_id"), contrib.as("_contrib"))
      .groupBy(col(queryIdCol), col("doc_id"))
      .agg(sum("_contrib").as("_raw"))
      .filter(col("_raw") > 0)
      .select(col(queryIdCol), round(col("_raw"), 6).as("_c"),
        col("doc_id").cast("long").as("_id"))
    graft.operators.Similarity.rankScoredTopK(scored, queryIdCol, "doc_id", k)
      .withColumnRenamed("cosine", "bm25")
  }

  /** BooleanQuery off the index — same clause semantics as the scan-form
    * [[DocQueries.boolQuery]] (one shared [[DocQueries.boolClauses]]
    * definition; spec-pinned equal), evaluated over postings:
    *
    *   - MUST: one leg per term reads ONLY that term's postings rows (a
    *     pushed `EqualTo` on the term-sorted layout — row-group pruning,
    *     like [[phraseSearch]]'s legs); the legs equi-join on `doc_id`
    *     and every join SHRINKS the candidate set. Lucene's conjunctive
    *     postings intersection, relationally.
    *   - SHOULD: the should-terms' postings (`Σ df` rows, one pushed
    *     `In` filter) aggregate to per-doc matched-clause counts —
    *     postings are unique per (term, doc), so `count(1)` IS the
    *     distinct-clause count — and `n_should >= msm` filters.
    *   - MUST_NOT: the forbidden terms' doc set (df-sized, distinct)
    *     removes candidates via `left_anti` — never a corpus scan.
    *
    * Every leg is df(term)-sized; nothing corpus-sized ever shuffles.
    * Returns distinct matching `doc_id`s (each leg is unique per doc, so
    * the joins preserve distinctness — no extra shuffle needed).
    */
  def boolSearch(postings: DataFrame, must: Seq[String] = Nil,
      should: Seq[String] = Nil, mustNot: Seq[String] = Nil,
      minimumShouldMatch: Int = -1): DataFrame = {
    val (m, sh, mn, msm) =
      DocQueries.boolClauses(must, should, mustNot, minimumShouldMatch)
    val mustBase: Option[DataFrame] =
      if (m.isEmpty) None
      else Some(m.map(t => postings.filter(col("term") === t).select("doc_id"))
        .reduce((a, b) => a.join(b, Seq("doc_id"))))
    val shouldCounts: Option[DataFrame] =
      if (sh.isEmpty) None
      else Some(postings.filter(col("term").isin(sh: _*))
        .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_should")))
    val base = (mustBase, shouldCounts) match {
      case (Some(mb), Some(sc)) if msm > 0 =>
        mb.join(sc.filter(col("n_should") >= msm).select("doc_id"), Seq("doc_id"))
      case (Some(mb), _) => mb
      case (None, Some(sc)) =>
        sc.filter(col("n_should") >= msm).select("doc_id")
      case (None, None) =>
        throw new IllegalStateException(
          "unreachable: boolClauses requires a MUST or SHOULD clause")
    }
    if (mn.isEmpty) base
    else base.join(
      postings.filter(col("term").isin(mn: _*)).select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** RANKED boolean query — Lucene BooleanQuery SCORING, not just
    * membership ([[boolSearch]]): every matching doc scores the sum of
    * per-clause BM25 contributions × that clause's BOOST, over MUST and
    * SHOULD clauses alike (Lucene's sum-of-scoring-clauses); docs must
    * carry every MUST term and no MUST_NOT term. Scores round to 6dp
    * before ranking (the engine-reproducibility convention) and top-k is
    * bounded.
    *
    * Scale shape: one postings pass filtered to the union of scoring
    * terms (pushed, row-group pruned on the term-sorted layout), the
    * boost table a CASE literal, MUST enforcement one count-distinct
    * filter against the clause count, MUST_NOT a left-anti of its
    * postings — everything doc-keyed hash aggregates, top-k as the
    * bounded sort.
    */
  def boolSearchRanked(postings: DataFrame, docLens: DataFrame,
      must: Seq[(String, Double)] = Nil, should: Seq[(String, Double)] = Nil,
      mustNot: Seq[String] = Nil, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def norm(ts: Seq[(String, Double)]) = ts.map { case (t, bo) =>
      (t.toLowerCase(java.util.Locale.ROOT), bo)
    }
    val m = norm(must)
    val sh = norm(should)
    require(m.nonEmpty || sh.nonEmpty,
      "ranked bool query needs a MUST or SHOULD clause")
    val boosts = (m ++ sh).toMap // last boost wins a duplicated term
    val terms = boosts.keys.toSeq.sorted
    val qp = postings.filter(col("term").isin(terms: _*))
    val stats = docLens.agg(
      count(lit(1)).cast("double").as("_n"),
      avg(col("dl").cast("double")).as("_avgdl"))
    val dfPerTerm = qp.groupBy("term")
      .agg(count(lit(1)).cast("double").as("_df"))
    val boost = terms.tail.foldLeft(
        when(col("term") === terms.head, lit(boosts(terms.head)))) {
      (acc, t) => acc.when(col("term") === t, lit(boosts(t)))
    }.otherwise(lit(0.0))
    val contrib = DocQueries.bm25Contrib(col("tf").cast("double"),
      col("_df"), col("_n"), col("_avgdl"), col("dl").cast("double"), k1, b)
    val mTerms = m.map(_._1).distinct
    val scored = qp.join(broadcast(dfPerTerm), "term")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), (contrib * boost).as("_c"))
      .groupBy("doc_id").agg(
        sum("_c").as("_score"),
        count_distinct(when(col("term").isin(mTerms: _*), col("term")))
          .as("_nm"))
      .filter(col("_nm") === mTerms.size && col("_score") > 0)
    val base =
      if (mustNot.isEmpty) scored
      else scored.join(
        postings.filter(col("term").isin(
          mustNot.map(_.toLowerCase(java.util.Locale.ROOT)): _*))
          .select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    base.select(col("doc_id"), round(col("_score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Persist the postings term-sorted: range-partition on `term`, sort
    * within partitions on `(term, doc_id)`. Parquet then records term
    * min/max per row group, so a query term's `IN` filter prunes to its
    * row groups at scan time — Lucene's seek-to-term expressed as
    * storage-level skipping (`InvertedIndexSpec` pins the pushed filter).
    *
    * `repartitionByRange` runs a range-SAMPLING job before the shuffle,
    * re-executing the input lineage a second time. `persistInput = true`
    * caches the input (MEMORY_AND_DISK) across the sample+shuffle pair —
    * pass it when the lineage is expensive relative to its output, e.g.
    * [[IncrementalPostings.compact]]'s base+deltas resolution (union +
    * owner broadcast join per leg). Measured r17 at sf0.1: the persist
    * round trip costs MORE than recomputing a plain tokenize+aggregate
    * lineage (q_bool_indexed 0.80→1.12 s with an unconditional persist),
    * so it stays opt-in rather than default.
    */
  def writePostings(postings: DataFrame, dir: String,
      persistInput: Boolean = false): Unit = {
    val p = if (persistInput)
      postings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else postings
    try p.repartitionByRange(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(dir)
    finally if (persistInput) p.unpersist(blocking = false): Unit
  }

  def readPostings(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** BM25 top-k via the index: identical scoring to
    * [[DocQueries.matchTextBM25]] (Lucene defaults k1=1.2, b=0.75,
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))`), but reading ONLY the postings
    * rows of the query terms. Corpus stats (N, avgdl) and per-term df are
    * single tiny aggregate rows, broadcast to the scorers; the only
    * non-broadcast join keys the query-term postings against the norms
    * table on `doc_id`. Top-k is TakeOrderedAndProject.
    *
    * Output `(doc_id, bm25 double)` — `round(…, 6)` absorbs the
    * summation-order ULP differences between engines (document scores sum
    * per-term contributions in hash-aggregate order here, fixed order in
    * the scan form and the SQL oracle).
    */
  def bm25Search(postings: DataFrame, docLens: DataFrame, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tokenizer and per-term formula are SHARED with the corpus-scan
    // scorer (DocQueries.queryTokens / bm25Contrib) — the spec-pinned
    // scan ≡ indexed equality depends on one definition of each
    val qTokens = DocQueries.queryTokens(query).distinct
    require(qTokens.nonEmpty, "BM25 needs a non-empty query")
    bm25ScoresAll(postings, docLens, qTokens, k1, b)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Learned-sparse (`sparse_vector`) serving off the postings layout:
    * query term→weight map dotted against per-doc impacts
    * `(1+ln tf)·ln(1+N/df)` — [[DocQueries.sparseVectorQuery]]'s exact
    * arithmetic (6dp contributions summed as decimals, id tie-break),
    * so indexed and corpus-scan serving return IDENTICAL rows. On a
    * persisted index the `term IN` prune is the pushed predicate that
    * cuts the scan to the query terms' posting rows; df re-derives
    * from those same rows, N/weights ride broadcasts, the cut is
    * top-k. Returns `(doc_id, score)`.
    */
  def sparseVectorSearch(postings: DataFrame, docLens: DataFrame,
      queryWeights: Seq[(String, Double)], k: Int): DataFrame = {
    require(queryWeights.nonEmpty, "sparse_vector needs query weights")
    val spark = postings.sparkSession
    val qw = broadcast(
      spark.createDataFrame(queryWeights).toDF("_qt", "_qw"))
    val qp = postings
      .filter(col("term").isin(queryWeights.map(_._1): _*))
    val dfreq = qp.groupBy("term").agg(count(lit(1)).cast("double")
      .as("_df"))
    val n = docLens.agg(count(lit(1)).cast("double").as("_n"))
    qp.join(broadcast(dfreq), "term")
      .join(qw, col("term") === col("_qt"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        round(col("_qw") * round((lit(1.0) + log(col("tf").cast("double")))
          * log(lit(1.0) + col("_n") / col("_df")), 6), 6)
          .cast("decimal(18,6)").as("_c"))
      .groupBy("doc_id").agg(sum(col("_c")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Every positive BM25 score for a token set — the un-limited body
    * shared by [[bm25Search]] (top-k) and [[disMaxSearch]] (clause legs).
    */
  private def bm25ScoresAll(postings: DataFrame, docLens: DataFrame,
      qTokens: Seq[String], k1: Double, b: Double): DataFrame = {
    // at-most-df(q) rows survive: on a persisted index this is the pushed
    // predicate that prunes the scan down to the query terms' row groups
    val qp = postings.filter(col("term").isin(qTokens: _*))
    val stats = docLens.agg(
      count(lit(1)).cast("double").as("_n"),
      avg(col("dl").cast("double")).as("_avgdl"))
    val dfPerTerm = qp.groupBy("term")
      .agg(count(lit(1)).cast("double").as("_df"))
    val contrib = DocQueries.bm25Contrib(col("tf").cast("double"),
      col("_df"), col("_n"), col("_avgdl"), col("dl").cast("double"), k1, b)
    qp.join(broadcast(dfPerTerm), "term")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), contrib.as("_c"))
      .groupBy("doc_id").agg(sum("_c").as("_score"))
      .filter(col("_score") > 0)
      .select(col("doc_id"), round(col("_score"), 6).as("bm25"))
  }

  /** DisjunctionMax off the index — [[DocQueries.disMaxSearch]]
    * semantics (max clause score + tieBreaker × the rest) with every
    * clause's BM25 read from pruned postings: each clause leg is a
    * pushed term-set predicate on the term-sorted layout, positive
    * scores only, joined id-keyed. Identical rounding discipline to the
    * scan form, so indexed ≡ scan row-for-row.
    */
  def disMaxSearch(postings: DataFrame, docLens: DataFrame,
      clauses: Seq[String], tieBreaker: Double, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(clauses.nonEmpty, "disMax needs at least one clause")
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tieBreaker must be in [0, 1], got $tieBreaker")
    require(k > 0, s"k must be positive, got $k")
    val legs = clauses.zipWithIndex.map { case (q, i) =>
      val qTokens = DocQueries.queryTokens(q).distinct
      require(qTokens.nonEmpty, s"disMax clause $i is empty")
      bm25ScoresAll(postings, docLens, qTokens, k1, b)
        .select(col("doc_id"), col("bm25").as(s"_c$i"))
    }
    val joined = legs.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val cs = clauses.indices.map(i => coalesce(col(s"_c$i"), lit(0.0)))
    val mx = cs.reduce(greatest(_, _))
    val sm = cs.reduce(_ + _)
    joined.select(col("doc_id"),
        round(mx + lit(tieBreaker) * (sm - mx), 6).as("dismax"))
      .orderBy(col("dismax").desc, col("doc_id"))
      .limit(k)
  }

  /** SignificantTermsAggregation served OFF the postings store — the
    * indexed twin of [[DocQueries.significantTerms]] (same JLH scoring
    * over document frequencies, same `minDocCount` guard): fg and bg
    * document frequencies come from the MATERIALIZED postings, so the
    * corpus text is never re-tokenized. `fgDocs` (one id column —
    * typically the hits of another indexed query) broadcasts to flag
    * the postings rows; `docIds` (one id column, the corpus membership)
    * supplies the two totals. One vocabulary-sized aggregate + one tiny
    * broadcast row, like the scan form — minus its tokenization pass.
    */
  def significantTermsIndexed(postings: DataFrame, docIds: DataFrame,
      fgDocs: DataFrame, minDocCount: Int, k: Int): DataFrame = {
    require(minDocCount >= 1, s"minDocCount must be >= 1, got $minDocCount")
    val fgFlag = fgDocs.select(col(fgDocs.columns.head).as("doc_id"))
      .distinct().withColumn("_fg", lit(true))
    val totals = docIds.select(col(docIds.columns.head).as("doc_id"))
      .distinct()
      .join(broadcast(fgFlag), Seq("doc_id"), "left")
      .agg(count(lit(1)).cast("double").as("_n"),
        sum(when(col("_fg"), 1).otherwise(0)).cast("double").as("_fgn"))
    postings
      .join(broadcast(fgFlag), Seq("doc_id"), "left")
      .groupBy("term")
      .agg(count(lit(1)).cast("double").as("_bgdf"),
        sum(when(col("_fg"), 1).otherwise(0)).cast("double").as("_fgdf"))
      .filter(col("_fgdf") >= minDocCount)
      .crossJoin(broadcast(totals))
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
}
