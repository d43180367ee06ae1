package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextExpressions, TextFunctions}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. Each is a narrow
  * projection over the text column — no shuffle, codegen-friendly, scales
  * with scan bandwidth.
  */
object TextAnalysis {

  val qualityStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Per-doc quality features: char length, token count, mean token
    * length, punctuation ratio, stopword ratio, and a composite score in
    * [0, 1] (simple length/punct/stopword heuristic).
    *
    * One [[graft.functions.TextMarkerStats]] pass per row — the composed
    * HOF form (`aggregate(transform(...))` + `filter` per ratio)
    * re-tokenized the document three times, interpreted. Semantics are
    * HOF-identical (`TextAnalysisSpec` cross-checks); mean token length
    * still uses actual token lengths, not (n_chars - separators)/n, which
    * would overcount under repeated/leading/trailing whitespace.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stats = TextExpressions.textMarkerStats(
      col(textCol), Seq(qualityStopwords))
    val nTok = col("_s.n_tokens")
    val nChars = col("_s.n_chars")
    // two-step projection: CollapseProject keeps the non-cheap stats
    // expression un-inlined, so the single pass stays single
    df.select(col(idCol), stats.as("_s"))
      .select(
        col(idCol),
        nChars.as("n_chars"),
        nTok.as("n_tokens"),
        when(nTok === 0, 0.0)
          .otherwise(col("_s.tok_len_sum").cast("double") / nTok)
          .as("mean_token_len"),
        when(nChars === 0, 0.0)
          .otherwise(col("_s.n_punct").cast("double") / nChars)
          .as("punct_ratio"),
        when(nTok === 0, 0.0)
          .otherwise(element_at(col("_s.hits"), 1).cast("double") / nTok)
          .as("stopword_ratio"))
  }

  /** Token counts: whitespace tokens plus a BPE-ish subword estimate
    * (regex word pieces: runs of ASCII alphanumerics, or any single other
    * non-space char — the classic pre-tokenizer shape, RE2-compatible so
    * the same pattern runs in any engine).
    */
  val piecePattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(piecePattern), lit(0)))
        .as("piece_tokens"))

  /** Language ID via stopword-marker argmax — same argmax/tie rules as
    * [[TextFunctions.langId]] (cross-checked in `TextAnalysisSpec`) but
    * all 5 marker lists counted in ONE tokenization pass instead of 5
    * interpreted re-splits per row.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = TextFunctions.langMarkers.toSeq.sortBy(_._1)
    val stats = TextExpressions.textMarkerStats(col(textCol), langs.map(_._2))
    val hits = df.select(
      col(idCol), stats.getField("hits").as("_h"))
    val scores = langs.indices.map(i => element_at(col("_h"), i + 1))
    val best = scores.reduce(greatest(_, _))
    val pred = langs.map(_._1).zip(scores).foldRight(lit("und"): Column) {
      case ((lang, s), elseCol) =>
        when(s > 0 && s === best, lit(lang)).otherwise(elseCol)
    }
    hits.select(col(idCol), pred.as("pred_lang"))
  }

  /** Repetition/boilerplate score: most-frequent n-gram count over total
    * n-grams (native one-pass expression) — the template/spam signal.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(idCol),
      TextExpressions.repetitionScore(col(textCol), n).as("repetition"))

  /** PII / URL scrub: count and redact emails, URLs, and phone-shaped
    * numbers — the standard pre-training privacy pass. RE2-compatible
    * patterns (no lookarounds), so the exact same regexes run in Spark's
    * codegen'd `regexp_replace` and in any RE2 engine; redaction order is
    * email → url → phone (an email inside a URL is already masked).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^ ]+"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, emailPattern, "<EMAIL>"),
          urlPattern, "<URL>"),
        phonePattern, "<PHONE>")
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(urlPattern), lit(0))).as("n_urls"),
      size(regexp_extract_all(t, lit(phonePattern), lit(0))).as("n_phones"),
      redacted.as("redacted"))
  }

  /** Host part of every URL mention in the corpus → `(domain, n_docs,
    * n_mentions)` — the domain-distribution report a web-curation
    * pipeline runs before per-domain caps or blocklist filtering (the
    * domain column it produces feeds [[graft.operators.Corpus.capPerStratum]]
    * / an anti-join directly). Domains compare lowercased, port and path
    * stripped.
    *
    * Scale shape: one narrow projection per doc (extract-all + distinct
    * within doc via array ops, no UDF), one explode bounded by mentions-
    * per-doc, one domain-keyed hash aggregate with map-side partials —
    * output is domain-cardinality-sized.
    */
  def domainCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hostPattern = "https?://([^/ :]+)" // capture group 1 = host
    val hosts = transform(
      regexp_extract_all(col(textCol), lit(hostPattern), lit(1)),
      h => lower(h))
    df.select(col(idCol), explode(hosts).as("domain"))
      .groupBy("domain")
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_mentions"))
  }

  /** Canonical content fingerprint (md5 of sorted distinct token set). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fingerprint"))

  /** Per-document top-k TF-IDF terms: `tf · ln(N / df)` over lowercase
    * whitespace tokens, ties broken by term — the keyword/topic signal
    * used for corpus exploration and domain tagging.
    *
    * Returns `(idCol, rk, term, tfidf)` with `rk ∈ [1, k]`.
    *
    * Scale shape: two hash aggregations off one tokenization (term
    * frequencies keyed by (doc, term); document frequencies keyed by
    * term — both with map-side partials), one shuffled equi-join on the
    * aggregated term table (vocabulary-sized, not corpus-sized), and a
    * per-doc ranking window whose partition holds one document's distinct
    * terms. The corpus row count joins in as a broadcast single-row
    * aggregate — no driver action. The ln runs on `N/df` (one IEEE
    * division, then one log), the same evaluation shape the oracle uses,
    * so the rounded scores agree bit-for-bit.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("_df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("_score",
        col("tf") * log(col("_n").cast("double") / col("_df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"),
        round(col("_score"), 6).as("tfidf"))
  }

  /** Type-token ratio (vocabulary richness): distinct tokens / total
    * tokens per document — near 1 for diverse text, near 0 for
    * template/boilerplate spam; a standard cheap quality signal next to
    * [[repetition]]. Empty docs score 0. Pure projection, no shuffle.
    */
  def typeTokenRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    df.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("ttr",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_distinct").cast("double") / col("n_tokens"), 6)))
  }

  /** Per-document token entropy in nats: `-Σ p ln p` over the token
    * distribution — the information-density quality signal (repetitive
    * spam scores low, diverse prose high). Docs with no tokens are
    * absent from the output.
    *
    * Determinism: each term's contribution is rounded to 9dp and summed
    * as DECIMAL, so the result does not depend on the order hash
    * aggregation merges terms (double addition is not associative) —
    * the same trick as the MaxSim scorer.
    *
    * Scale shape: one (doc, term) hash aggregation off one tokenization
    * (map-side partials bound hot terms), a doc-keyed re-aggregation for
    * lengths, one keyed join, one final doc-keyed sum — every stage
    * map-side combinable, no windows.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("_c"))
    val dl = tf.groupBy(col(idCol)).agg(sum("_c").as("_n"))
    val p = col("_c").cast("double") / col("_n").cast("double")
    tf.join(dl, idCol)
      .select(col(idCol),
        round(-p * log(p), 9).cast("decimal(18,9)").as("_e"))
      .groupBy(col(idCol))
      .agg(round(sum("_e").cast("double"), 6).as("entropy"))
  }

  /** Per-document CROSS-entropy under the corpus unigram model, in nats:
    * `Σ_t tf(t,d) · −ln(cf(t)/T) / dl(d)` — the model-free perplexity
    * proxy every large pretraining pipeline keeps as a quality signal.
    * Unlike [[tokenEntropy]] (a doc scored against ITSELF — repetition),
    * this scores a doc against the CORPUS: gibberish, boilerplate-free
    * rare-token noise, and out-of-distribution text score high; text made
    * of common corpus vocabulary scores low. Docs with no tokens are
    * absent from the output.
    *
    * Determinism: per-term contributions rounded to 9dp and summed as
    * DECIMAL (the [[tokenEntropy]] trick), final divide-by-length in
    * double rounded to 6dp.
    *
    * Scale shape: the unigram model IS the term dictionary — one
    * (doc, term) hash aggregation, one vocabulary-sized re-aggregation,
    * the scalar token total broadcast as a one-row frame, and one
    * term-keyed join of tf against the dictionary (vocabulary-bounded —
    * never broadcast, never corpus-sized). No windows, no driver state.
    */
  def unigramCrossEntropy(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("_c"))
    val cf = tf.groupBy(col("term")).agg(sum("_c").as("_cf"))
    val total = cf.agg(sum("_cf").as("_t"))
    val p = col("_cf").cast("double") / col("_t").cast("double")
    tf.join(cf, "term")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(col("_c") * -log(p), 9).cast("decimal(18,9)").as("_e"),
        col("_c"))
      .groupBy(col(idCol))
      .agg(round(sum("_e").cast("double") / sum("_c").cast("double"), 6)
        .as("unigram_ce"))
  }

  /** Per-document cross-entropy under an INTERPOLATED BIGRAM corpus
    * model, in nats — the sequence-aware upgrade of
    * [[unigramCrossEntropy]]: where the unigram score only asks "are
    * these tokens common?", this asks "do these tokens follow each
    * other the way the corpus does?", so shuffled or templated text
    * made of common words (which unigram CE cannot see) scores high.
    * Position 1 is scored by the unigram model; positions 2..n by
    * `λ·(cf(prev,t)/cf(prev)) + (1−λ)·(cf(t)/T)` — MLE bigram backed
    * off to unigram, the classic interpolated-LM smoothing (no zero
    * probabilities: any in-vocab continuation has unigram mass).
    * Output `(idCol, bigram_ce)` = mean −ln p over the doc's tokens;
    * empty docs are absent.
    *
    * Determinism: the [[unigramCrossEntropy]] contract — per-group
    * contributions rounded to 9dp, summed as DECIMAL, final mean
    * rounded to 6dp; the oracle mirrors the arithmetic term-for-term
    * (including computing `1 − λ` rather than its decimal literal, so
    * both engines use the identical double).
    *
    * Scale shape: one posexplode projection (fan-out = doc length, no
    * shuffle), two dictionary aggregations (unigram vocab-sized, bigram
    * distinct-adjacent-pair-sized), the scalar token total broadcast as
    * a one-row frame, and (prev,term)-keyed joins of per-doc counts
    * against the dictionaries — dictionary-bounded shuffles, never
    * corpus². No windows, no driver state.
    */
  def bigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.8): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val toks = df.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("_ts"))
      .filter(size(col("_ts")) > 0)
    val pos = toks.select(col(idCol), col("_ts"),
        posexplode(col("_ts")).as(Seq("_i", "term")))
      .withColumn("prev",
        when(col("_i") >= 1, element_at(col("_ts"), col("_i"))))
      .drop("_ts", "_i")
    val cf = pos.groupBy("term").agg(count(lit(1)).as("_cf"))
    val total = cf.agg(sum("_cf").as("_t"))
    val cfb = pos.filter(col("prev").isNotNull)
      .groupBy("prev", "term").agg(count(lit(1)).as("_cfb"))
    val pu = col("_cf").cast("double") / col("_t").cast("double")
    val first = pos.filter(col("prev").isNull)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("_c"))
      .join(cf, "term").crossJoin(broadcast(total))
      .select(col(idCol),
        round(col("_c") * -log(pu), 9).cast("decimal(18,9)").as("_e"),
        col("_c"))
    val rest = pos.filter(col("prev").isNotNull)
      .groupBy(col(idCol), col("prev"), col("term")).agg(count(lit(1)).as("_c"))
      .join(cfb, Seq("prev", "term"))
      .join(cf.select(col("term").as("prev"), col("_cf").as("_cfp")), "prev")
      .join(cf, "term")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(col("_c") * -log(
          lit(lambda) * (col("_cfb").cast("double") / col("_cfp").cast("double")) +
            lit(1 - lambda) * pu), 9).cast("decimal(18,9)").as("_e"),
        col("_c"))
    first.unionByName(rest)
      .groupBy(col(idCol))
      .agg(round(sum("_e").cast("double") / sum("_c").cast("double"), 6)
        .as("bigram_ce"))
  }

  /** Learn `nMerges` BPE merges from the corpus — the TRAINING side of
    * [[graft.functions.TextExpressions.BpeTokens]] (which APPLIES a
    * learned table; `BpeTokensSpec` pins train→apply round trips).
    * Classic BPE training never touches the corpus per iteration: it
    * operates on the WORD-FREQUENCY vocabulary — one corpus-sized hash
    * aggregate up front, then every iteration is vocabulary-sized:
    * adjacent symbol pairs (weighted by word count) → one hash
    * aggregate → a DETERMINISTIC global argmax (weight desc, pair asc)
    * → exactly ONE `(a, b)` row to the driver → the merge folded over
    * the vocab's symbol arrays (greedy left-to-right, the same
    * every-occurrence semantics the apply expression uses). Driver
    * state is the merge table itself (`nMerges` pairs — the model);
    * `localCheckpoint` truncates the iterative lineage (the
    * `Dedup.clusters` discipline). Words seed as CODE POINTS
    * (`regexp_extract_all '.'` walks code points), matching the apply
    * side's supplementary-plane safety.
    *
    * Training stops early when no adjacent pair remains (every word
    * fully merged). Not SQL-oracle-expressible (data-dependent
    * sequential argmax) — spec-gated, like the apply expression.
    *
    * This 2-arg form is the exact sequential algorithm (one merge per
    * job); the `batchSize` overload below amortizes the per-merge
    * scheduler round-trip for production-scale vocabularies.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String)] =
    learnBpeMerges(docs, textCol, nMerges, batchSize = 1)

  /** Batched BPE training: `batchSize > 1` folds the top-K
    * CHAIN-FREE pairs (weight-desc / pair-asc order) into the
    * vocabulary per Spark job, cutting the job count from nMerges to
    * ~nMerges/K — the difference between a 32k-merge production train
    * being 32k sequential scheduler round-trips and ~1k.
    *
    * The batch is PROVABLY sequential-identical — it extends only
    * while every argument sequential training would see is pinned:
    *
    *   - CHAINS stop the batch: a candidate whose left symbol is a
    *     taken pair's right, or whose right is a taken left (the
    *     "a b c" / "x a b" adjacencies) has its count REDUCED by the
    *     earlier merge — whether it still wins needs a recount, so the
    *     round ends there. Merely sharing a left (`(e,r)`,`(e,n)`) or
    *     right symbol keeps counts invariant (an `e` followed by `r`
    *     is never the `e` followed by `n`) and batches fine.
    *   - CREATED pairs bound the batch: merging `(a, b)` can mint
    *     `(x, ab)` / `(ab, y)` pairs sequential training would rank
    *     next; their counts are bounded by the OLD `(x, a)` / `(b, y)`
    *     weights (every minted adjacency was one of those), which the
    *     round's collected top already holds (anything uncollected
    *     weighs ≤ the collection minimum). A candidate at or below the
    *     running created-pair cap ends the round.
    *
    * Within a batch the greedy left-to-right fold is unambiguous (at
    * most one rule fires per position) and equals applying the members
    * sequentially. Net effect: conflict-light vocabularies (distinct
    * symbol pairs — code, CJK-ish text, the long tail after the first
    * hundred merges) batch near `batchSize`; conflict-heavy stretches
    * degrade gracefully toward one merge per job, never toward a wrong
    * merge table. The gated `x_bpe_train` row runs the batched trainer
    * against a strictly SEQUENTIAL DuckDB CTE oracle on the real
    * corpus; `batchSize = 1` (the default) is the classic algorithm,
    * bit for bit.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int): Seq[(String, String)] =
    learnBpeMergesWithStats(docs, textCol, nMerges, batchSize)._1

  /** [[learnBpeMerges]] plus the Spark-round count — the telemetry the
    * batching exists to shrink (specs pin conflict-light corpora train
    * in ~nMerges/batchSize rounds while staying sequential-identical).
    */
  private[graft] def learnBpeMergesWithStats(docs: DataFrame,
      textCol: String, nMerges: Int,
      batchSize: Int): (Seq[(String, String)], Int) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    // ROUND-STATE CONTRACT: the evolving vocabulary lives in
    // localCheckpoint(true) — VOCABULARY-sized (distinct words × symbol
    // arrays, not corpus-sized) executor block storage, refreshed per
    // round to keep the per-round plan flat (without truncation the
    // lineage grows one fold per round and planning time quadruples by
    // round ~30). localCheckpoint truncates lineage, so an EXECUTOR
    // LOSS mid-train fails the training job rather than recomputing —
    // acceptable for a train step that is rerun from its source corpus
    // on failure; a driver needing executor-loss resilience should set
    // a checkpoint dir and swap these two calls to reliable
    // checkpoint() (same semantics, adds an HDFS/object-store write per
    // round).
    var vocab = docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(expr("regexp_extract_all(w, '(?s).', 0)").as("syms"), col("n"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var continue = true
    while (continue && merges.size < nMerges) {
      val want = math.min(batchSize, nMerges - merges.size)
      // pull extra top pairs: the overflow feeds the created-pair cap
      // (anything uncollected weighs <= the collection minimum), and a
      // short pull only costs a smaller batch, never correctness
      val top = vocab
        // sequence(0, -1) DESCENDS — single-symbol words must not
        // reach the pair transform
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("w"))
        .orderBy(col("w").desc, col("a"), col("b"))
        .limit(want * 4 + 8).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      if (top.isEmpty) continue = false
      else {
        // the longest ranked prefix sequential training provably picks
        // in this order (see scaladoc): stop at the first chained
        // candidate (its count was reduced — needs a recount) or the
        // first candidate a minted pair could outrank
        val wMin = top.map(_._3).min
        def mintCap(a: String, b: String): Long = {
          // minted (x, ab) <= old (x, a); minted (ab, y) <= old (b, y)
          val known = top.collect {
            case (_, r, w) if r == a => w
            case (l, _, w) if l == b => w
          }
          math.max(wMin, if (known.isEmpty) 0L else known.max)
        }
        val lefts = scala.collection.mutable.HashSet.empty[String]
        val rights = scala.collection.mutable.HashSet.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var cap = -1L
        var i = 0
        var stop = false
        while (i < top.length && batch.size < want && !stop) {
          val (a, b, w) = top(i)
          if (batch.nonEmpty && (rights(a) || lefts(b) || w <= cap))
            stop = true
          else {
            batch += ((a, b))
            lefts += a
            rights += b
            cap = math.max(cap, mintCap(a, b))
          }
          i += 1
        }
        merges ++= batch
        // one fold applies the whole batch: disjointness makes the
        // per-element when-chain unambiguous (at most one rule fires)
        val folded = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => {
            val last = element_at(acc, -1)
            val hit = batch.map { case (a, b) =>
              last === lit(a) && x === lit(b)
            }.reduce(_ || _)
            when(size(acc) > 0 && hit,
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(last, x))))
              .otherwise(concat(acc, array(x)))
          })
        vocab = vocab.select(folded.as("syms"), col("n"))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq, rounds)
  }

  /** Memorization-risk score: the fraction of a document's word
    * n-gram shingles that occur in at least one OTHER document — docs
    * made of corpus-repeated n-grams are the ones a model reproduces
    * verbatim (and the ones near-dup/passage dedup should have caught);
    * this is the post-dedup audit signal. Same shingle convention as
    * the n-gram dedup family ([[graft.functions.WordShingles]]: raw
    * text, short docs collapse to one whole-text shingle).
    *
    * Scale shape: distinct (doc, shingle) pairs → shingle-keyed df
    * aggregate (vocabulary-sized result, hot boilerplate shingles
    * bounded by map-side partials) → one shingle-keyed join back →
    * per-doc counts. No windows, nothing quadratic — the all-pairs
    * version of this question is exactly what [[Dedup]] avoids.
    */
  def memorizationRisk(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), n)).as("g"))
      .distinct()
    val dfreq = sh.groupBy("g").agg(count(lit(1)).as("_df"))
    sh.join(dfreq, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") > 1, 1).otherwise(0)).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("shared_frac"))
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * `KL(P_source ‖ P_corpus) = Σ_t p_s(t) · ln(p_s(t)/p(t))` — the
    * distribution-shift report: which sources' vocabularies deviate
    * most from the mixture they feed (a spiking source, a scraper gone
    * wrong, a language drifting in). Every source term exists in the
    * corpus (superset), so no zero-probability guard is needed.
    *
    * Determinism: per-term contributions rounded to 9dp and summed as
    * DECIMAL (the [[tokenEntropy]] discipline). Scale shape: one
    * (source, term) hash aggregate, source- and vocabulary-sized
    * re-aggregations, one term-keyed join — never corpus-sized after
    * the first aggregate.
    */
  def sourceDivergence(df: DataFrame, stratumCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(stratumCol).as("src"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val cs = toks.groupBy("src", "term").agg(count(lit(1)).as("c"))
    val ns = cs.groupBy("src").agg(sum("c").as("ns"))
    val cf = cs.groupBy("term").agg(sum("c").as("cf"))
    val t = cf.agg(sum("cf").as("t"))
    val ps = col("c").cast("double") / col("ns").cast("double")
    val p = col("cf").cast("double") / col("t").cast("double")
    cs.join(ns, "src").join(cf, "term").crossJoin(broadcast(t))
      .select(col("src"), col("ns"),
        round(ps * log(ps / p), 9).cast("decimal(18,9)").as("_e"))
      .groupBy(col("src").as(stratumCol))
      .agg(max(col("ns")).as("n_tokens"),
        round(sum("_e").cast("double"), 6).as("kl"))
  }

  /** Corpus-wide frequent n-gram mining: the `k` most frequent word
    * n-grams with their total count and the number of distinct documents
    * containing each — the boilerplate-detection sweep (headers, footers,
    * license blurbs, navigation chrome) run before line/passage-level
    * dedup picks its removal list.
    *
    * Returns `(rk, ngram, n_total, n_docs)` with `rk ∈ [1, k]`, ordered by
    * count descending then n-gram (deterministic under ties).
    *
    * Scale shape: one pass of the native [[graft.functions.WordShingles]]
    * expression per row, one hash aggregation keyed by (doc, ngram) with
    * map-side partials (bounding any single key's shuffle volume by the
    * partition count, not its corpus frequency — exactly the hot-key case
    * boilerplate creates), one vocabulary-sized re-aggregation by ngram,
    * and a global top-k that plans as TakeOrderedAndProject (per-partition
    * heaps, k rows to the driver — never a full sort).
    */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(k > 0, s"k must be positive, got $k")
    val perDoc = df
      .select(col(idCol),
        explode(TextFunctions.wordShingles(lower(col(textCol)), n)).as("ngram"))
      .groupBy(col(idCol), col("ngram"))
      .agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_total").desc, col("ngram"))
    perDoc
      .groupBy("ngram")
      .agg(sum("_c").as("n_total"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_total").desc, col("ngram"))
      .limit(k)
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("ngram"), col("n_total"), col("n_docs"))
  }

  /** Blocklist screening — which of `patterns` occur as SUBSTRINGS of
    * each document, via one Aho–Corasick pass
    * ([[graft.functions.MultiSubstringMatch]]): the content-filtering
    * step every curation pipeline runs, at O(text + matches) per doc
    * regardless of list size (10k `contains` calls or one alternation
    * regex are O(terms × text)). Case-insensitive: text and patterns
    * are lowercased. Returns `(idCol, n_matched, matched_terms
    * comma-joined in pattern order, blocked = n_matched > 0)`.
    *
    * Scale shape: a pure projection — the automaton is a plan literal
    * built once per executor JVM, no broadcast, no shuffle, no UDF.
    */
  /** Unicode canonicalization ([[graft.functions.NormalizeText]]): NFC +
    * simple case fold + whitespace collapse — run BEFORE any content
    * hash, or NFC/NFD variants of one text land in different dedup
    * clusters and different postings. Returns `(idCol, normalized,
    * n_chars_before, n_chars_after)`; null text behaves as empty (the
    * oracle convention). Pure projection — no shuffle, no UDF.
    */
  def normalizeText(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    df.select(col(idCol),
      graft.functions.TextExpressions.normalizeText(raw).as("normalized"),
      length(raw).as("n_chars_before"))
      .withColumn("n_chars_after", length(col("normalized")))
  }

  def blocklistScreen(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "blocklist must be non-empty")
    val m = graft.functions.TextExpressions.multiSubstringMatch(
      lower(col(textCol)), patterns.map(_.toLowerCase))
    df.select(col(idCol), m.as("_m"))
      .select(col(idCol), size(col("_m")).as("n_matched"),
        array_join(col("_m"), ",").as("matched_terms"),
        (size(col("_m")) > 0).as("blocked"))
  }

  /** Zipf power-law fit of the corpus term distribution: least-squares
    * slope/intercept/R² of `ln freq` against `ln rank` — the corpus
    * health number every data card reports (natural language sits near
    * slope −1; a crawl dominated by boilerplate or template spam bends
    * the tail and the fit flags it). Returns ONE row
    * `(n_terms, slope, intercept, r2)`.
    *
    * Determinism contract: per-term x/y are `round(ln(·), 9)` (the
    * entropy convention — identical doubles across engines up to an
    * ln ULP at a rounding boundary), the five regression moments sum
    * those as exact decimals (order-free), and the closed-form
    * slope/intercept/R² is plain arithmetic on the five sums, rounded
    * 6dp.
    *
    * Scale shape: one map-side-combinable term count collapses the
    * corpus to vocabulary space; the rank window and the moment sums
    * run over the vocabulary frame (bounded by language, not corpus
    * size), so the single-partition rank window never sees corpus
    * rows.
    */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    val tc = df.select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_c").desc, col("_t"))
    val pts = tc.withColumn("_rk", row_number().over(w))
      .select(round(log(col("_rk").cast("double")), 9).as("_x"),
        round(log(col("_c").cast("double")), 9).as("_y"))
    def d9(c: Column) = round(c, 9).cast("decimal(28,9)")
    val sums = pts.agg(
      count(lit(1)).cast("double").as("_n"),
      sum(d9(col("_x"))).cast("double").as("_sx"),
      sum(d9(col("_y"))).cast("double").as("_sy"),
      sum(d9(col("_x") * col("_y"))).cast("double").as("_sxy"),
      sum(d9(col("_x") * col("_x"))).cast("double").as("_sxx"),
      sum(d9(col("_y") * col("_y"))).cast("double").as("_syy"))
    sums.select(col("_n").cast("long").as("n_terms"),
        round((col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx")), 6)
          .as("slope"),
        round((col("_sy") - ((col("_n") * col("_sxy") -
          col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx"))) *
          col("_sx")) / col("_n"), 6).as("intercept"),
        round((col("_n") * col("_sxy") - col("_sx") * col("_sy")) *
          (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          ((col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
           (col("_n") * col("_syy") - col("_sy") * col("_sy"))), 6)
          .as("r2"))
  }
}
