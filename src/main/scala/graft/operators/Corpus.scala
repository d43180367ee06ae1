package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TextFunctions

/** Corpus-level curation operators a training-data pipeline needs beyond
  * per-document scoring: benchmark decontamination and sequence packing.
  */
object Corpus {

  /** Benchmark decontamination: flag every training document that shares
    * at least one word n-gram with an evaluation/benchmark corpus — the
    * standard test-set-contamination sweep run before any pretraining job.
    *
    * Returns one row per training doc: `(idCol, n_shared, contaminated)`
    * where `n_shared` counts DISTINCT shared shingles.
    *
    * Scale shape: the benchmark side is small (eval suites are at most
    * ~10^6 shingles) → `broadcast` distinct-shingle set, so the 100 TB
    * training side is probed map-side with NO shuffle at join time. The
    * only shuffles are the per-doc distinct + count, both keyed by doc id
    * and combinable map-side. Shingling is the native [[graft.functions.WordShingles]]
    * expression (one pass per row).
    */
  def decontaminate(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val bsh = bench
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("_sh"))
      .distinct()
    val hits = train
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), n)).as("_sh"))
      // broadcast-probe FIRST, distinct after: only contaminated
      // (id, shingle) pairs ever reach a shuffle
      .join(broadcast(bsh), Seq("_sh"))
      .select(col(idCol), col("_sh")).distinct()
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Source-interleaved training order: a reproducible shuffle WITHIN
    * each source (the [[sampleHash]] keep-order), then sources
    * round-robin by per-source rank — so every training window sees a
    * balanced source mix instead of megabatches of one domain (the
    * curriculum failure mode of sorting a concatenated corpus). The
    * interleave is exactly `ORDER BY (rank_in_source, source)`:
    * position 1..S are the S sources' first docs, and so on; a source
    * that runs out simply drops from later rounds.
    *
    * Scale shape: per-source ranks come from
    * [[Batching.withGroupRowNumber]] (two-phase, never a per-source
    * window task), the global position from
    * [[Batching.withGlobalRowNumber]] — no single-partition exchange
    * anywhere. Returns `(position, idCol, stratumCol,
    * rank_in_source)`.
    */
  def interleaveBySource(df: DataFrame, idCol: String,
      stratumCol: String): DataFrame = {
    val ranked = Batching.withGroupRowNumber(
      df.select(col(idCol), col(stratumCol),
        sampleHash(col(idCol)).as("_h")),
      stratumCol, struct(col("_h"), col(idCol)), "rank_in_source")
    Batching.withGlobalRowNumber(ranked,
        struct(col("rank_in_source"), col(stratumCol)), "position")
      .select(col("position"), col(idCol), col(stratumCol),
        col("rank_in_source"))
  }

  /** Padding-waste report for length-bucketed batch inference: when
    * sequences batch by length bucket and pad to the bucket boundary,
    * what fraction of accelerator tokens is padding? One row per
    * policy — `global_max` (no bucketing: everything pads to the
    * corpus max — the waste ceiling), `pow2` (pad to the next power of
    * two), `mult64` (pad to the next multiple of 64, the
    * tensor-core-alignment default). The numbers decide the bucketing
    * a serving/embedding pipeline runs with; at 100 TB the difference
    * is a GPU-fleet bill.
    *
    * Determinism: bucket boundaries are integer-exact on both engines —
    * `mult64` by modular arithmetic, `pow2` by an explicit
    * threshold chain (a float `2^ceil(log2 l)` would disagree at exact
    * powers of two), capped at 2^20 (longer docs error loudly rather
    * than bucket wrong). Waste fractions round 6dp.
    *
    * Scale shape: one projection computes each row's bucketed lengths,
    * one map-side-combinable aggregate collapses the corpus to a
    * single moments row, and the per-policy rows explode from that one
    * row — corpus-size work is the scan only. Zero-token docs are
    * excluded (they'd batch to nothing).
    */
  def paddingWaste(df: DataFrame, textCol: String): DataFrame = {
    val pow2Cap = 1 << 20
    def pow2Ceil(l: Column): Column = {
      val powers = (0 to 20).map(1 << _)
      powers.init.foldRight(
        when(l <= pow2Cap, lit(pow2Cap)).otherwise(raise_error(concat(
          lit(s"paddingWaste: doc longer than $pow2Cap tokens: "),
          l.cast("string"))))) {
        (p, acc) => when(l <= p, lit(p)).otherwise(acc)
      }
    }
    def mult64Ceil(l: Column): Column =
      l + pmod(lit(64) - pmod(l, lit(64)), lit(64))
    val base = df
      .select(TextFunctions.tokenCount(col(textCol)).cast("long").as("_l"))
      .filter(col("_l") > 0)
      .select(col("_l"), pow2Ceil(col("_l")).cast("long").as("_p2"),
        mult64Ceil(col("_l")).as("_m64"))
    val agg = base.agg(count(lit(1)).as("_n"), sum(col("_l")).as("_real"),
      max(col("_l")).as("_mx"), sum(col("_p2")).as("_sp2"),
      sum(col("_m64")).as("_sm64"))
    def waste(padded: Column): Column =
      round((padded - col("_real")).cast("double") / padded, 6)
    agg.select(explode(array(
        struct(lit("global_max").as("policy"),
          (col("_n") * col("_mx")).as("padded_tokens"),
          waste(col("_n") * col("_mx")).as("waste_frac")),
        struct(lit("mult64").as("policy"), col("_sm64").as("padded_tokens"),
          waste(col("_sm64")).as("waste_frac")),
        struct(lit("pow2").as("policy"), col("_sp2").as("padded_tokens"),
          waste(col("_sp2")).as("waste_frac")))).as("_r"),
        col("_n"), col("_real"))
      .select(col("_r.policy").as("policy"), col("_n").as("n_docs"),
        col("_real").as("real_tokens"),
        col("_r.padded_tokens").as("padded_tokens"),
        col("_r.waste_frac").as("waste_frac"))
      .orderBy("policy")
  }

  /** Per-document contamination FRACTION — the reporting sibling of
    * [[decontaminate]]'s binary flag: what share of a training doc's
    * distinct `n`-grams appear anywhere in the benchmark suite, plus a
    * severity bucket (clean < 0.1 ≤ partial < 0.5 ≤ heavy). A doc
    * quoting one benchmark sentence and a doc that IS a benchmark doc
    * both flag binary-contaminated; the fraction separates "trim the
    * quote" from "drop the doc" — the dirty-fraction triage the GPT-3
    * appendix ran after its decontamination bug.
    *
    * Scale shape: the denominator (`size(array_distinct(shingles))`)
    * is a pure per-row projection — NO corpus-wide distinct shuffle;
    * the numerator reuses [[decontaminate]]'s probe-first trick
    * (broadcast benchmark set, only contaminated (id, shingle) pairs
    * reach a shuffle). The severity comparison reads the ROUNDED
    * fraction so engines agree at the boundary.
    */
  def contaminationFraction(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val bsh = bench
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("_sh"))
      .distinct()
    val hits = train
      .select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("_sh"))
      .join(broadcast(bsh), Seq("_sh"))
      .select(col(idCol), col("_sh")).distinct()
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    val frac = round(coalesce(col("n_shared"), lit(0L)).cast("double") /
      col("n_shingles"), 6)
    train.select(col(idCol),
        size(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
          .cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        frac.as("shared_frac"),
        when(frac >= 0.5, "heavy").when(frac >= 0.1, "partial")
          .otherwise("clean").as("severity"))
  }

  /** Embedding-space decontamination — the SEMANTIC sibling of
    * [[decontaminate]]: a training row is contaminated when its
    * embedding's cosine to ANY eval-set embedding reaches `threshold`
    * (catches paraphrased/translated benchmark leakage the n-gram
    * overlap test misses). Returns `(idCol, max_cosine 6dp,
    * contaminated)` per non-null-vector training row; the flag
    * compares the ROUNDED cosine so engines agree at the boundary.
    *
    * Scale shape: eval suites are small by construction → the eval
    * side is broadcast and scored map-side with the codegen'd cosine;
    * the per-row max is a map-side-combinable hash agg keyed by id, so
    * the 100 TB training side shuffles one row per doc, never the
    * (train × eval) product. Null training vectors are excluded (they
    * cannot be scored); an EMPTY (or all-null-vector) eval side means
    * "nothing to compare against", so every scorable training row comes
    * back `(max_cosine = null, contaminated = false)` — not zero rows,
    * which would read as every training doc vanishing. The left join
    * that provides this is against the id-keyed aggregate (one row per
    * doc), not the eval product.
    */
  def decontaminateEmbeddings(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val ev = broadcast(
      eval.filter(col(vecCol).isNotNull).select(col(vecCol).as("_ev")))
    // ONE training-side pass: the broadcast LEFT join keeps every
    // scorable row even when the eval side is empty (the row survives
    // with a null cosine → contaminated=false), and the id-keyed max
    // agg emits one row per DISTINCT id — no second corpus scan
    train.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .join(ev, lit(true), "left")
      .groupBy(idCol)
      .agg(max(graft.functions.VectorExpressions
        .cosineFast(col(vecCol), col("_ev"))).as("_mc"))
      .select(col(idCol),
        round(col("_mc"), 6).as("max_cosine"),
        coalesce(round(col("_mc"), 6) >= threshold, lit(false))
          .as("contaminated"))
  }

  /** Sequence packing: assign documents to fixed token-budget bins in a
    * deterministic global order — the layout step that turns a shuffled
    * corpus into fixed-length training sequences. A document's bin is the
    * bin its START offset falls into (contiguous fill; boundary docs
    * spill into the next bin's budget, the standard streaming packer).
    *
    * Returns `(idCol, n_tokens, bin_id)`; whitespace token counts.
    *
    * Scale shape: the global running offset uses [[withGlobalCumSum]] —
    * range-partition + two lightweight passes — NOT a single-partition
    * window (`sum().over(Window.orderBy(...))` funnels the corpus through
    * one task).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val counted = df.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    withGlobalCumSum(counted, col(idCol), col("n_tokens"), "_start")
      .select(col(idCol), col("n_tokens"),
        expr(s"_start DIV $budget").as("bin_id"))
  }

  /** Materialize packed bins as training sequences: every bin's documents
    * concatenated in id order, with doc/token accounting — the step that
    * turns [[packSequences]]'s assignment into actual fixed-budget
    * sequences. Per-bin text is bounded by the token budget, so group
    * state is bounded regardless of corpus size; the single shuffle is
    * keyed by bin.
    */
  def binTexts(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    val packed = packSequences(df, idCol, textCol, budget)
    df.select(col(idCol), col(textCol)).join(packed, idCol)
      .groupBy("bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        // sort_array over (id, text) structs orders by id; the transform
        // runs once per BIN (not per doc) so interpreted eval is fine
        array_join(
          transform(array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          " ").as("seq_text"))
  }

  /** Deterministic hash sampling: keep a row iff
    * `md5_56(id) % 1000 < permille`. The hash is the low 56 bits (bytes
    * 8–14, little-endian) of `md5(id)` — positive in a signed long AND
    * expressible in DuckDB as `md5_number_lower(x) % 2^56`, so the exact
    * kept-set is reproducible in any engine (the property that makes a
    * sampled corpus auditable). Stratification is free: an md5 of the id
    * is uniform within every stratum.
    */
  def sampleHash(c: Column): Column = hexLow56(md5(c.cast("string")))

  /** The conversion half of [[sampleHash]]: low-56-bit little-endian
    * value of an already-computed 32-char md5 hex string. Cheap
    * (substring/conv arithmetic, no hashing), so a BOUND hex value —
    * a lambda variable inside a higher-order function — may be
    * referenced by all 7 byte terms without re-triggering the md5.
    * Interpreted HOF lambdas do no subexpression caching: embedding
    * [[sampleHash]] itself in a lambda evaluates its md5 subtree once
    * per term per element. Hash once (e.g. a `transform` producing the
    * hex array), then convert with this over the bound value.
    */
  def hexLow56(hex: Column): Column =
    (0 until 7).map { i =>
      shiftleft(conv(substring(hex, 17 + 2 * i, 2), 16, 10).cast("long"), 8 * i)
    }.reduce(_.bitwiseOR(_))

  def deterministicSample(df: DataFrame, idCol: String,
      permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0,1000], got $permille")
    df.filter(pmod(sampleHash(col(idCol)), lit(1000L)) < permille)
  }

  /** Deterministic token masking — the MLM/span-corruption PREVIEW
    * (BERT/T5-style pretraining corruption, reproducible): a token at
    * position `i` of document `id` is replaced by `maskTok` iff
    * `md5_56(id + ":" + i) % 1000 < permille` — the same md5-56 bucket
    * trick as [[deterministicSample]], so the corrupted corpus is
    * bit-identical in any engine and any run (auditable masking — a
    * training-data bug can be replayed). Returns `(idCol, n_tokens,
    * n_masked, masked_text)`.
    *
    * Scale shape: a pure projection — no explode, no shuffle; cost is
    * O(tokens) with exactly ONE md5 per token, computed in a single
    * fused native pass ([[graft.functions.PrefixIndexHash56]] — the
    * md5-56 family). The mask decision reads each hash as a `zip_with`
    * lambda variable: interpreted HOF lambdas cache nothing, so
    * embedding [[sampleHash]]'s 7-term md5 tree in the lambda would
    * re-run the md5 7× per token (the r8 bench tax).
    */
  def maskTokens(df: DataFrame, idCol: String, textCol: String,
      permille: Int, maskTok: String = "<mask>"): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0,1000], got $permille")
    // null text behaves as empty (n_tokens 0, masked_text '') — the
    // DuckDB oracle convention; a NULL row here would silently diverge
    val toks = filter(split(coalesce(col(textCol), lit("")), " "),
      t => t =!= lit(""))
    val hashes = graft.functions.TextExpressions.prefixIndexHash56(
      concat(col(idCol).cast("string"), lit(":")), size(col("_t")))
    df.select(col(idCol), toks.as("_t"))
      .select(col(idCol), size(col("_t")).as("n_tokens"),
        // a null id nulls the hash array and zip_with with it — fall
        // back to the unmasked tokens (the pre-fusion per-token form
        // evaluated its null hash comparison to false, keeping tokens)
        coalesce(zip_with(col("_t"), hashes, (t, h) =>
          when(pmod(h, lit(1000L)) < permille,
            lit(maskTok)).otherwise(t)), col("_t")).as("_m"))
      .select(col(idCol), col("n_tokens"),
        size(filter(col("_m"), t => t === lit(maskTok))).as("n_masked"),
        array_join(col("_m"), " ").as("masked_text"))
  }

  /** Deterministic SPAN corruption — the T5 span-denoising preview
    * ([[maskTokens]] is the BERT-style single-token sibling): the token
    * stream is cut into stride-`stride` segments; segment `j` of
    * document `id` fires iff `md5_56(id:j:s) % 1000 < permille`, and a
    * fired segment masks its first `1 + md5_56(id:j:l) % maxSpan`
    * tokens behind ONE sentinel `<extra_id_K>` (K = the span's rank in
    * document order). Targets are the T5 layout: each span's sentinel
    * followed by the masked tokens, closed by a final sentinel. Spans
    * cannot overlap by construction (each lives in its own segment,
    * `maxSpan ≤ stride`), which is what makes the corruption exactly
    * reproducible in any engine — the md5-56 convention of
    * [[deterministicSample]], auditable like the rest of the family.
    * Returns `(idCol, n_tokens, n_spans, masked_text, targets_text)`.
    *
    * Scale shape: segments explode to at most tokens/stride rows per
    * doc (hash evaluated ONCE per segment in a codegen'd top-level
    * projection, never inside a HOF lambda), span ranks come from a
    * per-document window over fired segments (state bounded by
    * spans-per-doc), and the final projection rebuilds text via
    * bound-value lookups (`element_at` on the per-doc span map) — two
    * id-keyed shuffles total, independent of corpus width.
    */
  def maskSpans(df: DataFrame, idCol: String, textCol: String,
      permille: Int, stride: Int = 4, maxSpan: Int = 3,
      sentinelPrefix: String = "<extra_id_"): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0,1000], got $permille")
    require(stride >= 1, s"stride must be positive, got $stride")
    require(maxSpan >= 1 && maxSpan <= stride,
      s"maxSpan must be in [1, stride], got $maxSpan")
    def sentinel(k: Column): Column =
      concat(lit(sentinelPrefix), k.cast("string"), lit(">"))
    // null text behaves as empty (0 spans, masked_text '', targets the
    // bare closing sentinel) — the DuckDB oracle convention
    val toks = filter(split(coalesce(col(textCol), lit("")), " "),
      t => t =!= lit(""))
    val base = df.select(col(idCol), toks.as("_t"))
      .withColumn("_n", size(col("_t")))
    def segHash(tag: String) = sampleHash(concat(
      col(idCol).cast("string"), lit(":"), col("_j").cast("string"),
      lit(":" + tag)))
    val spans = base.filter(col("_n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), expr(s"cast((_n - 1) div $stride as long)")))
          .as("_j"))
      .filter(pmod(segHash("s"), lit(1000L)) < permille)
      .withColumn("_len",
        (pmod(segHash("l"), lit(maxSpan.toLong)) + 1).cast("int"))
      .withColumn("_k", (row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)
          .orderBy("_j")) - 1).cast("int"))
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("_j"), col("_k"),
        col("_len")))).as("_spans"))
    val emptySpans = array().cast(
      "array<struct<_j:bigint,_k:int,_len:int>>")
    val masked = base.join(spans, Seq(idCol), "left")
      .withColumn("_spans", coalesce(col("_spans"), emptySpans))
      .withColumn("_sm", map_from_entries(
        transform(col("_spans"), s => struct(s.getField("_j"), s))))
    def segOf(i: Column): Column =
      floor(i.cast("double") / stride).cast("long")
    masked.select(col(idCol), col("_n").as("n_tokens"),
        size(col("_spans")).as("n_spans"),
        array_join(filter(transform(col("_t"), (t, i) => {
          val e = element_at(col("_sm"), segOf(i))
          val inSpan = e.isNotNull &&
            (i.cast("long") - segOf(i) * stride) < e.getField("_len")
          when(inSpan && i.cast("long") === segOf(i) * stride,
            sentinel(e.getField("_k")))
            .when(inSpan, lit(null))
            .otherwise(t)
        }), t => t.isNotNull), " ").as("masked_text"),
        array_join(concat(
          transform(col("_spans"), s =>
            concat(sentinel(s.getField("_k")), lit(" "),
              array_join(slice(col("_t"),
                (s.getField("_j") * stride + 1).cast("int"),
                s.getField("_len")), " "))),
          array(sentinel(size(col("_spans"))))), " ").as("targets_text"))
  }

  /** Deterministic train/val/test split: assign each row a split label
    * from `md5_56(id) % 1000` — the holdout-carving step run before any
    * training job. The same hash family as [[deterministicSample]], so the
    * assignment is reproducible in any engine and STABLE under corpus
    * growth: a document's split never changes when other documents are
    * added or removed (the property row-number splits lack).
    *
    * Buckets: `[0, testPermille)` → test, `[testPermille,
    * testPermille + valPermille)` → val, rest → train.
    *
    * Scale shape: pure map-side projection — no shuffle, no state; the
    * split column is computed inline at scan speed.
    */
  def hashSplit(df: DataFrame, idCol: String,
      valPermille: Int, testPermille: Int): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"val+test permille must fit in [0,1000], got $valPermille+$testPermille")
    val bucket = pmod(sampleHash(col(idCol)), lit(1000L))
    df.withColumn("split",
      when(bucket < testPermille, lit("test"))
        .when(bucket < testPermille + valPermille, lit("val"))
        .otherwise(lit("train")))
  }

  /** Leakage-safe split: [[hashSplit]] keyed on the content FINGERPRINT
    * (md5 of the sorted distinct lowercased token set —
    * [[graft.functions.TextFunctions.fingerprint]]) instead of the row
    * id, so a document and its exact or token-set-identical near-copies
    * ALWAYS land in the same split. A per-id split cannot give that
    * guarantee: a doc and its crawl-duplicate hash independently, and at
    * web-corpus dup rates a test set assembled per-id is contaminated by
    * construction. Any precomputed group key works via plain
    * `hashSplit(df, groupCol, …)` (site domain, dedup-cluster canonical
    * id); this convenience derives the fingerprint inline and keeps it
    * in the output for audit.
    *
    * Scale shape: identical to [[hashSplit]] — pure map-side projection
    * (fingerprint + md5-56 bucket computed at scan speed), no shuffle,
    * no state.
    */
  def leakageSafeSplit(df: DataFrame, textCol: String,
      valPermille: Int, testPermille: Int): DataFrame =
    hashSplit(
      df.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol))),
      "fingerprint", valPermille, testPermille)

  /** Exact-count stratified sampling: keep the `quota(stratum)` rows with
    * the SMALLEST (md5-56, id) rank within each stratum — where
    * [[mixtureSample]] fixes per-stratum keep RATES (kept counts are
    * binomial), this fixes per-stratum kept COUNTS exactly: the shape a
    * fixed-size eval set or a per-source annotation budget needs. The
    * rank ordering is the same hash family as every sampler here, so the
    * kept set is engine-reproducible, and NESTED across quotas: raising
    * a quota only ever adds rows.
    *
    * Strata not in `quotas` use `defaultQuota`; a stratum smaller than
    * its quota is kept whole. Generalizes [[capPerStratum]] (uniform
    * cap) to a per-stratum allocation.
    *
    * Scale shape: one stratum-keyed shuffle for the rank window, one
    * counter of window state per stratum. A stratum holding most of the
    * corpus makes that window single-task — at that skew, cap the heavy
    * stratum with a pre-filter `pmod(md5_56(id), 1000) < p` sized from
    * stratum counts (the nested-keep-set property makes the pre-filter
    * lossless for any quota under p‰ of the stratum).
    */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String,
      quotas: Map[String, Int], defaultQuota: Int): DataFrame = {
    (quotas.values.toSeq :+ defaultQuota).foreach(q =>
      require(q >= 0, s"quota must be >= 0, got $q"))
    val quota = quotas.foldLeft(lit(defaultQuota)) {
      case (acc, (stratum, q)) =>
        when(col(stratumCol) === stratum, lit(q)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(sampleHash(col(idCol)), col(idCol))
    df.withColumn("_graft_rank", row_number().over(w))
      .filter(col("_graft_rank") <= quota)
      .drop("_graft_rank")
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * priority sampling, the weight-proportional draw the rate/quota
    * samplers can't express (sample 10k docs ∝ quality score): each row
    * gets priority `key = −ln(u)/w` with `u = (md5_56(id)+1)/2⁵⁶`, and
    * the sample is the k SMALLEST keys (equivalent to ranking by
    * `u^(1/w)`, the classic A-ES scheme) — inclusion probability scales
    * with weight, the draw is exactly-k, and the same md5-56 hash family
    * as every sampler here makes it engine-reproducible and NESTED in k
    * (the top-50 sample is a prefix of the top-100). Rows with
    * non-positive weight fail loudly (a silent drop would skew the
    * inclusion probabilities the caller reasoned about).
    *
    * Returns the sampled rows plus `priority` (9dp-rounded, the rank
    * key). Determinism: u is an exact dyadic rational identical in any
    * engine; the single `ln` is rounded at 9dp before ranking with an
    * id tie-break, so a last-ULP libm difference cannot reorder the
    * cut (adjacent priorities in a real corpus differ by ≫ 1e-9).
    *
    * Scale shape: one projection computes priorities; global top-k
    * plans as TakeOrderedAndProject (k rows per partition to the
    * driver) — no shuffle, no window, no corpus sort.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (sampleHash(col(idCol)).cast("double") + 1.0) /
      lit(72057594037927936.0) // 2^56
    val w = when(weightCol > 0, weightCol.cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedSample: non-positive weight for id "),
        col(idCol).cast("string"))).cast("double"))
    df.withColumn("priority", round(-log(u) / w, 9))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Mixture sampling: keep each row with a per-stratum rate — the
    * source-weighting step of corpus mixing (e.g. up-weight curated
    * sources, down-sample web crawl). `ratesPermille` maps stratum value →
    * keep rate in permille; strata not listed use `defaultPermille`.
    * Same md5-56 keep-set as [[deterministicSample]], so the kept set is
    * engine-reproducible, stable under corpus growth, and NESTED across
    * rates: the 100‰ sample of a stratum is a subset of its 200‰ sample,
    * which lets a pipeline dial mixture weights without resampling.
    *
    * Scale shape: the rate table is a small CASE literal in the plan
    * (mixtures enumerate at most hundreds of sources) — pure map-side
    * filter, no shuffle, no join.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesPermille: Map[String, Int], defaultPermille: Int): DataFrame = {
    (ratesPermille.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille must be in [0,1000], got $p"))
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(pmod(sampleHash(col(idCol)), lit(1000L)) < rate)
  }

  /** Exponentiated-gradient mixture reweighting — the DoReMi-style
    * step that turns per-source EVALUATION feedback into the next
    * round's sampling weights: `w'_s ∝ w_s · exp(η · loss_s)`,
    * normalized (sources with high excess loss gain mass; η is the
    * step size). Input is one row per source `(sourceCol, weightCol,
    * lossCol)`; output adds `new_weight`. The per-source scaled terms
    * round to 6dp and normalize through an EXACT decimal(18,6) sum, so
    * the result is engine-reproducible regardless of aggregation order
    * (the one libm `exp` per source is absorbed by the rounding, the
    * BM25 ln convention). New weights round to 6dp. The 6dp round is
    * also the precision floor: a scaled term below 5e-7 rounds to 0 and
    * contributes nothing; if EVERY term rounds to 0 the normalizer is
    * degenerate and the call fails loudly rather than emitting
    * NaN/Infinity weights.
    *
    * Scale shape: mixtures enumerate at most hundreds of sources — one
    * tiny aggregate broadcast back over the source rows; the 100 TB
    * corpus is untouched until the weights feed [[mixtureSample]].
    */
  def reweightMixture(df: DataFrame, sourceCol: String, weightCol: String,
      lossCol: String, eta: Double): DataFrame = {
    require(eta > 0, s"eta must be positive, got $eta")
    val raw = round(col(weightCol) * exp(lit(eta) * col(lossCol)), 6)
      .cast("decimal(18,6)")
    val scored = df.select(col(sourceCol), col(weightCol), col(lossCol),
      raw.as("_raw"))
    val total = scored.agg(sum(col("_raw")).as("_total"))
    scored.crossJoin(broadcast(total))
      .select(col(sourceCol), col(weightCol), col(lossCol),
        when(col("_total").isNull || col("_total") <= lit(0),
          raise_error(lit("reweightMixture: normalizer is zero — every " +
            "w*exp(eta*loss) term rounds to 0 at 6dp (weights below " +
            "5e-7) or inputs are null/degenerate")))
          .otherwise(round(
            col("_raw").cast("double") / col("_total").cast("double"), 6))
          .as("new_weight"))
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): score every raw-corpus document by how much more
    * likely its hashed n-gram features are under a TARGET domain's
    * feature distribution than under the raw corpus's — the
    * principled replacement for hand-written quality rules when "good"
    * is defined by an exemplar corpus. Features are unigrams + bigrams
    * hashed into `buckets` bins (the md5-56 sampling-hash family, so
    * the binning is engine-reproducible); both distributions are
    * add-one-smoothed over the bins; a doc's log-weight is
    * `Σ_b c_b · (ln p_target(b) − ln p_raw(b))`.
    *
    * Determinism: each bin's log-ratio is rounded to 9dp and fixed as
    * decimal(18,9); per-doc accumulation is then an EXACT decimal sum
    * of integer-count × ratio terms (order-free), with one final 6dp
    * double round — the [[reweightMixture]]/bigram-CE convention, so
    * libm `ln` ULP differences cannot reorder the selection.
    *
    * Scale shape: ONE tokenize+shingle explode over the corpus (the
    * target flag rides the rows, so target and raw counts come out of
    * the same pass), a (doc, bucket)-keyed count agg, a buckets-sized
    * stats agg (map-side combinable; `buckets` rows regardless of
    * corpus size), and a BROADCAST of the log-ratio table back onto
    * the per-doc counts. No all-pairs anything; the only corpus-sized
    * shuffles are the two keyed aggs.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // feature hashes via the FUSED native pass (one md5-56 per n-gram in
    // one row-level call) — `sampleHash` inside the exploded stream is
    // the interpreted 7-term-tree-per-element class the r9 winnowing fix
    // killed; the hash family (Md5Low56 ≡ hexLow56∘md5) and the bucket
    // values are identical, only the per-element dispatch disappears
    // (x_dsir sf0.1 gate: 4.5 s → well under 1 s)
    val lowered = lower(col(textCol))
    val toks = TextFunctions.tokens(lowered)
    val uniH = when(size(toks) >= 1,
      graft.functions.TextExpressions.wordShingleHash56(lowered, 1))
      .otherwise(array().cast("array<long>"))
    val biH = when(size(toks) >= 2,
      graft.functions.TextExpressions.wordShingleHash56(lowered, 2))
      .otherwise(array().cast("array<long>"))
    val feats = df.select(col(idCol), isTarget.as("_tgt"),
        explode(concat(uniH, biH)).as("_h"))
      .select(col(idCol), col("_tgt"),
        (col("_h") % buckets).as("_b"))
    val perDoc = feats.groupBy(col(idCol), col("_tgt"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val stats = perDoc.groupBy(col("_b"))
      .agg(sum(when(col("_tgt"), col("_c")).otherwise(0L)).as("_ct"),
        sum(col("_c")).as("_cr"))
    val tot = stats.agg(sum(col("_ct")).as("_tt"), sum(col("_cr")).as("_tr"))
    val ratio = stats.crossJoin(broadcast(tot))
      .select(col("_b").as("_rb"),
        round(
          log((col("_ct") + 1).cast("double") /
            (col("_tt") + buckets).cast("double")) -
          log((col("_cr") + 1).cast("double") /
            (col("_tr") + buckets).cast("double")), 9)
          .cast("decimal(18,9)").as("_lr"))
    perDoc.filter(!col("_tgt"))
      .join(broadcast(ratio), col("_b") === col("_rb"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_features"),
        round(sum(col("_c").cast("decimal(18,9)") * col("_lr"))
          .cast("double"), 6).as("weight"))
  }

  /** Temperature-scaled mixture sampling — the multilingual-LM source
    * balancing scheme (sampling weight ∝ n_s^α, α < 1 flattening the
    * source distribution so small sources are up-weighted relative to
    * proportional sampling; α = 1 is proportional, α = 0 uniform-by-
    * source). Where [[mixtureSample]] takes HAND-SET rates, this DERIVES
    * them from the corpus: stratum s keeps
    * `permille_s = clamp(⌊round(1000 · (f·N) · (n_s^α / Σ n_j^α) / n_s, 6)⌋, 0, 1000)`
    * — a target of `f·N` total docs allocated by temperature weight,
    * capped at keeping a whole stratum. The round-to-6dp before the
    * floor pins the integer rate against engine ULP differences, and the
    * md5-56 keep-set makes the kept set engine-reproducible and NESTED
    * across targets, like every sampler here.
    *
    * Scale shape: one stratum-sized aggregate (at most hundreds of
    * sources), its scalar total cross-joined back, and a BROADCAST join
    * of the per-stratum rate onto the corpus — pure map-side filter
    * after that; no corpus-sized shuffle.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0,1], got $targetFraction")
    val strata = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    val totals = strata.agg(sum(pow(col("_n"), alpha)).as("_z"),
      sum(col("_n")).as("_nn"))
    // expression SHAPE mirrored by the SQL oracle term-for-term — the
    // 6dp round only absorbs ULP noise if both engines compute the same
    // arithmetic in the same order
    val pm = least(lit(1000L), greatest(lit(0L),
      floor(round(lit(1000.0) * (lit(targetFraction) * col("_nn")) *
        (pow(col("_n"), alpha) / col("_z")) / col("_n"), 6)).cast("long")))
    val rates = strata.crossJoin(broadcast(totals))
      .select(col(stratumCol), pm.as("_pm"))
    df.join(broadcast(rates), stratumCol)
      .filter(pmod(sampleHash(col(idCol)), lit(1000L)) < col("_pm"))
      .drop("_pm")
  }

  /** Epoch-weighted mixture MATERIALIZATION — [[mixtureSample]] extended
    * past 1.0: a stratum with 2500 permille-epochs (2.5 epochs) emits
    * every row twice plus a third copy for the deterministic md5-56 half
    * of its ids — how training mixes UPSAMPLE high-quality sources while
    * downsampling others, with the same engine-reproducible keep-set
    * contract as the sampler (the fractional copy goes to exactly the
    * ids any compliant engine would pick). Adds `epoch` (0-based copy
    * index) so downstream ordering/packing can tell copies apart.
    *
    * Scale shape: one narrow projection computes the copy count, one
    * generator explodes it — fan-out is the epoch factor (bounded, known
    * up front), no shuffle, no join. Factor 0 drops the stratum.
    */
  def mixtureEpochs(df: DataFrame, idCol: String, stratumCol: String,
      epochsPermille: Map[String, Int], defaultPermille: Int): DataFrame = {
    (epochsPermille.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0, s"permille-epochs must be >= 0, got $p"))
    val rate = epochsPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    // floor-div for full epochs (Column `/` is double division; these
    // magnitudes are double-exact), md5-56 keep-set for the fraction
    val copies = floor(rate / 1000).cast("long") +
      when(pmod(sampleHash(col(idCol)), lit(1000L)) <
          pmod(rate.cast("long"), lit(1000L)), 1L).otherwise(0L)
    df.withColumn("_n", copies)
      .filter(col("_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n")
  }

  /** Token-budget cap per stratum: keep a deterministic hash-ordered
    * prefix of each stratum whose cumulative token count stays under
    * `tokenBudget` — the budget-based twin of [[capPerStratum]] (real
    * mixing specs say "20B tokens of web, 5B of code", not row counts).
    * A row is kept iff the tokens BEFORE it (in (md5-hash, id) order) fit
    * the budget, so the first over-budget document is included (budget
    * overshoot bounded by one document) and every stratum with data emits
    * at least one row.
    *
    * Returns the input rows kept, plus `n_tokens` and `tokens_before`.
    *
    * Scale shape: one stratum-keyed shuffle; the per-stratum window state
    * is a single running sum (no buffering). Skewed strata behave like any
    * single-key window — mitigate upstream with [[capPerStratum]] if one
    * stratum dominates the corpus.
    */
  def capTokensPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      textCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"token budget must be positive, got $tokenBudget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(sampleHash(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("tokens_before") < tokenBudget)
  }

  /** Source balancing: cap each stratum (source/domain/language) at
    * `maxPerStratum` rows, keeping a deterministic hash-ordered prefix —
    * the over-represented-domain down-sampling step of corpus mixing.
    * Rank within a stratum orders by (md5-hash, id): uniform, stable
    * across runs/engines, and no rescan when the cap changes. One
    * stratum-keyed shuffle; the per-stratum window state is one counter.
    */
  def capPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      maxPerStratum: Int): DataFrame = {
    require(maxPerStratum > 0, s"cap must be positive, got $maxPerStratum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(sampleHash(col(idCol)), col(idCol))
    df.withColumn("_graft_rank", row_number().over(w))
      .filter(col("_graft_rank") <= maxPerStratum)
      .drop("_graft_rank")
  }

  /** Overlapping token-window chunking: split each document into
    * `chunkSize`-token windows advancing by `chunkSize - overlap` tokens —
    * the context-window preparation step for embedding/RAG indexing and
    * long-document training. Chunk ids are per-document ordinals; the last
    * chunk is short rather than padded (its real token count is emitted).
    *
    * Returns `(idCol, chunk_id, chunk_text, n_chunk_tokens)`.
    *
    * Scale shape: pure per-row generate + project — tokenize once, emit
    * one row per window via `posexplode(sequence(...))`, no shuffle, no
    * UDF. Fan-out is bounded by doc length / step, so task memory holds
    * one document's tokens at a time and the operator scales with scan
    * bandwidth like the text-analysis family.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("_w"))
      .withColumn("_n", size(col("_w")))
      .filter(col("_n") > 0)
      .select(col(idCol), col("_w"), col("_n"),
        posexplode(sequence(lit(0), col("_n") - 1, lit(step)))
          .as(Seq("chunk_id", "_s")))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("_w"), col("_s") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), col("_n") - col("_s")).as("n_chunk_tokens"))
  }

  /** Corpus version diff: given two snapshots keyed by `idCol`, classify
    * every id as `added` (only in `after`), `removed` (only in
    * `before`), `changed` (both, content hash differs), or `unchanged` —
    * the audit report run between dataset releases (what moved, what a
    * retrain will actually see). Content identity is md5 of `textCol`
    * (exact; near-dup drift is [[graft.operators.Dedup]]'s job).
    *
    * Returns `(idCol, status)` for every id in either snapshot.
    *
    * Scale shape: each side collapses to `(id, hash)` in a map-side
    * projection before the single id-keyed full-outer join — the join
    * carries two narrow columns per row, never document text.
    */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence is carried EXPLICITLY (md5(null) = null, so hash nullity
    // would misclassify a null-text row as absent); the hash compare is
    // null-safe so null-text vs null-text reads unchanged
    val a = before.select(col(idCol), md5(col(textCol)).as("_ha"),
      lit(true).as("_in_before"))
    val b = after.select(col(idCol), md5(col(textCol)).as("_hb"),
      lit(true).as("_in_after"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_in_before").isNull, lit("added"))
          .when(col("_in_after").isNull, lit("removed"))
          .when(col("_ha") <=> col("_hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Append a global EXCLUSIVE cumulative sum of `weightCol` in `orderCol`
    * order (row i gets the sum of weights of all rows before it), without
    * a single-partition window: range-partition + sort, one job for
    * per-partition weight totals, then partition-local prefix sums plus
    * the broadcast offsets — the cum-sum analogue of
    * [[Batching.withGlobalRowNumber]]. Both passes reuse the same shuffle
    * output, so the order is consistent.
    */
  /** Cross-source duplicate overlap: per source pair, how many distinct
    * content fingerprints they SHARE, each side's distinct-fingerprint
    * count, and the Jaccard overlap — the inter-source contamination
    * report run before mixing sources into a training corpus (a high
    * overlap pair means one source is substantially a mirror of the
    * other and double-counts its content in the mix).
    *
    * Scale shape: one distinct (fingerprint, stratum) hash aggregate
    * collapses the corpus first; the fingerprint-keyed self-join fans
    * out at most strata² rows PER FINGERPRINT (the distinct step caps a
    * fingerprint at one row per stratum — a boilerplate fingerprint
    * shared by millions of docs still joins as ≤ strata rows); the
    * per-stratum size table is strata-cardinality-sized and broadcasts.
    */
  def sourceOverlap(df: DataFrame, stratumCol: String,
      fingerprintCol: String): DataFrame = {
    val f = df.select(col(fingerprintCol).as("_fp"), col(stratumCol).as("_s"))
      .distinct()
    val sizes = f.groupBy(col("_s")).agg(count(lit(1)).as("_n"))
    val pairs = f.select(col("_fp"), col("_s").as("source_a"))
      .join(f.select(col("_fp"), col("_s").as("source_b")), Seq("_fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.select(col("_s").as("source_a"), col("_n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("_s").as("source_b"), col("_n").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")), 6)
          .as("jaccard"))
  }

  /** Global percent-rank WITHOUT a corpus-wide window: rank every row in
    * `orderCol`'s total order (pass a struct to break ties — e.g.
    * `struct(score, id)`) and emit `(rank - 1) / (n - 1)` — the
    * SQL `percent_rank()` of the fully-tiebroken ordering. The quality-
    * percentile normalization step ("keep the top 30% by score") that a
    * naive `Window.orderBy(score)` would serialize through ONE task at
    * corpus scale; here ranking is [[withGlobalCumSum]]'s two-phase
    * range-partitioned prefix sum (weight 1), so it scales like a sort.
    * `n == 1` emits 0.0 (percent_rank's convention).
    */
  def globalPercentRank(df: DataFrame, orderCol: Column,
      outCol: String): DataFrame = {
    val n = df.count()
    val denom = math.max(n - 1L, 1L).toDouble
    withGlobalCumSum(df, orderCol, lit(1L), "_graft_r0")
      .withColumn(outCol, col("_graft_r0").cast("double") / denom)
      .drop("_graft_r0")
  }

  /** Per-GROUP percent rank WITHOUT windows —
    * `percent_rank() OVER (PARTITION BY group ORDER BY order)` for the
    * case window partitioning cannot survive: a HOT group (half the
    * corpus from one source) funnels its whole partition through one
    * task under `Window.partitionBy`. Here rows range-partition on
    * `(group, order)` — a hot group SPREADS over adjacent partitions —
    * and ranks come from the [[withGlobalCumSum]] two-phase shape,
    * per-group: one lightweight per-(partition, group) count job
    * (sorted partitions keep groups contiguous, so it emits ≈ one row
    * per group-run, bounded by partitions + groups), driver-side
    * exclusive offsets, then partition-local rank assignment against
    * broadcast offsets. Denominator is percent_rank's `n − 1`
    * (single-row groups emit 0.0). Pass a tiebreaking struct as
    * `orderCol` for a total order, as with [[globalPercentRank]].
    */
  def groupPercentRank(df: DataFrame, groupCol: String, orderCol: Column,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, col(groupCol), orderCol)
      .sortWithinPartitions(col(groupCol), orderCol)
    val gIdx = sorted.schema.fieldIndex(groupCol)
    val rdd = sorted.rdd
    val runs: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex { (p, it) =>
      val counts = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        val g = r.get(gIdx); counts.update(g, counts.getOrElse(g, 0L) + 1L)
        Batching.guardGroupCardinality(counts.size, "groupPercentRank",
          groupCol)
      }
      counts.toList.map { case (g, c) => (p, g, c) }.iterator
    }.collect()
    val totals: Map[Any, Long] =
      runs.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._3).sum }
    // per-partition group -> (exclusive offset, pass-1 count): pass 2
    // re-checks its replayed counts so a between-pass recompute over a
    // nondeterministic source fails loudly (Batching.snapshotDiverged)
    val perPid: Map[Int, Map[Any, (Long, Long)]] = runs.groupBy(_._2)
      .iterator.flatMap { case (g, rs) =>
        val byPart = rs.sortBy(_._1)
        byPart.zip(byPart.map(_._3).scanLeft(0L)(_ + _))
          .map { case ((p, _, c), o) => (p, g, o, c) }
      }.toSeq.groupBy(_._1).map { case (p, rows) =>
        p -> rows.map { case (_, g, o, c) => g -> (o, c) }.toMap
      }
    val bTotals = spark.sparkContext.broadcast(totals)
    val bOffsets = spark.sparkContext.broadcast(perPid)
    val schema = sorted.schema.add(outCol, DoubleType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      val mine = bOffsets.value.getOrElse(p, Map.empty[Any, (Long, Long)])
      val seen = scala.collection.mutable.HashMap.empty[Any, Long]
      var cur: Any = null
      var started = false
      var acc = 0L
      val mapped = it.map { r =>
        val g = r.get(gIdx)
        if (!started || g != cur) {
          cur = g; started = true
          acc = mine.get(g).map(_._1).getOrElse(
            Batching.snapshotDiverged("groupPercentRank", p,
              s"group '$g' appeared in pass 2 but not in pass 1"))
        }
        seen.update(g, seen.getOrElse(g, 0L) + 1L)
        val denom = math.max(bTotals.value(g) - 1L, 1L).toDouble
        val rank = acc
        acc += 1L
        Row.fromSeq(r.toSeq :+ rank / denom)
      }
      Batching.verifiedEnd(mapped) { _ =>
        if (seen.size != mine.size ||
            mine.exists { case (g, (_, c)) => seen.getOrElse(g, 0L) != c })
          Batching.snapshotDiverged("groupPercentRank", p,
            s"pass 1 counted ${mine.size} groups/" +
              s"${mine.valuesIterator.map(_._2).sum} rows, pass 2 saw " +
              s"${seen.size} groups/${seen.valuesIterator.sum} rows")
      }
    }
    spark.createDataFrame(out, schema)
  }

  def withGlobalCumSum(df: DataFrame, orderCol: Column, weightCol: Column,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .withColumn("_graft_w", weightCol.cast("long"))
      .repartitionByRange(shufflePartitions, orderCol)
      .sortWithinPartitions(orderCol)
    val wIdx = sorted.schema.fieldIndex("_graft_w")
    val rdd = sorted.rdd
    // pass 1 records (weight sum, row count) per partition; pass 2
    // re-checks BOTH (a membership change can shift either) and fails
    // loudly on divergence — the two-jobs-one-shuffle snapshot guard
    val partFacts: Map[Int, (Long, Long)] = rdd
      .mapPartitionsWithIndex { (p, it) =>
        var s = 0L; var n = 0L
        it.foreach { r => s += r.getLong(wIdx); n += 1L }
        Iterator((p, (s, n)))
      }
      .collect().toMap
    val partSums = Array.tabulate(rdd.getNumPartitions)(
      partFacts.get(_).map(_._1).getOrElse(0L))
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      val (expectSum, expectRows) = partFacts.getOrElse(p, (0L, 0L))
      var acc = offsets(p)
      val mapped = it.map { r =>
        val start = acc
        acc += r.getLong(wIdx)
        Row.fromSeq(r.toSeq :+ start)
      }
      Batching.verifiedEnd(mapped) { n =>
        if (n != expectRows || acc - offsets(p) != expectSum)
          Batching.snapshotDiverged("withGlobalCumSum", p,
            s"pass 1 counted $expectRows rows/weight $expectSum, " +
              s"pass 2 saw $n rows/weight ${acc - offsets(p)}")
      }
    }
    spark.createDataFrame(out, schema).drop("_graft_w")
  }

  /** Preference-pair construction for reward-model / DPO training data:
    * within each group, pair the r-th BEST row (by `scoreCol`, ties to
    * the lower id) with the r-th WORST (mirrored tie-break, so all-tied
    * groups still pair distinct rows) for r = 1..min(⌊n/2⌋, maxPairs) —
    * the widest-margin-first pairing; an odd group's median row pairs
    * with nothing. Returns `(groupCol, pair_rank, chosen_id,
    * rejected_id, margin)` with `margin = chosen − rejected` score.
    *
    * Scale shape: both rankings window over the SAME group partitioning
    * (one shuffle, two in-partition sorts), and the chosen/rejected
    * halves meet through a (group, rank)-keyed equi-join whose keys are
    * unique on each side — never a per-group cross product, state
    * bounded by the window frame however large a group gets.
    */
  def preferencePairs(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, maxPairs: Int = Int.MaxValue): DataFrame = {
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(idCol).as("_id"), col(scoreCol).as("_s"))
      .withColumn("_rb", row_number().over(
        byGroup.orderBy(col("_s").desc, col("_id").asc)))
      .withColumn("_rw", row_number().over(
        byGroup.orderBy(col("_s").asc, col("_id").desc)))
      .withColumn("_half", (count(lit(1)).over(byGroup) / 2).cast("int"))
    val chosen = ranked
      .filter(col("_rb") <= col("_half") && col("_rb") <= maxPairs)
      .select(col(groupCol), col("_rb").as("pair_rank"),
        col("_id").as("chosen_id"), col("_s").as("_cs"))
    val rejected = ranked
      .filter(col("_rw") <= col("_half") && col("_rw") <= maxPairs)
      .select(col(groupCol), col("_rw").as("pair_rank"),
        col("_id").as("rejected_id"), col("_s").as("_rs"))
    chosen.join(rejected, Seq(groupCol, "pair_rank"))
      .select(col(groupCol), col("pair_rank"), col("chosen_id"),
        col("rejected_id"), (col("_cs") - col("_rs")).as("margin"))
  }
}
