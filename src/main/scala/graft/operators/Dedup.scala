package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design notes (100 TB):
  *   - `exact` is one hash aggregation on the content key — map-side
  *     partial aggregation, no row ever leaves its executor un-combined.
  *   - `minhashLsh` never materializes the O(n²) pair space: docs are
  *     shuffled by (band, bucket-hash) so only same-bucket docs meet, then
  *     candidate pairs are verified with exact Jaccard. Signature width and
  *     band count trade recall vs cost independently of data volume.
  *   - `simhash` reduces each doc to a 64-bit signature; near-dup pairs
  *     join on rotated signature prefixes (here: exact-signature match or
  *     banded join), again avoiding the cross product.
  *   - `ngramJaccard` is the exact (quadratic-in-colliding-docs) verifier:
  *     explode distinct shingles, self-join on shingle, count overlaps. At
  *     scale it is meant for candidate verification, not the full corpus —
  *     which is exactly how `minhashLsh` uses it.
  *   - `embeddingCosine` brute-force is for candidate sets / small dims;
  *     the scale path buckets by random-hyperplane signature first
  *     (Similarity.annBuckets) so cosine is only evaluated within buckets.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keep the lowest-id row per
    * distinct key, report the group size. One shuffle (hash agg).
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup that returns the surviving rows themselves. */
  def dropExactDuplicates(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Distinct word-`n`-gram shingles per doc: `(id, shingle)` rows. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("_id"),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n))).as("shingle"))

  /** Exact n-gram Jaccard similarity for all colliding pairs (share ≥1
    * shingle); emits pairs with similarity ≥ `threshold`, `id_a < id_b`.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    // no .cache(): the exploded shingle relation is many times the corpus
    // size at scale, and the shingle expression is cheap to recompute
    val sh = shingles(df, idCol, textCol, n)
    val counts = sh.groupBy("_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** ASYMMETRIC containment pairs: `containment(a ⊆ b) = |Sₐ∩S_b|/|Sₐ|`
    * over n-gram shingle SETS — the quote/subset detector Jaccard is
    * blind to: a paragraph verbatim inside a 100× longer page scores
    * near-zero Jaccard (union dominated by the long doc) but
    * containment 1.0. Ordered output `(id_small, id_big, containment)`
    * — the smaller shingle set is the contained candidate; ties (equal
    * set sizes) keep the lower id on the left. Same scale shape as
    * [[ngramJaccard]]: one shingle-keyed equi-join, per-doc set-size
    * aggregate, never all-pairs.
    */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    ngramContainmentOnSets(
      df.select(col(idCol).as("_sid"),
        array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("_tk")),
      "_sid", "_tk", threshold)

  /** [[ngramContainment]] over PRE-BUILT distinct shingle sets — the
    * entry point for callers that already hold (or share) the
    * shingle-set frame, so the shingling pass is paid once per corpus
    * (the [[prefixFilterJoinOnSets]] pattern). Two r18 cost trims over
    * the r17 body, semantics identical: per-doc set sizes come from
    * `size(set)` directly (the r17 form re-derived them with a THIRD
    * corpus-wide shuffle over the exploded rows), and the exploded
    * relation feeds only the two collision-join sides.
    *
    * A prefix-filtered candidate generator (the r17 verdict's item 5)
    * was implemented and MEASURED SLOWER here (x_dedup_containment
    * 2.0 → 6.4 s at sf0.1, t = 0.3): at low thresholds the small-side
    * prefix is (1−t)·n + 1 ≈ 70% of each doc, the big side cannot be
    * pruned at all (its bound depends on the unknown |small|), so
    * candidates barely shrink while the df aggregate, per-doc rank
    * window, candidate distinct and per-pair array_intersect all cost
    * extra — the collision join's map-side-combinable count aggregate
    * is the cheaper exact verifier at bulk thresholds. Recorded as a
    * negative result (OPTIMIZATION_r18.md); the completeness property
    * test written for it is kept pinning this form against the naive
    * join.
    */
  def ngramContainmentOnSets(sets0: DataFrame, idCol: String,
      setCol: String, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sets = sets0.select(col(idCol).as("_sid"), col(setCol).as("_tk"))
    val sh = sets.select(col("_sid").as("_id"), explode(col("_tk")).as("shingle"))
    val counts = sets.select(col("_sid").as("_id"), size(col("_tk")).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnRenamed("_id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("_id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(
        when(col("n_a") <= col("n_b"), col("id_a")).otherwise(col("id_b"))
          .as("id_small"),
        when(col("n_a") <= col("n_b"), col("id_b")).otherwise(col("id_a"))
          .as("id_big"),
        round(col("common").cast("double") / least(col("n_a"), col("n_b")), 6)
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions take
    * the min over the doc's shingle hashes. Pure expression: shingles →
    * xxhash64(shingle, seed) → array_min. Deterministic across runs.
    */
  def minhashSignature(textCol: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = array_distinct(TextFunctions.wordShingles(textCol, shingleN))
    val sigs = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(s, lit(seed))))
    }
    array(sigs: _*)
  }

  /** Banded LSH rows per doc: `(_id, sig, band, bucket)` — the minhash
    * signature split into `bands` bands of `numHashes / bands` rows, each
    * band reduced to one 64-bit bucket hash. Deterministic in the doc's
    * text alone (seeded xxhash64), so a doc's rows are IDENTICAL no matter
    * when or with which cohort it is signed — the property that makes a
    * persisted signature index ([[graft.sink.SignatureStore]]) probe-able
    * incrementally with no recall loss vs a full-corpus run.
    *
    * The signature is the native one-pass
    * [[graft.functions.VectorExpressions.minhashSignature]] expression
    * (r17 — previously explode(shingle) → one codegen'd
    * `min(xxhash64(shingle, seed))` aggregate per hash function, which
    * shuffled ×shingles-per-doc rows on `_id`; bit-equivalence is
    * spec-pinned, so persisted [[graft.sink.SignatureStore]] data signed
    * by either form stays interoperable. The nested higher-order lambda
    * both replace is interpreted and ~50× slower).
    * Docs with no shingles (empty text) have no rows — nothing to match.
    */
  def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val withSig = df.select(col(idCol).as("_id"),
        TextFunctions.wordShingles(col(textCol), shingleN).as("_sh"))
      .where(size(col("_sh")) > 0)
      .select(col("_id"),
        graft.functions.VectorExpressions.minhashSignature(
          col("_sh"), numHashes).as("sig"))
    withSig.select(col("_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(array_join(transform(
              slice(col("sig"), b * rows + lit(1), lit(rows)), _.cast("string")), ","))
              .as("bucket")))).as("bb"))
      .select(col("_id"), col("sig"), col("bb.band"), col("bb.bucket"))
  }

  /** MinHash + LSH candidate pairs: signature split into `bands` bands of
    * `numHashes / bands` rows each; docs agreeing on any full band land in
    * the same bucket and become a candidate pair. Emits distinct candidate
    * pairs with their estimated (signature-agreement) similarity.
    *
    * Only same-bucket docs are ever paired — the shuffle key is
    * (band, hash(band rows)), so cost tracks bucket occupancy, not n².
    *
    * Signatures come from the native one-pass `minhash_signature`
    * expression via [[bandedSignatures]] (r17) — no explode, no
    * per-signature shuffle.
    */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame =
    minhashLshCandidates(df, idCol, textCol, shingleN, numHashes, bands,
      maxBucketOccupancy = Int.MaxValue)

  /** [[minhashLshCandidates]] with a HOT-BUCKET cap — the 100 TB guard:
    * a viral boilerplate string puts every carrier in the same
    * (band, bucket), and that one bucket re-creates the O(n²) pair
    * explosion LSH exists to avoid (10⁵ copies → 5·10⁹ pairs from one
    * key). Buckets holding more than `maxBucketOccupancy` docs are
    * SKIPPED — the standard production-LSH mitigation: a mega-bucket's
    * members are exact/boilerplate duplicates, which the cheaper exact
    * and passage dedup paths already catch, so skipping costs recall
    * only on text that is literally everywhere. The occupancy table is
    * (band, bucket)-sized and broadcasts; the extra aggregate reads the
    * same banded rows the join reads anyway.
    */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int,
      maxBucketOccupancy: Int): DataFrame = {
    require(maxBucketOccupancy >= 2,
      s"maxBucketOccupancy must be >= 2, got $maxBucketOccupancy")
    // r17: the banded rows are referenced twice by the bucket self-join
    // (three times with the hot-bucket cap) and their lineage re-signs
    // the corpus per reference. localCheckpoint (eager): sign once; the
    // banded rows are (id, sig, band, bucket) — the same rows the join
    // shuffles anyway — and blocks are ContextCleaner-managed. Trade:
    // no lineage recovery for this table (an executor loss fails the
    // query instead of re-signing), the standard persist-the-signatures
    // shape of production LSH.
    val all = bandedSignatures(df, idCol, textCol, shingleN, numHashes, bands)
      .localCheckpoint()
    val banded =
      if (maxBucketOccupancy == Int.MaxValue) all
      else {
        val hot = all.groupBy("band", "bucket")
          .agg(count(lit(1)).as("_occ"))
          .filter(col("_occ") > maxBucketOccupancy)
          .select("band", "bucket")
        all.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      }
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    // fused sig_match_count, not size(filter(zip_with(...))): the HOF is
    // interpreted per candidate pair (~2.5x slower at 500k pairs x 32
    // hashes, and the candidate set is the leg that grows with the
    // corpus); bit-equivalence to the HOF form is spec-pinned
    // (VectorExpressionsSpec "sig_match_count equals ...")
    cand.withColumn("est_jaccard",
        graft.functions.VectorExpressions.sigMatchCount(
          col("sig_a"), col("sig_b")).cast("double")
          / lit(numHashes.toDouble))
      .select("id_a", "id_b", "est_jaccard")
  }

  /** MinHash-LSH dedup with exact verification: candidates from the LSH
    * join, then true n-gram Jaccard computed ONLY for candidate pairs
    * (shingle sets joined to each side, `array_intersect` per pair) —
    * never for the full corpus. The scale-safe near-dup pipeline: LSH
    * prunes to near-linear candidates, exact Jaccard decides.
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame =
    verifyJaccard(
      minhashLshCandidates(df, idCol, textCol, shingleN, numHashes, bands)
        .select("id_a", "id_b"),
      df, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)

  /** Exact n-gram Jaccard for a CANDIDATE pair set: shingle sets joined to
    * each side by id, `array_intersect` per pair — cost is O(candidates),
    * never the corpus cross product. The verification half of every LSH
    * dedup path (`minhashDedup`, [[graft.sink.SignatureStore]] probes).
    * Returns `(id_a, id_b, jaccard)` for every input pair; callers apply
    * their threshold.
    */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    verifyJaccard(pairs, df, idCol, textCol, shingleN, cutPairs = true)

  /** [[verifyJaccard]] with the PAIR-set lineage cut optional — r18
    * (advisor): callers whose pair frame is already persisted or cheap
    * (x_dedup_incremental_probe persists its probe candidates before
    * calling) pass `cutPairs = false` and skip the redundant eager
    * materialize-and-read-back; the LSH/banded callers with join-heavy
    * candidate lineages keep the default cut — the same opt-in shape as
    * InvertedIndex.writePostings' persistInput. The candidate shingle
    * table's own cut is unconditional: it is referenced by both join
    * sides and its shingling pass is always worth running once.
    */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, cutPairs: Boolean): DataFrame = {
    // r17, candidates-only all the way down (guide §1.2): the old body
    // shingled the WHOLE corpus once per pair side (two passes), and a
    // semi-join pruning would have re-executed the candidate
    // generator's lineage three more times (both id-union legs + the
    // main join). Now: (1) the pair set is cut once (localCheckpoint —
    // candidate-sized), (2) docs semi-join to the candidate ids BEFORE
    // shingling, so shingles are computed for candidate docs only —
    // O(candidates), never the corpus — and (3) the candidate shingle
    // table is cut once and read by both join sides. Results identical:
    // the inner joins on id_a/id_b never matched non-candidate docs.
    val p0 = pairs.select("id_a", "id_b")
    val p = if (cutPairs) p0.localCheckpoint() else p0
    val ids = p.select(col("id_a").as("_sid"))
      .unionByName(p.select(col("id_b").as("_sid"))).distinct()
    val shSets = df.select(col(idCol).as("_sid"), col(textCol).as("_stx"))
      .join(ids, Seq("_sid"), "left_semi")
      .select(col("_sid"),
        array_distinct(TextFunctions.wordShingles(col("_stx"), shingleN)).as("_sh"))
      .localCheckpoint()
    p
      .join(shSets.withColumnRenamed("_sid", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
      .join(shSets.withColumnRenamed("_sid", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .select("id_a", "id_b", "jaccard")
  }

  /** EXACT-threshold token-set Jaccard join via PREFIX FILTERING — the
    * All-Pairs / SSJoin family (public literature: Bayardo, Ma &
    * Srikant, WWW 2007; Chaudhuri, Ganti & Kaushik, ICDE 2006). The
    * deterministic complement to [[minhashDedup]]: LSH buys fixed probe
    * cost at recall ≈ 1; prefix filtering guarantees recall = 1 (every
    * pair with jaccard ≥ t is emitted — no banding miss), at candidate
    * cost that stays near-linear because candidates join ONLY on each
    * document's globally RAREST tokens.
    *
    * Algorithm: per doc take the distinct set T of word `shingleN`-gram
    * shingles (n = |T|; `shingleN = 1` ⇒ plain tokens); order elements
    * by ascending corpus document frequency with the element string
    * as tie-break (a TOTAL canonical order — both sides of a tie order
    * identically or completeness breaks); the prefix is the first
    * p = n − ⌈t'·n⌉ + 1 elements, where t' = t − 5e-7 is the ROUNDED
    * verifier's true acceptance boundary (see the inline comment at the
    * bound). Completeness: for a qualifying pair,
    * |A∩B| ≥ ⌈t·|A|⌉, and the MINIMAL shared token w (canonical order)
    * is preceded in A's order only by unshared tokens — at most
    * |A| − |A∩B| of them — so w sits within A's first
    * |A| − ⌈t·|A|⌉ + 1 = p_A positions; symmetrically for B. Hence
    * prefix(A) ⋈ prefix(B) on the token sees every qualifying pair, and
    * the exact per-pair verification keeps only true matches.
    *
    * Scale shape: one token-frequency aggregate, one per-doc window over
    * the doc's own tokens (bounded by doc length), a join keyed on
    * LOW-frequency tokens by construction (a token of global df D can
    * produce at most D·(D−1)/2 candidates, and high-df tokens are pushed
    * out of every prefix), then O(candidates) verification via the
    * collected token arrays. No all-pairs stage anywhere.
    *
    * Returns `(id_a, id_b, jaccard)` with jaccard rounded to 6dp BEFORE
    * the threshold compare (both engines compute identical arithmetic —
    * the [[ngramJaccard]] convention).
    */
  def prefixFilterJoin(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    // set elements are word n-gram shingles (shingleN = 1 ⇒ plain
    // tokens): on template-heavy corpora TOKEN sets are near-identical
    // across unrelated docs (measured at sf0.1: 7M qualifying token
    // pairs from 5k docs), while shingle sets carry word order and
    // stay discriminative — the same reason every other dedup operator
    // here shingles first
    prefixFilterJoinOnSets(
      df.select(col(idCol).as("_sid"),
        array_distinct(
          TextFunctions.wordShingles(col(textCol), shingleN)).as("_tk")),
      "_sid", "_tk", threshold)
  }

  /** [[prefixFilterJoin]] over PRE-BUILT distinct element sets
    * `(id, array<string>)` — the entry point for callers that already
    * hold (or share) the shingle-set frame, so the shingling pass is
    * paid once per corpus instead of once per dedup variant. Semantics
    * identical to [[prefixFilterJoin]] (which delegates here).
    */
  def prefixFilterJoinOnSets(sets0: DataFrame, idCol: String,
      setCol: String, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val sets = sets0.select(col(idCol).as("_sid"), col(setCol).as("_tk"))
    val tok = sets.select(col("_sid").as("_id"), explode(col("_tk")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("_df"))
    val ranked = tok.join(dfreq, "tok")
      .withColumn("_pos", row_number().over(
        Window.partitionBy("_id").orderBy(col("_df"), col("tok"))))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("_id")))
    // The prefix bound must be complete for every pair the VERIFIER
    // accepts, and the verifier compares round(jaccard, 6) >= t — so a
    // true jaccard as low as t − 5e-7 passes. Derive the bound from
    // THAT boundary (effT), not from t, or boundary pairs verify green
    // yet get pruned from candidates. The 1e-9 guard keeps IEEE
    // overshoot past an exact integer (0.07 × 100 = 7.000000000000001,
    // ceil → 8) from shortening the prefix by one and breaking the
    // recall-1 guarantee; it can only ever WIDEN the prefix (spec-pinned
    // with a planted t·n-integer boundary pair).
    val effT = threshold - 5e-7
    val prefix = ranked
      .filter(col("_pos") <=
        col("_n") - ceil(lit(effT) * col("_n") - lit(1e-9)) + 1)
      .select("_id", "tok")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    // exact verification over the collected shingle sets — O(candidates)
    cand
      .join(sets.withColumnRenamed("_sid", "id_a")
        .withColumnRenamed("_tk", "tk_a"), "id_a")
      .join(sets.withColumnRenamed("_sid", "id_b")
        .withColumnRenamed("_tk", "tk_b"), "id_b")
      .withColumn("_common", size(array_intersect(col("tk_a"), col("tk_b"))))
      .withColumn("jaccard", round(col("_common").cast("double") /
        (size(col("tk_a")) + size(col("tk_b")) - col("_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Edit-distance verification for a CANDIDATE pair set — the
    * character-level confirmation behind "near-duplicate up to k edits"
    * policies (template pages, boilerplate variants, OCR noise), where
    * set-based Jaccard can be fooled by reordered or re-chunked
    * n-grams. Levenshtein is quadratic per pair, so it NEVER runs
    * corpus-wide: candidates come from a banded/bucketed generator
    * ([[minhashLshCandidates]], [[ngramJaccard]]) and this leg costs
    * O(candidates). The `maxDist` bound uses Spark's THRESHOLDED
    * levenshtein — the banded-DP cutoff abandons a pair as soon as the
    * distance provably exceeds the bound (O(len·maxDist) per pair, not
    * O(len²)), the production form for long documents. Returns
    * `(id_a, id_b, edit_distance)` for pairs within `maxDist`.
    */
  def verifyEditDistance(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val t = df.select(col(idCol).as("_tid"), col(textCol).as("_tx"))
    pairs.select("id_a", "id_b")
      .join(t.withColumnRenamed("_tid", "id_a")
        .withColumnRenamed("_tx", "_ta"), "id_a")
      .join(t.withColumnRenamed("_tid", "id_b")
        .withColumnRenamed("_tx", "_tb"), "id_b")
      .withColumn("edit_distance", levenshtein(col("_ta"), col("_tb"), maxDist))
      .filter(col("edit_distance") >= 0)
      .select("id_a", "id_b", "edit_distance")
  }

  /** 64-bit SimHash over whitespace tokens: per bit position, sum +1/-1
    * across token-hash bits, sign of the sum becomes the signature bit.
    * Pure expressions (aggregate over the token array).
    */
  def simhash(textCol: Column): Column = {
    // variable-amount shifts need the SQL function form (the Scala
    // `shiftright(Column, Int)` overload only takes a literal amount)
    def shr(c: Column, n: Column): Column = call_function("shiftright", c, n)
    def shl(c: Column, n: Column): Column = call_function("shiftleft", c, n)
    val hashes = transform(TextFunctions.tokens(textCol), t => xxhash64(t))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, i) => c + when(shr(h, i.cast("int")).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, shl(lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: hamming distance ≤ `maxHamming` among docs
    * sharing any of 4 16-bit signature bands (pigeonhole: distance ≤ 3
    * implies at least one identical band — no cross product).
    */
  /** SimHash signatures for a whole table via the native [[
    * graft.functions.VectorExpressions.simhash64]] expression — one
    * codegen'd pass per document, NO explode and NO shuffle (r17: the
    * previous explode + 64-conditional-sum aggregate multiplied rows by
    * tokens-per-doc and shuffled on `_id`; measured ~4× slower warm at
    * sf0.1, and the shuffle grows with the corpus at 100 TB).
    * Token-less documents (empty or null text) are dropped, matching
    * the aggregate formulation's explode semantics exactly.
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("_id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col("_id"),
        graft.functions.VectorExpressions.simhash64(col("_toks")).as("sig"))

  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = simhashSignatures(df, idCol, textCol)
    val banded = withSig.select(col("_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftright", col("sig"), (b * 16).cast("int"))
            .bitwiseAND(0xFFFFL).as("bits"))))
        .as("bb"))
      .select(col("_id"), col("sig"), col("bb.band"), col("bb.bits"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .distinct()
      .withColumn("hamming", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Duplicate clustering: connected components over a near-dup pair
    * graph, labeling every doc with the smallest id reachable from it
    * (the canonical survivor). Large-scale label propagation: each round
    * joins current labels across edges and keeps the min — O(diameter)
    * rounds, each one shuffle; near-dup clusters are shallow (diameter
    * rarely exceeds a handful), so this converges in a few rounds even on
    * billion-edge graphs.
    *
    * @param pairs edges as (id_a, id_b) columns
    * @param ids   one row per doc id (isolated docs label themselves)
    */
  def connectedComponents(pairs: DataFrame, ids: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    val idCol = ids.columns.head
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    try {
      var labels = ids.select(col(idCol).as("id"), col(idCol).as("root"))
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        val viaEdges = edges
          .join(labels.withColumnRenamed("id", "dst")
            .withColumnRenamed("root", "nroot"), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(col("nroot")).as("nroot"))
        // localCheckpoint truncates lineage each round — without it the
        // plan doubles per iteration and planning itself blows the heap
        // long before the data does (use reliable checkpointing on a
        // cluster if executor loss during the loop matters). r18: the
        // OLD label rides inside the checkpointed frame, so the
        // convergence probe is a filter over the just-cached blocks —
        // the previous id-keyed next⋈labels compare join re-shuffled
        // both node-sized frames every round for a value `next` already
        // knew.
        val next = labels.join(viaEdges, Seq("id"), "left")
          .select(col("id"), col("root").as("_old"),
            least(col("root"), coalesce(col("nroot"), col("root"))).as("root"))
          .localCheckpoint(true)
        val changed = next.filter(col("root") =!= col("_old"))
          .limit(1).count()
        labels = next.select("id", "root")
        converged = changed == 0
        round += 1
      }
      // silent truncation would return split clusters that LOOK valid —
      // fail loudly and let the caller raise maxRounds (rounds needed =
      // max distance from a component's min-id member)
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxRounds rounds; " +
            "raise maxRounds (a component's diameter exceeds it)")
      labels
    } finally edges.unpersist()
  }

  /** Connected components by alternating Large-Star / Small-Star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the O(log n)-round counterpart of
    * [[connectedComponents]]'s min-label propagation, whose round count
    * is the component DIAMETER. Near-dup clusters are shallow, so label
    * propagation wins there; chain-shaped graphs (reference/link chains,
    * temporal hand-offs) have diameters in the thousands, and this is
    * the variant that survives them: each round is two keyed
    * aggregations + joins, edges re-hang onto per-neighborhood minima,
    * and the edge set provably converges to depth-1 stars in O(log n)
    * rounds regardless of diameter.
    *
    * Same contract as [[connectedComponents]]: `pairs` are (id_a, id_b)
    * edges, `ids` one row per doc, output `(id, root)` with root = the
    * component's smallest id; isolated docs label themselves. Fails
    * loudly on non-convergence rather than returning split clusters.
    */
  def connectedComponentsStar(pairs: DataFrame, ids: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val idCol = ids.columns.head
    // orient every edge (u > v), drop self-loops/dups
    var edges = pairs
      .select(col("id_a").cast("long").as("a"),
        col("id_b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(true)
    // set-canonical fingerprint (edge sets are distinct(), xor is
    // commutative and overflow-free under ANSI): ONE aggregate job per
    // round decides convergence instead of two counts plus an except —
    // rounds are job-count-bound on all but enormous graphs, so the
    // check IS the round cost. A 64-bit fingerprint collision on a
    // CHANGED set would stop one round early; with count compared too
    // that needs an equal-size xor collision (~2⁻⁶⁴) — accepted.
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(edges)
    var converged = false
    var round = 0
    val byCenter = org.apache.spark.sql.expressions.Window.partitionBy("c")
    while (!converged && round < maxRounds) {
      // large-star: every neighbor LARGER than the center re-hangs onto
      // the neighborhood minimum (min of neighbors and center). The
      // per-center minimum comes from a window over the SAME shuffle
      // the grouping would need — one exchange, no agg+join pair.
      val nbrL = edges.select(col("u").as("c"), col("v").as("n"))
        .unionByName(edges.select(col("v").as("c"), col("u").as("n")))
      val afterLarge = nbrL
        .withColumn("m", least(min(col("n")).over(byCenter), col("c")))
        .filter(col("n") > col("c"))
        // oriented (larger, smaller) already: m <= c < n
        .select(col("n").as("c"), col("m").as("n"))
      // small-star: smaller neighbors (plus the center) re-hang onto the
      // in-neighborhood minimum; afterLarge rows are already oriented
      // center > neighbor, so they feed straight in (duplicates collapse
      // in the final distinct — min is idempotent under them)
      val withMin = afterLarge
        .withColumn("m", min(col("n")).over(byCenter))
      val next = withMin.filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .unionByName(withMin.select(col("c").as("u"), col("m").as("v")))
        .distinct()
        // lazy lineage truncation: the fingerprint job below is the one
        // action per round — it materializes the checkpoint AND decides
        // convergence in the same pass
        .localCheckpoint(false)
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star connected components did not converge in $maxRounds " +
          "rounds; raise maxRounds")
    // converged edge set is depth-1 stars: u -> component min
    ids.select(col(idCol).as("id"))
      .join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("root"))
  }

  /** Canonical-document selection: keep the best-scoring member of each
    * duplicate cluster — the policy step that turns dup DETECTION (exact
    * fingerprint groups, [[connectedComponents]] labels, minhash/simhash
    * clusters) into a curated corpus. "Best" is highest `scoreCol`, ties
    * broken by smallest id, so the survivor set is deterministic across
    * runs and engines.
    *
    * `df` carries one row per document with `(clusterCol, idCol,
    * scoreCol)`; returns `(clusterCol, idCol, scoreCol, n_members)`.
    *
    * Scale shape: a single hash aggregation — the arg-max rides a
    * lexicographic `max(struct(score, -id))` with map-side partials, so
    * even a pathological cluster holding half the corpus contributes one
    * row per partition to the shuffle (the window-rank formulation would
    * funnel that cluster through one task).
    */
  def keepBestPerCluster(df: DataFrame, clusterCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    // the tie-break negates the id; a string id would silently cast to
    // null (null winners, no error) and Long.MinValue has no negation —
    // reject both loudly, like Similarity.knnJoin's id guard
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(idType),
      s"keepBestPerCluster id '$idCol' must be integral, got ${idType.simpleString}")
    df.groupBy(col(clusterCol))
      .agg(
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("ni"))).as("_best"),
        count(lit(1)).as("n_members"))
      .select(col(clusterCol), (-col("_best.ni")).as(idCol),
        col("_best.s").as(scoreCol), col("n_members"))
  }

  /** Passage-level dedup: split every document into fixed non-overlapping
    * token windows, keep only the EARLIEST occurrence of each distinct
    * passage corpus-wide (by (doc id, chunk position)), and reassemble
    * each document from its surviving passages — the passage/line-level
    * sweep that removes repeated boilerplate *inside* otherwise-unique
    * documents, run between document dedup and quality filtering.
    *
    * Returns one row per input doc: `(idCol, n_passages, n_kept,
    * dedup_text)` — docs whose every passage was seen earlier elsewhere
    * survive with `n_kept = 0` and an empty string (the caller decides
    * whether to drop them).
    *
    * Scale shape: chunking is a per-row generate ([[Corpus.chunk]], no
    * shuffle); the keeper per passage fingerprint is `min(struct(doc,
    * pos))` — a hash aggregation with map-side partials, so a passage
    * repeated a million times (the exact case this operator exists for)
    * contributes one row per partition to the shuffle, NOT a
    * million-row window partition. Survivors rejoin on the fingerprint
    * (equi-join keyed by (fp, doc, pos)) and reassembly is one doc-keyed
    * aggregation with per-doc bounded state.
    */
  def dedupPassages(df: DataFrame, idCol: String, textCol: String,
      passageTokens: Int): DataFrame = {
    val chunks = Corpus.chunk(df, idCol, textCol, passageTokens, overlap = 0)
      .withColumn("_fp", md5(col("chunk_text")))
    val keepers = chunks
      .groupBy("_fp")
      .agg(min(struct(col(idCol).as("i"), col("chunk_id").as("p"))).as("_k"))
      .select(col("_fp"), col("_k.i").as(idCol), col("_k.p").as("chunk_id"))
    val kept = chunks.join(keepers, Seq("_fp", idCol, "chunk_id"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("dedup_text"))
    val totals = chunks.groupBy(idCol).agg(count(lit(1)).as("n_passages"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_passages"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold. Brute-force pair join —
    * use on candidate buckets (see Similarity.annBuckets) at scale.
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.cosineFast(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** EXACT all-pairs cosine threshold join, distributed as a
    * fragment-and-replicate equi-join instead of a
    * BroadcastNestedLoopJoin.
    *
    * Why not LSH candidates here: an exact threshold that sits in the BULK
    * of the cosine distribution (e.g. 0.4 over random-ish embeddings,
    * where every matching pair lives at 0.4–0.6) has near-zero LSH
    * collision probability per matching pair — candidate generation can
    * never be exhaustive, so candidate/verify cannot reproduce the exact
    * semantics. For *near-dup* thresholds (≥ ~0.9) use
    * [[graft.operators.Similarity.annBuckets]] + [[embeddingCosinePairs]]
    * within buckets, which is corpus-size-sublinear.
    *
    * Shape: the left side is replicated to all `blocks` keys, the right
    * side keeps its own hash block, and the pair predicate runs inside a
    * shuffled equi-join on the block key. Each task streams n left rows
    * against n/blocks right rows — per-task memory O(n/blocks · dim), no
    * broadcast of the corpus, and the n² codegen'd cosine evaluations
    * spread evenly over blocks × cluster cores (the inherent cost of the
    * exact semantics; the round-1 BNLJ did the same work on ONE node).
    */
  def embeddingCosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 32): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("_blk", explode(sequence(lit(0), lit(blocks - 1))))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      pmod(xxhash64(col(idCol).cast("string")), lit(blocks.toLong)).cast("int").as("_blk"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.cosineFast(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** The cell pairs that can possibly hold a cosine-≥-threshold pair,
    * by the spherical triangle inequality: for x in cell `a` and y in
    * cell `b`, `θ(x,y) ≥ θ(ca,cb) − ra − rb` where `r` is each cell's
    * max member-to-centroid angle — so if
    * `cos(max(0, θ(ca,cb) − ra − rb)) < threshold`, NO pair across
    * (a,b) can reach the threshold and the pair is pruned. Exact: the
    * bound only ever over-admits (a 1e-7 slack additionally armors the
    * acos/cos round trip against libm rounding). Returns BOTH
    * orientations of surviving cross-cell pairs plus the diagonal, so a
    * downstream `id_a < id_b` filter sees each unordered point pair
    * exactly once. Driver math over k centroids — O(k²) on k ≪ corpus.
    */
  private[graft] def survivingCellPairs(model: Ivf.Model,
      radii: Map[Int, Double], threshold: Double): Seq[(Int, Int)] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    def theta(a: Array[Double], b: Array[Double]): Double = {
      val d = norm(a) * norm(b)
      if (d == 0) 0.0 // degenerate centroid: no angle info, never prune
      else math.acos(math.max(-1.0, math.min(1.0, dot(a, b) / d)))
    }
    val cs = model.centroids
    val slack = 1e-7
    for {
      a <- cs.indices
      b <- cs.indices
      ra = radii.getOrElse(a, math.Pi)
      rb = radii.getOrElse(b, math.Pi)
      bound = math.max(0.0, theta(cs(a), cs(b)) - ra - rb - slack)
      if math.cos(bound) >= threshold
    } yield (a, b)
  }

  /** EXACT all-pairs cosine ≥ `threshold` — the [[embeddingCosinePairsExact]]
    * semantics — with IVF cell-pair pruning: k-means cells partition the
    * corpus, each cell records its angular radius around its centroid,
    * and only cell pairs that can possibly cross the threshold
    * ([[survivingCellPairs]] — spherical triangle inequality, provably
    * no false prune) are joined and verified with the exact codegen'd
    * cosine. Identical output to the blocked-cross variant on ANY input.
    *
    * Scale shape: candidate volume is Σ |cell_a|·|cell_b| over SURVIVING
    * pairs — on clustered data (the regime where bulk-threshold dedup is
    * meaningful) most of the k² lattice prunes and the join is far
    * sublinear in n²; on one isotropic blob nothing can prune and the
    * cost degrades to the exact variant's (the semantics are inherently
    * quadratic in that regime). The mechanics: points shuffle ONCE on
    * their cell key; the surviving-pair list broadcasts (≤ k² tiny
    * rows); per-cell radii are one k-row aggregate to the driver.
    */
  def embeddingCosinePairsPruned(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double, k: Int = 16, iters: Int = 5)
      : DataFrame = {
    val clean = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
    val model = Ivf.fit(clean, idCol, vecCol, k, iters)
    val assigned = Ivf.assign(clean, vecCol, model)
    // angle to own centroid: CASE over the k centroid literals (one
    // fused cosine per row); NaN (zero-norm vector) → π, never pruned
    val cosToOwn = model.centroids.zipWithIndex.tail.foldLeft(
      graft.functions.VectorExpressions.cosineFast(col(vecCol),
        array(model.centroids(0).toSeq.map(lit): _*))) { case (acc, (c, i)) =>
      when(col("cell") === i,
        graft.functions.VectorExpressions.cosineFast(col(vecCol),
          array(c.toSeq.map(lit): _*))).otherwise(acc)
    }
    val radii = assigned
      .withColumn("_theta",
        acos(least(greatest(cosToOwn, lit(-1.0)), lit(1.0))))
      .groupBy("cell").agg(max(nanvl(col("_theta"), lit(math.Pi))).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap // k rows
    val pairs = survivingCellPairs(model, radii, threshold)
    val spark = df.sparkSession
    import spark.implicits._
    val pairDf = pairs.toDF("_ca", "_cb")
    val left = assigned.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("cell").as("_ca"))
    val right = assigned.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("cell").as("_cb"))
    left.join(broadcast(pairDf), Seq("_ca"))
      .join(right, Seq("_cb"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.cosineFast(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Windowed dedup: collapse each key's records within a tumbling
    * event-time window to one survivor (lowest id — deterministic under
    * any arrival order) plus a duplicate count — the batch twin of
    * [[graft.streaming.StreamingOps.dedupeStream]], whose watermark
    * expires the same per-(key, window) state incrementally. Running the
    * batch form over a backfill and the streaming form over the live tail
    * yields identical survivor sets.
    *
    * One hash aggregation keyed by (window, key): map-side partial
    * min/count, no window function, no per-key sort. State per group is
    * two longs regardless of how hot a key is.
    */
  def firstPerWindow(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, windowLen: String): DataFrame =
    df.groupBy(window(col(tsCol), windowLen).as("_w"), col(keyCol))
      .agg(min(col(idCol)).as("first_id"), count(lit(1)).as("n_window"))
      .select(col(keyCol), unix_micros(col("_w.start")).as("window_us"),
        col("first_id"), col("n_window"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * plagiarism-detection scheme): hash every `k`-gram word shingle
    * (md5-56 — the engine-reproducible hash family the sampling ops
    * use), then keep the MINIMUM hash of every `w`-consecutive-hash
    * window; the distinct kept values are the document's fingerprints.
    * The winnowing guarantee: any shared substring of ≥ `k + w − 1`
    * tokens between two documents yields at least one SHARED
    * fingerprint — local-match detection with a density bound of
    * ~2/(w+1) selected hashes, unlike MinHash (whole-document
    * similarity, no locality). Returns `(idCol, fingerprint)` rows;
    * documents shorter than `k` tokens fingerprint their whole text.
    *
    * Scale shape: O(tokens × w) per row, no shuffle before the output
    * explode. Two projections, deliberately: the shingle-hash array is
    * MATERIALIZED as a column first (one fused native pass per row —
    * [[graft.functions.WordShingleHash56]], the md5-56 family), and
    * the window-min pass then references that attribute. Referencing
    * the hash EXPRESSION inside the window lambda instead would
    * re-evaluate the whole array per window position — interpreted
    * HOFs cache nothing — turning the op O(tokens²·md5) per document
    * (the r8 130-second bench row). Catalyst keeps the barrier:
    * CollapseProject never inlines a non-cheap producer referenced
    * more than once (pinned by PlanSpec). Matching is then a
    * fingerprint equi-join — candidates share a bucket, never
    * all-pairs (the LSH join shape).
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(w >= 1, s"w must be positive, got $w")
    val hashes =
      graft.functions.TextExpressions.wordShingleHash56(col(textCol), k)
    val h = col("_h")
    val fps = when(size(h) < w, array(array_min(h)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(h) - w + 1),
        i => array_min(slice(h, i, lit(w))))))
    df.select(col(idCol), hashes.as("_h"))
      .select(col(idCol), explode(fps).as("fingerprint"))
  }

  /** Candidate-generator quality evaluation — the measurement loop a
    * production dedup pipeline needs before trusting a banded/bucketed
    * generator at scale: given CANDIDATE pairs (from LSH bands, shared
    * winnowing fingerprints, SimHash radius, …) and exact TRUTH pairs
    * (an exact-Jaccard threshold over the same corpus, computed on a
    * sample at 100 TB), report the confusion counts plus
    * recall (`hits/truth` — what fraction of real near-dups the
    * generator surfaces) and precision (`hits/candidates` — how much
    * exact-verification work per real pair). Both inputs are pair
    * frames `(id_a, id_b)` with `id_a < id_b`; recall/precision are
    * null when their denominator is empty (never a fabricated 0 or 1).
    *
    * Scale shape: one distinct per side (keyed aggregates), one
    * semi-join for the hit set — all pair-space, never corpus² — and
    * three single-row counts crossed by broadcast. Returns one row
    * `(n_truth, n_candidates, n_hits, recall, precision)`.
    */
  def evalCandidatePairs(candidates: DataFrame,
      truth: DataFrame): DataFrame = {
    val c = candidates.select("id_a", "id_b").distinct()
    val t = truth.select("id_a", "id_b").distinct()
    val h = c.join(t, Seq("id_a", "id_b"), "left_semi")
    t.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_candidates"))))
      .crossJoin(broadcast(h.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_truth"), col("n_candidates"), col("n_hits"),
        when(col("n_truth") > 0,
          round(col("n_hits").cast("double") / col("n_truth"), 6))
          .as("recall"),
        when(col("n_candidates") > 0,
          round(col("n_hits").cast("double") / col("n_candidates"), 6))
          .as("precision"))
  }

  /** Soft dedup: DOWNWEIGHT duplicates instead of dropping them — each
    * exact-content cluster's docs get `weight = 1/|cluster|`, so every
    * cluster contributes exactly one document's worth of sampling mass
    * to training (the repetition-penalty alternative to hard dedup:
    * keeps all provenance rows, removes the over-representation).
    * Output `(idCol, cluster_size, weight)` per input row.
    *
    * Scale shape: identical to exact dedup — an md5 content
    * fingerprint, one hash-partitioned count per fingerprint (window
    * over the fingerprint key, map-side-combinable under AQE), no
    * driver state. Weights sum to the number of DISTINCT contents up
    * to the 6dp display rounding (a cluster of 3 sums to 0.999999, not
    * exactly 1).
    */
  /** Exact duplicate-SPAN detection — the distributed shape of the
    * ExactSubstr method (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): find the maximal token runs whose every
    * `k`-gram appears verbatim in ≥ `minDocs` distinct documents, with
    * exact positions, so a pipeline can CUT duplicated spans instead of
    * dropping whole near-dup documents. Consecutive duplicated shingle
    * positions within a doc merge into one maximal run (the
    * gaps-and-islands fold). Guarantees: every shared substring of
    * ≥ k tokens is covered by some emitted run; a run is the UNION of
    * overlapping shared k-grams, so its full extent need not occur
    * verbatim in any single partner doc (the standard over-approximation
    * — ExactSubstr's cut semantics want exactly this cover). Returns
    * `(idCol, span_start, span_tokens, span_text)` — token offsets,
    * 0-based.
    *
    * Documents shorter than `k` tokens shingle to their whole text
    * ([[graft.functions.WordShingles]] semantics) — such a doc can only
    * pair with OTHER sub-`k` docs of identical text (its short shingle
    * never equals a `k`-gram), not with a longer doc containing it;
    * empty docs emit nothing.
    *
    * Scale shape: suffix arrays don't distribute; this does — one
    * (doc, shingle) distinct + df hash agg (map-side combinable), one
    * shingle-keyed equi-join back to positions (duplicated shingles
    * only — the corpus never meets itself all-pairs), one per-doc window
    * over HIT positions (state bounded by hits-per-doc, not corpus), and
    * a final id-keyed join to slice span text. Hot shingles (boilerplate)
    * fan out by their true df, which is exactly the output the operator
    * exists to surface.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // \s+ split to MATCH WordShingles' tokenizer exactly — slicing from
    // a space-only split would mislocate spans on tab/newline tokens
    val base = df.select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= lit("")).as("_t"))
      .withColumn("_n", size(col("_t")))
    val posSh = df.select(col(idCol),
        posexplode(TextFunctions.wordShingles(col(textCol), k))
          .as(Seq("_pos", "_sh")))
      .filter(col("_sh") =!= "") // empty docs collapse to one "" shingle
    val dup = posSh.select(col(idCol), col("_sh")).distinct()
      .groupBy("_sh").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDocs)
      .select("_sh")
    val w = Window.partitionBy(idCol).orderBy("_pos")
    val runs = posSh.join(dup, "_sh")
      .withColumn("_grp", col("_pos") - row_number().over(w))
      .groupBy(col(idCol), col("_grp"))
      .agg(min("_pos").as("span_start"),
        (max("_pos") - min("_pos") + k).as("_rawlen"))
    val spanLen = least(col("_rawlen"), col("_n") - col("span_start"))
    runs.join(base, Seq(idCol))
      .select(col(idCol), col("span_start").cast("int").as("span_start"),
        spanLen.cast("int").as("span_tokens"),
        array_join(slice(col("_t"), col("span_start") + 1, spanLen), " ")
          .as("span_text"))
  }

  /** Label each near-dup cluster with its top-`topK` most frequent
    * tokens — the human-auditable handle on what a cluster IS (a
    * curation dashboard shows "cluster 17: 14 docs, 'window scan
    * merge'", not an opaque root id). Input is [[connectedComponents]]
    * output `(id, root)` plus the docs; singleton clusters are skipped
    * (their label is the document). Ties break on ascending term.
    * Returns `(cluster_id, n_docs, term, term_count, rk)`.
    *
    * Scale shape: term counting is one map-side-combinable hash agg
    * over exploded tokens, and the top-k window partitions by cluster —
    * state bounded by a cluster's distinct terms, never corpus-wide.
    * The sizes join is left UNHINTED: non-singleton cluster count
    * scales with the corpus's duplication level, so AQE should pick
    * broadcast only when the frame measures small.
    */
  def clusterLabels(clusters: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, topK: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val real = clusters.groupBy("root")
      .agg(count(lit(1)).as("n_docs")).filter(col("n_docs") >= 2)
    val toks = clusters.join(real, "root")
      .join(docs.select(col(idCol), col(textCol)), col("id") === col(idCol))
      .select(col("root"), col("n_docs"),
        explode(filter(split(lower(col(textCol)), " "),
          t => t =!= lit(""))).as("term"))
    val tf = toks.groupBy("root", "n_docs", "term")
      .agg(count(lit(1)).as("term_count"))
    val w = Window.partitionBy("root")
      .orderBy(col("term_count").desc, col("term"))
    tf.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select(col("root").as("cluster_id"), col("n_docs"), col("term"),
        col("term_count"), col("rk"))
  }

  def softWeights(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_fp")
    df.select(col(idCol), md5(col(textCol).cast("binary")).as("_fp"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col(idCol), col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("weight"))
  }

  /** Fuzzy record linkage by Jaro–Winkler over blocked candidates — the
    * entity-resolution classic (near-identical names/titles that no
    * token-level dedup catches: transposed letters, one-char edits).
    *
    * Scale shape: each record emits ≤ 2 blocking keys (its `blockLen`-char
    * prefix and suffix), candidates meet through an equi-join on the key
    * (shuffle on key, never all-pairs), dedupe, then the native
    * [[graft.functions.JaroWinkler]] expression scores ONLY the candidate
    * set. Recall is blocking-bounded by construction — a pair differing in
    * both its first AND last `blockLen` characters is invisible, the
    * standard multi-pass-blocking trade — and both passes here are one
    * explode, not two scans. Returns `(id_a, id_b, similarity)` for
    * candidates at or above `threshold`, id_a < id_b.
    */
  def fuzzyLinkage(df: DataFrame, idCol: String, nameCol: String,
      threshold: Double, blockLen: Int = 4): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    val base = df
      .select(col(idCol).as("_id"), col(nameCol).as("_nm"))
      .filter(col("_nm").isNotNull && length(col("_nm")) > 0)
    val keys = base.select(col("_id"), col("_nm"),
      explode(array_distinct(array(
        substring(col("_nm"), 1, blockLen),
        col("_nm").substr(
          greatest(length(col("_nm")) - (blockLen - 1), lit(1)),
          lit(blockLen))))).as("_k"))
    val cand = keys.as("a").join(keys.as("b"),
        col("a._k") === col("b._k") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._nm").as("_na"), col("b._nm").as("_nb"))
      .distinct()
    cand
      .withColumn("similarity",
        graft.functions.TextExpressions.jaroWinkler(col("_na"), col("_nb")))
      .filter(col("similarity") >= threshold)
      .select("id_a", "id_b", "similarity")
  }
}
