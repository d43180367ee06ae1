package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Scale design:
  *   - `bruteForceTopK` against a literal query vector is a single
  *     map-side pass (cosine per row) + a top-k (`orderBy.limit` →
  *     TakeOrderedAndProject, which keeps only k rows per partition and
  *     merges on the driver). No shuffle of the corpus. This is the exact
  *     baseline.
  *   - `annBuckets` assigns every vector a `nBits`-bit random-hyperplane
  *     signature (deterministic pseudo-random planes derived from a seed —
  *     no driver-side randomness, reproducible across runs and executors).
  *     Same-signature vectors are cosine-close with high probability;
  *     bucketing is one narrow projection, so a bucketed (IVF-style)
  *     search only scans the probe's bucket — corpus-size-independent
  *     per-query cost given balanced buckets.
  *   - `annTopK` = brute force within the query's bucket (optionally
  *     multi-probe by Hamming-adjacent buckets).
  */
object Similarity {

  /** nBits-bit random-hyperplane signature of a vector column — a native
    * codegen expression fusing all nBits plane dot-products into one loop
    * (planes derived from an integer hash of (plane, dim, seed): identical
    * on every executor, never materialized or broadcast). The round-1
    * `aggregate(zip_with(...))` HOF formulation evaluated interpreted, per
    * bit × per element — the measured 50-70× hot-path trap.
    */
  def rhpSignature(vec: Column, nBits: Int, seed: Int = 42): Column =
    graft.functions.VectorExpressions.rhpSignature(vec, nBits, seed.toLong)

  /** Exact brute-force cosine top-k for one query vector (as a Scala seq —
    * becomes a literal array, broadcast implicitly in the plan).
    *
    * NaN cosines (a zero vector: 0/0) rank LAST, not first: Spark's sort
    * treats NaN as greater than any double, so a bare `desc` on the raw
    * cosine would put every zero vector at rank 1. Ranking on
    * `nanvl(cosine, -Inf)` pushes them below all real scores — the same
    * placement as [[knnJoin]]'s bounded [[graft.functions.TopKByScore]]
    * aggregate (whose `(-score, id)` ordering also sorts NaN last), so
    * the two top-k paths agree. The reported cosine stays NaN.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val qLit = array(query.map(lit): _*)
    df.select(col(idCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), qLit).as("cosine"))
      .orderBy(nanvl(col("cosine"), lit(Double.NegativeInfinity)).desc, col(idCol))
      .limit(k)
  }

  /** Label-cardinality bound for the centroid family
    * ([[nearestCentroid]], [[centroidOutliers]]): both collect ONE
    * dim-length centroid per label to the driver and fuse L × dim
    * literals into the scoring expression (an `array(struct…)` argmax /
    * a `CASE` router) — fine for the intended label cardinalities
    * (languages, domains, sources), but a high-cardinality label column
    * (url host, cluster id) is a silent driver OOM plus a
    * megabytes-of-codegen plan. The guard fails loudly instead
    * ([[Batching.MaxGroupsPerPartition]] design); past it, use the
    * join-based form — broadcast-join the `(label, centroid)` frame and
    * take the per-row argmax with `min_by` over the joined pairs — which
    * trades the fused map-side argmax for a labels-sized shuffle-free
    * join and has no L bound.
    */
  val MaxCentroidLabels: Int = 1024

  /** Collect `(label, centroid)` rows with the [[MaxCentroidLabels]]
    * guard — one job (LIMIT L+1, no separate counting pass), loud
    * failure with the join-based alternative spelled out.
    */
  private def collectCentroids(cents: DataFrame, where: String,
      labelCol: String): Array[(Any, Seq[Double])] = {
    val rows = cents.limit(MaxCentroidLabels + 1).collect()
    if (rows.length > MaxCentroidLabels) throw new IllegalArgumentException(
      s"$where: more than $MaxCentroidLabels distinct '$labelCol' labels — " +
        "the centroid family collects one dim-length centroid per label " +
        "to the driver and fuses labels x dim literals into the scoring " +
        "expression; it is meant for FEW labels (languages, domains, " +
        "sources). For high-cardinality labels broadcast-join the " +
        "(label, centroid) frame and argmax with min_by instead.")
    rows.map(r => r.get(0) -> r.getSeq[Double](1))
  }

  /** Nearest-centroid classification (embedding-space domain tagging):
    * label each vector with the label whose member-average embedding is
    * most cosine-similar — the cheap classifier a curation pipeline
    * runs off a labeled seed corpus (route crawl docs to domains, flag
    * outliers by low best-cosine). Output `(idCol, label_pred,
    * cosine)`, ties broken label-ascending.
    *
    * Scale shape: centroids are one map-side-combinable `vectorSum`
    * aggregate per label (the model — L × dim doubles to the driver,
    * exactly like `Ivf.fit`'s re-center step); assignment is an argmax
    * over L centroid literals fused per row, so the corpus never
    * shuffles. Engine-reproducible: centroid dims round to 6dp in the
    * aggregate frame (the `x_embed_centroid` pinned convention — both
    * engines see bit-identical centroids) and the cosine rounds to 6dp
    * before the argmax.
    */
  def nearestCentroid(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val vecs = df.filter(col(vecCol).isNotNull)
    // unlabeled rows train NO centroid (a null-label group would become
    // a routing target) — they still get classified below, which is the
    // point: route unlabeled arrivals off the labeled seed corpus
    val cents = collectCentroids(
      vecs.filter(col(labelCol).isNotNull).groupBy(col(labelCol))
        .agg(graft.functions.VectorAggregates.vectorSum(col(vecCol)).as("_s"),
          count(col(vecCol)).as("_n"))
        .select(col(labelCol).as("_l"),
          transform(col("_s"), x => round(x / col("_n"), 6)).as("_c")),
      "nearestCentroid", labelCol) // label keeps its NATIVE type
    require(cents.nonEmpty, "nearestCentroid needs at least one label")
    // argmax as array_min over (-cosine, label) structs: cosine decides,
    // the label tie-break is ascending in the label's own type
    // (struct ordering is field order; array_min is order-independent,
    // so the centroid list needs no sorting)
    val scored = array(cents.map { case (lbl, cv) =>
      struct(
        (round(graft.functions.VectorExpressions.cosineFast(col(vecCol),
          array(cv.map(lit): _*)), 6) * -1).as("nc"),
        lit(lbl).as("l"))
    }: _*)
    vecs.select(col(idCol), array_min(scored).as("_b"))
      .select(col(idCol), col("_b.l").as("label_pred"),
        (col("_b.nc") * -1).as("cosine"))
  }

  /** Embedding outlier detection — the data-cleaning triage: score
    * every labeled vector by cosine to its OWN label centroid (the
    * one-shot per-(label, dim) average rounded 6dp — the
    * [[nearestCentroid]] recipe, exactly reproducible in SQL) and flag
    * the lower tail: cosine strictly below the label's exact
    * `tailQuantile` percentile of that distribution (mislabeled and
    * corrupted rows cluster there). Returns `(idCol, labelCol,
    * cosine 6dp, threshold 6dp, outlier)`; both compared values are
    * pre-rounded so engines agree at the boundary.
    *
    * Scale shape: centroids are labels × dim of bounded driver state
    * (the k-centroids plan-literal contract); scoring is one map-side
    * codegen cosine (a CASE over label literals routes each row to its
    * own centroid); the per-label percentile is one hash agg over
    * LABELS (exact here for reproducibility — swap percentile_approx
    * when label cardinality explodes); the flag is a broadcast join of
    * the label-threshold table.
    */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, tailQuantile: Double = 0.1): DataFrame = {
    require(tailQuantile > 0 && tailQuantile < 1,
      s"tailQuantile must be in (0,1), got $tailQuantile")
    val vecs = df.filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
    val cents = collectCentroids(
      vecs.groupBy(col(labelCol))
        .agg(graft.functions.VectorAggregates.vectorSum(col(vecCol)).as("_s"),
          count(col(vecCol)).as("_n"))
        .select(col(labelCol).as("_l"),
          transform(col("_s"), x => round(x / col("_n"), 6)).as("_c")),
      "centroidOutliers", labelCol)
    require(cents.nonEmpty, "centroidOutliers needs at least one label")
    def cosTo(cv: Seq[Double]) =
      graft.functions.VectorExpressions.cosineFast(col(vecCol),
        array(cv.map(lit): _*))
    val cosOwn = cents.tail.foldLeft(cosTo(cents.head._2)) {
      case (acc, (lbl, cv)) =>
        when(col(labelCol) === lit(lbl), cosTo(cv)).otherwise(acc)
    }
    val scored = vecs.select(col(idCol), col(labelCol),
      round(cosOwn, 6).as("cosine"))
    val thr = scored.groupBy(col(labelCol))
      .agg(round(percentile(col("cosine"), lit(tailQuantile)), 6)
        .as("threshold"))
    scored.join(broadcast(thr), Seq(labelCol))
      .select(col(idCol), col(labelCol), col("cosine"), col("threshold"),
        (col("cosine") < col("threshold")).as("outlier"))
  }

  /** Exact all-pairs top-k neighbors per vector (small corpora / within
    * candidate buckets): window-ranked pair join.
    */
  /** Quantized candidate generation + exact rescore — the memory-bound
    * ANN pattern: score the corpus against the QUANTIZED (int8
    * symmetric, [[graft.functions.VectorExpressions.q8Roundtrip]])
    * vectors — at 100 TB the brute-force leg is bandwidth-bound, and
    * int8 reads a quarter of the bytes — keep a `rescoreK` candidate
    * pool, then re-score ONLY the pool at full precision for the final
    * top-`k`. Exactness is probabilistic in the pool width: with
    * `rescoreK ≫ k` the quantization error (≲1/127 per component) must
    * displace a true top-k member past `rescoreK` candidates to change
    * the answer; the gate runs it against the EXACT oracle to show the
    * pool holds at the gated width.
    *
    * Scale shape: both passes are corpus-scan projections + one
    * TakeOrderedAndProject each; the rescore leg is a broadcast semi
    * join of the ≤rescoreK candidate ids — never a second corpus pass
    * at full width (ids, not vectors, travel).
    */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, rescoreK: Int): DataFrame = {
    require(rescoreK >= k, s"rescoreK ($rescoreK) must be ≥ k ($k)")
    val qLit = array(query.map(lit): _*)
    val candidates = df.select(col(idCol),
        graft.functions.VectorExpressions.cosineFast(
          graft.functions.VectorExpressions.q8Roundtrip(col(vecCol)),
          graft.functions.VectorExpressions.q8Roundtrip(qLit)).as("_qc"))
      .orderBy(nanvl(col("_qc"), lit(Double.NegativeInfinity)).desc, col(idCol))
      .limit(rescoreK)
      .select(col(idCol))
    df.join(broadcast(candidates), Seq(idCol), "left_semi")
      .select(col(idCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), qLit)
          .as("cosine"))
      .orderBy(nanvl(col("cosine"), lit(Double.NegativeInfinity)).desc,
        col(idCol))
      .limit(k)
  }

  /** Matryoshka (MRL) truncated-prefix serving: shortlist `rescoreK`
    * candidates by cosine over only the FIRST `dims` components (the
    * matryoshka property: a prefix of an MRL-trained embedding is
    * itself an embedding — dims/fullDim of the scan bandwidth), then
    * rescore the shortlist alone with the full-dimension exact cosine
    * and cut to `k`. The same shortlist/rescore shape as
    * [[quantizedTopK]] (4× reduction) and [[binaryTopK]] (32×) — this
    * one trades dimensions instead of precision. Cosine needs no
    * re-normalization on the prefix (scale-invariant). Both cuts are
    * TakeOrderedAndProject; the SHORTLIST cut orders by the 6dp-ROUNDED
    * prefix cosine with an id tie-break, so the candidate set is
    * engine-reproducible (a replayable cut, not a recall assumption —
    * on non-MRL-trained embeddings the prefix shortlist is NOT
    * guaranteed to contain the exact top-k, and the gate asserts the
    * operator's actual contract instead of pretending it does).
    */
  def matryoshkaTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], dims: Int, k: Int, rescoreK: Int): DataFrame = {
    require(rescoreK >= k && k >= 1, s"need rescoreK >= k >= 1, got $rescoreK/$k")
    require(dims >= 1 && dims <= query.length,
      s"dims must be in [1, ${query.length}], got $dims")
    val qLit = array(query.map(lit): _*)
    val qTrunc = array(query.take(dims).map(lit): _*)
    val candidates = df.select(col(idCol),
        round(graft.functions.VectorExpressions.cosineFast(
          slice(col(vecCol), 1, dims), qTrunc), 6).as("_tc"))
      .orderBy(nanvl(col("_tc"), lit(Double.NegativeInfinity)).desc, col(idCol))
      .limit(rescoreK)
      .select(col(idCol))
    df.join(broadcast(candidates), Seq(idCol), "left_semi")
      .select(col(idCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), qLit)
          .as("cosine"))
      .orderBy(nanvl(col("cosine"), lit(Double.NegativeInfinity)).desc,
        col(idCol))
      .limit(k)
  }

  def allPairsTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cosine").desc, col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("cosine", graft.functions.VectorExpressions.cosineFast(col("va"), col("vb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id_a", "id_b", "cosine", "rank")
  }

  /** Attach the LSH bucket signature (IVF-style partition key). */
  def annBuckets(df: DataFrame, vecCol: String, nBits: Int = 12,
      seed: Int = 42): DataFrame =
    df.withColumn("bucket", rhpSignature(col(vecCol), nBits, seed))

  /** ANN top-k for one query: brute-force cosine restricted to the query's
    * bucket (plus Hamming-1 neighbor buckets when `multiProbe`).
    */
  def annTopK(bucketed: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nBits: Int = 12, seed: Int = 42,
      multiProbe: Boolean = true): DataFrame = {
    val spark = bucketed.sparkSession
    val qDf = spark.range(1).select(
      rhpSignature(array(query.map(lit): _*), nBits, seed).as("qb"))
    val qBucket = qDf.head().getLong(0)
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: (0 until nBits).map(b => qBucket ^ (1L << b))
      else Seq(qBucket)
    bruteForceTopK(
      bucketed.filter(col("bucket").isin(probes: _*)), idCol, vecCol, query, k)
  }

  /** Late-interaction (MaxSim) scoring: documents are BAGS of vectors
    * (one per chunk/token, keyed by `groupCol`), a query is a small bag of
    * vectors, and a document's score is `Σ_q max_d cos(q, d)` — the
    * ColBERT retrieval objective, which beats single-vector retrieval
    * when relevance lives in one passage of a long document.
    *
    * Returns `(groupCol, maxsim double)`, one row per document group,
    * scores summed over per-query maxima rounded to 6dp and accumulated
    * in decimal so the result is independent of aggregation order (and
    * engine-reproducible).
    *
    * Scale shape: queries broadcast and scored map-side (codegen'd
    * cosine); BOTH aggregations — the per-(group, query) max and the
    * per-group sum — are hash aggregates with map-side partials, so a
    * group's cost in each shuffle is one row per partition regardless of
    * how many vectors it holds. Corpus is never shuffled by vector, only
    * by (group, query) then group keys.
    */
  def maxSimScores(corpus: DataFrame, queries: DataFrame, groupCol: String,
      vecCol: String, qIdCol: String, qVecCol: String): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))))
      .select(col(groupCol), col(qIdCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), col(qVecCol)).as("_c"))
    scored
      .groupBy(col(groupCol), col(qIdCol))
      .agg(max(col("_c")).as("_m"))
      // round-then-decimal-sum: double addition is not associative, and
      // partial-merge order differs between engines and runs
      .groupBy(col(groupCol))
      .agg(sum(round(col("_m"), 6).cast("decimal(16,6)"))
        .cast("double").as("maxsim"))
  }

  /** Exact KNN join: for every query vector, the k nearest corpus vectors
    * by cosine — the batch retrieval shape (embed a batch of prompts,
    * fetch neighbors for each) that [[bruteForceTopK]]'s single literal
    * query can't express.
    *
    * Returns `(qIdCol, rk, idCol, cosine)` with `rk ∈ [1, k]`, cosine
    * rounded to 6 decimals, ties broken by corpus id.
    *
    * Scale shape: the query side is broadcast (a retrieval batch is
    * thousands of rows at most) and scored map-side with the codegen'd
    * `vector_cosine` — the corpus is never shuffled. Per-query ranking
    * uses the bounded [[graft.functions.TopKByScore]] aggregate: map-side
    * partials keep O(k) state per (partition, query), so the only shuffle
    * carries `numPartitions × k` pairs per query — NOT the window-rank
    * formulation, which funnels all N scored rows of each query into one
    * task (skew by construction at corpus scale). For sub-scan latency at
    * many queries, pre-bucket both sides with [[annBuckets]] and apply the
    * same aggregate within buckets.
    */
  /** Hard-negative mining — for each query, the most similar corpus
    * vectors with a DIFFERENT label (contrastive-training's negative
    * set: near the query in embedding space, wrong by the labels). The
    * [[knnJoin]] shape plus the label-exclusion predicate: broadcast
    * query side, bounded `TopKByScore` per query, no corpus window.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, qIdCol: String, qVecCol: String,
      qLabelCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIntegralId(corpus, idCol, "hardNegatives corpus")
    val scored = corpus
      .crossJoin(broadcast(
        queries.select(col(qIdCol), col(qVecCol), col(qLabelCol))))
      .filter(col(labelCol) =!= col(qLabelCol))
      .select(col(qIdCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), col(qVecCol)).as("_c"),
        col(idCol).cast("long").as("_id"))
    rankScoredTopK(scored, qIdCol, idCol, k)
  }

  def knnJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIntegralId(corpus, idCol, "knnJoin corpus")
    val scored = corpus
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))))
      .select(col(qIdCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), col(qVecCol)).as("_c"),
        col(idCol).cast("long").as("_id"))
    rankScoredTopK(scored, qIdCol, idCol, k)
  }

  /** Shared tail of the batch-retrieval paths ([[knnJoin]],
    * [[graft.sink.VectorIndex.knnSearch]]): given `(qIdCol, _c double,
    * _id long)` scored pairs, the per-query top-k via the bounded
    * [[graft.functions.VectorAggregates.topKByScore]] aggregate — O(k)
    * state per (partition, query) map-side, so the only shuffle carries
    * `numPartitions × k` pairs per query, never a corpus window.
    */
  private[graft] def rankScoredTopK(scored: DataFrame, qIdCol: String,
      idCol: String, k: Int): DataFrame =
    scored
      .groupBy(col(qIdCol))
      .agg(graft.functions.VectorAggregates.topKByScore(col("_c"), col("_id"), k).as("_nn"))
      .select(col(qIdCol), posexplode(col("_nn")).as(Seq("_pos", "_p")))
      .select(col(qIdCol), (col("_pos") + 1).as("rk"),
        col("_p").getField("id").as(idCol),
        round(col("_p").getField("score"), 6).as("cosine"))

  /** 1-bit-per-dimension binary signature: bit `i` set iff
    * `vec[i] > 0` — packed into ONE long for dims ≤ 64 (the binary
    * quantization used by modern vector stores: 32× smaller than
    * float32, Hamming distance ≈ angular distance for centered data).
    * Unrolled into a codegen'd 64-term bitwise OR at plan time — no
    * HOF, no UDF.
    */
  def binarySignature(vec: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"dim must be in [1,64], got $dim")
    (0 until dim).map(i =>
      when(element_at(vec, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }

  /** Binary-quantized KNN with exact rescoring: Hamming distance on the
    * packed [[binarySignature]]s shortlists `rerank` candidates
    * (`bit_count(sig XOR qsig)` — one xor+popcount per row, the whole
    * corpus pass touches 8 bytes/vector), then the shortlist alone is
    * rescored with the exact cosine and cut to `k`. The standard
    * BQ/rescore serving pattern: ~32× less memory bandwidth than raw
    * floats on the corpus pass, full precision where it matters.
    * Returns `(idCol, hamming, cosine, rk)`.
    *
    * Scale shape: signature + Hamming are a pure projection over the
    * corpus; both cuts are TakeOrderedAndProject (never a global
    * sort); the query row rides a broadcast. Ties at the Hamming cut
    * break deterministically by id.
    *
    * The query side is hard-bounded to one row (`limit(1)` after the id
    * equality): a duplicated `idCol` would otherwise multiply every
    * corpus row through the cross join and corrupt the shortlist. A
    * missing `queryId` (absent id or null vector) fails loudly rather
    * than returning a plausible-looking empty top-k.
    */
  def binaryTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryId: Long, rerank: Int, k: Int): DataFrame = {
    require(rerank >= k && k >= 1, s"need rerank >= k >= 1, got $rerank/$k")
    val e = df.filter(col(vecCol).isNotNull)
    val sigs = e.select(col(idCol), col(vecCol),
      binarySignature(col(vecCol), dim).as("_sig"))
    val q = sigs.filter(col(idCol) === queryId)
      .select(col("_sig").as("_qsig"), col(vecCol).as("_qv"))
      .limit(1)
    if (q.isEmpty)
      throw new IllegalArgumentException(
        s"binaryTopK: query id $queryId has no non-null vector in '$vecCol'")
    sigs.crossJoin(broadcast(q))
      .select(col(idCol), col(vecCol), col("_qv"),
        bit_count(col("_sig").bitwiseXOR(col("_qsig"))).as("hamming"))
      .orderBy(col("hamming"), col(idCol)).limit(rerank)
      .select(col(idCol), col("hamming"),
        round(graft.functions.VectorExpressions.cosineFast(
          col(vecCol), col("_qv")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol)).limit(k)
      .select(col(idCol), col("hamming"), col("cosine"))
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein '98) —
    * the result-diversification pass every retrieval stack runs between
    * candidate generation and serving: greedily pick
    * `argmax λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)` so near-
    * duplicate candidates stop crowding out novel ones. Input is a
    * BOUNDED candidate frame `(queryCol, idCol, relCol, vecCol)` (the
    * top-N of an ANN/BM25 stage — N is tens, never the corpus);
    * returns `(queryCol, rk, cand_id, mmr_score)` for the first `k`
    * picks per query, rank-ordered.
    *
    * Determinism contract (what lets a DuckDB oracle replay the greedy
    * loop exactly): relevance and every pairwise cosine round to 6dp
    * BEFORE scoring (the [[graft.functions.VectorExpressions]] cosine
    * convention), scores round to 6dp, ties break on ascending id.
    * Callers should pick λ with an exact binary representation (0.5,
    * 0.75, …) so `1−λ` is the same double in any engine.
    *
    * Scale shape: one shuffle to group each query's candidates
    * (bounded list state — the collect_list holds N structs, never
    * corpus rows), then the O(N·k) greedy loop runs per query inside
    * mapPartitions; queries parallelize across the cluster. Pairwise
    * sims are computed incrementally (each new pick updates each
    * remaining candidate's running max once), so the loop is N·k
    * cosines, not N².
    *
    * NaN relevance (a zero query or candidate vector upstream) EXCLUDES
    * the candidate — a NaN can neither rank nor be rounded; silently
    * treating it as 0 would let a garbage vector into the diversity
    * penalty. NaN pairwise sims (zero candidate vs zero candidate)
    * simply never raise the running max.
    */
  def mmrRerank(candidates: DataFrame, queryCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val vecIsFloat = candidates.schema(vecCol).dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case t => throw new IllegalArgumentException(
        s"mmrRerank: vector column must be array<float|double>, got ${t.simpleString}")
    }
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      if (c.isNaN) Double.NaN else round6(c)
    }
    val grouped = candidates.groupBy(col(queryCol))
      .agg(collect_list(struct(col(idCol).cast("long").as("_id"),
        col(relCol).cast("double").as("_rel"), col(vecCol).as("_vec")))
        .as("_cands"))
    val outSchema = StructType(Seq(
      grouped.schema.head.copy(),
      StructField("rk", IntegerType, nullable = false),
      StructField("cand_id", LongType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    grouped.flatMap { row =>
      val cands = row.getSeq[Row](1).toArray
        .filter(c => !c.isNullAt(1) && !c.getDouble(1).isNaN &&
          !c.isNullAt(2))
      val ids = cands.map(_.getLong(0))
      val rels = cands.map(c => round6(c.getDouble(1)))
      val vecs: Array[Array[Double]] = cands.map { c =>
        if (vecIsFloat) c.getSeq[Float](2).iterator.map(_.toDouble).toArray
        else c.getSeq[Double](2).toArray
      }
      val n = cands.length
      val taken = new Array[Boolean](n)
      val maxSim = new Array[Double](n) // 0 before the first pick
      val out = Seq.newBuilder[Row]
      var rk = 1
      while (rk <= math.min(k, n)) {
        var best = -1
        var bestScore = 0.0
        var i = 0
        while (i < n) {
          if (!taken(i)) {
            val s = round6(lambda * rels(i) - (1 - lambda) * maxSim(i))
            if (best < 0 || s > bestScore ||
                (s == bestScore && ids(i) < ids(best))) {
              best = i; bestScore = s
            }
          }
          i += 1
        }
        taken(best) = true
        out += Row(row.get(0), rk, ids(best), bestScore)
        i = 0
        while (i < n) {
          if (!taken(i)) {
            val sim = cos6(vecs(i), vecs(best))
            if (sim > maxSim(i)) maxSim(i) = sim
          }
          i += 1
        }
        rk += 1
      }
      out.result()
    }(enc)
  }

  /** md5-56 of a UTF-8 string on the JVM side — the same value as
    * [[Corpus.sampleHash]]'s Column form and DuckDB's
    * `md5_number_lower(s) % 2^56` (digest bytes 8–14, little-endian):
    * lets PLAN-TIME derivations (e.g. the projection sign matrix below)
    * share the engine-reproducible hash family. Pinned against the
    * Column form in SimilaritySpec.
    */
  private[graft] def md5_56(s: String): Long =
    graft.functions.Md5Low56.hash(s)

  /** The deterministic Achlioptas sign matrix behind
    * [[randomProjection]]: `signs(j)(i) ∈ {+1, 0, −1}` with
    * probabilities 1/6, 2/3, 1/6 keyed by `md5_56(seed:i:j) % 6` —
    * derivable in ANY engine (the [[md5_56]] convention), so an oracle
    * can rebuild the identical matrix from the seed alone.
    */
  def projectionSigns(seed: Int, inDim: Int, outDim: Int): Array[Array[Int]] =
    Array.tabulate(outDim, inDim) { (j, i) =>
      graft.functions.SparseRandomProject.sign(seed, i, j)
    }

  /** Sparse random projection (Achlioptas' database-friendly
    * Johnson–Lindenstrauss transform): reduce `inDim`-dim embeddings to
    * `outDim` dims as `y_j = sqrt(3/outDim) · Σᵢ signs(j)(i) · x_i` —
    * the standard pre-ANN dimensionality reduction (distances preserved
    * within JL distortion; 2/3 of the matrix is zero so each output is
    * a ~inDim/3-term signed sum). The matrix is derived from the seed
    * INSIDE the native [[graft.functions.SparseRandomProject]]
    * expression (built lazily once per executor JVM from three literal
    * ints) — the plan carries ONE node regardless of dimensions, so the
    * operator survives production widths (768→128 ≈ 100k nodes in the
    * unrolled r9 form, where Catalyst analysis alone took minutes and
    * the tree was duplicated into the scan's `DataFilters`). No HOF, no
    * matrix broadcast, no shuffle; a pure projection that scales with
    * scan bandwidth. Output components round to 6dp (the
    * float-reduction compare convention), term order ascending-index
    * left-associated — bit-identical to the seed-rebuilt oracle. Null
    * vectors are excluded. Returns `(idCol, projected)`.
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int, seed: Int = 7): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), graft.functions.VectorExpressions
        .sparseRandomProject(col(vecCol), seed, inDim, outDim)
        .as("projected"))

  /** PCA rotation / whitening of an embedding column — the data-derived
    * counterpart of [[randomProjection]] (decorrelate dimensions, order
    * them by variance, optionally rescale to unit variance; the standard
    * retrieval-embedding post-process).
    *
    * Scale shape: ONE pass accumulates per-partition `(n, Σx, Σxxᵀ)`
    * partials (dim + dim² doubles each — corpus-size-independent state,
    * the IVF-training shape), at most one small row per partition is
    * collected (the k-sized-collect convention), the 64×64…768×768
    * eigenproblem solves on the driver via cyclic Jacobi, and the
    * projection back over the corpus is a pure mapPartitions pass with
    * the rotation in task closures — no shuffle anywhere, throughput =
    * scan bandwidth.
    *
    * Rows with a null vector project to null (poison-pill convention);
    * a null ELEMENT inside a vector fails loudly — it would silently
    * poison the covariance. Returns `(idCol, projected)` where
    * `projected(j)` is the component along the (j+1)-th largest-variance
    * eigenvector of the SAMPLE covariance, mean-centered;
    * `whiten = true` rescales each component by `1/√λ` (components with
    * `λ ≤ 1e-12` are left unscaled rather than exploded). Orthogonal
    * rotation (k = dim, whiten = false) preserves pairwise distances to
    * fp rounding — the gate's invariant.
    */
  def pcaRotate(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, whiten: Boolean = false): DataFrame = {
    require(dim >= 1 && k >= 1 && k <= dim,
      s"need 1 <= k <= dim, got k=$k dim=$dim")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    df.schema(vecCol).dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
      case t => throw new IllegalArgumentException(
        s"pcaRotate expects array<float|double>, got ${t.simpleString}")
    }
    def vecAt(r: Row, vIdx: Int): Array[Double] = {
      val seq = r.getSeq[Any](vIdx)
      if (seq.length < dim) throw new IllegalArgumentException(
        s"pcaRotate: vector has ${seq.length} elements, need $dim")
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        seq(i) match {
          case null => throw new IllegalArgumentException(
            "pcaRotate: null vector element would poison the covariance")
          case f: java.lang.Float => out(i) = f.toDouble
          case d: java.lang.Double => out(i) = d
          case other => throw new IllegalArgumentException(
            s"pcaRotate: unexpected element $other")
        }
        i += 1
      }
      out
    }
    // one covariance partial per partition: (n, sum, flattened sum xxᵀ)
    val partSchema = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("s", ArrayType(DoubleType, containsNull = false)),
      StructField("ss", ArrayType(DoubleType, containsNull = false))))
    val partials = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .mapPartitions { rows =>
        val s = new Array[Double](dim)
        val ss = new Array[Double](dim * dim)
        var n = 0L
        rows.foreach { r =>
          val x = vecAt(r, 0)
          var i = 0
          while (i < dim) {
            s(i) += x(i)
            var j = 0
            val base = i * dim
            while (j < dim) { ss(base + j) += x(i) * x(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator(Row(n, s.toSeq, ss.toSeq))
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(partSchema))
      .collect()
    val n = partials.map(_.getLong(0)).sum
    require(n >= 2, s"pcaRotate needs at least 2 vectors, got $n")
    val s = new Array[Double](dim)
    val ss = new Array[Double](dim * dim)
    partials.foreach { r =>
      val ps = r.getSeq[Double](1); val pss = r.getSeq[Double](2)
      var i = 0
      while (i < dim) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < dim * dim) { ss(i) += pss(i); i += 1 }
    }
    val mean = s.map(_ / n)
    // sample covariance: (Σxxᵀ − n·μμᵀ) / (n − 1)
    val cov = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        cov(i * dim + j) = (ss(i * dim + j) - n * mean(i) * mean(j)) / (n - 1)
        j += 1
      }
      i += 1
    }
    val (eval, evec) = jacobiEigen(cov, dim)
    // order components by descending eigenvalue, deterministic ties by index
    val order = (0 until dim).sortBy(j => (-eval(j), j)).take(k).toArray
    val scaleJ = order.map { j =>
      if (whiten && eval(j) > 1e-12) 1.0 / math.sqrt(eval(j)) else 1.0
    }
    // projection matrix rows: out_c = scale_c · Σ_i evec(i, order(c))·(x_i − μ_i)
    val proj = Array.tabulate(k, dim)((c, i2) =>
      evec(i2 * dim + order(c)) * scaleJ(c))
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("projected", ArrayType(DoubleType, containsNull = false),
        nullable = true)))
    val idIdx2 = df.schema.fieldIndex(idCol)
    val vIdx2 = df.schema.fieldIndex(vecCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(vIdx2)) Row(r.get(idIdx2), null)
        else {
          val x = vecAt(r, vIdx2)
          val out = new Array[Double](k)
          var c = 0
          while (c < k) {
            val p = proj(c)
            var acc = 0.0
            var i2 = 0
            while (i2 < dim) { acc += p(i2) * (x(i2) - mean(i2)); i2 += 1 }
            out(c) = acc
            c += 1
          }
          Row(r.get(idIdx2), out.toSeq)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (row-major
    * `a`, size dim×dim — destructively copied): returns (eigenvalues,
    * eigenvectors) with eigenvector `c` in COLUMN c of the returned
    * row-major matrix. Converges quadratically; dims here are embedding
    * widths (≤ ~1k), a driver-side millisecond problem.
    */
  private[operators] def jacobiEigen(aIn: Array[Double], dim: Int)
      : (Array[Double], Array[Double]) = {
    val a = aIn.clone()
    val v = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) { v(i * dim + i) = 1.0; i += 1 }
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-11) {
      off = 0.0
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p * dim + q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-13) {
            val app = a(p * dim + p)
            val aqq = a(q * dim + q)
            val theta = (aqq - app) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → 45° rotation
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s2 = t * c
            var r = 0
            while (r < dim) {
              val arp = a(r * dim + p); val arq = a(r * dim + q)
              a(r * dim + p) = c * arp - s2 * arq
              a(r * dim + q) = s2 * arp + c * arq
              r += 1
            }
            r = 0
            while (r < dim) {
              val apr = a(p * dim + r); val aqr = a(q * dim + r)
              a(p * dim + r) = c * apr - s2 * aqr
              a(q * dim + r) = s2 * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < dim) {
              val vrp = v(r * dim + p); val vrq = v(r * dim + q)
              v(r * dim + p) = c * vrp - s2 * vrq
              v(r * dim + q) = s2 * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val evals = Array.tabulate(dim)(j => a(j * dim + j))
    (evals, v)
  }

  /** The integral-id guard shared by the bounded-aggregate retrieval
    * paths: the aggregate carries primitive (double, long) pairs — a
    * non-integral id would cast to null and be SILENTLY dropped.
    */
  private[graft] def requireIntegralId(df: DataFrame, idCol: String,
      what: String): Unit = {
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(idType),
      s"$what id '$idCol' must be integral, got ${idType.simpleString}")
  }
}
