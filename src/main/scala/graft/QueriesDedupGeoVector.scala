package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Changelog
import graft.schema.{Flattener, Stringifier}
import graft.shard.{ModuloSharding, ShardingStrategyFactory}
import graft.sink.DocQueries
import graft.SparkEntry.{dec, tempDir, sharedExactPairs, sharedPrunedCosinePairs}
import graft.SparkEntry.eventsChangelog
import graft.OracleDefs.bpeApplyMerges

/** Gate registry 2/4: dedup (exact/LSH/simhash/incremental), graph (CC/pagerank/HITS), geo (scan+indexed), and vector/similarity serving rows.
  * (Verbatim slice of the former SparkEntry.queries literal — the
  * registry split is pure file layout, zero behavior change.)
  */
private[graft] object QueriesDedupGeoVector {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- LLM-pipeline extensions (north-star operators) ----

    // Exact dedup: one hash-agg on the content key.
    "x_dedup_exact" -> ((s, d) =>
      operators.Dedup.exact(Tables.documents(s, d), "doc_id", Seq("text"))
        .select("keep_id", "n_copies").orderBy("keep_id")),

    // Winnowing fingerprints (the MOSS local-match scheme): md5-56
    // shingle hashes, min of every 4-hash window, distinct kept values
    // — any shared ≥6-token substring between docs must share a
    // fingerprint. One transform chain per row, no shuffle before the
    // output explode; matching is a fingerprint equi-join, never
    // all-pairs.
    "x_winnowing" -> ((s, d) =>
      operators.Dedup.winnowingFingerprints(
        Tables.documents(s, d), "doc_id", "text", k = 3, w = 4)
        .orderBy("doc_id", "fingerprint")),

    // Soft dedup: downweight instead of drop — every exact-content
    // cluster's docs get weight 1/n (one document of sampling mass per
    // cluster). The corpus has no exact dups, so every 10th doc is
    // re-planted under a shifted id FIRST (identical planting in the
    // oracle): those clusters provably weigh 0.5 each, the rest 1.0.
    "x_dedup_soft" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val planted = docs.unionByName(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            col("text")))
      operators.Dedup.softWeights(planted, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Exact duplicate-span detection (the ExactSubstr shape): maximal
    // token runs appearing verbatim in ≥2 docs, with exact positions —
    // the cut-the-span alternative to whole-document dedup. The
    // synthetic corpus's templated phrases yield ~1k shared 5-gram
    // runs at sf0.01, so the gate pins positions and span text.
    "x_dedup_spans" -> ((s, d) =>
      operators.Dedup.duplicateSpans(Tables.documents(s, d), "doc_id",
        "text", k = 5, minDocs = 2)
        .orderBy("doc_id", "span_start")),

    // Exact n-gram Jaccard near-dup pairs (the LSH verifier, run whole).
    // This row OWNS the family's shared corpus-wide reference: the frame
    // is computed once per (sf, session) and the minhash / simhash /
    // clusters gates consume the persisted copy instead of re-running
    // the verifier in each timed body.
    "x_dedup_ngram" -> ((s, d) =>
      sharedExactPairs(s, d).orderBy("id_a", "id_b")),

    // ASYMMETRIC containment (|Sₐ∩S_b|/|S_small|): the quote/subset
    // detector Jaccard is blind to — a paragraph verbatim inside a much
    // longer page scores near-zero Jaccard but containment 1.0. Same
    // shingle-keyed join shape as x_dedup_ngram, never all-pairs.
    // r18: consumes the session-shared word-3-shingle-set frame (the
    // x_dedup_prefix_filter pattern; identical sets — ngramContainment
    // builds array_distinct(wordShingles(text, 3)) itself) — the
    // shingling pass is charged to the bench's explicit
    // shared_frames_build row; the timed body keeps the collision join,
    // the count aggregate and the containment verify end-to-end.
    "x_dedup_containment" -> ((s, d) =>
      operators.Dedup.ngramContainmentOnSets(
        graft.SparkEntry.sharedShingleSets(s, d), "doc_id", "shingles",
        threshold = 0.3)
        .orderBy("id_small", "id_big")),

    // MinHash+LSH candidates verified by exact Jaccard, gated as ONE
    // oracle-checkable row: the exact-verifier pair count must equal the
    // SQL oracle's count, candidates must be a subset of the exact pairs
    // (precision 1.0 — the verify step's contract), and LSH recall vs the
    // exact set must hold. Converts the round-1 rows-only entry into a
    // hash-gated one without weakening the probabilistic semantics.
    // BENCH NOTE: the corpus-wide exact verifier is the family's SHARED
    // reference (owned by x_dedup_ngram, computed once per session) —
    // this body pays the full-outer equivalence join the gate requires,
    // not a second verifier run. The operator being graded is
    // minhashDedup's banded (band, bucket) join, which only touches
    // candidate pairs.
    // Edit-distance near-dup verification: candidate pairs from the
    // exact shingle equi-join (the engine-reproducible generator; the
    // LSH generator composes identically), then per-pair BANDED
    // Levenshtein ≤ 6 — quadratic work confined to O(candidates),
    // never the corpus; the threshold's early abandon makes each pair
    // O(len·maxDist). Distances 4–8 live in this corpus, so the bound
    // genuinely prunes.
    // Candidate-generator evaluation: winnowing-fingerprint-overlap
    // candidates scored against the exact trigram-Jaccard >= 0.3 truth
    // set — the recall/precision measurement a pipeline runs (on a
    // sample) before trusting a banded generator at 100 TB. Both
    // generators are md5-56-derived, so the oracle rebuilds BOTH sides
    // and replays the confusion counts exactly.
    // r17: the τ=0.3 truth/candidate frame is session-shared (the r7
    // pattern — x_dedup_eval's truth and x_dedup_edit's candidates ran
    // the identical corpus-wide ngramJaccard twice); the graded
    // operators here (winnowing generator + confusion counts, banded
    // Levenshtein verify) still run in full and own their oracles.
    "x_dedup_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val fps = operators.Dedup.winnowingFingerprints(docs, "doc_id", "text")
      val cand = fps.as("a").join(fps.as("b"),
          col("a.fingerprint") === col("b.fingerprint") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      operators.Dedup.evalCandidatePairs(cand,
        graft.SparkEntry.sharedExactPairs03(s, d))
    }),

    "x_dedup_edit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.verifyEditDistance(
          graft.SparkEntry.sharedExactPairs03(s, d), docs, "doc_id", "text", 6)
        .orderBy("id_a", "id_b")
    }),

    // Exact-threshold token-set Jaccard join via PREFIX FILTERING
    // (All-Pairs/SSJoin — the deterministic-recall complement to LSH):
    // the oracle computes the NAIVE all-token self-join, so the row
    // gates the algorithm's completeness theorem — the rare-token
    // prefix prune must lose NOTHING against an engine that never
    // pruned at all.
    // consumes the session-shared shingle-set frame (r16 verdict task
    // 4): the shingling pass is computed once per (sf, session) by
    // SparkEntry.sharedShingleSets; the timed body keeps the df
    // aggregate, per-doc prefix windows, candidate join and exact
    // verification — and still owns its oracle end-to-end.
    "x_dedup_prefix_filter" -> ((s, d) =>
      operators.Dedup.prefixFilterJoinOnSets(
        graft.SparkEntry.sharedShingleSets(s, d), "doc_id", "shingles",
        threshold = 0.8)
        .orderBy("id_a", "id_b")),

    "x_dedup_minhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val exact = sharedExactPairs(s, d)
        .select(col("id_a"), col("id_b"))
      val mh = operators.Dedup.minhashDedup(docs, "doc_id", "text")
        .select(col("id_a").as("ma"), col("id_b").as("mb"))
      // sums are coalesced to 0: a corpus with ZERO exact near-dup pairs
      // makes every sum() NULL (empty agg input), which would yield NULL
      // booleans mismatching the oracle's literal TRUE — 0 >= 0 holds
      exact.join(mh,
          col("id_a") === col("ma") && col("id_b") === col("mb"), "full_outer")
        .agg(
          coalesce(sum(when(col("id_a").isNotNull, 1).otherwise(0)), lit(0L)).as("n_exact"),
          (coalesce(sum(when(col("id_a").isNotNull && col("ma").isNotNull, 1).otherwise(0)), lit(0L)) >=
            coalesce(sum(when(col("id_a").isNotNull, 1).otherwise(0)), lit(0L)) * 0.8).as("recall_ok"),
          (coalesce(sum(when(col("id_a").isNull, 1).otherwise(0)), lit(0L)) === 0).as("precision_ok"))
    }),

    // Incremental dedup against the persisted SignatureStore, split into
    // a BUILD row and a PROBE row (the former single x_dedup_incremental
    // conflated four LSH legs + exact verify into one 5 s gate, hiding
    // per-leg regressions). The incr ≡ one-shot-full equality the old row
    // asserted is owned by SignatureStoreSpec ("union of probes ≡
    // one-shot LSH", "selfPairs reproduces one-shot LSH across appends");
    // corpus-wide recall/precision vs the exact pair set is owned by
    // x_dedup_minhash. Each row here times ONE path of the steady-state
    // ingest loop and value-asserts its own oracle-checkable output.
    //
    // BUILD: sign a base corpus, then admit ONE arriving batch through
    // the fused sign-once probe-and-commit step — the ingest-side cost.
    // (The two-batch incr≡full proof is spec-owned; the write+appends+
    // compact shape is x_signature_stats' body — this row times exactly
    // one base build plus one fused admission.) Gate: the store's health
    // stats, fully deterministic (every doc signs to exactly `bands`(=8)
    // rows; disjoint batch, no supersessions; 1 pending commit).
    "x_dedup_incremental_build" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.filter(pmod(col("doc_id"), lit(5)) < 3)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) >= 3)
      val dir = tempDir("graft-sig-build")
      sink.SignatureStore.write(base, "doc_id", "text", dir)
      // the batch signs ONCE (probe ≡ + append ≡ pinned in
      // SignatureStoreSpec); the returned candidate pairs are the
      // ingest loop's screening output — materialized, as a real loop
      // would consume them, but value-asserted by the PROBE row below
      sink.SignatureStore.probeAndAppend(batch, dir).count(): Unit
      sink.SignatureStore.stats(s, dir)
    }),

    // PROBE: screen ONE arriving batch against an existing store — the
    // serving-side cost (signature-store probe exponents 0.08 at 10×;
    // this row is what regresses if the probe path picks up an extra
    // scan leg). Candidates = cross(store, batch) ∪ within-batch, i.e.
    // every pair touching the batch; the exact-verify leg shingles only
    // broadcast-pruned candidate docs. n_verified hash-checks against
    // the oracle's exact pair count restricted to pairs touching the
    // batch — candidate coverage of every exact pair plus verifier
    // precision, the old row's recall fact on the probe path.
    "x_dedup_incremental_probe" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = docs.filter(pmod(col("doc_id"), lit(5)) < 4)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      val dir = tempDir("graft-sig-probe")
      sink.SignatureStore.write(store, "doc_id", "text", dir)
      val cand = sink.SignatureStore.probe(batch, dir)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // shingle only docs that appear in a candidate pair: the candidate
      // id set is pair-sized, so broadcasting it prunes the corpus scan
      // BEFORE the expensive shingling — identical result (non-candidate
      // docs never survive the verify joins anyway)
      val candIds = cand.select(explode(array(col("id_a"), col("id_b")))
        .as("doc_id")).distinct()
      val candDocs = docs.join(broadcast(candIds), "doc_id")
      // cutPairs = false: cand is ALREADY persisted above — the default
      // checkpoint would eagerly re-materialize a cached frame (r18)
      operators.Dedup.verifyJaccard(cand, candDocs, "doc_id", "text", 3,
          cutPairs = false)
        .filter(col("jaccard") >= 0.5)
        .agg(count(lit(1)).as("n_verified"))
    }),

    // Signature-store health + the stats-driven auto-compaction hook
    // (x_postings_stats / x_sim_ivf_stats parity): base + 2 appends
    // leave a 2-deep commit log; maybeCompact(maxDeltas=1) must fold it,
    // after which the live store reports every doc exactly once.
    // Deterministic: every doc signs to exactly `bands`(=8) rows, so
    // n_rows = 8 × n_docs off the compacted layout.
    "x_signature_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = tempDir("graft-sigstat")
      sink.SignatureStore.write(
        docs.filter(pmod(col("doc_id"), lit(5)) < 3), "doc_id", "text", dir)
      sink.SignatureStore.append(
        docs.filter(pmod(col("doc_id"), lit(5)) === 3), dir)
      sink.SignatureStore.append(
        docs.filter(pmod(col("doc_id"), lit(5)) === 4), dir)
      val ran = sink.SignatureStore.maybeCompact(s, dir, maxDeltas = 1)
      sink.SignatureStore.stats(s, dir).withColumn("compact_ran", lit(ran))
    }),

    // Duplicate clustering: connected components over the exact near-dup
    // pair graph (the shared family verifier); every doc labeled with
    // its canonical (min-id) survivor.
    "x_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.connectedComponents(sharedExactPairs(s, d),
          docs.select("doc_id"))
        .orderBy("id")
    }),

    // Cluster labeling: each non-singleton near-dup cluster named by
    // its 3 most frequent tokens (tie → ascending term) — the
    // human-auditable "what IS this cluster" handle on the same shared
    // pair graph as x_dedup_clusters; the oracle extends that gate's
    // recursive min-reach walk with the token ranking.
    "x_cluster_labels" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Dedup.clusterLabels(
          operators.Dedup.connectedComponents(sharedExactPairs(s, d),
            docs.select("doc_id")),
          docs, "doc_id", "text", topK = 3)
        .orderBy("cluster_id", "rk")
    }),

    // Link-graph centrality (bounded power iteration) — the
    // crawl-prioritization / quality-weighting primitive: rank docs by
    // link structure over a deterministic synthetic link graph (each
    // doc links to (7·id+1) mod n and (13·id+5) mod n; both multipliers
    // are coprime to n, so in-degree is exactly 2 everywhere). Five
    // iterations at d=0.85; the oracle unrolls the identical closed
    // form. Each iteration is ONE shuffle on the destination key — no
    // driver graph state (GraphSpec pins mass conservation and hub
    // asymmetry).
    "x_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val n = docs.count() // bounded driver scalar: the link modulus
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 5, lit(n)).as("dst")))
      operators.Graph.pageRank(edges, "src", "dst", docs, "doc_id",
          iters = 5, damping = 0.85)
        .select(col("id"), round(col("rank"), 8).as("rank"))
        .orderBy("id")
    }),

    // Topic-sensitive PageRank: teleport mass lands only on the German
    // slice — centrality relative to a trusted seed set ("rank the
    // crawl around the pages we already trust"). Same per-iteration
    // shuffle shape as x_pagerank; the topic is a plan-time predicate.
    "x_pagerank_topic" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      val n = docs.count() // bounded driver scalar: the link modulus
      val ids = docs.select("doc_id")
      val edges = ids.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
        .unionByName(ids.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 5, lit(n)).as("dst")))
      operators.Graph.personalizedPageRank(edges, "src", "dst", docs,
          "doc_id", col("lang") === "de", iters = 5, damping = 0.85)
        .select(col("id"), round(col("rank"), 8).as("rank"))
        .orderBy("id")
    }),

    // Multi-source BFS hop distance: how far is every page from the
    // trusted seed set (doc_id % 97 == 0) over the synthetic link
    // graph, 6 hops. Each hop joins only the NEW frontier against the
    // edge list + an anti-join on settled nodes; the oracle is a
    // recursive CTE over the same arithmetic.
    "x_shortest_path" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val n = docs.count() // bounded driver scalar: the link modulus
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 5, lit(n)).as("dst")))
      operators.Graph.shortestPaths(edges, "src", "dst",
          docs.filter(pmod(col("doc_id"), lit(97)) === 0), "doc_id",
          maxHops = 6)
        .orderBy("id")
    }),

    // Triangle count over an undirected quadratic-residue + shift link
    // graph (varying degree — the coprime graph alone has in-degree
    // exactly 2 everywhere). Degree-ordered orientation bounds the
    // wedge join at O(E^{3/2}) however skewed the hubs.
    "x_triangle_count" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * col("doc_id") + 3, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("dst")))
      operators.Graph.triangleCount(edges, "src", "dst")
    }),

    // In-degree distribution of the quadratic-residue graph (hub
    // diagnostic): nodes with no in-edges count at degree 0. Two hash
    // aggregates — node-sized, then degree-sized.
    "x_degree_dist" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * col("doc_id") + 3, lit(n)).as("dst"))
      operators.Graph.degreeDistribution(edges, "src", "dst", docs,
        "doc_id", "in")
    }),

    // Deterministic random walks (the node2vec/DeepWalk corpus sampler,
    // replayable in any engine): 4 steps from the seed set, neighbor
    // choice = md5_56(start:step) mod outdeg over id-ranked neighbors.
    "x_random_walk" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 5, lit(n)).as("dst")))
      operators.Graph.deterministicWalks(edges, "src", "dst",
          docs.filter(pmod(col("doc_id"), lit(97)) === 0), "doc_id",
          steps = 4)
        .orderBy("start", "step", "node")
    }),

    // HITS hubs & authorities over the degree-varied graph: 2 rounds of
    // L1-normalized mutual reinforcement — the oracle unrolls the same
    // decimal-summed closed form layer by layer.
    "x_hits" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * col("doc_id") + 3, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 1, lit(n)).as("dst")))
      operators.Graph.hits(edges, "src", "dst", docs, "doc_id", iters = 2)
        .select(col("id"), round(col("auth"), 8).as("auth"),
          round(col("hub"), 8).as("hub"))
        .orderBy("id")
    }),

    // Passage-level dedup: 10-token windows, earliest occurrence of each
    // distinct passage kept corpus-wide, docs reassembled from survivors.
    // The keeper is a min(struct) hash agg — a million-fold repeated
    // passage never forms a window partition.
    "x_dedup_passages" -> ((s, d) =>
      operators.Dedup.dedupPassages(Tables.documents(s, d), "doc_id", "text",
        passageTokens = 10)
        .orderBy("doc_id")),

    // Canonical-doc selection: bag-of-words fingerprint groups as the
    // clusters (cheap, deterministic), keep the longest doc per cluster
    // (ties → lowest id). The arg-max is one lexicographic max(struct)
    // hash agg — map-side partials, no per-cluster window funnel.
    "x_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clustered = docs.select(
        functions.TextFunctions.fingerprint(col("text")).as("cluster"),
        col("doc_id"), col("n_chars"))
      operators.Dedup.keepBestPerCluster(clustered, "cluster", "doc_id", "n_chars")
        .orderBy("cluster")
    }),

    // SimHash near-dup pairs (banded hamming join), gated like minhash:
    // exact-verifier count hash-checked against SQL, plus a recall floor
    // vs the exact jaccard pairs (simhash is a different similarity — its
    // candidate set overlaps but is not a subset, so no precision gate).
    // BENCH NOTE: as with x_dedup_minhash, the exact reference comes
    // from the shared family verifier (owned by x_dedup_ngram); the
    // graded operator is the 16-bit banded signature join.
    "x_dedup_simhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val exact = sharedExactPairs(s, d)
        .select(col("id_a"), col("id_b"))
      val sh = operators.Dedup.simhashDedup(docs, "doc_id", "text", maxHamming = 3)
        .select(col("id_a").as("ma"), col("id_b").as("mb"))
      // coalesce as in x_dedup_minhash: zero exact pairs must gate TRUE
      exact.join(sh,
          col("id_a") === col("ma") && col("id_b") === col("mb"), "full_outer")
        .agg(
          coalesce(sum(when(col("id_a").isNotNull, 1).otherwise(0)), lit(0L)).as("n_exact"),
          (coalesce(sum(when(col("id_a").isNotNull && col("ma").isNotNull, 1).otherwise(0)), lit(0L)) >=
            coalesce(sum(when(col("id_a").isNotNull, 1).otherwise(0)), lit(0L)) * 0.5).as("recall_ok"))
    }),

    // Embedding cosine near-dup pairs.
    // Exact threshold join, distributed (no BNLJ / corpus broadcast):
    // fragment-and-replicate equi-join on a block key. LSH candidates
    // can't be exhaustive at a bulk-tail threshold (all matches here sit
    // at cosine 0.4–0.6), so the exact path must compare all pairs — the
    // point is HOW: spread over blocks × cores, bounded task memory.
    "x_dedup_embed" -> ((s, d) =>
      operators.Dedup.embeddingCosinePairsExact(Tables.embeddings(s, d), "vec_id",
        "embedding", threshold = 0.4)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")),

    // The SAME exact bulk-threshold semantics (same oracle), but with
    // IVF cell-pair pruning: cell pairs that provably cannot cross the
    // threshold (spherical triangle inequality over centroid angles +
    // per-cell angular radii) are never joined — far sublinear in n² on
    // clustered data, degrading to the blocked-exact cost only when the
    // corpus is one isotropic blob (where the semantics are inherently
    // quadratic). DedupSpec pins pruned ≡ exact and that separated
    // clusters DO prune most of the lattice. This row OWNS the shared
    // pruned pair graph (one IVF fit + pair join per session); the
    // clustering gate consumes the persisted copy.
    "x_dedup_embed_pruned" -> ((s, d) =>
      sharedPrunedCosinePairs(s, d)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")),

    // Semantic-dedup keeper map: connected components over the EXACT
    // cell-pruned cosine pair graph — every vector labeled with its
    // cluster's canonical (min-id) representative. Composes the two
    // gated structures off the SHARED pair graph (owned by
    // x_dedup_embed_pruned — no second k-means fit or pair join in this
    // timed body); the component loop is the lineage-truncated label
    // propagation x_dedup_clusters pins.
    "x_dedup_embed_clusters" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      // star CC, not label propagation: same (id, min-root) contract,
      // O(log diameter) rounds with no per-round convergence-count job —
      // this was the board's slowest row on the propagation form
      operators.Dedup.connectedComponentsStar(sharedPrunedCosinePairs(s, d),
          e.select("vec_id"))
        .orderBy("id")
    }),

    // Int8-quantized similarity: embeddings quantize→dequantize through
    // the native roundtrip expression (4× storage/bandwidth cut at
    // ingest), then top-10 by quantized cosine vs the vec_id=0 query,
    // with per-row fidelity (cosine of original vs dequantized) — the
    // recall-loss measurement a quantized ANN index ships with.
    "x_quantize" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val deq = e.select(col("vec_id"), col("embedding"),
        functions.VectorExpressions.q8Roundtrip(col("embedding")).as("dq"))
      val q = deq.filter(col("vec_id") === 0).select(col("dq").as("qdq"))
      deq.crossJoin(broadcast(q))
        .select(col("vec_id"),
          functions.VectorExpressions.cosineFast(col("dq"), col("qdq")).as("c"),
          functions.VectorExpressions.cosineFast(col("embedding"), col("dq")).as("f"))
        .orderBy(col("c").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("c"), 6).as("q_cosine"),
          round(col("f"), 6).as("fidelity"))
    }),

    // Geo radius query: deterministic synthetic coordinates per doc
    // (integer-derived, bit-identical in any engine), conservative
    // bounding-box prefilter, haversine radius — distance rounded to 3dp
    // (the BM25 ln-rounding convention absorbing trig-libm ULP). The
    // center (26, 93) is ON the synthetic curve (= doc 300's position),
    // so the 1500 km disc holds ~25 real rows at sf0.01 — a gate that
    // pins distance values, unlike the old off-curve (40, -74) center
    // whose disc was empty at every tested sf.
    "x_geo_radius" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      pts.filter(functions.GeoFunctions.inBoundingBox(
          col("lat"), col("lon"), 26.0, 93.0, 1500.0))
        .withColumn("dist_km", round(functions.GeoFunctions.haversineKm(
          col("lat"), col("lon"), lit(26.0), lit(93.0)), 3))
        .filter(col("dist_km") <= 1500.0)
        .select("doc_id", "lat", "lon", "dist_km")
        .orderBy("doc_id")
    }),

    // Bounding-box query (ES geo_bounding_box) with a box CROSSING the
    // antimeridian — minLon > maxLon wraps (the Fiji/Bering case a
    // naive BETWEEN silently empties). Pure literal comparisons (on
    // synthetic doc_id-derived coordinates here, so the predicate
    // evaluates in the scan stage; on real stored lat/lon columns the
    // same shape reaches PushedFilters). The lat window [50, 80] is
    // chosen so
    // the sf0.01 synthetic curve yields hits on BOTH sides of the wrap
    // (ids 385-395 at lon ≥ 170, ids 396-439 at lon ≤ -140) — the gate
    // pins the wrap branch with real rows, not an empty≡empty match.
    "q_geo_bbox" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      pts.filter(functions.GeoFunctions.inBox(col("lat"), col("lon"),
          50.0, 80.0, 170.0, -140.0))
        .select("doc_id", "lat", "lon")
        .orderBy("doc_id")
    }),

    // Point-in-polygon tagging: ray casting unrolled into per-edge
    // arithmetic at plan time (no trig — engine-exact, no rounding
    // needed). Quad region over the synthetic coordinates.
    "x_geo_polygon" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      pts.filter(functions.GeoFunctions.inPolygon(col("lat"), col("lon"),
          Seq((-25.0, -10.0), (5.0, -10.0), (25.0, 60.0), (-5.0, 60.0))))
        .select("doc_id", "lat", "lon")
        .orderBy("doc_id")
    }),

    // Batch nearest-k off the persisted layout: the k nearest indexed
    // points for EACH center — lock-step ring expansion over the
    // unsatisfied remainder, then per-center ranks over bounded
    // candidate sets (GeoIndexSpec pins ≡ per-center brute force).
    "x_geo_knn_join" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geoknnj")
      sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir, cellDeg = 30.0)
      sink.GeoIndex.knnJoin(s, dir,
          Seq((1L, 40.0, -74.0), (2L, -33.9, 151.2), (3L, 64.1, -21.9)),
          k = 5)
        .select("center_id", "doc_id", "dist_km", "rk")
        .orderBy("center_id", "rk")
    }),

    // DataFrame-centers batch nearest-k: the unbounded-centers overload
    // — centers come from a FRAME (here: every ~101st document), never
    // landing on the driver; ring rounds keep the unsatisfied set
    // distributed and the final pass is ONE per-center-radius join.
    // GeoIndexSpec pins Seq-form equivalence and construction laziness.
    "x_geo_knn_join_df" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geoknnjdf")
      sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir, cellDeg = 30.0)
      val centers = pts.filter(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("center_id"), col("lat"), col("lon"))
      sink.GeoIndex.knnJoin(s, dir, centers, "center_id", "lat", "lon",
          k = 5)
        .select("center_id", "doc_id", "dist_km", "rk")
        .orderBy("center_id", "rk")
    }),

    // Polygon query served off the persisted layout: bounding-box cell
    // cover enumerated driver-side, exact ray cast on the pruned live
    // view. Result ≡ the x_geo_polygon scan form (same oracle contract).
    "x_geo_polygon_indexed" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geopoly")
      sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir, cellDeg = 30.0)
      sink.GeoIndex.polygonSearch(s, dir,
          Seq((-25.0, -10.0), (5.0, -10.0), (25.0, 60.0), (-5.0, 60.0)))
        .select("doc_id", "lat", "lon")
        .orderBy("doc_id")
    }),

    // Distance-ring facet (ES geo_distance aggregation): bucket every
    // point by its distance band from a center — "how far is our
    // audience". One projection + hash agg; the band edges are plan
    // literals, the 3dp-rounded distance keys band membership
    // engine-reproducibly.
    "x_geo_distance_agg" -> ((s, d) =>
      Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
        .withColumn("dist_km", round(functions.GeoFunctions.haversineKm(
          col("lat"), col("lon"), lit(40.0), lit(-74.0)), 3))
        .withColumn("band",
          when(col("dist_km") <= 2000.0, "0-2000")
            .when(col("dist_km") <= 5000.0, "2000-5000")
            .when(col("dist_km") <= 10000.0, "5000-10000")
            .otherwise("10000+"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_points"),
          min("dist_km").as("min_km"), max("dist_km").as("max_km"))
        .orderBy("band")),

    // Grid-bucket aggregation (ES geotile_grid / geohash_grid shape):
    // every point keyed to its fixed-degree cell, per-cell count +
    // mean position — the density heat-map aggregation. One map-side-
    // combinable hash agg; the cell key is the same floor arithmetic
    // the GeoJoin/GeoIndex lattice uses (15° here).
    "x_geo_grid_agg" -> ((s, d) =>
      Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
        .groupBy(floor(col("lat") / 15.0).cast("int").as("lat_cell"),
          floor(col("lon") / 15.0).cast("int").as("lon_cell"))
        .agg(count(lit(1)).as("n_points"),
          // decimal sums (coordinates are 2dp-exact), ONE double division
          // — partial-aggregation order cannot perturb the mean
          round(sum(col("lat").cast("decimal(12,2)")).cast("double") /
            count(lit(1)), 6).as("mean_lat"),
          round(sum(col("lon").cast("decimal(12,2)")).cast("double") /
            count(lit(1)), 6).as("mean_lon"))
        .orderBy("lat_cell", "lon_cell")),

    // Geo bounds + centroid aggregation (ES geo_bounds / geo_centroid):
    // per-group bounding box (exact min/max) and centroid (decimal-sum
    // mean, the x_geo_grid_agg convention) in one hash aggregate.
    "x_geo_bounds" -> ((s, d) =>
      Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
        .groupBy(pmod(col("doc_id"), lit(4)).as("g"))
        .agg(count(lit(1)).as("n"),
          min("lat").as("min_lat"), max("lat").as("max_lat"),
          min("lon").as("min_lon"), max("lon").as("max_lon"),
          round(sum(col("lat").cast("decimal(12,2)")).cast("double") /
            count(lit(1)), 6).as("centroid_lat"),
          round(sum(col("lon").cast("decimal(12,2)")).cast("double") /
            count(lit(1)), 6).as("centroid_lon"))
        .orderBy("g")),

    // Geo nearest-k: the 15 closest docs to a point by haversine — the
    // distance twin of x_sim_topk; top-k plans as TakeOrderedAndProject
    // (k rows per partition, no global sort). Ranked by the 3dp-rounded
    // distance with id tie-break so the cut is engine-reproducible.
    "x_geo_knn" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      pts.withColumn("dist_km", round(functions.GeoFunctions.haversineKm(
          col("lat"), col("lon"), lit(40.0), lit(-74.0)), 3))
        .orderBy(col("dist_km"), col("doc_id"))
        .limit(15)
        .select("doc_id", "dist_km")
    }),

    // Spatial radius join off the persisted layout: the scan-form
    // x_geo_join semantics, base read pruned to the union of the
    // centers' covered cells at file-listing time. Same oracle contract.
    "x_geo_join_indexed" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geoidx")
      sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir, cellDeg = 30.0) // coarse gate lattice: 72 cells bound the timed write; pruning pins live in GeoIndexSpec
      sink.GeoIndex.radiusJoin(s, dir,
          Seq((1L, -48.0, -89.0), (2L, 7.5, 47.5), (3L, 70.4, -157.8)),
          radiusKm = 1500.0)
        .select(col("center_id"), col("doc_id"),
          round(col("dist_km"), 3).as("dist_km"))
        .orderBy("center_id", "doc_id")
    }),

    // Persisted geo layout (GeoIndex): the same radius query served off
    // the cell-partitioned index — covered cells enumerated driver-side,
    // `cell IN (…)` prunes at file-listing time (GeoIndexSpec pins
    // scanned-files < total). Result ≡ the x_geo_radius scan form.
    "x_geo_radius_indexed" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geoidx")
      sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir, cellDeg = 30.0) // coarse gate lattice: 72 cells bound the timed write; pruning pins live in GeoIndexSpec
      // candidate radius +1 m, then the scan form's exact rounded cut:
      // a point whose ROUNDED distance is 1500.000 can sit at unrounded
      // 1500.0004, which a raw <=1500 candidate filter would drop
      sink.GeoIndex.radiusSearch(s, dir, 26.0, 93.0, 1500.001)
        .withColumn("dist_km", round(col("dist_km"), 3))
        .filter(col("dist_km") <= 1500.0)
        .select("doc_id", "lat", "lon", "dist_km")
        .orderBy("doc_id")
    }),

    // Nearest-k off the persisted layout: ring expansion over covered
    // cells until k points fall inside, then the scan form's exact
    // (dist_km 3dp, id) cut. Result ≡ x_geo_knn.
    "x_geo_knn_indexed" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geoidx")
      sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir, cellDeg = 30.0) // coarse gate lattice: 72 cells bound the timed write; pruning pins live in GeoIndexSpec
      sink.GeoIndex.knnSearch(s, dir, 40.0, -74.0, 15)
    }),

    // Keyed geo mutation (GeoIndex upsert/delete, the VectorIndex
    // protocol on the cell grid): base = ids ≥ 50, then upsert < 50,
    // RE-upsert < 10 at moved positions (supersede ACROSS cells: the
    // move carries ids 0-9 from (-85, -180) into the query disc around
    // (26, 93)), tombstones [10, 30) (upserted rows) and [290, 300)
    // (base rows INSIDE the disc — their absence is value-visible in
    // the gate, not vacuously true). The radius query reads the live
    // last-writer-wins view: moved ids 0-9 + on-curve ids ~284-316
    // minus the deleted 290-299. O(batch) commit bytes and cross-cell
    // supersede are pinned in GeoIndexSpec.
    "x_geo_upsert" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geoups")
      sink.GeoIndex.write(pts.filter(col("doc_id") >= 50),
        "doc_id", "lat", "lon", dir, cellDeg = 30.0)
      sink.GeoIndex.upsert(pts.filter(col("doc_id") < 50),
        "doc_id", "lat", "lon", dir)
      sink.GeoIndex.upsert(
        pts.filter(col("doc_id") < 10)
          .withColumn("lat", col("lat") / 4 + 47)  // moved into the disc
          .withColumn("lon", col("lon") / 2 + 183),
        "doc_id", "lat", "lon", dir)
      sink.GeoIndex.delete(
        pts.filter((col("doc_id") >= 10 && col("doc_id") < 30) ||
            (col("doc_id") >= 290 && col("doc_id") < 300))
          .select("doc_id"), "doc_id", dir)
      // candidate radius +1 m, then the scan form's exact rounded cut
      // (the x_geo_radius_indexed boundary convention)
      sink.GeoIndex.radiusSearch(s, dir, 26.0, 93.0, 1500.001)
        .withColumn("dist_km", round(col("dist_km"), 3))
        .filter(col("dist_km") <= 1500.0)
        .select("doc_id", "lat", "lon", "dist_km")
        .orderBy("doc_id")
    }),

    // Geo index health: occupancy stats over the LIVE view after an
    // upsert and a delete. n_points, the full-lattice cell count, and
    // commit depth are exact oracle values; skew gates as a boolean
    // (the x_sim_ivf_stats convention). Drift teeth (skew rises under
    // one-sided ingest) are pinned in GeoIndexSpec.
    "x_geo_stats" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = tempDir("graft-geostat")
      sink.GeoIndex.write(pts.filter(col("doc_id") >= 20),
        "doc_id", "lat", "lon", dir, cellDeg = 30.0)
      sink.GeoIndex.upsert(pts.filter(col("doc_id") < 20),
        "doc_id", "lat", "lon", dir)
      sink.GeoIndex.delete(pts.filter(col("doc_id") < 5).select("doc_id"),
        "doc_id", dir)
      sink.GeoIndex.stats(s, dir).select(
        col("n_points"), col("n_cells"),
        (col("skew") >= 1.0).as("skew_ok"),
        (col("max_cell") * col("n_nonempty_cells") >= col("n_points"))
          .as("max_consistent"),
        col("n_pending_commits"))
    }),

    // Spatial radius join: 3 centers × all docs' synthetic coordinates
    // with NO cross product — grid-cell equi-join, haversine-verified;
    // distances rounded to 3dp for the cross-engine compare.
    "x_geo_join" -> ((s, d) => {
      val pts = Tables.documents(s, d).select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      operators.GeoJoin.geoRadiusJoin(pts, "doc_id", "lat", "lon",
          Seq((1L, -48.0, -89.0), (2L, 7.5, 47.5), (3L, 70.4, -157.8)),
          radiusKm = 1500.0)
        .select(col("center_id"), col("doc_id"),
          round(col("dist_km"), 3).as("dist_km"))
        .orderBy("center_id", "doc_id")
    }),

    // Field collapsing: best-scoring doc PER SOURCE, then the top-5
    // sources by their representative — dedup-by-site in search results,
    // via a hash aggregate (no per-group window).
    "x_collapse" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      val scored = DocQueries.matchTextRanked(docs, "text",
        "merge window scan", 1000000)
      DocQueries.collapseTop(scored, "source", "doc_id", "score", 5)
        .orderBy(col("score").desc, col("source"))
    }),

    // Ranked boolean query (Lucene BooleanQuery SCORING): boosted BM25
    // sum over MUST + SHOULD clauses, MUST enforced, MUST_NOT excluded.
    "x_bool_ranked" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      sink.InvertedIndex.boolSearchRanked(
        sink.InvertedIndex.postings(docs, "doc_id", "text"),
        sink.InvertedIndex.docLengths(docs, "doc_id", "text"),
        must = Seq(("merge", 1.0)),
        should = Seq(("window", 2.0), ("scan", 0.5)),
        mustNot = Seq("slow"), k = 20)
    }),

    // Two-stage retrieval (candidate generation → rerank): BM25 top-50
    // candidates, exact-cosine rerank of ONLY those — the production
    // serving shape (cheap wide recall stage, expensive narrow precision
    // stage; the rerank touches 50 rows however large the corpus).
    "x_rerank" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val cand = sink.InvertedIndex.bm25Search(
          sink.InvertedIndex.postings(docs, "doc_id", "text"),
          sink.InvertedIndex.docLengths(docs, "doc_id", "text"),
          "merge window scan", 50)
        .select("doc_id")
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      cand.join(e.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .crossJoin(broadcast(qv))
        .select(col("doc_id"),
          functions.VectorExpressions.cosineFast(col("embedding"), col("qv")).as("c"))
        .orderBy(col("c").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), round(col("c"), 6).as("cosine"))
    }),

    // Hybrid retrieval: text tf leg + vector cosine leg, each reduced to
    // a bounded top-50 candidate list (TakeOrderedAndProject), then
    // reciprocal-rank fusion and final top-10. Ranking windows run over
    // the ALREADY-LIMITED 50-row lists — bounded post-limit state, never
    // a corpus-wide single-partition window.
    "x_hybrid" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 50
      val textTop = DocQueries.matchTextRanked(
          Tables.documents(s, d).select("doc_id", "text"), "text",
          "merge window scan", k)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).as("r_text"))
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val vecTop = e.crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          functions.VectorExpressions.cosineFast(col("embedding"), col("qv")).as("c"))
        .orderBy(col("c").desc, col("doc_id")).limit(k)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("c").desc, col("doc_id"))).as("r_vec"))
      textTop.join(vecTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(lit(1.0) / (lit(60) + col("r_text")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), round(col("rrf"), 9).as("rrf"))
    }),

    // Linear hybrid fusion (the ES `linear` retriever — the other
    // standard next to x_hybrid's RRF): each leg's top-50 scores
    // min-max normalize to [0,1] WITHIN the retrieved window, then a
    // 0.7·text + 0.3·vector weighted sum. Rank-free fusion preserves
    // score gaps RRF flattens. The vector leg cuts and normalizes on
    // the ROUNDED cosine (the engine-agreement convention); a
    // constant-score leg normalizes to 1.0 (documented, mirrored).
    "q_hybrid_linear" -> ((s, d) => {
      val k = 50
      def norm(sc: Column, mn: Column, mx: Column): Column =
        when(mx > mn, round((sc - mn) / (mx - mn), 6)).otherwise(lit(1.0))
      val text = DocQueries.matchTextRanked(
          Tables.documents(s, d).select("doc_id", "text"), "text",
          "merge window scan", k)
        .select(col("doc_id"), col("score").cast("double").as("_st"))
      val ts = text.agg(min("_st").as("_tmn"), max("_st").as("_tmx"))
      val tn = text.crossJoin(broadcast(ts))
        .select(col("doc_id"),
          norm(col("_st"), col("_tmn"), col("_tmx")).as("_nt"))
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("_qv"))
      val vec = e.crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          round(functions.VectorExpressions.cosineFast(
            col("embedding"), col("_qv")), 6).as("_c"))
        .orderBy(col("_c").desc, col("doc_id")).limit(k)
      val vs = vec.agg(min("_c").as("_vmn"), max("_c").as("_vmx"))
      val vn = vec.crossJoin(broadcast(vs))
        .select(col("doc_id"),
          norm(col("_c"), col("_vmn"), col("_vmx")).as("_nv"))
      tn.join(vn, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          round(lit(0.7) * coalesce(col("_nt"), lit(0.0)) +
            lit(0.3) * coalesce(col("_nv"), lit(0.0)), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    }),

    // Incrementally-maintained inverted index: base holds docs ≥ 10, one
    // delta commits docs < 10 plus a bogus doc, a tombstone delta removes
    // the bogus doc — the merge-on-read view must then score BM25 exactly
    // like a full-corpus index (same oracle as x_bm25_indexed). Commits
    // are O(batch); the base is never rewritten (IncrementalPostingsSpec
    // pins bytes + mtime).
    "x_bm25_incremental" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val dir = tempDir("graft-incpost")
      sink.IncrementalPostings.init(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", dir)
      sink.IncrementalPostings.commitUpserts(
        docs.filter(col("doc_id") < 10).unionByName(
          Seq((1000000L, "bogus merge window scan text"))
            .toDF("doc_id", "text")),
        "doc_id", "text", dir)
      sink.IncrementalPostings.commitDeletes(
        Seq(1000000L).toDF("doc_id"), "doc_id", dir)
      sink.IncrementalPostings.bm25Search(s, dir, "merge window scan", 20)
    }),

    // Indexed sparse_vector serving: the SAME query weights as
    // q_sparse_vector served off the persisted postings store after
    // init + upsert + delete — indexed and corpus-scan serving must
    // return identical rows (shared impact arithmetic), so the gate
    // reuses the corpus-scan oracle verbatim.
    "q_sparse_vector_indexed" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val dir = tempDir("graft-incpost-sv")
      sink.IncrementalPostings.init(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", dir)
      sink.IncrementalPostings.commitUpserts(
        docs.filter(col("doc_id") < 10).unionByName(
          Seq((1000000L, "bogus merge window scan text"))
            .toDF("doc_id", "text")),
        "doc_id", "text", dir)
      sink.IncrementalPostings.commitDeletes(
        Seq(1000000L).toDF("doc_id"), "doc_id", dir)
      sink.IncrementalPostings.sparseVectorSearch(s, dir,
        Seq(("merge", 1.5), ("window", 1.0), ("scan", 0.7),
          ("data", 0.3)), 20)
    }),

    // Postings-index health: delta-log depth, touched/tombstoned docs,
    // live count, and the compaction signal after two upserts + one
    // delete (60 touched ids, 10 of them tombstoned). Counts are exact
    // oracle values; the delete-then-reupsert distinction (a tombstone
    // is a doc whose LATEST write is a delete) is pinned in
    // IncrementalPostingsSpec.
    "x_postings_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val dir = tempDir("graft-poststat")
      sink.IncrementalPostings.init(docs, "doc_id", "text", dir)
      sink.IncrementalPostings.commitUpserts(
        docs.filter(col("doc_id") < 50), "doc_id", "text", dir)
      sink.IncrementalPostings.commitDeletes(
        docs.filter(col("doc_id") >= 50 && col("doc_id") < 60)
          .select("doc_id"), "doc_id", dir)
      sink.IncrementalPostings.stats(s, dir)
    }),

    // Phrase search over the INCREMENTALLY-MAINTAINED positional index:
    // init without doc_id<10, upsert those back plus a bogus doc that
    // CONTAINS the phrase, tombstone the bogus doc — the live view must
    // answer exactly like a scan of the full corpus (same oracle as
    // q_match_phrase; the deleted doc proves tombstones reach the
    // positional view).
    "x_phrase_incremental" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val dir = tempDir("graft-incphrase")
      sink.IncrementalPostings.init(
        docs.filter(col("doc_id") >= 10), "doc_id", "text", dir,
        withPositions = true)
      sink.IncrementalPostings.commitUpserts(
        docs.filter(col("doc_id") < 10).unionByName(
          Seq((1000000L, "bogus stream data phrase doc"))
            .toDF("doc_id", "text")),
        "doc_id", "text", dir)
      sink.IncrementalPostings.commitDeletes(
        Seq(1000000L).toDF("doc_id"), "doc_id", dir)
      sink.IncrementalPostings.phraseSearch(s, dir, "stream data")
        .select("doc_id").orderBy("doc_id")
    }),

    // Vector-index append path: index built WITHOUT vec_id<100, those
    // vectors appended (assigned against the persisted model, cell dirs
    // appended — no retrain, no rewrite). Full-probe search must then
    // equal the exact corpus top-10 row-for-row (same oracle shape as
    // x_sim_topk).
    "x_sim_ivf_append" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dir = tempDir("graft-vecapp")
      val model = sink.VectorIndex.write(e.filter(col("vec_id") >= 100),
        "vec_id", "embedding", dir, k = 8, iters = 3)
      sink.VectorIndex.append(e.filter(col("vec_id") < 100),
        "vec_id", "embedding", dir)
      sink.VectorIndex.search(s, dir, "vec_id", "embedding", qv,
          topK = 10, nProbe = model.k)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // Keyed MUTATION of the persisted vector index (the reference's
    // defining upsert/delete-by-key semantic, PaimonIngestorE2ETest.java:
    // 579-766, applied to the vector layout): base on vec_id>=50, ids
    // <50 upserted, ids <10 then RE-upserted with negated vectors
    // (last-writer-wins supersedes across cells), ids 10..29 tombstoned.
    // Full-probe search must equal exact top-10 over the surviving
    // corpus: >=30 original + <10 negated — each commit O(batch) bytes
    // (VectorIndexSpec pins the base is never rewritten).
    "x_sim_ivf_upsert" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dir = tempDir("graft-vecups")
      val model = sink.VectorIndex.write(e.filter(col("vec_id") >= 50),
        "vec_id", "embedding", dir, k = 8, iters = 3)
      sink.VectorIndex.upsert(e.filter(col("vec_id") < 50),
        "vec_id", "embedding", dir)
      sink.VectorIndex.upsert(
        e.filter(col("vec_id") < 10).withColumn("embedding",
          transform(col("embedding"), x => x * lit(-1.0f))),
        "vec_id", "embedding", dir)
      sink.VectorIndex.delete(
        e.filter(col("vec_id") >= 10 && col("vec_id") < 30).select("vec_id"),
        "vec_id", dir)
      sink.VectorIndex.search(s, dir, "vec_id", "embedding", qv,
          topK = 10, nProbe = model.k)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // Index health / rebuild signal: cell-occupancy stats over the LIVE
    // view after an upsert (supersede — count unchanged) and a delete.
    // n_vectors and the commit-log depth are exact oracle values; the
    // skew/occupancy invariants gate as booleans (the x_sim_ivf
    // pattern — cell assignment itself is k-means, not SQL-expressible).
    // The drift-detection teeth (skew rises under one-sided ingest) are
    // pinned in VectorIndexSpec.
    "x_sim_ivf_stats" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = tempDir("graft-vecstat")
      sink.VectorIndex.write(e, "vec_id", "embedding", dir, k = 8, iters = 3)
      sink.VectorIndex.upsert(
        e.filter(col("vec_id") < 20).withColumn("embedding",
          transform(col("embedding"), x => x * lit(-1.0f))),
        "vec_id", "embedding", dir)
      sink.VectorIndex.delete(
        e.filter(col("vec_id") < 5).select("vec_id"), "vec_id", dir)
      sink.VectorIndex.stats(s, dir).select(
        col("n_vectors"), col("n_cells"),
        (col("skew") >= 1.0).as("skew_ok"),
        (col("max_cell") * col("n_cells") >= col("n_vectors"))
          .as("max_consistent"),
        col("n_pending_commits"))
    }),

    // Batch KNN served off the PERSISTED index: each query probes its own
    // nearest cells (dynamic partition pruning on the cell layout —
    // VectorIndexSpec pins the file cut); all cells probed here so the
    // answer is exactly the corpus-scan knnJoin's (same oracle shape).
    "x_knn_indexed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = tempDir("graft-vecknn")
      val model = sink.VectorIndex.write(e, "vec_id", "embedding", dir,
        k = 8, iters = 3)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      sink.VectorIndex.knnSearch(s, dir, q, "query_id", "qv",
          k = 5, nProbe = model.k)
        .orderBy("query_id", "rk")
    }),

    // Filtered KNN (the ES knn-query `filter` shape): the metadata
    // predicate restricts candidates BEFORE ranking — within the probed
    // cells the true filtered top-k, never "rank then discard". Exact
    // only because nProbe = k covers all cells here; at smaller nProbe
    // the result is recall-bounded like unfiltered IVF (a selective
    // filter can empty the probed cells — see VectorIndex.knnSearch).
    "x_knn_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = tempDir("graft-vecknnf")
      val model = sink.VectorIndex.write(e, "vec_id", "embedding", dir,
        k = 8, iters = 3)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      sink.VectorIndex.knnSearch(s, dir, q, "query_id", "qv",
          k = 5, nProbe = model.k, filter = Some(pmod(col("label"), lit(2)) === 0))
        .orderBy("query_id", "rk")
    }),

    // Late-interaction (MaxSim) retrieval: labels act as document groups
    // (bags of chunk vectors), vec_id<3 as the query bag; score =
    // Σ_q max_chunk cosine. Both aggregations are map-side-combinable
    // hash aggs; round-then-decimal-sum makes the score order-independent.
    "x_maxsim" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      operators.Similarity.maxSimScores(e, q, "label", "embedding", "qid", "qv")
        .orderBy("label")
    }),

    // BENCH NOTE (as with x_dedup_minhash): the index-building gates —
    // x_sim_ivf_persisted, x_sim_ivf_append, x_sim_ivf_upsert,
    // x_sim_ivf_stats, x_knn_indexed, x_hybrid_indexed,
    // x_bm25_incremental, x_geo_upsert, x_geo_stats — pay a full index
    // WRITE (and, for the mutation gates, several commits) inside the
    // timed query to prove the end-to-end layout; that build cost is
    // gate overhead, not per-query serving cost (serving reads only
    // probed cells / query-term postings / covered geo cells, pinned by
    // VectorIndexSpec + GeoIndexSpec + PlanSpec). The cost is JOB COUNT
    // (one write + N commit jobs on tiny frames), not data volume.

    // The SERVING STACK end-to-end: lay out BOTH persisted indexes (term-
    // sorted postings + norms; IVF cell-partitioned vectors), then answer
    // a hybrid query reading only index structures — BM25 from the query
    // terms' postings, cosine from the vector cells — fused by RRF. All
    // cells are probed here so the result is row-for-row the declarative
    // answer (the pruned-probe path is gated by x_sim_ivf_persisted, the
    // postings term-pruning by x_bm25_indexed / PlanSpec).
    "x_hybrid_indexed" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 50
      val docs = Tables.documents(s, d)
      val tdir = tempDir("graft-textidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.postings(docs, "doc_id", "text"), s"$tdir/postings")
      sink.InvertedIndex.docLengths(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$tdir/norms")
      val textTop = sink.InvertedIndex.bm25Search(
          sink.InvertedIndex.readPostings(s, s"$tdir/postings"),
          s.read.parquet(s"$tdir/norms"), "merge window scan", k)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))).as("r_text"))
      val e = Tables.embeddings(s, d)
      val vdir = tempDir("graft-vecidx")
      val model = sink.VectorIndex.write(e, "vec_id", "embedding", vdir,
        k = 8, iters = 3)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val vecTop = sink.VectorIndex.search(s, vdir, "vec_id", "embedding",
          qv, topK = k, nProbe = model.k)
        .select(col("vec_id").as("doc_id"), row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_id"))).as("r_vec"))
      textTop.join(vecTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(lit(1.0) / (lit(60) + col("r_text")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), round(col("rrf"), 9).as("rrf"))
    }),

    // Brute-force cosine top-k vs the vec_id=0 query vector (exact ANN
    // baseline), expressed as a broadcast join — no driver collect.
    // Quantized-scan + exact-rescore ANN: int8 candidate pool (100) then
    // full-precision rescore of the pool — must equal the EXACT top-10
    // (same oracle as x_sim_topk): the 4x-bandwidth scan pattern with
    // its answer-fidelity pinned by the gate.
    "x_sim_quantized" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      operators.Similarity.quantizedTopK(
          e.select("vec_id", "embedding"), "vec_id", "embedding",
          qv, k = 10, rescoreK = 100)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // Product quantization serving: 64-dim vectors → 8 codes (one per
    // 8-dim subspace, 16-entry codebooks — a 32× byte reduction on the
    // candidate scan), ADC scoring via plan-literal lookup tables, then
    // exact-cosine rescore of only the 200-candidate pool. The answer
    // must BE the exact top-10 (the x_sim_quantized pool-holds
    // convention); PqSpec pins encode determinism and the ADC ranking.
    "x_sim_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val qv = e.filter(col("vec_id") === 1).select("embedding")
        .head().getSeq[Float](0)
      val model = operators.Pq.fit(e, "vec_id", "embedding", dim = 64,
        m = 8, codebookSize = 16, iters = 3)
      operators.Pq.searchTopK(e, "vec_id", "embedding", model, qv,
          k = 10, rescoreK = 200)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // PQ codebook training on its own board row (split from
    // x_pq_knn_join, whose 3.8 s was dominated by the fit — per-leg
    // visibility is the x_dedup_incremental_build/_probe convention).
    // Full-corpus fit at the serving config; the one-row gate
    // value-asserts the trained model: every code in range for 16×16
    // codebooks, and corpus reconstruction MSE beats the rank-0
    // baseline (quantize everything to the global mean) — k-means must
    // have learned structure, not just converged trivially. PqSpec pins
    // encode determinism; this row pins the training leg's cost + a
    // quality floor on real data.
    "x_pq_train" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val model = operators.Pq.fit(e, "vec_id", "embedding", dim = 64,
        m = 16, codebookSize = 16, iters = 2)
      val vecs = e.filter(col("embedding").isNotNull)
      val dv = transform(col("embedding"), _.cast("double"))
      val meanVec = vecs
        .agg(graft.functions.VectorAggregates.vectorSum(dv).as("_s"),
          count(lit(1)).as("_n"))
        .select(transform(col("_s"), x => x / col("_n")).as("mv"))
        .head().getSeq[Double](0)
      val sqErr = aggregate(
        zip_with(dv, operators.Pq.decodeExpr(col("codes"), model),
          (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, x) => acc + x)
      val sqBase = aggregate(
        zip_with(dv, array(meanVec.map(lit): _*),
          (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, x) => acc + x)
      operators.Pq.encode(vecs, "embedding", model)
        .agg(count(lit(1)).as("n_train"),
          (min(array_min(col("codes"))) >= 0 &&
            max(array_max(col("codes"))) < 16 &&
            min(size(col("codes"))) === 16 &&
            max(size(col("codes"))) === 16).as("codes_valid"),
          (avg(sqErr) < avg(sqBase) * 0.75).as("mse_improves"))
    }),

    // Batch PQ KNN join, the SERVE leg (training cost lives in
    // x_pq_train; here the codebooks fit on a deterministic 1-in-2
    // sample, iters 2 — k-means over an isotropic half-sample lands on
    // near-identical centroids at half the cost, and the row's
    // assertion never depends on codebook quality: the ADC pool +
    // exact rescore must BE the exact per-query top-5 at the gated
    // pool width. Pool margin measured at sf0.1: holds at rescoreK=200
    // with this fit; gated at 400 for 2× headroom — a TakeOrdered pool
    // of 400 ids costs the serve leg nothing visible). Five query
    // vectors against the encoded corpus — ADC candidates read only
    // codes, the exact rescore touches candidate ids only (the
    // x_sim_pq convention).
    "x_pq_knn_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
      val model = operators.Pq.fit(
        e.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "embedding",
        dim = 64, m = 16, codebookSize = 16, iters = 2)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      operators.Pq.knnJoin(e, "vec_id", "embedding", q, "query_id", "qv",
          model, k = 5, rescoreK = 400)
        .orderBy("query_id", "rk")
    }),

    "x_sim_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"),
          functions.VectorExpressions.cosineFast(col("embedding"), col("qv")).as("c"))
        .orderBy(col("c").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("c"), 6).as("cosine"))
    }),

    // LSH-bucketed ANN top-k, gated as one oracle row: k results returned,
    // the query's own vector found (its bucket is always probed), and
    // nonzero overlap with the exact top-k. RHP-LSH over ISOTROPIC random
    // vectors has weak recall by nature (no cluster structure to hash) —
    // the tight recall assertions live in SimilaritySpec; the oracle gate
    // pins determinism and the self-hit/shape contract.
    "x_sim_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val bucketed = operators.Similarity.annBuckets(e, "embedding", nBits = 8)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val ann = operators.Similarity.annTopK(bucketed, "vec_id", "embedding",
        qv, 10, nBits = 8).select(col("vec_id"))
      val exact = operators.Similarity.bruteForceTopK(e, "vec_id", "embedding",
        qv, 10).select(col("vec_id").as("eid"))
      ann.join(exact, col("vec_id") === col("eid"), "left")
        .agg(count(lit(1)).as("n_results"),
          (sum(when(col("vec_id") === 0, 1).otherwise(0)) === 1).as("self_found"),
          (sum(when(col("eid").isNotNull, 1).otherwise(0)) >= 1).as("recall_ok"))
    }),

    // IVF-ANN: k-means cells (custom vector_sum aggregate) + probed
    // search, gated as one oracle row (recall@10 ≥ 0.8 vs brute force —
    // measured 0.9-1.0 across SFs; exact per-run values in IvfSpec).
    "x_sim_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val model = operators.Ivf.fit(e, "vec_id", "embedding", k = 8, iters = 3)
      val assigned = operators.Ivf.assign(e, "embedding", model)
      val ivf = operators.Ivf.search(assigned, "vec_id", "embedding", model, qv,
        topK = 10, nProbe = 3).select(col("vec_id"))
      val exact = operators.Similarity.bruteForceTopK(e, "vec_id", "embedding",
        qv, 10).select(col("vec_id").as("eid"))
      ivf.join(exact, col("vec_id") === col("eid"), "left")
        .agg(count(lit(1)).as("n_results"),
          (sum(when(col("eid").isNotNull, 1).otherwise(0)) >= 8).as("recall_ok"))
    }),

    // Persisted IVF index (vector-side serving path): train + lay out by
    // cell on disk, then search reading ONLY the probed cell directories
    // (partition pruning — VectorIndexSpec pins the file-level scan cut).
    // Same gate as x_sim_ivf: k results, recall floor vs exact top-k.
    // Nearest-centroid classification: every embedding tagged with the
    // label whose member-average vector is most cosine-similar —
    // embedding-space domain routing off a labeled seed corpus. Full
    // oracle: 6dp-rounded centroids (the x_embed_centroid convention)
    // make both engines' models bit-identical before the argmax.
    "x_classify_centroid" -> ((s, d) =>
      operators.Similarity.nearestCentroid(
        Tables.embeddings(s, d), "vec_id", "embedding", "label")
        .orderBy("vec_id")),

    // Embedding outlier triage: cosine to the OWN label centroid, flag
    // the per-label lower decile (mislabeled/corrupt rows live there).
    // Centroids are the one-shot 6dp-average recipe the classifier row
    // pins; both compared values pre-round so the flag is boundary-
    // deterministic across engines.
    "x_embed_outliers" -> ((s, d) =>
      operators.Similarity.centroidOutliers(
        Tables.embeddings(s, d), "vec_id", "embedding", "label",
        tailQuantile = 0.1)
        .orderBy("vec_id")),

    // Cosine-threshold range search off the persisted IVF layout: the
    // stored per-cell angular radius prunes base cells at file-listing
    // time (spherical triangle inequality — sound, VectorIndexSpec-
    // pinned), and the answer must EQUAL the brute-force threshold scan
    // — exact results through a pruned read, unlike the recall-gated
    // nProbe rows.
    "x_sim_radius" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dir = tempDir("graft-vecrad")
      sink.VectorIndex.write(e, "vec_id", "embedding", dir, k = 8, iters = 3)
      sink.VectorIndex.radiusSearch(s, dir, "vec_id", "embedding", qv, 0.4)
        .orderBy("vec_id")
    }),

    "x_sim_ivf_persisted" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dir = tempDir("graft-vecidx")
      sink.VectorIndex.write(e, "vec_id", "embedding", dir, k = 8, iters = 3)
      val hit = sink.VectorIndex.search(s, dir, "vec_id", "embedding", qv,
        topK = 10, nProbe = 3).select(col("vec_id"))
      val exact = operators.Similarity.bruteForceTopK(e, "vec_id", "embedding",
        qv, 10).select(col("vec_id").as("eid"))
      hit.join(exact, col("vec_id") === col("eid"), "left")
        .agg(count(lit(1)).as("n_results"),
          (sum(when(col("eid").isNotNull, 1).otherwise(0)) >= 8).as("recall_ok"))
    }),

  )
}
