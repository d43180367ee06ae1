package graft

/** Physical-plan regression tests: the scale properties that make these
  * queries viable at 100 TB must stay visible in the executed plan —
  * filters pushed into the parquet scan, schemas pruned, dimension joins
  * broadcast, top-k as TakeOrderedAndProject (never a global sort of the
  * corpus), and the custom vector expression present (codegen path).
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("incremental scan pushes the time predicate into the parquet scan") {
    val p = plan("s2_incremental_scan")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts range filter not pushed:\n$p")
  }

  test("q1 pushes the shipdate filter and prunes to 6 columns") {
    val p = plan("q1_agg")
    assert(p.contains("LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum")) // map-side partial aggregation
    assert(!p.contains("l_partkey"))  // column pruning reached the scan
  }

  test("top-orders join broadcasts the filtered dimension and uses top-k") {
    val p = plan("j3_top_orders")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject")) // not a global Sort+Limit
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)")) // pushed filter
  }

  test("similarity top-k uses the native vector expression and top-k") {
    val p = plan("x_sim_topk")
    assert(p.contains("vector_cosine"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("shard filter prunes the scan to two columns") {
    val p = plan("f3_shard_modulo")
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"))
  }

  test("exact embed dedup distributes as an equi-join, never a BNLJ") {
    val p = plan("x_dedup_embed")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"corpus-broadcast nested loop join back in the plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    assert(p.contains("vector_cosine")) // codegen'd verify, not HOFs
  }

  test("prefix-filter join: equi-joins throughout, no cartesian, no one-partition funnel") {
    val p = plan("x_dedup_prefix_filter")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"prefix candidates must meet on an equi-join key:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    // the per-doc prefix is a bounded window over the doc's own tokens —
    // never a global single-partition sort
    assert(!p.contains("Exchange SinglePartition"),
      s"prefix ranking funnels through one partition:\n$p")
  }

  test("b1_batching numbers rows without a single-partition exchange") {
    val p = plan("b1_batching")
    assert(!p.contains("Exchange SinglePartition"),
      s"global window funnels all rows through one partition:\n$p")
  }

  test("sequence packing numbers without a single-partition exchange") {
    val p = plan("x_pack")
    assert(!p.contains("Exchange SinglePartition"),
      s"global cum-sum funnels all rows through one partition:\n$p")
  }

  test("quantized similarity keeps native expressions and top-k") {
    val p = plan("x_quantize")
    assert(p.contains("vector_q8_roundtrip"))
    assert(p.contains("vector_cosine"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("decontamination probes a broadcast benchmark side") {
    val p = plan("x_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"benchmark shingle set should broadcast:\n$p")
  }

  test("indexed BM25 prunes to the query terms before any shuffle") {
    val p = plan("x_bm25_indexed")
    // the postings filter must sit below the (term, doc) aggregate: the
    // shuffle carries only query-term postings, never the whole corpus
    assert(p.contains("IN (merge,window,scan)"),
      s"query-term filter missing from the postings build:\n$p")
    assert(p.contains("BroadcastHashJoin")) // df + norms joins broadcast
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_sum")) // per-doc score map-side combined
  }

  test("postings build is one aggregate with map-side combine") {
    val p = plan("x_inverted_postings")
    assert(p.contains("partial_count"),
      s"tf counting should collapse map-side before the term shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("boilerplate mining pre-aggregates per doc and ends in top-k") {
    val p = plan("x_boilerplate")
    // (doc, ngram) partial counting bounds a hot n-gram's shuffle volume
    assert(p.contains("partial_count"),
      s"per-doc pre-aggregation should combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must never be a full sort:\n$p")
  }

  test("knn join ranks through the bounded aggregate, no corpus window") {
    val p = plan("x_knn_join")
    assert(p.contains("partial_top_k_by_score"),
      s"per-partition top-k partials missing:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query batch should broadcast:\n$p")
    assert(!p.contains("Window"), s"no window over the scored corpus:\n$p")
  }

  test("cell-pruned embed dedup joins on the cell lattice, never a cartesian") {
    // probe the OPERATOR's plan, not the gate's: the x_dedup_embed_pruned
    // row reads the session-shared parquet copy of this same frame
    // (BENCH_NOTES r7), so the computation plan lives here
    val p = operators.Dedup.embeddingCosinePairsPruned(
        Tables.embeddings(spark, sf), "vec_id", "embedding",
        threshold = 0.4, k = 8, iters = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"corpus BNLJ in the pruned path:\n$p")
    assert(p.contains("vector_cosine")) // codegen'd exact verify
  }

  test("function score rides the BM25 plan as one extra projection") {
    val p = plan("q_function_score")
    val base = plan("q_match_bm25")
    // no extra shuffle or join beyond what BM25 itself plans
    def count(s: String, t: String): Int = s.sliding(t.length).count(_ == t)
    assert(count(p, "Exchange") <= count(base, "Exchange"),
      s"decay added a shuffle:\n$p")
    assert(count(p, "Join") <= count(base, "Join"),
      s"decay added a join:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("has_child plans as a semi-join with the pushed child predicate") {
    val p = plan("q_has_child")
    assert(p.contains("LeftSemi"), s"not a semi-join:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_quantity,49"),
      s"child predicate not pushed:\n$p")
  }

  test("significant terms: one corpus pass per frequency table, no window") {
    val p = plan("q_significant_terms")
    assert(!p.contains("Window"), s"no window over the vocabulary:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"term frequencies must combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("split and mixture sampling stay pure map-side projections") {
    for (q <- Seq("x_split", "x_quality_floor")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q must not shuffle-join:\n$p")
    }
    // x_mix aggregates per source AFTER a shuffle-free filter; the only
    // exchange is the small per-source aggregate
    val p = plan("x_mix")
    assert(p.contains("partial_count"), s"x_mix should combine map-side:\n$p")
  }

  test("query_string pushes the keyword leg into the parquet scan") {
    val p = plan("q_query_string")
    // the compiled tree's lang='de' conjunct must reach the scan
    assert(p.contains("EqualTo(lang,de)"),
      s"keyword clause not pushed:\n$p")
    // one scan, no join — the whole boolean tree is one predicate
    assert(!p.contains("Join"), s"query_string must not join:\n$p")
  }

  test("feature-scoring queries are projection + top-k, no shuffle-join") {
    for (q <- Seq("q_rank_feature", "q_distance_feature")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q should cut with top-k:\n$p")
      assert(!p.contains("Join"), s"$q must not join:\n$p")
    }
  }

  test("new bucket aggs combine map-side") {
    for (q <- Seq("q_histogram", "q_multi_terms", "agg_matrix_stats")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q should combine map-side:\n$p")
    }
  }

  test("winnowing materializes the shingle-hash array below the window pass") {
    // Interpreted HOF lambdas re-evaluate captured subtrees per element:
    // if CollapseProject ever inlined the hash array back into the
    // window-min Generate, the op would regress to O(tokens²·md5) per doc
    // (the r8 130-second bench row). Pin: the hash stays in its own
    // Project (`AS _h`) and the Generate above references the attribute —
    // no md5 anywhere in the Generate's expression.
    val df = graft.operators.Dedup.winnowingFingerprints(
      spark.range(3).selectExpr("id",
        "concat('a b c d e f g ', cast(id as string)) as text"),
      "id", "text")
    val lines = df.queryExecution.optimizedPlan.toString.linesIterator.toSeq
    val gen = lines.filter(_.contains("Generate"))
    assert(gen.nonEmpty && gen.forall(l =>
        !l.contains("md5") && !l.contains("word_shingle_hash56")),
      s"hash inlined into the window Generate:\n${lines.mkString("\n")}")
    assert(lines.exists(l =>
        l.contains("word_shingle_hash56") && l.contains("AS _h")),
      s"materializing hash projection missing:\n${lines.mkString("\n")}")
  }

  test("round-9 ops keep their scale shapes") {
    // duplicateSpans: shingle equi-join on duplicated shingles only —
    // never a cartesian/BNLJ corpus self-meet
    val ds = plan("x_dedup_spans")
    assert(!ds.contains("CartesianProduct") &&
      !ds.contains("BroadcastNestedLoopJoin"), s"all-pairs span join:\n$ds")
    // maskSpans: per-doc windows only — no single-partition funnel
    val ms = plan("x_mask_spans")
    assert(!ms.contains("Exchange SinglePartition"),
      s"global window in span corruption:\n$ms")
    // randomProjection: a pure projection — no exchange, no join, ONE
    // native node (not the r9 unrolled element_at tree, which Spark
    // duplicated into the scan's DataFilters and re-evaluated
    // interpreted per row), and the scan's pushed-down filters carry
    // only the isnotnull guard — never the projection expression.
    val rp = operators.Similarity.randomProjection(
        Tables.embeddings(spark, sf), "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!rp.contains("Exchange") && !rp.contains("Join"),
      s"projection should not shuffle:\n$rp")
    assert(!rp.contains("element_at"),
      s"projection should be one native node, not an unrolled tree:\n$rp")
    assert(rp.contains("sparse_random_project"),
      s"native projection expression missing:\n$rp")
    for (line <- rp.linesIterator if line.contains("DataFilters"))
      assert(!line.contains("sparse_random_project") &&
        !line.contains("element_at"),
        s"projection leaked into scan DataFilters:\n$line")
  }

  test("TPC-H exists shapes decorrelate to semi/anti joins, dims broadcast") {
    // j11 (Q21 shape): the exists is a LeftSemi, the not-exists a
    // LeftAnti, both equi-keyed on the orderkey (with the supplier
    // inequality as a join residual) — NEVER a cartesian/BNLJ; the
    // supplier×nation dimension rides a broadcast. Join STRATEGY
    // (broadcast vs sort-merge) is size-driven by design: tiny test
    // inputs may broadcast what a 100 TB run sort-merges, so the pin is
    // on join TYPE and on the absence of unkeyed joins.
    val p11 = plan("j11_waiting_suppliers")
    assert(p11.contains("LeftSemi"), s"exists not a semi-join:\n$p11")
    assert(p11.contains("LeftAnti"), s"not-exists not an anti-join:\n$p11")
    assert(!p11.contains("CartesianProduct") &&
      !p11.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join in Q21 shape:\n$p11")
    assert(p11.contains("BroadcastHashJoin"),
      s"dimension should broadcast:\n$p11")
    // j12 (Q20 shape): the prefix-part dimension broadcasts into the
    // lineitem scan; every post-aggregate join is aggregate-sized and
    // broadcast; no shuffle join of the raw corpus anywhere
    val p12 = plan("j12_dominant_suppliers")
    assert(!p12.contains("CartesianProduct") &&
      !p12.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join in Q20 shape:\n$p12")
    assert(p12.contains("BroadcastHashJoin"),
      s"dimension should broadcast:\n$p12")
  }

  test("randomProjection plan size is flat in embedding dimensions") {
    // The structural half of the r9 'weak' finding: the unrolled form
    // emitted inDim×outDim/3 nodes (~100k at production 768→128 —
    // minutes of Catalyst analysis before a row moves). Pin: the
    // optimized plan's rendered size stays constant as dims grow 144×.
    def planChars(inDim: Int, outDim: Int): Int = {
      import org.apache.spark.sql.functions.{col, lit, sequence, transform}
      val df = spark.range(4).select(col("id").as("vec_id"),
        graft.functions.VectorExpressions.sparseRandomProject(
          transform(sequence(lit(1), lit(inDim)), x => x.cast("double")),
          7, inDim, outDim).as("projected"))
      df.queryExecution.optimizedPlan.toString.length
    }
    val small = planChars(64, 16)
    val big = planChars(768, 128)
    assert(big < small * 2,
      s"plan grows with dimensions: 64x16 -> $small chars, 768x128 -> $big")
  }

  test("TPC-H Q2/Q18/Q19 shapes keep their scan and join scale shapes") {
    // j15 (Q2 shape): the (part, supplier) cost aggregate feeds BOTH the
    // per-part min and the equality join back — at runtime AQE reuses
    // the partkey-side exchange instead of recomputing the corpus agg
    // (the pin runs the query: ReusedExchange only materializes in the
    // adaptive final plan). Dims broadcast with the region filter pushed;
    // the min-equality join stays equi-keyed.
    val df15 = SparkEntry.queries("j15_min_cost_supplier")(spark, sf)
    df15.collect()
    val p15 = df15.queryExecution.executedPlan.toString
    assert(p15.contains("ReusedExchange"),
      s"cost-agg exchange recomputed instead of reused:\n$p15")
    assert(p15.contains("EqualTo(r_name,EUROPE)"),
      s"region filter not pushed:\n$p15")
    assert(!p15.contains("CartesianProduct") &&
      !p15.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join in Q2 shape:\n$p15")
    // j16 (Q18 shape): the HAVING-IN folds into one keyed join of the
    // orderkey agg (map-side partial sum), customer dim broadcasts,
    // final order is top-k shaped only via sort (full result) — pin the
    // aggregate and the absence of unkeyed joins.
    val p16 = plan("j16_large_orders")
    assert(p16.contains("partial_sum"), s"qty agg not partial:\n$p16")
    assert(!p16.contains("CartesianProduct") &&
      !p16.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join in Q18 shape:\n$p16")
    // j17 (Q19 shape): the OR-of-ANDs cannot push below the join whole,
    // but BOTH derived single-table halves must: the part-side brand/size
    // union prefilter into the part scan, and the derived quantity-range
    // union into the lineitem scan (Catalyst extracts it from the mixed
    // disjunction). The join itself carries the residual mixed predicate.
    val p17 = plan("j17_disjunctive_revenue")
    assert(p17.contains("Or(Or(And(EqualTo(p_brand,Brand#12)"),
      s"part-side union prefilter not pushed:\n$p17")
    assert(p17.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      s"derived lineitem quantity union not pushed:\n$p17")
    assert(p17.contains("BroadcastHashJoin"),
      s"pruned part dim should broadcast:\n$p17")
  }

  test("TPC-H Q4/Q10/Q16 shapes: semi/anti joins, pushed prunes, top-k") {
    // j4: the EXISTS is a LeftSemi (an order with five late lines
    // counts once), the quarter window pushed into the orders scan
    val p4 = plan("j4_priority_wait")
    assert(p4.contains("LeftSemi"), s"exists not a semi-join:\n$p4")
    assert(p4.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window not pushed:\n$p4")
    // j20: return flag pushed into the lineitem scan, top-20 cut is
    // TakeOrderedAndProject, customer/nation dims broadcast
    val p20 = plan("j20_returned_customers")
    assert(p20.contains("EqualTo(l_returnflag,R)"),
      s"return-flag filter not pushed:\n$p20")
    assert(p20.contains("TakeOrderedAndProject"),
      s"top-20 should never be a global sort:\n$p20")
    assert(p20.contains("BroadcastHashJoin"), s"dims should broadcast:\n$p20")
    // j23: the supplier exclusion is a LeftAnti BEFORE the distinct
    // aggregate; the part dim's negated predicates push into its scan
    val p23 = plan("j23_parts_suppliers")
    assert(p23.contains("LeftAnti"), s"NOT-IN not an anti-join:\n$p23")
    assert(p23.contains("Not(EqualTo(p_brand,Brand#45))"),
      s"negated brand predicate not pushed:\n$p23")
    assert(!p23.contains("CartesianProduct") &&
      !p23.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join:\n$p23")
  }

  test("round-10 second-wave ops keep their scale shapes") {
    // fuzzyLinkage: candidates meet through the block-key equi-join —
    // never a cartesian/BNLJ name cross-product — and the JW scorer
    // runs on the candidate set, never leaked into the parquet scan
    // (the r9 DataFilters-duplication class)
    val fl = plan("x_fuzzy_linkage")
    assert(!fl.contains("CartesianProduct") &&
      !fl.contains("BroadcastNestedLoopJoin"), s"all-pairs linkage:\n$fl")
    for (line <- fl.linesIterator if line.contains("DataFilters"))
      assert(!line.contains("jaro_winkler"),
        s"JW scorer leaked into scan DataFilters:\n$line")
    // image near-dup: multi-index Hamming banding is an equi-join too
    val id = plan("x_image_dedup")
    assert(!id.contains("CartesianProduct") &&
      !id.contains("BroadcastNestedLoopJoin"), s"all-pairs image join:\n$id")
    // codec chains (encode→decode mapPartitions legs) are pure
    // projections: throughput = scan bandwidth, no exchange anywhere
    val pcm = spark.range(4).selectExpr("id",
      "transform(sequence(0, 63), n -> cast(n * 13 % 2000 - 1000 as int)) as samples")
    val codec = operators.Multimodal.audioSpectrum(
      operators.Multimodal.encodeAdpcm(pcm, "id", "samples", 8000),
      "id", "payload", 64)
      .queryExecution.executedPlan.toString
    assert(!codec.contains("Exchange") && !codec.contains("Join"),
      s"codec chain should not shuffle:\n$codec")
    // the two-column stereo MP3 chain (intensity path) is the same
    // mapPartitions projection — no exchange, no join
    val pcm2 = spark.range(2).selectExpr("id",
      "transform(sequence(0, 63), n -> cast(n * 13 % 2000 - 1000 as int)) as l",
      "transform(sequence(0, 63), n -> cast(n * 7 % 1200 - 600 as int)) as r")
    val codec2 = operators.Multimodal.audioSpectrum(
      operators.Multimodal.encodeMp3Stereo(pcm2, "id", "l", "r", 44100,
        intensityBand = 8),
      "id", "payload", 64)
      .queryExecution.executedPlan.toString
    assert(!codec2.contains("Exchange") && !codec2.contains("Join"),
      s"stereo codec chain should not shuffle:\n$codec2")
    // mixed-block intensity (r14) rides the same projection shape
    val codec3 = operators.Multimodal.audioSpectrum(
      operators.Multimodal.encodeMp3Stereo(pcm2, "id", "l", "r", 44100,
        intensityBand = 4, blockMode = "mixed"),
      "id", "payload", 64)
      .queryExecution.executedPlan.toString
    assert(!codec3.contains("Exchange") && !codec3.contains("Join"),
      s"mixed-intensity codec chain should not shuffle:\n$codec3")
    // the third-party interop decode leg is a per-row projection too
    val interop = plan("x_audio_mp3_interop")
    assert(!interop.contains("Join") &&
      !interop.contains("Exchange SinglePartition"),
      s"interop decode leg should not join or funnel:\n$interop")
  }

  test("round-11 ops keep their scale shapes") {
    // watermarkReplay: the corpus side joins the TINY per-batch
    // watermark frame via broadcast — the events scan is never shuffled
    // for it, and the only SinglePartition exchange ever allowed is the
    // batch-count-sized window (it must not touch the big side)
    val wl = plan("ws_late")
    assert(wl.contains("BroadcastHashJoin") ||
      wl.contains("BroadcastExchange"), s"watermark frame not broadcast:\n$wl")
    assert(!wl.contains("SortMergeJoin"),
      s"corpus shuffled against the watermark frame:\n$wl")
    // sessionizeSpread: two-phase — no per-user window, no
    // single-partition exchange anywhere (the straggler shapes it exists
    // to avoid)
    val ss = plan("x_sessionize_spread")
    assert(!ss.contains("Exchange SinglePartition"),
      s"spread sessionize funnels through one partition:\n$ss")
    assert(!ss.contains("WindowExec") && !ss.contains("RunningWindow"),
      s"spread sessionize fell back to a window pass:\n$ss")
  }

  test("token masking hashes each token exactly once") {
    // The mask decision reads each md5-56 as a zip_with lambda variable
    // produced by ONE fused native pass; embedding sampleHash's 7-term
    // md5 tree in the lambda would re-run the md5 7× per token,
    // interpreted. Pin: one fused hash call, zero expression-tree md5s.
    val df = graft.operators.Corpus.maskTokens(
      spark.range(3).selectExpr("id",
        "concat('a b c d ', cast(id as string)) as text"),
      "id", "text", 300)
    val p = df.queryExecution.optimizedPlan.toString
    assert("prefix_index_hash56".r.findAllIn(p).size == 1 &&
      !p.contains("md5("),
      s"mask plan should hash via one fused pass:\n$p")
  }

  test("r17 native signature paths: pure map, zero exchanges, codegen'd") {
    // the r17 point of simhash64 / minhash_signature is the DELETED
    // shuffle: signature computation must be a scan -> project map with
    // no Exchange anywhere (the old explode + groupBy form shuffled
    // ×tokens-per-doc rows on the doc id). Pin it in the physical plan.
    val docs = Tables.documents(spark, sf) // tiny at spec sf; no limit —
    // a GlobalLimit would inject its own SinglePartition exchange
    for ((name, frame) <- Seq(
        ("simhashSignatures",
          operators.Dedup.simhashSignatures(docs, "doc_id", "text")),
        ("bandedSignatures",
          operators.Dedup.bandedSignatures(docs, "doc_id", "text", 3, 32, 8)))) {
      val p = frame.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"$name: signature computation must not shuffle:\n$p")
    }
    val sim = operators.Dedup.simhashSignatures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(sim.contains("simhash64"), s"native expression missing:\n$sim")
    val mh = operators.Dedup.bandedSignatures(docs, "doc_id", "text", 3, 32, 8)
      .queryExecution.executedPlan.toString
    assert(mh.contains("minhash_signature"), s"native expression missing:\n$mh")
  }
}
