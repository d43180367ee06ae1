package graft.sink

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "merge the scan then Merge again"),
    (1L, "window scan window"),
    (2L, "nothing relevant here"),
    (3L, ""),
    (4L, "merge window scan")).toDF("doc_id", "text")

  test("postings: one row per (term, doc), exact tf, case-folded") {
    val p = InvertedIndex.postings(corpus, "doc_id", "text")
    val merge = p.filter($"term" === "merge").orderBy("doc_id")
      .as[(String, Long, Int)].collect().toSeq
    assert(merge == Seq(("merge", 0L, 2), ("merge", 4L, 1)))
    // empty doc contributes nothing
    assert(p.filter($"doc_id" === 3L).count() == 0)
    // total postings = distinct (term, doc) pairs
    assert(p.count() == p.select("term", "doc_id").distinct().count())
  }

  test("term stats: df counts docs, cf counts occurrences") {
    val s = InvertedIndex.termStats(
        InvertedIndex.postings(corpus, "doc_id", "text"))
      .filter($"term".isin("merge", "window", "scan"))
      .orderBy("term").as[(String, Int, Long)].collect().toSeq
    assert(s == Seq(("merge", 2, 3L), ("scan", 3, 3L), ("window", 2, 3L)))
  }

  test("doc lengths count single-space tokens, empty doc = 0") {
    val dl = InvertedIndex.docLengths(corpus, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Int)].collect().toSeq
    assert(dl == Seq((0L, 6), (1L, 3), (2L, 3), (3L, 0), (4L, 3)))
  }

  test("persisted postings push the query-term filter into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("postings").toString
    InvertedIndex.writePostings(
      InvertedIndex.postings(corpus, "doc_id", "text"), dir)
    val persisted = InvertedIndex.readPostings(spark, dir)
    val dl = InvertedIndex.docLengths(corpus, "doc_id", "text")
    // searching the persisted index ≡ searching the inline build
    val fromDisk = InvertedIndex.bm25Search(persisted, dl, "merge window scan", 10)
      .as[(Long, Double)].collect().toSeq
    val inline = InvertedIndex.bm25Search(
      InvertedIndex.postings(corpus, "doc_id", "text"), dl,
      "merge window scan", 10).as[(Long, Double)].collect().toSeq
    assert(fromDisk == inline)
    // the term predicate reaches the parquet scan (row-group pruning)
    val plan = persisted.filter($"term".isin("merge", "scan"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term filter not pushed to the postings scan:\n$plan")
  }

  test("index-accelerated BM25 matches the corpus-scan scorer exactly") {
    val p = InvertedIndex.postings(corpus, "doc_id", "text")
    val dl = InvertedIndex.docLengths(corpus, "doc_id", "text")
    val indexed = InvertedIndex.bm25Search(p, dl, "merge window scan", 10)
      .as[(Long, Double)].collect().toSeq
    val scan = DocQueries.matchTextBM25(corpus, "doc_id", "text",
      "merge window scan", 10).as[(Long, Double)].collect().toSeq
    assert(indexed == scan)
    assert(indexed.nonEmpty && indexed.map(_._2) == indexed.map(_._2).sorted.reverse)
  }

  test("indexed phrase search ≡ scan-form matchPhrase; overlaps counted") {
    val docs = Tables.documents(spark, sf)
    val positional = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    for (phrase <- Seq("stream data", "the", "data stream load")) {
      val viaIndex = InvertedIndex.phraseSearch(positional, phrase)
        .select("doc_id").as[Long].collect().toSet
      val viaScan = DocQueries.matchPhrase(docs, "text", phrase)
        .select("doc_id").as[Long].collect().toSet
      assert(viaIndex == viaScan, s"phrase '$phrase'")
    }
    // overlapping occurrences count like Lucene's PhraseQuery: "a a a"
    // holds "a a" at starts 0 and 1; repeated-term phrases align legs
    val tiny = Seq((1L, "a a a b"), (2L, "a b a"), (3L, "b b")).toDF("doc_id", "text")
    val got = InvertedIndex.phraseSearch(
      InvertedIndex.positionalPostings(tiny, "doc_id", "text"), "a a")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L), got)
  }

  test("a query term's phrase leg is a pushed predicate on the persisted layout") {
    val dir = java.nio.file.Files.createTempDirectory("posidx").toString
    val docs = Tables.documents(spark, sf)
    InvertedIndex.writePostings(
      InvertedIndex.positionalPostings(docs, "doc_id", "text"), dir)
    val search = InvertedIndex.phraseSearch(
      InvertedIndex.readPostings(spark, dir), "stream data")
    val plan = search.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("EqualTo(term,stream)") || plan.contains("term")), plan)
    assert(search.count() > 0)
    // spanNear legs push the same per-term predicate
    val spanPlan = InvertedIndex.spanNearSearch(
        InvertedIndex.readPostings(spark, dir), "stream data", 1)
      .queryExecution.executedPlan.toString
    assert(spanPlan.contains("PushedFilters") && spanPlan.contains("term"),
      spanPlan)
  }

  test("boolSearch ≡ scan-form boolQuery across clause shapes; legs push") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("boolidx").toString
    InvertedIndex.writePostings(
      InvertedIndex.postings(docs, "doc_id", "text"), dir)
    val persisted = InvertedIndex.readPostings(spark, dir)
    val shapes = Seq(
      (Seq("merge"), Seq("stream", "scan"), Seq("window"), 1),
      (Seq("merge", "data"), Nil, Nil, -1),        // pure conjunction
      (Nil, Seq("stream", "scan"), Nil, -1),       // should-only, default msm=1
      (Nil, Seq("stream", "scan"), Seq("merge"), 2), // both should terms, anti
      (Seq("merge"), Seq("stream"), Nil, -1))      // msm defaults to 0
    for ((m, sh, mn, msm) <- shapes) {
      val viaIndex = InvertedIndex.boolSearch(persisted, m, sh, mn, msm)
        .select("doc_id").as[Long].collect().toSet
      val viaScan = DocQueries.boolQuery(docs, "text", m, sh, mn, msm)
        .select("doc_id").as[Long].collect().toSet
      assert(viaIndex == viaScan, s"clauses must=$m should=$sh not=$mn msm=$msm")
    }
    // the MUST leg is a pushed term predicate on the persisted layout
    val plan = InvertedIndex.boolSearch(persisted, must = Seq("merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"), plan)
  }

  test("bm25SearchBatch answers each query exactly like the single form") {
    val docs = Tables.documents(spark, sf)
    val p = InvertedIndex.postings(docs, "doc_id", "text")
    val dl = InvertedIndex.docLengths(docs, "doc_id", "text")
    val qs = Seq(("a", "merge window"), ("b", "stream data scan"))
      .toDF("query_id", "query")
    val batch = InvertedIndex.bm25SearchBatch(p, dl, qs, "query_id", "query", 5)
      .orderBy("query_id", "rk")
      .as[(String, Int, Long, Double)].collect().toSeq
    for ((qid, text) <- Seq(("a", "merge window"), ("b", "stream data scan"))) {
      val single = InvertedIndex.bm25Search(p, dl, text, 5)
        .as[(Long, Double)].collect().toSeq
      val fromBatch = batch.filter(_._1 == qid).map(r => (r._3, r._4))
      assert(fromBatch == single, s"query $qid")
    }
    // ranks are dense from 1 within each query
    assert(batch.filter(_._1 == "a").map(_._2) == (1 to 5))
  }

  test("spanNearSearch: ordered proximity with slop; slop 0 ≡ phraseSearch") {
    val docs = Seq(
      (1L, "stream data now"),          // adjacent, in order
      (2L, "stream the data"),          // one gap — slop 1 only
      (3L, "stream a b data"),          // two gaps — slop 2 only
      (4L, "data stream"),              // wrong order — never
      (5L, "stream only here")          // missing term
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    def ids(slop: Int): Set[Long] =
      InvertedIndex.spanNearSearch(pos, "stream data", slop)
        .as[Long].collect().toSet
    assert(ids(0) == Set(1L))
    assert(ids(1) == Set(1L, 2L))
    assert(ids(2) == Set(1L, 2L, 3L))
    // slop 0 membership equals phraseSearch on the shared test corpus
    val corpusPos = InvertedIndex.positionalPostings(corpus, "doc_id", "text")
    assert(
      InvertedIndex.spanNearSearch(corpusPos, "merge window", 0)
        .as[Long].collect().toSet ==
      InvertedIndex.phraseSearch(corpusPos, "merge window")
        .select("doc_id").as[Long].collect().toSet)
    // single-token degenerate: the term query
    assert(ids(0).subsetOf(
      InvertedIndex.spanNearSearch(pos, "stream", 0).as[Long].collect().toSet))
  }

  test("spanFirst and spanNot: position windows and exclusion semantics") {
    val docs = Seq(
      (1L, "merge starts the doc"),          // merge at 0
      (2L, "the big merge lands here"),      // merge at 2 — last inside end=3
      (3L, "way down here a merge hides"),   // merge at 4 — outside end=3
      (4L, "scan alone works"),              // scan, no merge at all
      (5L, "merge scan adjacent"),           // scan at 1, merge at 0 → excluded
      (6L, "merge gap scan far apart"),      // scan at 2, merge at 0 → survives ±1
      (7L, "scan merge scan")                // pos 0 excluded by merge@1; no survivor? both scans adjacent
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    assert(InvertedIndex.spanFirstSearch(pos, "merge", 3)
      .as[Long].collect().toSet == Set(1L, 2L, 5L, 6L, 7L))
    assert(InvertedIndex.spanFirstSearch(pos, "merge", 1)
      .as[Long].collect().toSet == Set(1L, 5L, 6L))
    // span_not ±1: doc 4 (no exclude), doc 6 (distance 2) match;
    // doc 5 (adjacent) and doc 7 (both scans touch the middle merge) don't
    assert(InvertedIndex.spanNotSearch(pos, "scan", "merge", 1, 1)
      .as[Long].collect().toSet == Set(4L, 6L))
    // pre/post are directional: with post-only exclusion, a merge AFTER
    // the scan excludes it but a merge BEFORE does not
    assert(InvertedIndex.spanNotSearch(pos, "scan", "merge", 0, 1)
      .as[Long].collect().toSet == Set(4L, 5L, 6L, 7L))
  }

  test("spanWithin: containment over ALL spans, not greedy minimal ones") {
    val docs = Seq(
      (1L, "x stream y merge data z"),   // merge@3 inside span [1,4]
      (2L, "merge stream data"),         // merge@0 BEFORE the span
      // greedy counter-case: minimal spans [0,1] and [5,10] miss
      // merge@3; the wider span (stream@0 … data@10, gap 9) holds it
      (3L, "stream data q merge r stream w w w w data"),
      (4L, "stream data only")           // no little term at all
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    assert(InvertedIndex.spanWithinSearch(pos, "merge", "stream", "data",
      slop = 10).as[Long].collect().toSet == Set(1L, 3L))
    // tight slop kills the wide span that carried doc 3
    assert(InvertedIndex.spanWithinSearch(pos, "merge", "stream", "data",
      slop = 2).as[Long].collect().toSet == Set(1L))
    intercept[IllegalArgumentException] {
      InvertedIndex.spanWithinSearch(pos, "merge", "stream", "data", -1)
    }
  }

  test("prefix and fuzzy: index-served ≡ scan-form; prefix predicate pushes") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("preidx").toString
    InvertedIndex.writePostings(
      InvertedIndex.postings(docs, "doc_id", "text"), dir)
    val persisted = InvertedIndex.readPostings(spark, dir)
    // prefix: indexed ≡ scan
    val viaPrefixIdx = InvertedIndex.prefixSearch(persisted, "merg")
      .as[Long].collect().toSet
    val viaPrefixScan = DocQueries.termPrefix(docs, "text", "merg")
      .select("doc_id").as[Long].collect().toSet
    assert(viaPrefixIdx == viaPrefixScan && viaPrefixIdx.nonEmpty)
    // the prefix reaches the scan as a pushed StringStartsWith
    val plan = InvertedIndex.prefixSearch(persisted, "merg")
      .queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(term,merg"), plan)
    // fuzzy: vocabulary-scan indexed form ≡ per-token scan form
    val viaFuzzyIdx = InvertedIndex.fuzzySearch(persisted, "mergs", 1)
      .as[Long].collect().toSet
    val viaFuzzyScan = DocQueries.matchFuzzy(docs, "text", "mergs", 1)
      .select("doc_id").as[Long].collect().toSet
    assert(viaFuzzyIdx == viaFuzzyScan && viaFuzzyIdx.nonEmpty)
  }

  test("boolSearchRanked: boosted BM25 sum, MUST enforced, MUST_NOT excluded") {
    val docs = corpus // 0: "merge the scan then Merge again", 1: "window scan window", 4: "merge window scan"
    val postings = InvertedIndex.postings(docs, "doc_id", "text")
    val dl = InvertedIndex.docLengths(docs, "doc_id", "text")
    // all-boost-1, single SHOULD term ≡ plain bm25Search on that term
    val viaBool = InvertedIndex.boolSearchRanked(postings, dl,
      should = Seq(("merge", 1.0)), k = 10)
      .as[(Long, Double)].collect().toSeq
    val viaBm25 = InvertedIndex.bm25Search(postings, dl, "merge", 10)
      .as[(Long, Double)].collect().toSeq
    assert(viaBool == viaBm25 && viaBool.nonEmpty)
    // MUST merge: doc 1 (no merge) is out even though it scores on window
    val mm = InvertedIndex.boolSearchRanked(postings, dl,
      must = Seq(("merge", 1.0)), should = Seq(("window", 1.0)), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(mm.keySet == Set(0L, 4L))
    // boosting window 100× must rank doc 4 (has window) above doc 0
    val boosted = InvertedIndex.boolSearchRanked(postings, dl,
      must = Seq(("merge", 1.0)), should = Seq(("window", 100.0)), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(boosted.head._1 == 4L, boosted.toString)
    // MUST_NOT scan: every remaining doc lacks scan
    val noScan = InvertedIndex.boolSearchRanked(postings, dl,
      should = Seq(("merge", 1.0), ("window", 1.0)), mustNot = Seq("scan"),
      k = 10).as[(Long, Double)].collect().toMap
    assert(!noScan.keySet.exists(Set(0L, 1L, 4L)), noScan.toString)
  }

  test("suggest ranks completions by frequency with term tie-break; prefix pushes") {
    val docs = Seq(
      (1L, "scan scan scan sort sort spark"),
      (2L, "scan sort span other")).toDF("doc_id", "text")
    val postings = InvertedIndex.postings(docs, "doc_id", "text")
    val got = InvertedIndex.suggest(postings, "s", 3)
      .as[(String, Long)].collect().toSeq
    // scan 4 > sort 3 > span 1 == spark 1 → "span" wins the tie on term
    assert(got == Seq(("scan", 4L), ("sort", 3L), ("span", 1L)), got.toString)
    val dir = java.nio.file.Files.createTempDirectory("suggidx").toString
    InvertedIndex.writePostings(postings, dir)
    val plan = InvertedIndex.suggest(InvertedIndex.readPostings(spark, dir), "s", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(term,s"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("wildcard/regexp: indexed ≡ scan; literal prefix pushes; glob escapes") {
    val docs = corpus.unionByName(
      Seq((5L, "a.b special m+rge token"), (6L, "mx bad")).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("wcidx").toString
    InvertedIndex.writePostings(
      InvertedIndex.postings(docs, "doc_id", "text"), dir)
    val persisted = InvertedIndex.readPostings(spark, dir)
    // glob m*e: matches "merge" (0, 4) and "m+rge" (5) but not "mx"
    val idx = InvertedIndex.wildcardSearch(persisted, "m*e")
      .as[Long].collect().toSet
    val scan = DocQueries.matchWildcard(docs, "text", "m*e")
      .select("doc_id").as[Long].collect().toSet
    assert(idx == scan && idx == Set(0L, 4L, 5L))
    // regex special chars in the glob are LITERAL: "a.b" matches only
    // the token "a.b", not "aXb"-shaped tokens; "m+rge" likewise
    assert(DocQueries.matchWildcard(docs, "text", "a.b")
      .select("doc_id").as[Long].collect().toSeq == Seq(5L))
    assert(DocQueries.matchWildcard(docs, "text", "m+rge*")
      .select("doc_id").as[Long].collect().toSeq == Seq(5L))
    // ? is exactly one char: "m?rge" matches "merge" and "m+rge",
    // never "mrge"/"meerge"-shaped tokens
    assert(DocQueries.matchWildcard(docs, "text", "m?rge")
      .select("doc_id").as[Long].collect().toSet == Set(0L, 4L, 5L))
    // the glob's literal prefix reaches the postings scan pushed
    val plan = InvertedIndex.wildcardSearch(persisted, "mer*")
      .queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(term,mer"), plan)
    // regexp: full-token anchoring (no substring matches), indexed ≡ scan
    val reIdx = InvertedIndex.regexpSearch(persisted, "wind.w|scan")
      .as[Long].collect().toSet
    val reScan = DocQueries.matchRegexp(docs, "text", "wind.w|scan")
      .select("doc_id").as[Long].collect().toSet
    assert(reIdx == reScan && reIdx == Set(0L, 1L, 4L))
    // "erge" must NOT match "merge" (anchored), and the regexp prefix
    // prune must not break prefix-less patterns
    assert(InvertedIndex.regexpSearch(persisted, "erge")
      .as[Long].collect().isEmpty)
    // alternation-free pattern DOES take the pushed-prefix path
    val rePlan = InvertedIndex.regexpSearch(persisted, "wind.w")
      .queryExecution.executedPlan.toString
    assert(rePlan.contains("StringStartsWith(term,wind"), rePlan)
    assert(InvertedIndex.regexpSearch(persisted, "wind.w")
      .as[Long].collect().toSet == Set(1L, 4L))
    // a quantifier on the literal run's LAST char makes it optional:
    // 'scans?' must still find the term "scan" (prune = "scan", not
    // "scans"), and 'windowz*' / 'windowx{0,2}' likewise keep "window"
    assert(InvertedIndex.regexpSearch(persisted, "scans?")
      .as[Long].collect().toSet == Set(0L, 1L, 4L))
    assert(InvertedIndex.regexpSearch(persisted, "windowz*")
      .as[Long].collect().toSet == Set(1L, 4L))
    assert(InvertedIndex.regexpSearch(persisted, "windowx{0,2}")
      .as[Long].collect().toSet == Set(1L, 4L))
    // '+' keeps the full run as the prefix (≥1 occurrence required) —
    // and the shortened prune still pushes to the scan
    val qPlan = InvertedIndex.regexpSearch(persisted, "scans?")
      .queryExecution.executedPlan.toString
    assert(qPlan.contains("StringStartsWith(term,scan)"), qPlan)
    assert(InvertedIndex.regexpSearch(persisted, "scan+")
      .queryExecution.executedPlan.toString
      .contains("StringStartsWith(term,scan)"))
  }

  test("phrasePrefixSearch indexed ≡ scan form; prefix leg pushes") {
    val docs = Seq(
      (1L, "merge window open"),
      (2L, "merge the window"),
      (3L, "submerge window"),
      (4L, "merge windowless panes"),
      (5L, "merge window"),
      (6L, "window merge")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ppidx").toString
    InvertedIndex.writePostings(
      InvertedIndex.positionalPostings(docs, "doc_id", "text"), dir)
    val persisted = InvertedIndex.readPostings(spark, dir)
    for (q <- Seq("merge wind", "merge window", "merg")) {
      val idx = InvertedIndex.phrasePrefixSearch(persisted, q)
        .as[Long].collect().toSet
      val scan = DocQueries.matchPhrasePrefix(docs, "text", q)
        .select("doc_id").as[Long].collect().toSet
      assert(idx == scan, s"q=$q idx=$idx scan=$scan")
    }
    // the last token's prefix reaches the postings scan pushed
    val plan = InvertedIndex.phrasePrefixSearch(persisted, "merge wind")
      .queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(term,wind"), plan)
  }

  test("disMaxSearch indexed ≡ scan form") {
    val docs = corpus
    val idx = InvertedIndex.disMaxSearch(
        InvertedIndex.postings(docs, "doc_id", "text"),
        InvertedIndex.docLengths(docs, "doc_id", "text"),
        Seq("merge window", "scan"), tieBreaker = 0.3, k = 10)
      .as[(Long, Double)].collect().toSeq
    val scan = DocQueries.disMaxSearch(docs, "doc_id", "text",
        Seq("merge window", "scan"), tieBreaker = 0.3, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(idx == scan && idx.nonEmpty)
  }

  test("significantTermsIndexed ≡ scan form off the materialized postings") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val idx = InvertedIndex.significantTermsIndexed(
        InvertedIndex.postings(docs, "doc_id", "text"),
        docs.select("doc_id"),
        docs.filter(col("lang") === "de").select("doc_id"),
        minDocCount = 2, k = 15)
      .as[(String, Long, Long, Double)].collect().toSeq
    val scan = DocQueries.significantTerms(docs, "doc_id", "text",
        col("lang") === "de", minDocCount = 2, k = 15)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(idx == scan && idx.nonEmpty)
    intercept[IllegalArgumentException] {
      InvertedIndex.significantTermsIndexed(
        InvertedIndex.postings(docs, "doc_id", "text"),
        docs.select("doc_id"), docs.select("doc_id"), 0, 5)
    }
  }

  test("spanNearSearch stays correct and bounded on repetitive text") {
    // a doc repeating the query terms m times: the greedy earliest-next
    // fold must still match (existence preserved) without enumerating
    // every increasing position tuple
    val rep = (1 to 40).map(_ => "stream data").mkString(" ")
    val docs = Seq(
      (1L, rep),                          // 40 interleaved repeats
      (2L, "stream stream stream only"),  // repeats of one term, no match
      (3L, "data " + rep)                 // leading wrong-order copy still matches
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    assert(InvertedIndex.spanNearSearch(pos, "stream data", 0)
      .as[Long].collect().toSet == Set(1L, 3L))
    // repeated query tokens consume DISTINCT ascending positions
    assert(InvertedIndex.spanNearSearch(pos, "stream stream", 2)
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    // the fold's intermediate is one row per (doc, first-position):
    // pinned via the aggregate in the plan (no m^k tuple blowup)
    val plan = InvertedIndex.spanNearSearch(pos, "stream data stream", 5)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("min("), plan)
  }

  test("spanUnorderedSearch: either order, best gap, guards") {
    val docs = Seq(
      (1L, "stream data now"),      // adjacent forward: gap 0
      (2L, "data x stream"),        // REVERSE order, one gap
      (3L, "stream a b c data"),    // gap 3
      (4L, "data only here"),       // missing term
      (5L, "stream q data q data")  // multiple pairs: best gap wins (1)
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    def got(maxGaps: Int): Map[Long, Int] =
      InvertedIndex.spanUnorderedSearch(pos, "stream", "data", maxGaps)
        .as[(Long, Int)].collect().toMap
    assert(got(0) == Map(1L -> 0))
    assert(got(1) == Map(1L -> 0, 2L -> 1, 5L -> 1))
    assert(got(3) == Map(1L -> 0, 2L -> 1, 3L -> 3, 5L -> 1))
    // the ordered sibling misses the reversed doc at the same budget
    assert(!InvertedIndex.spanNearSearch(pos, "stream data", 1)
      .as[Long].collect().toSet.contains(2L))
    intercept[IllegalArgumentException] {
      InvertedIndex.spanUnorderedSearch(pos, "stream", "stream", 1)
    }
    intercept[IllegalArgumentException] {
      InvertedIndex.spanUnorderedSearch(pos, "a", "b", -1)
    }
  }

  test("spanOrSearch: union of span clauses with matched-clause counts") {
    val docs = Seq(
      (1L, "stream data flows"),          // clause 1 only
      (2L, "merge the window now"),       // clause 2 only (slop 1 ≤ 2)
      (3L, "stream data merge window"),   // both clauses
      (4L, "data stream window merge"),   // neither (wrong order)
      (5L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val pos = InvertedIndex.positionalPostings(docs, "doc_id", "text")
    val out = InvertedIndex.spanOrSearch(pos,
        Seq(("stream data", 1), ("merge window", 2)))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 2))
    intercept[IllegalArgumentException] {
      InvertedIndex.spanOrSearch(pos, Seq.empty)
    }
  }
}
