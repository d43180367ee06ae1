package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps lowest id per duplicate group") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exact(df, "id", Seq("text")).orderBy("keep_id")
      .as[(String, Long, Long)] // (text, keep_id, n_copies)
    val rows = Dedup.exact(df, "id", Seq("text"))
      .select("keep_id", "n_copies").orderBy("keep_id")
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 2L), (3L, 1L)))
  }

  test("dropExactDuplicates returns surviving rows") {
    val df = Seq((2L, "same"), (1L, "same"), (3L, "other")).toDF("id", "text")
    val out = Dedup.dropExactDuplicates(df, "id", Seq("text"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("identical docs have identical minhash signature and simhash") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("id", "text")
    val sigs = df.select(
      Dedup.minhashSignature(col("text"), 3, 16).as("mh"),
      Dedup.simhash(col("text")).as("sh"))
      .collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhash of near-identical docs is within small hamming distance") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"))
      .toDF("id", "text")
    val pairs = Dedup.simhashDedup(docs, "id", "text", maxHamming = 16)
    assert(pairs.count() == 1)
  }

  test("containment catches a quote that Jaccard is blind to") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                      // the short original
      (2L, s"$filler $quote"),          // quoted verbatim inside a long page
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    // every shingle of doc 1 appears in doc 2 → containment 1.0
    val cont = Dedup.ngramContainment(docs, "doc_id", "text", n = 3,
        threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont == Seq((1L, 2L, 1.0)), cont.toString)
    // the small side lands on the left even when its id is larger
    val swapped = Dedup.ngramContainment(
      Seq((9L, quote), (2L, s"$filler $quote")).toDF("doc_id", "text"),
      "doc_id", "text", 3, 0.9).as[(Long, Long, Double)].collect().toSeq
    assert(swapped == Seq((9L, 2L, 1.0)), swapped.toString)
    // Jaccard at the same bar misses it (union is filler-dominated)
    assert(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).count() == 0)
    intercept[IllegalArgumentException] {
      Dedup.ngramContainment(docs, "doc_id", "text", 3, 0.0)
    }
  }

  test("minhash LSH recall vs exact ngram jaccard on real documents") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashDedup(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(exact)) // verification step guarantees precision 1.0
    if (exact.nonEmpty) {
      val recall = mh.size.toDouble / exact.size
      assert(recall >= 0.8, s"minhash recall $recall too low (${mh.size}/${exact.size})")
    }
  }

  test("connected components label every doc with its min reachable id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("id")
    val roots = Dedup.connectedComponents(pairs, ids)
      .as[(Long, Long)].collect().toMap
    assert(roots == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L,
      7L -> 7L, 9L -> 7L))
  }

  test("components converge across a long chain (multi-round propagation)") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ids = (1L to 10L).toDF("id")
    val roots = Dedup.connectedComponents(chain, ids)
      .as[(Long, Long)].collect().toMap
    assert(roots.values.toSet == Set(1L))
  }

  test("embedding cosine pairs are symmetric-free and above threshold") {
    val out = Dedup.embeddingCosinePairs(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0.3)
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, c) => a < b && c >= 0.3 })
    assert(rows.nonEmpty)
  }

  test("blocked exact pair join ≡ brute-force pair join") {
    val e = Tables.embeddings(spark, sf)
    val brute = Dedup.embeddingCosinePairs(e, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Dedup.embeddingCosinePairsExact(e, "vec_id", "embedding", 0.3, blocks = 7)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == brute)
  }

  test("cell-pruned exact pair join ≡ brute-force pair join") {
    val e = Tables.embeddings(spark, sf)
    val brute = Dedup.embeddingCosinePairs(e, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val pruned = Dedup.embeddingCosinePairsPruned(e, "vec_id", "embedding",
        0.3, k = 6, iters = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(pruned == brute)
  }

  test("separated clusters prune most of the cell-pair lattice, soundly") {
    // two tight antipodal bundles on the 2-sphere: nothing across them
    // can come near cosine 0.9
    val docs = (0L until 40L).map { i =>
      val s = if (i % 2 == 0) 1f else -1f
      val w = (i % 5).toFloat * 0.01f
      (i, Seq(s * 1f, s * w, w))
    }.toDF("vec_id", "embedding")
    val model = Ivf.fit(docs, "vec_id", "embedding", 4, 5)
    // radii from the operator's own aggregate path: run the public op
    // and independently recompute the driver decision for the pin
    val assigned = Ivf.assign(docs, "embedding", model)
    val radii = assigned.select(col("vec_id"), col("cell"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()
      .groupBy(_._2)
      .map { case (cell, rows) =>
        val c = model.centroids(cell)
        def ang(v: Seq[Float]): Double = {
          val dot = v.zip(c).map { case (a, b) => a * b }.sum
          val n = math.sqrt(v.map(x => x * x.toDouble).sum) *
            math.sqrt(c.map(x => x * x).sum)
          math.acos(math.max(-1.0, math.min(1.0, dot / n)))
        }
        cell -> rows.map(r => ang(r._3)).max
      }
    val surviving = Dedup.survivingCellPairs(model, radii, 0.9)
    // the full lattice is k² = 16 ordered pairs; antipodal cell pairs
    // must prune (their centroid angle ≈ π dwarfs the tiny radii)
    assert(surviving.size < 16, s"nothing pruned: $surviving")
    // soundness: the pruned op still equals brute force at this threshold
    val brute = Dedup.embeddingCosinePairs(docs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val pruned = Dedup.embeddingCosinePairsPruned(docs, "vec_id",
        "embedding", 0.9, k = 4, iters = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pruned == brute && pruned.nonEmpty)
  }

  test("dedupPassages keeps the earliest copy of each repeated passage") {
    // passage size 2: doc 1 = [a b][c d], doc 2 = [c d][e f] (repeats
    // "c d"), doc 3 = [a b][c d] (nothing unique), doc 4 = empty
    val docs = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b c d"), (4L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupPassages(docs, "doc_id", "text", passageTokens = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),  // earliest owner of both passages
      (2L, 2L, 1L, "e f"),      // "c d" already seen in doc 1
      (3L, 2L, 0L, "")))        // every passage seen earlier; doc 4 has none
    // keeper selection is a hash agg, not a per-fingerprint window
    val plan = Dedup.dedupPassages(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("keepBestPerCluster keeps the arg-max with id tie-break") {
    val df = Seq(
      ("c1", 1L, 10L), ("c1", 2L, 30L), ("c1", 3L, 30L), // tie at 30 → id 2
      ("c2", 4L, 5L),                                    // singleton
      ("c3", 6L, 0L), ("c3", 5L, 0L)                     // all-tie → id 5
    ).toDF("cluster", "doc_id", "score")
    val out = Dedup.keepBestPerCluster(df, "cluster", "doc_id", "score")
      .orderBy("cluster").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("c1", 2L, 30L, 3L), ("c2", 4L, 5L, 1L),
      ("c3", 5L, 0L, 2L)))
    // map-side combinable: partial max before the shuffle, no Window
    val plan = Dedup.keepBestPerCluster(df, "cluster", "doc_id", "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("winnowing: shared >= k+w-1 token run yields a shared fingerprint") {
    val common = "alpha beta gamma delta epsilon zeta" // 6 = k+w-1 tokens
    val docs = Seq(
      (1L, s"intro words here $common trailing tail"),
      (2L, s"$common completely different ending text"),
      (3L, "nothing in common with the others at all"),
      (4L, "tiny")) // shorter than k: whole-text fingerprint
      .toDF("doc_id", "text")
    val fp = Dedup.winnowingFingerprints(docs, "doc_id", "text",
        k = 3, w = 4)
      .as[(Long, Long)].collect().toSeq
    val byDoc = fp.groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    // the winnowing guarantee: docs 1 and 2 share the 6-token run
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared run must share a fp")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "unrelated docs must not")
    assert(byDoc(4L).size == 1, "short doc fingerprints its whole text")
    // density: far fewer fingerprints than shingles
    val nShingles1 = docs.filter(col("doc_id") === 1L)
      .select(size(graft.functions.TextFunctions.wordShingles(col("text"), 3)))
      .head().getInt(0)
    assert(byDoc(1L).size < nShingles1)
    // deterministic across runs
    assert(fp.toSet == Dedup.winnowingFingerprints(docs, "doc_id",
      "text", 3, 4).as[(Long, Long)].collect().toSet)
    intercept[IllegalArgumentException] {
      Dedup.winnowingFingerprints(docs, "doc_id", "text", 0, 4)
    }
  }

  test("fused hash expressions match the composed md5-56 forms exactly") {
    // the native one-pass expressions behind winnowing/masking must be
    // value-identical to the transform(wordShingles, sampleHash) /
    // per-index sampleHash(concat) compositions they replaced
    val df = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "x y"),
      (3L, "")).toDF("doc_id", "text")
    val fusedVsComposed = df.select(
        graft.functions.TextExpressions.wordShingleHash56(col("text"), 3)
          .as("f"),
        transform(graft.functions.TextFunctions.wordShingles(col("text"), 3),
          s => Corpus.sampleHash(s)).as("c"))
      .as[(Seq[Long], Seq[Long])].collect()
    fusedVsComposed.foreach { case (f, c) => assert(f == c) }
    val prefixed = df.select(
        graft.functions.TextExpressions.prefixIndexHash56(
          concat(col("doc_id").cast("string"), lit(":")), lit(3)).as("f"),
        array((0 until 3).map(i => Corpus.sampleHash(
          concat(col("doc_id").cast("string"), lit(s":$i")))): _*).as("c"))
      .as[(Seq[Long], Seq[Long])].collect()
    prefixed.foreach { case (f, c) => assert(f == c) }
    // a BIGINT count above Int.MaxValue fails loudly (it used to clamp
    // silently to an Int.MaxValue-sized — i.e. OOM-sized — array)
    val e = intercept[Exception] {
      df.select(graft.functions.TextExpressions.prefixIndexHash56(
        lit("p:"), lit(Long.MaxValue))).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("Int.MaxValue") ||
        e.getCause != null && e.getCause.getMessage.contains("Int.MaxValue")))
  }

  test("softWeights: 1/cluster weights that sum to distinct contents") {
    val df = Seq(
      (1L, "same text"), (2L, "same text"),      // pair → 0.5 each
      (3L, "unique one"),                        // singleton → 1.0
      (4L, "tri"), (5L, "tri"), (6L, "tri"))     // triple → 1/3 each
      .toDF("doc_id", "text")
    val out = Dedup.softWeights(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.5), (2L, 2L, 0.5), (3L, 1L, 1.0),
      (4L, 3L, 0.333333), (5L, 3L, 0.333333), (6L, 3L, 0.333333)))
    // every input row survives; mass ≈ #distinct contents (6dp rounding)
    assert(out.size == 6)
    assert(math.abs(out.map(_._3).sum - 3.0) < 1e-5)
  }

  test("duplicateSpans: maximal shared token runs with exact positions") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val df = Seq(
      (1L, s"intro words here $shared tail one"),
      (2L, s"$shared completely different ending text"),
      (3L, "nothing shared with anyone at all here"),
      (4L, "alpha beta gamma"), // exactly one 3-gram, contained in 1+2
      (5L, "")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, String)].collect().toSeq
    // docs 1+2 share the 6-token run; doc 4's whole text is a 3-gram of
    // both → it participates too, and extends their runs' hit sets
    val expected1 = out.filter(_._1 == 1L)
    assert(expected1 == Seq((1L, 3, 6, shared)), s"got $out")
    val expected2 = out.filter(_._1 == 2L)
    assert(expected2 == Seq((2L, 0, 6, shared)))
    // doc 3 and the empty doc emit nothing
    assert(!out.exists(r => r._1 == 3L || r._1 == 5L))
    // the short doc is caught as contained verbatim
    assert(out.filter(_._1 == 4L) == Seq((4L, 0, 3, "alpha beta gamma")))

    // adjacent duplicated shingles merge into ONE maximal run, never
    // one row per shingle position
    assert(out.count(_._1 == 1L) == 1)

    // two disjoint shared runs in one doc stay two rows
    val df2 = Seq(
      (1L, "a b c X X X d e f"),
      (2L, "a b c Y Y Y d e f")).toDF("doc_id", "text")
    val out2 = Dedup.duplicateSpans(df2, "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out2 == Seq((1L, 0, 3, "a b c"), (1L, 6, 3, "d e f"),
      (2L, 0, 3, "a b c"), (2L, 6, 3, "d e f")))

    // tab/newline whitespace: span positions and text must come from
    // the SAME \s+ tokenizer the shingles use (a space-only split
    // would mislocate the slice)
    val dfWs = Seq(
      (1L, "x\ty\np q r s tail"),
      (2L, "p q r s other stuff here")).toDF("doc_id", "text")
    val outWs = Dedup.duplicateSpans(dfWs, "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(outWs == Seq((1L, 2, 4, "p q r s"), (2L, 0, 4, "p q r s")),
      s"got $outWs")
  }

  test("evalCandidatePairs: confusion counts, null-safe denominators") {
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 5L))
      .toDF("id_a", "id_b") // duplicate pair must count once
    val truth = Seq((1L, 2L), (4L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val out = Dedup.evalCandidatePairs(cand, truth)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out == Seq((3L, 4L, 2L,
      Some(BigDecimal(2.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble), Some(0.5))), s"got $out")
    // empty truth -> null recall, not 0/0 fabrication
    val empty = truth.filter(col("id_a") < 0)
    val out2 = Dedup.evalCandidatePairs(cand, empty)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(out2._1 == 0L && out2._4.isEmpty && out2._5.contains(0.0))
  }

  test("evalCandidatePairs composes with the LSH generator") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight"),
      (4L, "totally unrelated words again here now yes")
    ).toDF("doc_id", "text")
    val cand = Dedup.minhashLshCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val truth = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.3)
    val out = Dedup.evalCandidatePairs(cand, truth)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    // (1,2) share 5 of 7 distinct trigrams -> jaccard > 0.3; the LSH
    // bands must surface it
    assert(out._1 == 1L && out._3 == 1L && out._4.contains(1.0),
      s"got $out")
  }

  test("verifyEditDistance: banded Levenshtein confirms only within-bound pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"),  // dist 2
      (3L, "the quick brown fox jumps over the lazy cat og"), // small edits
      (4L, "completely different text with no overlap at all")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.verifyEditDistance(pairs, docs, "doc_id", "text", 6)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    // (1,2): "jumps"->"jumped" = 2 edits; (1,3): "dog"->"cat og" = 4
    // (substitute d->c, insert "at " before the retained "og")
    assert(out == Seq((1L, 2L, 2), (1L, 3L, 4)), s"got $out")
    // the far pair is dropped by the threshold, not scored
    assert(!out.exists(_._2 == 4L))
    // bound 1 drops everything
    assert(Dedup.verifyEditDistance(pairs, docs, "doc_id", "text", 1)
      .count() == 0)
    // composes with the LSH candidate generator
    val lsh = Dedup.minhashLshCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val viaLsh = Dedup.verifyEditDistance(lsh, docs, "doc_id", "text", 6)
      .as[(Long, Long, Int)].collect().toSeq
    assert(viaLsh.forall(r => r._3 <= 6))
  }

  test("connectedComponentsStar: O(log n) rounds where propagation needs diameter") {
    // one 120-node chain: diameter 119 — label propagation at its default
    // 20-round budget must refuse (split clusters would otherwise LOOK
    // valid), while the star form converges well inside 50
    val ids = (0L until 120L).toDF("id")
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, ids).count()
    }
    val star = Dedup.connectedComponentsStar(chain, ids)
      .as[(Long, Long)].collect().toSeq
    assert(star.forall(_._2 == 0L) && star.size == 120)
    // differential vs label propagation on a random-ish seeded graph
    // (shallow components, LP's home turf): identical labels
    val nodes = (0L until 80L).toDF("id")
    val edges = (0L until 120L).map { i =>
      val a = (i * 2654435761L) % 80
      val b = (i * 40503L + 7) % 80
      (a, b)
    }.filter(e => e._1 != e._2).toDF("id_a", "id_b")
    val viaLp = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toSeq.sorted
    val viaStar = Dedup.connectedComponentsStar(edges, nodes)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(viaLp == viaStar)
    // isolated nodes self-label; duplicate/self-loop edges tolerated
    val messy = Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponentsStar(messy,
      Seq(1L, 2L, 3L, 9L).toDF("id")).as[(Long, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 3L), (9L, 9L)))
  }

  test("jaroWinkler: bit-exact DuckDB convention on golden pairs") {
    import graft.functions.TextExpressions.jaroWinkler
    val pairs = Seq(
      ("martha", "marhta", 0.9611111111111111),   // classic transposition
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      // jaro = 2/3 <= 0.7: the 3-char common prefix must NOT boost
      ("abcdef", "abczzz", 0.6666666666666666),
      // window = max(2,2)/2 - 1 = 0, NOT clamped to 1: no matches at all
      ("ab", "ba", 0.0),
      ("goldenrod lace", "goldenrod lcae", 0.9857142857142858),
      ("same", "same", 1.0),
      ("", "", 0.0),                              // BOTH empty -> 0, not 1
      ("", "x", 0.0), ("x", "", 0.0),
      ("abc", "xyz", 0.0))
    val out = pairs.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", jaroWinkler(col("a"), col("b")))
      .as[(String, String, Double)].collect()
    out.zip(pairs).foreach { case ((a, b, got), (_, _, want)) =>
      assert(got == want, s"jw($a, $b): got $got want $want (bit-exact)")
    }
    // null propagation
    val n = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("fuzzyLinkage: blocked candidates only, threshold honored") {
    val df = Seq(
      (1L, "jonathan archer"), (2L, "jonathan archre"),   // near-dup
      (3L, "jonathan doe"),                               // same prefix, far
      (4L, "benjamin sisko"), (5L, "kathryn janeway"),
      (6L, null.asInstanceOf[String]), (7L, "")           // dropped inputs
    ).toDF("id", "nm")
    // ("jonathan archer", "jonathan doe") scores exactly 0.9 on the long
    // shared prefix — 0.95 keeps only the real transposition pair
    val out = Dedup.fuzzyLinkage(df, "id", "nm", 0.95, blockLen = 8)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L)))
    assert(out.head._3 == 0.9866666666666667) // DuckDB-pinned, bit-exact
    // pairs sharing NO prefix/suffix block never meet: lowering the
    // threshold cannot resurrect (4,5)
    val all = Dedup.fuzzyLinkage(df, "id", "nm", 0.01, blockLen = 8)
      .as[(Long, Long, Double)].collect()
    assert(!all.exists(r => r._1 == 4L && r._2 == 5L))
    // (1,3) share the 8-char prefix block -> candidate, scored, kept at 0.01
    assert(all.exists(r => r._1 == 1L && r._2 == 3L))
  }

  test("prefixFilterJoin: complete vs the naive all-pairs join, and it actually prunes") {
    // a corpus with one stopword-like token ("the") in EVERY doc: the
    // naive token join meets on it n^2 times; the prefix prune must
    // push it out of every prefix yet lose no qualifying pair
    val docs = (0L until 60L).map { i =>
      val fam = i % 3 // three near-dup families + per-doc salt
      (i, s"the alpha$fam beta$fam gamma$fam delta$fam salt$i")
    } ++ Seq(
      (100L, "the unique only tokens here"),
      (101L, "x"), // single-token doc: prefix p = 1 - ceil(t) + 1 = 1
      (102L, "x")) // its exact twin (jaccard 1.0 on one token)
    val df = docs.toDF("doc_id", "text")
    def naive(t: Double) = {
      val tk = df.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(
          col("text")))).as("tok"))
      val cnt = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
      tk.as("a").join(tk.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("common"))
        .join(cnt.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("n", "na"), "id_a")
        .join(cnt.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", round(col("common").cast("double") /
          (col("na") + col("nb") - col("common")), 6))
        .filter(col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    }
    for (t <- Seq(0.5, 0.6, 0.8, 1.0)) { // incl. t=1.0 (p = 1: rarest token only)
      val got = Dedup.prefixFilterJoin(df, "doc_id", "text", 1, t)
        .as[(Long, Long, Double)].collect().toSet
      val want = naive(t).as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"threshold $t diverged from the naive join")
      assert(t > 0.9 || got.nonEmpty, s"threshold $t: vacuous fixture")
    }
    // the single-token twins survive every threshold (jaccard = 1.0)
    val one = Dedup.prefixFilterJoin(df, "doc_id", "text", 1, 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(one.contains((101L, 102L, 1.0)))
    // the prune is REAL: at t=0.6 a 6-token doc keeps a 3-token prefix,
    // so the universal "the" (df=63, canonical order LAST in every doc)
    // never enters any prefix — candidate pairs stay near the family
    // structure instead of the 63-doc cross product
    val tk = df.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions.tokens(
        col("text")))).as("tok"))
    val dfreq = tk.groupBy("tok").agg(count(lit(1)).as("_df"))
    val prefix = tk.join(dfreq, "tok")
      .withColumn("_pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("_df"), col("tok"))))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(col("_pos") <= col("_n") - ceil(lit(0.6) * col("_n")) + 1)
    assert(prefix.filter(col("tok") === "the").count() == 0L,
      "the universal token must be pruned out of every prefix")
  }

  test("prefixFilterJoin property: ≡ the naive join for random corpora and thresholds") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random corpora over a SMALL vocabulary (overlaps are common, so
    // qualifying pairs exist at most thresholds) and random thresholds
    // incl. values wherever t·n lands near integers — the completeness
    // theorem must hold for EVERY (corpus, t), not just the fixtures
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu",
      "hen", "ibis", "jay", "kite", "lark")
    val docGen = for {
      k <- Gen.choose(1, 8)
      toks <- Gen.pick(k, vocab)
    } yield toks.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(4, 18)
      docs <- Gen.listOfN(n, docGen)
      tPct <- Gen.choose(5, 100) // t in (0.05, 1.0], steps hit t·n integers
    } yield (docs, tPct / 100.0)
    val prop = Prop.forAll(corpusGen) { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val tk = df.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(
          col("text")))).as("tok"))
      val cnt = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val naive = tk.as("a").join(tk.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("common"))
        .join(cnt.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("n", "na"), "id_a")
        .join(cnt.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", round(col("common").cast("double") /
          (col("na") + col("nb") - col("common")), 6))
        .filter(col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val got = Dedup.prefixFilterJoin(df, "doc_id", "text", 1, t)
        .as[(Long, Long, Double)].collect().toSet
      Prop(got == naive) :|
        s"t=$t n=${docs.size}: missing=${naive -- got} extra=${got -- naive}"
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("ngramContainment property: ≡ the naive collision join for random corpora and thresholds") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // r18: ngramContainment generates candidates via the small side's
    // prefix joined against the big side's full element set — the
    // asymmetric-containment completeness bound must reproduce the old
    // full-collision join EXACTLY for every (corpus, threshold),
    // including thresholds where t·n lands on integers
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu",
      "hen", "ibis", "jay", "kite", "lark")
    val docGen = for {
      k <- Gen.choose(1, 8)
      toks <- Gen.pick(k, vocab)
    } yield toks.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(4, 18)
      docs <- Gen.listOfN(n, docGen)
      tPct <- Gen.choose(5, 100)
    } yield (docs, tPct / 100.0)
    val prop = Prop.forAll(corpusGen) { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val tk = df.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(
          col("text")))).as("tok"))
      val cnt = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // the pre-r18 algorithm verbatim: every colliding pair, then the
      // size-ordered containment select
      val naive = tk.as("a").join(tk.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("common"))
        .join(cnt.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("n", "na"), "id_a")
        .join(cnt.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("n", "nb"), "id_b")
        .select(
          when(col("na") <= col("nb"), col("id_a")).otherwise(col("id_b"))
            .as("id_small"),
          when(col("na") <= col("nb"), col("id_b")).otherwise(col("id_a"))
            .as("id_big"),
          round(col("common").cast("double") / least(col("na"), col("nb")), 6)
            .as("containment"))
        .filter(col("containment") >= t)
        .as[(Long, Long, Double)].collect().toSet
      val got = Dedup.ngramContainment(df, "doc_id", "text", 1, t)
        .as[(Long, Long, Double)].collect().toSet
      Prop(got == naive) :|
        s"t=$t n=${docs.size}: missing=${naive -- got} extra=${got -- naive}"
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("ngramContainment: FP-overshoot boundary — t·n exactly integer, pair at containment = t") {
    // the prefixFilterJoin boundary fixture, transposed to containment:
    // SMALL doc with 100 distinct tokens, BIG doc sharing exactly 7 of
    // them (the globally-frequent ones, so canonical order puts them at
    // positions 94-100 of the small doc). containment = 7/100 = 0.07 =
    // t, and 0.07 × 100 overshoots to 7.000000000000001 in IEEE — the
    // unguarded ceil would shorten the small side's prefix to 93 and
    // lose the pair.
    val sTokens = (0 until 93).map(i => f"rare$i%03d") ++
      (0 until 7).map(i => f"common$i")
    val gTokens = (0 until 7).map(i => f"common$i") ++
      (0 until 110).map(i => f"big$i%03d")
    val fillers = (0 until 12).map { j =>
      (200L + j, (0 until 7).map(i => f"common$i").mkString(" ") + s" filler$j")
    }
    val df = (Seq(
      (1L, sTokens.mkString(" ")),
      (2L, gTokens.mkString(" "))) ++ fillers).toDF("doc_id", "text")
    val got = Dedup.ngramContainment(df, "doc_id", "text", 1, 0.07)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 0.07)),
      s"the boundary pair (containment exactly = t, t·n an exact " +
        s"integer) must survive the prefix prune; got $got")
  }

  test("prefixFilterJoin: FP-overshoot boundary — t·n exactly integer, pair at jaccard = t") {
    // ADVICE r16: 0.07 × 100 = 7.000000000000001 in IEEE doubles, so an
    // unguarded ceil(t·n) returns 8 and shortens the 100-token doc's
    // prefix to 93. Plant the tightest legal pair: A has 100 distinct
    // tokens, B exactly 7 of them (B ⊂ A), jaccard = 7/100 = 0.07 = t.
    // The 7 shared tokens are made globally FREQUENT (planted in many
    // other docs), so canonical order puts them at positions 94–100 of
    // A — the minimal shared token sits at position 94, inside the
    // correct prefix (p = 100 − 7 + 1 = 94) and OUTSIDE the buggy one.
    val aTokens = (0 until 93).map(i => f"rare$i%03d") ++
      (0 until 7).map(i => f"common$i")
    val bTokens = (0 until 7).map(i => f"common$i")
    // 12 filler docs raise the shared tokens' df far above the rares'
    val fillers = (0 until 12).map { j =>
      (200L + j, (0 until 7).map(i => f"common$i").mkString(" ") + s" filler$j")
    }
    val df = (Seq(
      (1L, aTokens.mkString(" ")),
      (2L, bTokens.mkString(" "))) ++ fillers).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(df, "doc_id", "text", 1, 0.07)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 0.07)),
      s"the boundary pair (jaccard exactly = t, t·n an exact integer) " +
        s"must survive the prefix prune; got $got")
  }
}
