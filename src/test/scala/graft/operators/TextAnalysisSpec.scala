package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "der hund ist nicht hier und der ball ist da"),
    (3L, ""),
    (4L, "le chat est dans la maison")).toDF("id", "text")

  test("token count handles empty and multi-space text") {
    val counts = Seq((1L, "a b  c"), (2L, ""), (3L, "  x  "))
      .toDF("id", "text")
      .select(TextFunctions.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(counts == Seq(3, 0, 1))
  }

  test("word shingles: n-grams, short docs collapse to one shingle") {
    val sh = spark.range(1).select(
      TextFunctions.wordShingles(lit("a b c d"), 3).as("s3"),
      TextFunctions.wordShingles(lit("a b"), 3).as("short"))
    val r = sh.head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq("a b"))
  }

  test("language id picks the marker-richest language") {
    val preds = TextAnalysis.languageId(docs, "id", "text")
      .orderBy("id").select("pred_lang").as[String].collect().toSeq
    assert(preds == Seq("en", "de", "und", "fr"))
  }

  test("quality features on empty text are zero, not null/NaN") {
    val q = TextAnalysis.quality(docs, "id", "text").filter(col("id") === 3)
      .select("n_tokens", "mean_token_len", "punct_ratio", "stopword_ratio")
      .as[(Int, Double, Double, Double)].head()
    assert(q == ((0, 0.0, 0.0, 0.0)))
  }

  test("fingerprint is order- and duplication-invariant") {
    val fps = Seq((1L, "b a c a"), (2L, "a b c"), (3L, "a b d"))
      .toDF("id", "text")
    val out = TextAnalysis.fingerprints(fps, "id", "text")
      .select("fingerprint").as[String].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("native marker-stats path matches the composed-HOF semantics") {
    // adversarial corpus: shared markers across languages ("que" is fr+es,
    // "est"/"une" fr, "es"/"en" es), whitespace runs, CJK, punctuation
    val tricky = Seq(
      (1L, "que est une belle maison que"),
      (2L, "el que es una casa en que por"),
      (3L, "  the   of.of, to; it:  "),
      (4L, "的 是 了 在 和"),
      (5L, "no markers here whatsoever"),
      (6L, "")).toDF("id", "text")
    // languageId vs the HOF argmax
    val native = TextAnalysis.languageId(tricky, "id", "text")
      .orderBy("id").select("pred_lang").as[String].collect().toSeq
    val hof = tricky.select(col("id"), TextFunctions.langId(col("text")).as("p"))
      .orderBy("id").select("p").as[String].collect().toSeq
    assert(native == hof)
    // quality vs independently composed HOF columns
    val t = col("text")
    val toks = TextFunctions.tokens(t)
    val expect = tricky.select(
      col("id"),
      length(t).as("n_chars"),
      size(toks).as("n_tokens"),
      when(size(toks) === 0, 0.0).otherwise(
        aggregate(transform(toks, tk => length(tk)), lit(0), (a, x) => a + x)
          .cast("double") / size(toks)).as("mean_token_len"),
      when(length(t) === 0, 0.0).otherwise(
        (length(t) - length(regexp_replace(t, "[.!?,;:]", "")))
          .cast("double") / length(t)).as("punct_ratio"),
      TextFunctions.stopwordRatio(t, TextAnalysis.qualityStopwords)
        .as("stopword_ratio"))
    val got = TextAnalysis.quality(tricky, "id", "text")
    assert(got.orderBy("id").collect().toSeq ==
      expect.orderBy("id").collect().toSeq)
  }

  test("pii scrub counts and redacts emails, urls, phones") {
    val out = TextAnalysis.piiScrub(Seq(
      (1L, "mail me at bob.smith+x@corp.example.org today"),
      (2L, "see https://a.b/c?d=e and http://plain.com now"),
      (3L, "call 555-123-4567 or 555-999-0000"),
      (4L, "nothing sensitive here")).toDF("id", "text"), "id", "text")
      .orderBy("id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out(0) == ((1L, 1, 0, 0, "mail me at <EMAIL> today")))
    assert(out(1) == ((2L, 0, 2, 0, "see <URL> and <URL> now")))
    assert(out(2) == ((3L, 0, 0, 2, "call <PHONE> or <PHONE>")))
    assert(out(3) == ((4L, 0, 0, 0, "nothing sensitive here")))
  }

  test("bpe tokens: ranked merges apply greedily per word") {
    import graft.functions.TextExpressions
    // classic toy vocab: rank 0 merges first even when a later merge
    // would produce fewer tokens
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    val r = spark.range(1).select(
      TextExpressions.bpeTokens(lit("low lower newest"), merges).as("t"),
      TextExpressions.bpeTokens(lit(""), merges).as("empty"))
      .head()
    assert(r.getSeq[String](0) ==
      Seq("low", "lower", "n", "e", "w", "e", "s", "t"))
    assert(r.getSeq[String](1) == Seq.empty)
    // merge of every occurrence in one step: "lolo" → [lo, lo]
    val rep = spark.range(1).select(
      TextExpressions.bpeTokens(lit("lolo"), Seq(("l", "o"))).as("t")).head()
    assert(rep.getSeq[String](0) == Seq("lo", "lo"))
  }

  test("repetition score: 1.0 for pure repeats, 1/m for diverse text") {
    val r = TextAnalysis.repetition(Seq(
      (1L, "spam spam spam spam"), // both 3-grams identical
      (2L, "a b c d e"),           // 3 distinct 3-grams
      (3L, "a b"),                 // shorter than n: one whole-doc shingle
      (4L, "")).toDF("id", "text"), "id", "text")
      .orderBy("id").select("repetition").as[Double].collect().toSeq
    assert(r == Seq(1.0, 1.0 / 3, 1.0, 1.0))
  }

  test("piece tokens split punctuation but not word runs") {
    val out = TextAnalysis.tokenCounts(
      Seq((1L, "hello, world! x9")).toDF("id", "text"), "id", "text")
      .select("ws_tokens", "piece_tokens").as[(Int, Int)].head()
    assert(out == ((3, 5))) // hello , world ! x9
  }

  test("term-freq stats: one-pass dl and per-term tf match the HOF form") {
    val df = Seq(
      (1L, "Merge the scan then merge  again"),
      (2L, ""),
      (3L, null: String)).toDF("id", "text")
    val terms = Seq("merge", "scan")
    val native = df.select(col("id"),
      graft.functions.TextExpressions.termFreqStats(col("text"), terms).as("_s"))
      .select(col("id"), col("_s.dl"),
        element_at(col("_s.tf"), 1), element_at(col("_s.tf"), 2))
      .as[(Long, Option[Int], Option[Int], Option[Int])].collect().toSeq.sortBy(_._1)
    // row 1: 6 tokens (double space dropped), merge×2 (case-folded), scan×1
    assert(native(0) == ((1L, Some(6), Some(2), Some(1))))
    assert(native(1) == ((2L, Some(0), Some(0), Some(0))))
    assert(native(2) == ((3L, None, None, None))) // null text → null struct
    // cross-check against the composed HOF pipeline on the non-null rows
    val toks = filter(split(lower(col("text")), " "), t => t =!= lit(""))
    val hof = df.filter(col("text").isNotNull).select(col("id"),
      size(toks), size(filter(toks, t => t === lit("merge"))),
      size(filter(toks, t => t === lit("scan"))))
      .as[(Long, Int, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(hof.map(r => (r._1, Some(r._2), Some(r._3), Some(r._4))) ==
      native.take(2))
  }

  test("typeTokenRatio and tokenEntropy score diversity correctly") {
    val df = Seq(
      (1L, "a a a a"),       // ttr 0.25, entropy 0
      (2L, "a b c d"),       // ttr 1.0, entropy ln(4)
      (3L, "a a b b"),       // ttr 0.5, entropy ln(2)
      (4L, "")               // empty: ttr 0, no entropy row
    ).toDF("doc_id", "text")
    val ttr = TextAnalysis.typeTokenRatio(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(ttr == Seq((1L, 4L, 1L, 0.25), (2L, 4L, 4L, 1.0),
      (3L, 4L, 2L, 0.5), (4L, 0L, 0L, 0.0)))
    val ent = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(ent.keySet == Set(1L, 2L, 3L)) // empty doc absent
    assert(ent(1L) == 0.0)
    assert(math.abs(ent(2L) - math.log(4)) < 1e-5)
    assert(math.abs(ent(3L) - math.log(2)) < 1e-5)
  }

  test("unigramCrossEntropy scores docs against the corpus distribution") {
    // corpus: 8 tokens total — a×4, b×2, c×1, d×1
    val df = Seq(
      (1L, "a a a a"),   // all common tokens → LOW ce = -ln(4/8)
      (2L, "b b"),       // ce = -ln(2/8)
      (3L, "c d"),       // all rare tokens → HIGH ce = -ln(1/8)
      (4L, "")           // empty: no row
    ).toDF("doc_id", "text")
    val ce = TextAnalysis.unigramCrossEntropy(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(ce.keySet == Set(1L, 2L, 3L))
    assert(math.abs(ce(1L) - math.log(2)) < 1e-5)       // -ln(1/2)
    assert(math.abs(ce(2L) - math.log(4)) < 1e-5)       // -ln(1/4)
    assert(math.abs(ce(3L) - math.log(8)) < 1e-5)       // -ln(1/8)
    // the quality ordering: common-vocabulary text below rare-token text
    assert(ce(1L) < ce(2L) && ce(2L) < ce(3L))
  }

  test("bigramCrossEntropy is sequence-aware where unigram CE is not") {
    // two docs over the SAME token multiset: one in the corpus-dominant
    // order ("the quick fox" pattern ×4), one shuffled. Unigram CE ties
    // them exactly; bigram CE must score the shuffled doc strictly higher.
    val df = Seq(
      (1L, "the quick fox the quick fox the quick fox the quick fox"),
      (2L, "fox the quick quick the fox the fox quick quick fox the"),
      (3L, "the quick fox runs")).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramCrossEntropy(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(uni(1L) == uni(2L))
    val bi = TextAnalysis.bigramCrossEntropy(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(bi(1L) < bi(2L), bi.toString)
    // hand check on a 2-token doc: corpus "a b" ×2 → doc (4L, "a b"):
    // pos1 unigram -ln(2/4); pos2 λ·(2/2) + (1-λ)·(2/4)
    val tiny = Seq((4L, "a b"), (5L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCrossEntropy(tiny, "doc_id", "text", 0.8)
      .as[(Long, Double)].collect().toMap
    val expect = (-math.log(0.5) - math.log(0.8 * 1.0 + 0.2 * 0.5)) / 2.0
    assert(math.abs(got(4L) - expect) < 1e-5, s"${got(4L)} vs $expect")
    // single-token doc: only the unigram-scored first position
    val one = Seq((6L, "solo"), (7L, "solo x")).toDF("doc_id", "text")
    val ce1 = TextAnalysis.bigramCrossEntropy(one, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(ce1(6L) - (-math.log(2.0 / 3.0))) < 1e-5)
  }

  test("learnBpeMerges: frequency order, tie-break, early stop, round trip") {
    // vocab: "ab"×3, "ac"×1 — pair (a,b) wins, then (a,c), then dry
    val df = Seq((1L, "ab ab ac"), (2L, "ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.learnBpeMerges(df, "text", nMerges = 5)
    assert(merges == Seq(("a", "b"), ("a", "c"))) // early stop at 2
    // tie on weight breaks by (a, b) ascending
    val tie = Seq((1L, "xy yx")).toDF("doc_id", "text")
    assert(TextAnalysis.learnBpeMerges(tie, "text", 1) == Seq(("x", "y")))
    // train → apply: the learned table drives the apply expression
    val toks = spark.range(1).select(
      graft.functions.TextExpressions.bpeTokens(lit("abac ab"), merges)
        .as("t")).as[Seq[String]].head()
    assert(toks == Seq("ab", "ac", "ab"), toks)
    // multi-round: "aaab"×2 — (a,a) wins round 1 (adjacent weight 4),
    // the greedy fold leaves [aa, a, b]; round 2 ties (aa,a) vs (a,b)
    // at weight 2 → (a,b) by ascending tie-break → [aa, ab]; round 3
    // merges (aa, ab) → fully collapsed, training runs dry
    val deep = Seq((1L, "aaab aaab")).toDF("doc_id", "text")
    val m2 = TextAnalysis.learnBpeMerges(deep, "text", 5)
    assert(m2 == Seq(("a", "a"), ("a", "b"), ("aa", "ab")), m2)
  }

  test("batched BPE training ≡ sequential, merge-for-merge") {
    // golden corpora spanning the divergence hazards: shared-left /
    // shared-right pairs (counts invariant — batch together), adjacency
    // chains (reduced counts — round must stop), MINTED pairs that
    // outrank old ones (the "the/then/there" shape: after (h,e),
    // sequential picks (t,he) — a batch that committed old-count picks
    // would diverge; the created-pair cap stops it), self-pairs, ties,
    // early stop
    val corpora = Seq(
      Seq((1L, "ab ab ac"), (2L, "ab")),
      Seq((1L, "the then there and an end"), (2L, "other other mother")),
      Seq((1L, "aaab aaab")),
      Seq((1L, "xy yx zz zz qr qr rs")),
      Seq((1L, "banana bandana ananas"), (2L, "cabana banana")),
      Seq((1L, "abc abc abc ab")))
    for (rows <- corpora; k <- Seq(2, 4, 8)) {
      val df = rows.toDF("doc_id", "text")
      val seqM = TextAnalysis.learnBpeMerges(df, "text", nMerges = 8)
      val batM = TextAnalysis.learnBpeMerges(df, "text", nMerges = 8,
        batchSize = k)
      assert(batM == seqM, s"batchSize=$k on ${rows.map(_._2)}")
    }
    // the payoff: a conflict-light vocabulary (distinct symbol pairs,
    // steep weights) trains in ~nMerges/batchSize Spark rounds
    val light = Seq((1L, Seq.fill(9)("ab").mkString(" ") + " " +
      Seq.fill(7)("cd").mkString(" ") + " " + Seq.fill(5)("ef").mkString(" ") +
      " " + Seq.fill(3)("gh").mkString(" ") + " ij")).toDF("doc_id", "text")
    val (mSeq, rSeq) =
      TextAnalysis.learnBpeMergesWithStats(light, "text", 4, 1)
    val (mBat, rBat) =
      TextAnalysis.learnBpeMergesWithStats(light, "text", 4, 4)
    assert(mBat == mSeq && mSeq.size == 4)
    assert(rSeq >= 4 && rBat <= 2, s"rounds: sequential $rSeq, batched $rBat")
  }

  test("memorizationRisk counts shingles shared with OTHER docs") {
    val df = Seq(
      (1L, "a b c d"),        // shingles: "a b c", "b c d"
      (2L, "a b c x"),        // shares "a b c" with doc 1
      (3L, "q r s t")         // shares nothing
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.memorizationRisk(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L) == ((2L, 1L, 0.5)))
    assert(rows(2L) == ((2L, 1L, 0.5)))
    assert(rows(3L) == ((2L, 0L, 0.0)))
  }

  test("sourceDivergence: KL zero for a corpus-typical source, positive for drift") {
    // s_bal mirrors the corpus mix; s_skew is all-z — diverges hard
    val df = Seq(
      (1L, "s_bal", "a b"), (2L, "s_bal", "a b"),
      (3L, "s_skew", "z z z z")
    ).toDF("doc_id", "source", "text")
    val kl = TextAnalysis.sourceDivergence(df, "source", "text")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(kl("s_bal")._1 == 4L && kl("s_skew")._1 == 4L)
    // corpus: a=2/8, b=2/8, z=4/8; s_bal: a=1/2,b=1/2 → KL = ln(2)
    assert(math.abs(kl("s_bal")._2 - math.log(2)) < 1e-5, kl.toString)
    // s_skew: z=1 → KL = ln(2) too (p_corpus(z)=1/2) — check positive
    assert(kl("s_skew")._2 > 0)
  }

  test("topNgrams ranks corpus-wide n-grams with doc counts and tie-break") {
    val df = Seq(
      (1L, "a b c a b c"),   // "a b c"×2, "b c a"×1, "c a b"×1
      (2L, "a b c d"),       // "a b c", "b c d"
      (3L, "x y")            // short doc → whole text as one shingle
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(df, "doc_id", "text", n = 3, k = 4)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got.head == ((1, "a b c", 3L, 2L))) // 3 total across 2 docs
    // counts of 1 tie → lexicographic n-gram order, ranks dense 1..k
    assert(got.map(_._1) == Seq(1, 2, 3, 4))
    assert(got.tail.map(_._2) == got.tail.map(_._2).sorted)
    assert(got.tail.forall(r => r._3 == 1L && r._4 == 1L))
    // uppercase input folds into the same n-gram
    val folded = TextAnalysis.topNgrams(
      Seq((1L, "A B c"), (2L, "a b C")).toDF("doc_id", "text"), "doc_id", "text", 3, 1)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(folded == Seq((1, "a b c", 2L, 2L)))
  }

  test("domainCounts: lowercased hosts, ports/paths stripped, docs vs mentions") {
    val df = Seq(
      (1L, "see https://A.Example.com/x and https://a.example.com/y plus http://b.org:8080/z"),
      (2L, "only https://b.org/path here"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val got = TextAnalysis.domainCounts(df, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    // doc 1 mentions a.example.com twice (case-folded) and b.org once
    // (port stripped); doc 2 mentions b.org once; doc 3 contributes nothing
    assert(got == Set(("a.example.com", 1L, 2L), ("b.org", 2L, 2L)), got)
  }

  test("blocklistScreen: Aho-Corasick substring matching, pattern order") {
    val pats = Seq("ab", "b", "bc", "zzq", "word scan")
    val df = Seq(
      (1L, "xabcx"),                 // overlapping: ab, b, bc all hit
      (2L, "plain B here"),          // case-insensitive single hit
      (3L, "clean text"),            // nothing
      (4L, "a word scan appears"),   // multi-word pattern (substring)
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistScreen(df, "doc_id", "text", pats)
      .orderBy("doc_id")
      .as[(Long, Int, String, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 3, "ab,b,bc", true),
      (2L, 1, "b", true),
      (3L, 0, "", false),
      (4L, 1, "word scan", true),
      (5L, 0, "", false)), out)

    // randomized cross-check vs naive contains over one batched frame
    val r = new scala.util.Random(7)
    def s(n: Int) = Seq.fill(n)(('a' + r.nextInt(3)).toChar).mkString
    val rpats = Seq.fill(12)(s(1 + r.nextInt(4))).distinct
    val texts = (0 until 100).map(i => i.toLong -> s(r.nextInt(30)))
    val got = TextAnalysis.blocklistScreen(
        texts.toDF("doc_id", "text"), "doc_id", "text", rpats)
      .as[(Long, Int, String, Boolean)].collect()
      .map(r0 => r0._1 -> r0._3).toMap
    texts.foreach { case (id, t) =>
      val want = rpats.filter(t.contains).mkString(",")
      assert(got(id) == want, s"text '$t': got ${got(id)}, want $want")
    }
  }

  test("normalizeText: NFC composition, simple case fold, space collapse") {
    val out = TextAnalysis.normalizeText(Seq(
        (1L, "Café"),            // decomposed -> composed+folded
        (2L, "  a \t\n b  "),          // runs collapse, ends trim
        (3L, "ΣΙΣ"),    // ΣΙΣ: SIMPLE fold — trailing σ,
                                       // never the contextual final ς
        (4L, null.asInstanceOf[String]),
        (5L, "𝐀 b"))        // non-BMP (𝐀) survives intact
        .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(out(0)._2 == "café" && out(0)._4 == 4, out(0))
    assert(out(1)._2 == "a b", out(1))
    assert(out(2)._2 == "σισ", out(2))
    assert(out(3) == ((4L, "", 0, 0)), out(3))
    assert(out(4)._2 == "𝐀 b", out(4)) // 𝐀 has no lowercase
    // idempotent: normalizing the output is a no-op
    val again = TextAnalysis.normalizeText(
        out.map(r => (r._1, r._2)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect().toSeq
    assert(again.map(_._2) == out.map(_._2))
  }

  test("zipfFit: an exact 1/rank corpus fits slope -1 with r2 = 1") {
    // term k appears floor(720/k) times for k=1..6: 720 360 240 180
    // 144 120 — exactly c = 720/rank, so ln c = ln 720 - 1·ln rank
    val text = (1 to 6).flatMap(k => Seq.fill(720 / k)(s"t$k"))
      .mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(Tuple1(text)).toDF("text"), "text")
      .as[(Long, Double, Double, Double)].collect().head
    assert(out._1 == 6L)
    assert(math.abs(out._2 - (-1.0)) < 1e-6, s"slope ${out._2}")
    assert(math.abs(out._3 - math.log(720.0)) < 1e-6,
      s"intercept ${out._3}")
    assert(out._4 > 0.999999, s"r2 ${out._4}")
  }

  test("zipfFit: uniform frequencies have slope ~0") {
    val text = (1 to 8).flatMap(k => Seq.fill(5)(s"u$k")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(Tuple1(text)).toDF("text"), "text")
      .as[(Long, Double, Double, Double)].collect().head
    assert(out._2 == 0.0 && out._4 == 0.0, s"got $out")
  }
}
