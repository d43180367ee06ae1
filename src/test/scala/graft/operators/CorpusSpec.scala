package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a quick brown fox appears"),  // shares "quick brown fox"
      (2L, "totally unrelated content here"),
      (3L, "the quick brown fox jumps")   // verbatim copy: many shared
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, bench, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.map(_._3) == Seq(true, false, true))
    assert(out(0)._2 == 1) // exactly "quick brown fox"
    assert(out(2)._2 == 3) // all three shingles of the 5-word doc
  }

  test("decontaminate broadcasts the benchmark side") {
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val train = Seq((2L, "a b c d")).toDF("doc_id", "text")
    val plan = Corpus.decontaminate(train, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark probe should be a broadcast join:\n$plan")
  }

  test("global cumulative sum matches the window reference") {
    val df = spark.range(1000).select(
      col("id"), (pmod(col("id") * 37 + 11, lit(50)) + 1).as("w"))
    val got = Corpus.withGlobalCumSum(df, col("id"), col("w"), "cum")
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    val expect = df.select(col("id"),
        coalesce(sum("w").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("cum"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("binTexts concatenates each bin's docs in id order") {
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j")).toDF("doc_id", "text")
    // token counts 3,2,4,1; starts 0,3,5,9; budget 5 → bins 0,0,1,1
    val out = Corpus.binTexts(docs, "doc_id", "text", 5L)
      .orderBy("bin_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((0L, 2L, 5L, "a b c d e"), (1L, 2L, 5L, "f g h i j")))
  }

  test("deterministic sample is reproducible and permille-bounded") {
    val df = spark.range(2000).toDF("id")
    val a = Corpus.deterministicSample(df, "id", 200).as[Long].collect().toSet
    val b = Corpus.deterministicSample(df, "id", 200).as[Long].collect().toSet
    assert(a == b) // same keep-set every run
    assert(math.abs(a.size - 400) < 80, s"~20% expected, got ${a.size}/2000")
    // monotone: a larger rate keeps a superset
    val c = Corpus.deterministicSample(df, "id", 500).as[Long].collect().toSet
    assert(a.subsetOf(c))
    assert(Corpus.deterministicSample(df, "id", 0).count() == 0)
    assert(Corpus.deterministicSample(df, "id", 1000).count() == 2000)
  }

  test("capPerStratum keeps a deterministic hash prefix per stratum") {
    val df = spark.range(100).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("src"))
    val capped = Corpus.capPerStratum(df, "id", "src", 5)
    assert(capped.groupBy("src").count().select("count")
      .as[Long].collect().forall(_ == 5))
    // deterministic: identical keep-set on re-run
    val a = capped.select("id").as[Long].collect().toSet
    val b = Corpus.capPerStratum(df, "id", "src", 5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // prefix property: cap 3 keeps a subset of cap 5
    val c = Corpus.capPerStratum(df, "id", "src", 3)
      .select("id").as[Long].collect().toSet
    assert(c.subsetOf(a) && c.size == 12)
    // cap above stratum size keeps everything
    assert(Corpus.capPerStratum(df, "id", "src", 1000).count() == 100)
  }

  test("diff classifies added/removed/changed/unchanged by content hash") {
    val before = Seq((1L, "same"), (2L, "old text"), (3L, "going away"))
      .toDF("doc_id", "text")
    val after = Seq((1L, "same"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = Corpus.diff(before, after, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    // null text is CONTENT, not absence: a null-text row present on one
    // side still counts as present there (md5(null) must not read as
    // "missing"), and null vs null compares unchanged
    val nb = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val na = Seq((2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ngot = Corpus.diff(nb, na, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(ngot == Seq((1L, "removed"), (2L, "changed"), (3L, "unchanged")))
    // text never reaches the join: both sides project to (id, hash)
    val plan = Corpus.diff(before, after, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("text#") ||
      plan.indexOf("Join") < 0 ||
      !plan.substring(plan.indexOf("Join")).contains("text#"), plan)
  }

  test("hashSplit assigns stable, disjoint, roughly-proportional splits") {
    val df = spark.range(2000).toDF("id")
    val splits = Corpus.hashSplit(df, "id", valPermille = 100, testPermille = 100)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(splits.size == 2000)
    val byLabel = splits.groupBy(_._2).view.mapValues(_.size).toMap
    // 10%/10%/80% ± sampling noise on 2000 uniform hashes
    assert(byLabel("test") > 120 && byLabel("test") < 280, byLabel.toString)
    assert(byLabel("val") > 120 && byLabel("val") < 280, byLabel.toString)
    assert(byLabel("train") > 1450, byLabel.toString)
    // STABILITY: an id's split is a pure function of the id — unchanged
    // when the rest of the corpus grows (the property row-number lacks)
    val grown = Corpus.hashSplit(spark.range(4000).toDF("id"),
      "id", 100, 100).select("id", "split").as[(Long, String)].collect().toMap
    assert(splits.forall { case (id, s) => grown(id) == s })
  }

  test("leakageSafeSplit keeps token-set duplicates in one split") {
    // 600 base docs + a shuffled-token copy and a repeated-token copy of
    // each: same distinct token set → same fingerprint → same split
    val base = spark.range(600).select(col("id"),
      concat_ws(" ", lit("tok"), col("id").cast("string"),
        lit("alpha beta gamma")).as("text"))
    val dups = base.select(col("id") + 10000,
        concat_ws(" ", lit("beta gamma alpha alpha"), lit("tok"),
          col("id").cast("string")).as("text"))
      .toDF("id", "text")
    val out = Corpus.leakageSafeSplit(base.unionByName(dups), "text", 100, 100)
    // every fingerprint maps to exactly one split — no group straddles
    assert(out.groupBy("fingerprint")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count() == 0)
    // and the pairing is real: each base doc shares a fingerprint with its copy
    val perFp = out.groupBy("fingerprint").count()
      .filter(col("count") =!= 2).count()
    assert(perFp == 0)
    // proportions still hold at the GROUP level (600 uniform group hashes)
    val byLabel = out.select("fingerprint", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel("test") > 30 && byLabel("test") < 95, byLabel.toString)
    assert(byLabel("val") > 30 && byLabel("val") < 95, byLabel.toString)
  }

  test("weightedSample: weight-proportional, nested in k, loud on bad weights") {
    val df = spark.range(2000).select(col("id"),
      // ids < 200 get weight 50, the rest weight 1
      when(col("id") < 200, 50.0).otherwise(1.0).as("w"))
    val kept = Corpus.weightedSample(df, "id", col("w"), 200)
      .select("id").as[Long].collect().toSet
    assert(kept.size == 200)
    // heavy ids are 10% of rows and 84% of total weight — they must
    // dominate the sample (statistically ≫ the 20 a uniform draw gives)
    val heavy = kept.count(_ < 200)
    assert(heavy > 100, s"heavy=$heavy")
    // NESTED in k: top-100 is a prefix of top-200
    val small = Corpus.weightedSample(df, "id", col("w"), 100)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(kept) && small.size == 100)
    // raising ONE doc's weight can only improve its priority: a doc
    // absent at weight 1 everywhere present when its weight is huge
    val boosted = Corpus.weightedSample(
      df.withColumn("w", when(col("id") === 1999, 1e6).otherwise(col("w"))),
      "id", col("w"), 200).select("id").as[Long].collect().toSet
    assert(boosted.contains(1999L))
    // non-positive weight fails loudly, not silently skewing the draw
    val e = intercept[Exception] {
      Corpus.weightedSample(
        df.withColumn("w", when(col("id") === 7, 0.0).otherwise(col("w"))),
        "id", col("w"), 10).collect()
    }
    assert(e.getMessage.contains("non-positive weight") ||
      e.getCause != null)
  }

  test("quotaSample keeps exact per-stratum counts, nested across quotas") {
    val df = spark.range(4000).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("src"))
    val kept = Corpus.quotaSample(df, "id", "src",
      Map("s0" -> 17, "s1" -> 2000), defaultQuota = 40)
    val counts = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("s0") == 17)
    assert(counts("s1") == 1000)   // quota above stratum size: kept whole
    assert(counts("s2") == 40 && counts("s3") == 40)
    // NESTED: the 10-quota set is a subset of the 17-quota set
    val small = Corpus.quotaSample(df, "id", "src", Map("s0" -> 10), 0)
      .select("id").as[Long].collect().toSet
    val big = kept.filter(col("src") === "s0")
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big) && small.size == 10)
  }

  test("mixtureSample applies per-stratum rates with nested keep-sets") {
    val df = spark.range(4000).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("src"))
    val kept = Corpus.mixtureSample(df, "id", "src",
      Map("s0" -> 1000, "s1" -> 500), defaultPermille = 0)
    val counts = kept.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(counts("s0") == 1000)                 // full stratum kept
    assert(counts("s1") > 380 && counts("s1") < 620, counts.toString)
    assert(!counts.contains("s2") && !counts.contains("s3")) // rate 0
    // NESTED across rates: the 250-permille set ⊂ the 500-permille set
    val half = Corpus.mixtureSample(df, "id", "src",
      Map("s1" -> 500), 0).select("id").as[Long].collect().toSet
    val quarter = Corpus.mixtureSample(df, "id", "src",
      Map("s1" -> 250), 0).select("id").as[Long].collect().toSet
    assert(quarter.subsetOf(half))
  }

  test("temperatureSample flattens the source distribution at alpha < 1") {
    // skewed corpus: s0 has 3600 docs, s1 has 400
    val df = spark.range(4000).select(col("id"),
      when(col("id") < 3600, "s0").otherwise("s1").as("src"))

    // alpha = 1 is proportional: both strata keep ~ the target fraction
    val prop = Corpus.temperatureSample(df, "id", "src", 1.0, 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(prop("s0") / 3600.0 - 0.5) < 0.06, prop.toString)
    assert(math.abs(prop("s1") / 400.0 - 0.5) < 0.1, prop.toString)

    // alpha = 0.5 flattens: the small stratum's keep RATE must exceed
    // the large stratum's (w_s ∝ √n_s ⇒ rate ∝ 1/√n_s)
    val flat = Corpus.temperatureSample(df, "id", "src", 0.5, 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val (r0, r1) = (flat("s0") / 3600.0, flat("s1") / 400.0)
    assert(r1 > r0 * 2, s"expected flattening, got r0=$r0 r1=$r1")

    // alpha = 0: per-source-uniform allocation caps at whole strata
    // (2000-doc target split 1000/1000; s1 has only 400 → keeps all)
    val unif = Corpus.temperatureSample(df, "id", "src", 0.0, 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(unif("s1") == 400, unif.toString)

    // the keep-set nests across target fractions (same md5-56 order)
    val small = Corpus.temperatureSample(df, "id", "src", 0.5, 0.25)
      .select("id").as[Long].collect().toSet
    val big = Corpus.temperatureSample(df, "id", "src", 0.5, 0.5)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("groupPercentRank matches the window form, group-locally, no Window") {
    // groups of size 5, 1 (percent_rank = 0.0), and 2; interleaved input
    val df = Seq(
      ("a", 10L, 1L), ("b", 5L, 2L), ("a", 20L, 3L), ("c", 7L, 4L),
      ("a", 15L, 5L), ("a", 10L, 6L), ("c", 3L, 7L), ("a", 1L, 8L)
    ).toDF("g", "score", "id")
    val got = Corpus.groupPercentRank(df, "g",
        struct(col("score"), col("id")), "pr")
      .select("g", "id", "pr").as[(String, Long, Double)]
      .collect().toSet
    val want = df.select(col("g"), col("id"),
        org.apache.spark.sql.functions.percent_rank().over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")
            .orderBy("score", "id")).as("pr"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
    // the plan is RDD-two-phase by construction: no WindowExec anywhere
    assert(!Corpus.groupPercentRank(df, "g", struct(col("score"), col("id")),
      "pr").queryExecution.executedPlan.toString.contains("Window"))
    // single-row group convention
    assert(got.exists { case (g, id, pr) => g == "b" && pr == 0.0 })
  }

  test("capTokensPerStratum keeps a budget-bounded hash-ordered prefix") {
    val df = spark.range(200).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(2))).as("src"),
      // 5 tokens per doc
      lit("t1 t2 t3 t4 t5").as("text"))
    val out = Corpus.capTokensPerStratum(df, "id", "src", "text", 23L)
      .select("id", "src", "n_tokens", "tokens_before")
      .as[(Long, String, Long, Long)].collect().toSeq
    // every kept row STARTS inside the budget; overshoot ≤ one doc
    assert(out.forall(_._4 < 23L))
    // 5-token docs, budget 23 → starts 0,5,10,15,20 → exactly 5 per stratum
    assert(out.groupBy(_._2).view.mapValues(_.size).toMap ==
      Map("s0" -> 5, "s1" -> 5))
    // deterministic: same keep-set on re-run; smaller budget is a prefix
    val again = Corpus.capTokensPerStratum(df, "id", "src", "text", 23L)
      .select("id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
    val smaller = Corpus.capTokensPerStratum(df, "id", "src", "text", 11L)
      .select("id").as[Long].collect().toSet
    assert(smaller.subsetOf(again) && smaller.size == 6)
    // a stratum whose FIRST doc exceeds the budget still emits that doc
    val tiny = Corpus.capTokensPerStratum(df, "id", "src", "text", 2L)
    assert(tiny.groupBy("src").count().select("count")
      .as[Long].collect().forall(_ == 1))
  }

  test("packSequences: bin is the bin the doc's start offset falls in") {
    // token counts: 3, 4, 2, 5, 1 — budget 6
    // starts:       0, 3, 7, 9, 14 → bins 0, 0, 1, 1, 2
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b"),
      (4L, "a b c d e"), (5L, "a")).toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, "doc_id", "text", 6L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L),
      (4L, 5L, 1L), (5L, 1L, 2L)))
  }

  test("globalPercentRank matches percent_rank over the tiebroken order, no Window") {
    val df = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 10L), (5L, 40L))
      .toDF("id", "score")
    val ranked = Corpus.globalPercentRank(df,
      struct(col("score"), col("id")), "pr")
    val got = ranked.select("id", "pr").as[(Long, Double)].collect().toMap
    // order (score, id): 2,4,3,1,5 → ranks 0..4 over n-1=4
    assert(got == Map(2L -> 0.0, 4L -> 0.25, 3L -> 0.5, 1L -> 0.75, 5L -> 1.0),
      got.toString)
    // the scale contract: no window operator anywhere in the plan — the
    // rank comes from the two-phase range-partitioned prefix sum
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
    // single row: percent_rank convention 0.0 (collect, not head — a
    // take on an unverified numbered result is forbidden by the
    // verifiedEnd abandonment guard; see BatchingSpec's limit test)
    val one = Corpus.globalPercentRank(Seq((9L, 5L)).toDF("id", "score"),
      struct(col("score"), col("id")), "pr")
      .select("pr").as[Double].collect()
    assert(one.toSeq == Seq(0.0))
  }

  test("sourceOverlap: shared fingerprints and Jaccard per source pair") {
    // fp1 in A and B; fp2 in A only; fp3 in B and C; duplicates of the
    // same (fp, source) collapse before the join
    val df = Seq(
      ("fp1", "A"), ("fp1", "A"), ("fp1", "B"),
      ("fp2", "A"),
      ("fp3", "B"), ("fp3", "C")).toDF("fingerprint", "source")
    val got = Corpus.sourceOverlap(df, "source", "fingerprint")
      .select("source_a", "source_b", "n_shared", "n_a", "n_b", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("A", "B", 1L, 2L, 2L, 0.333333), // 1/3 at the 6dp contract
      ("B", "C", 1L, 2L, 1L, 0.5)), got)
  }

  test("maskTokens: a null id leaves the document unmasked, not nulled") {
    // pre-fusion semantics: the null-id hash comparison was false per
    // token; the fused hash array nulls wholesale, so the coalesce
    // fallback must keep the tokens
    val out = Corpus.maskTokens(
        Seq((Some(1L), "a b c"), (None, "keep all of this"))
          .toDF("doc_id", "text"),
        "doc_id", "text", permille = 1000)
      .orderBy(col("doc_id").asc_nulls_last)
      .as[(Option[Long], Int, Int, String)].collect().toSeq
    assert(out(0)._4 == "<mask> <mask> <mask>")
    assert(out(1) == ((None, 4, 0, "keep all of this")), out)
  }

  test("maskTokens: deterministic md5-56 per-position masking") {
    val df = Seq((7L, "alpha beta gamma delta epsilon zeta eta theta"),
      (8L, "one  two"), (9L, "")).toDF("doc_id", "text")
    val out = Corpus.maskTokens(df, "doc_id", "text", permille = 300)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    // determinism: a second run is bit-identical
    val out2 = Corpus.maskTokens(df, "doc_id", "text", permille = 300)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out == out2)
    // shape: token counts survive, mask count matches the text
    out.foreach { case (_, nTok, nMask, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      assert(toks.length == nTok)
      assert(toks.count(_ == "<mask>") == nMask)
    }
    // double-space text tokenizes to 2; empty text to 0 masked/tokens
    assert(out.find(_._1 == 8L).get._2 == 2)
    assert(out.find(_._1 == 9L).get._2 == 0)
    // permille=0 masks nothing; permille=1000 masks everything
    val none = Corpus.maskTokens(df, "doc_id", "text", 0)
      .agg(sum("n_masked")).head().getLong(0)
    assert(none == 0L)
    val all = Corpus.maskTokens(df.filter(col("doc_id") === 7L),
        "doc_id", "text", 1000)
      .select("n_tokens", "n_masked").head()
    assert(all.getInt(0) == all.getInt(1))
  }

  test("decontaminateEmbeddings: max-cosine flag vs a broadcast eval set") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f)),   // exactly an eval vector → 1.0
      (2L, Array(0.0f, 1.0f)),   // orthogonal to [1,0], aligned to [0,1]
      (3L, Array(-1.0f, 0.0f)),  // anti-aligned → max is 0.0 vs [0,1]
      (4L, null.asInstanceOf[Array[Float]])) // null vector: excluded
      .toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Array(1.0f, 0.0f)), (101L, Array(0.0f, 1.0f)),
      (102L, null.asInstanceOf[Array[Float]])) // null eval: excluded
      .toDF("vec_id", "embedding")
    val out = Corpus.decontaminateEmbeddings(train, eval,
        "vec_id", "embedding", threshold = 0.9)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1.0, true), (2L, 1.0, true), (3L, 0.0, false)))
    // the eval side is broadcast — no shuffle of the training corpus
    val plan = Corpus.decontaminateEmbeddings(train, eval,
        "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("reweightMixture: exponentiated-gradient step toward high loss") {
    val base = Seq(("a", 0.5, 1.0), ("b", 0.3, 2.0), ("c", 0.2, 0.5))
      .toDF("source", "weight", "loss")
    val out = Corpus.reweightMixture(base, "source", "weight", "loss",
        eta = 1.0)
      .orderBy("source").as[(String, Double, Double, Double)]
      .collect().toSeq
    val w = out.map(r => r._1 -> r._4).toMap
    // normalized to 1 (up to 6dp rounding)
    assert(math.abs(w.values.sum - 1.0) < 1e-5, w)
    // the high-loss source gains mass, the low-loss source loses it
    assert(w("b") > 0.3 && w("c") < 0.2, w)
    // uniform losses leave weights unchanged (up to rounding)
    val same = Corpus.reweightMixture(
        Seq(("a", 0.6, 1.0), ("b", 0.4, 1.0)).toDF("source", "weight", "loss"),
        "source", "weight", "loss", 1.0)
      .orderBy("source").as[(String, Double, Double, Double)].collect()
    assert(math.abs(same(0)._4 - 0.6) < 1e-5 &&
      math.abs(same(1)._4 - 0.4) < 1e-5)
    intercept[IllegalArgumentException] {
      Corpus.reweightMixture(base, "source", "weight", "loss", 0.0)
    }
    // degenerate normalizer fails loudly instead of emitting NaN: every
    // scaled term below the 6dp precision floor rounds to 0
    val tiny = Seq(("a", 1e-9, 1.0), ("b", 2e-9, 1.0))
      .toDF("source", "weight", "loss")
    val e = intercept[Exception] {
      Corpus.reweightMixture(tiny, "source", "weight", "loss", 1.0).collect()
    }
    assert(e.getMessage.contains("normalizer is zero"), e.getMessage)
  }

  test("maskTokens/maskSpans: null text behaves as empty (oracle convention)") {
    // the DuckDB oracles coalesce to ''/'<extra_id_0>'; the operators
    // must match, not emit NULL masked_text/targets_text
    val df = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val mt = Corpus.maskTokens(df, "doc_id", "text", 1000)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect()
    assert(mt(1) == ((2L, 0, 0, "")), mt.toSeq)
    val ms = Corpus.maskSpans(df, "doc_id", "text", 1000)
      .orderBy("doc_id").as[(Long, Int, Int, String, String)].collect()
    assert(ms(1) == ((2L, 0, 0, "", "<extra_id_0>")), ms.toSeq)
  }

  test("maskSpans: T5 span corruption is reproducible and round-trips") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m"),
      (2L, "one two three"),
      (3L, ""),
      (4L, "  double  spaced  tokens  ")).toDF("doc_id", "text")
    def run() = Corpus.maskSpans(docs, "doc_id", "text",
        permille = 400, stride = 4, maxSpan = 3)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String, String)].collect().toSeq
    val out = run()
    assert(out == run()) // deterministic

    val sentinelRe = "<extra_id_(\\d+)>".r
    for (((id, n, nSpans, masked, targets), orig) <- out.zip(Seq(
        "a b c d e f g h i j k l m", "one two three", "",
        "double spaced tokens"))) {
      val origToks = orig.split(" ").filter(_.nonEmpty)
      assert(n == origToks.length, s"doc $id token count")
      // masked text carries each span sentinel exactly once, in order
      val maskedSents = sentinelRe.findAllMatchIn(masked)
        .map(_.group(1).toInt).toSeq
      assert(maskedSents == (0 until nSpans), s"doc $id sentinels: $masked")
      // targets: every span's sentinel + a closing one
      val targetSents = sentinelRe.findAllMatchIn(targets)
        .map(_.group(1).toInt).toSeq
      assert(targetSents == (0 to nSpans), s"doc $id targets: $targets")
      // ROUND-TRIP: substituting each sentinel's span back into the
      // masked text reproduces the original token stream exactly
      val spanToks: Map[Int, Seq[String]] = {
        val parts = sentinelRe.split(targets).toSeq // text between sentinels
        val ks = targetSents
        ks.dropRight(1).zip(parts.drop(1))
          .map { case (k, seg) =>
            k -> seg.trim.split(" ").filter(_.nonEmpty).toSeq }.toMap
      }
      val rebuilt = masked.split(" ").filter(_.nonEmpty).flatMap { t =>
        t match {
          case sentinelRe(k) => spanToks(k.toInt)
          case other => Seq(other)
        }
      }.toSeq
      assert(rebuilt == origToks.toSeq, s"doc $id round-trip failed:" +
        s"\n  masked:  $masked\n  targets: $targets")
    }
    // empty doc: no spans, empty masked text, lone closing sentinel
    assert(out(2) == ((3L, 0, 0, "", "<extra_id_0>")))

    // permille extremes: 0 → untouched; 1000 → every segment fires
    val zero = Corpus.maskSpans(docs.filter(col("doc_id") === 1), "doc_id",
        "text", permille = 0).head()
    assert(zero.getInt(2) == 0 &&
      zero.getString(3) == "a b c d e f g h i j k l m" &&
      zero.getString(4) == "<extra_id_0>")
    val all = Corpus.maskSpans(docs.filter(col("doc_id") === 1), "doc_id",
        "text", permille = 1000, stride = 4, maxSpan = 3).head()
    assert(all.getInt(2) == (13 + 3) / 4) // ceil(13/4) = 4 segments
  }

  test("decontaminateEmbeddings: empty eval side means clean, not vanished") {
    // "nothing to check" must read as contaminated=false per row, not as
    // zero rows (which looks like the whole training set disappearing)
    val train = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    for (eval <- Seq(
        Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
        Seq((100L, null.asInstanceOf[Array[Float]]))
          .toDF("vec_id", "embedding"))) {
      val out = Corpus.decontaminateEmbeddings(train, eval,
          "vec_id", "embedding", threshold = 0.9)
        .orderBy("vec_id")
        .select(col("vec_id"), col("max_cosine").isNull.as("nc"),
          col("contaminated"))
        .as[(Long, Boolean, Boolean)].collect().toSeq
      assert(out == Seq((1L, true, false), (2L, true, false)))
    }
  }

  test("dsirWeights: target-like docs outscore off-domain docs") {
    val df = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "alpha beta gamma delta", "raw"),      // shares target n-grams
      (3L, "zulu yankee xray whiskey", "raw"),    // disjoint from target
      (4L, "alpha beta alpha beta", "raw")        // mostly target n-grams
    ).toDF("doc_id", "text", "source")
    val out = Corpus.dsirWeights(df, "doc_id", "text",
        col("source") === "tgt", buckets = 64)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // target doc excluded; raw docs all present
    assert(out.map(_._1) == Seq(2L, 3L, 4L))
    val w = out.map(o => o._1 -> o._3).toMap
    assert(w(4L) > w(3L), s"target-heavy doc must outscore disjoint: $w")
    assert(w(2L) > w(3L), s"overlapping doc must outscore disjoint: $w")
    // n_features = unigrams + bigrams
    assert(out.find(_._1 == 2L).get._2 == 4 + 3)
    // deterministic across runs
    val again = Corpus.dsirWeights(df, "doc_id", "text",
        col("source") === "tgt", buckets = 64)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(again == out)
  }

  test("dsirWeights: ratio table rides a broadcast, no cartesian blowup") {
    val df = Seq((1L, "a b c", "t"), (2L, "a c d", "r"))
      .toDF("doc_id", "text", "source")
    val plan = Corpus.dsirWeights(df, "doc_id", "text",
        col("source") === "t", buckets = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"log-ratio join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("paddingWaste: hand-computed buckets, zero-token docs excluded") {
    // lengths 3, 64, 65; "" excluded
    // global_max: 3 * 65 = 195; pow2: 4 + 64 + 128 = 196;
    // mult64: 64 + 64 + 128 = 256; real = 132
    val docs = Seq("a b c", Seq.fill(64)("t").mkString(" "),
      Seq.fill(65)("t").mkString(" "), "").map(Tuple1(_)).toDF("text")
    val out = Corpus.paddingWaste(docs, "text")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    def w(p: Long) = BigDecimal((p - 132.0) / p).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      ("global_max", 3L, 132L, 195L, w(195)),
      ("mult64", 3L, 132L, 256L, w(256)),
      ("pow2", 3L, 132L, 196L, w(196))), s"got $out")
  }

  test("contaminationFraction: fraction and severity per doc") {
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // doc 1: trigrams {a b c, b c d, c d e} all benchmarked -> 3/3 heavy
    // doc 2: {a b c, b c x, c x y} -> 1/3 partial
    // doc 3: no overlap -> clean
    val train = Seq(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "p q r s t")
    ).toDF("doc_id", "text")
    val out = Corpus.contaminationFraction(train, bench, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 1.0, "heavy"),
      (2L, 3L, 1L, BigDecimal(1.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, "partial"),
      (3L, 3L, 0L, 0.0, "clean")), s"got $out")
  }

  test("preferencePairs: mirrored rankings, odd median excluded, tie-breaks") {
    val df = Seq(
      // group g: scores 50,40,30,20,10 -> pairs (1,5) margin 40, (2,4) 20
      ("g", 1L, 50L), ("g", 2L, 40L), ("g", 3L, 30L), ("g", 4L, 20L),
      ("g", 5L, 10L),
      // group t: ALL TIED — mirrored tie-break pairs (6,9) and (7,8)
      ("t", 6L, 5L), ("t", 7L, 5L), ("t", 8L, 5L), ("t", 9L, 5L),
      // group s: singleton -> no pairs
      ("s", 10L, 99L)
    ).toDF("src", "id", "score")
    val out = Corpus.preferencePairs(df, "id", "src", "score")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(out == Seq(
      ("g", 1, 1L, 5L, 40L), ("g", 2, 2L, 4L, 20L),
      ("t", 1, 6L, 9L, 0L), ("t", 2, 7L, 8L, 0L)), s"got $out")
    // maxPairs caps widest-margin-first
    val capped = Corpus.preferencePairs(df, "id", "src", "score", maxPairs = 1)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(capped == Seq(("g", 1, 1L, 5L, 40L), ("t", 1, 6L, 9L, 0L)),
      s"got $capped")
  }
}
