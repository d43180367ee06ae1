package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup, TextAnalysis}

/** End-to-end TRAINING-DATA CURATION example — the batch pipeline a
  * pretraining run executes over a raw crawl, chained from the library's
  * gated operators (each stage is individually oracle-checked by
  * `SparkEntry`; this demo shows them COMPOSED):
  *
  *   1. quality floor        — drop the worst text by corpus percentile
  *   2. perplexity filter    — drop high bigram-CE outliers (templated /
  *                             shuffled junk made of common words)
  *   3. exact dedup          — collapse byte-identical copies
  *   4. near-dedup           — MinHash-LSH candidates, exact-Jaccard
  *                             verified, keep-best per duplicate cluster
  *   5. decontamination      — remove docs sharing 13-gram-style shingles
  *                             with the held-out benchmark
  *   6. leakage-safe split   — train/val/test keyed on content
  *                             fingerprint (copies can't straddle)
  *   7. mixture sampling     — per-source keep rates on the train split
  *   8. packing order        — deterministic hash order + token budget
  *
  * Prints per-stage survivor counts; writes the final corpus partitioned
  * by split.
  *
  *   runMain graft.examples.CurationPipeline [sfDir] [outDir]
  */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-corpus").toString)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-curation")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = Tables.documents(spark, sfDir)
    def report(stage: String, n: Long): Unit =
      println(f"[curation] $stage%-22s $n%6d docs")
    report("raw", raw.count())

    // 0. admission gate: the declarative quality-rules audit runs
    // BEFORE any curation spends compute on a broken slice (r7)
    import graft.operators.QualityRules._
    val auditRows = audit(raw, Seq(
        NotNull("doc_id_not_null", "doc_id"),
        Unique("doc_id_unique", Seq("doc_id")),
        NotNull("text_not_null", "text"),
        InRange("n_chars_sane", "n_chars", 1, 1e9)))
      .collect()
    auditRows.foreach(r => println(
      f"[curation] audit ${r.getString(0)}%-18s violations=${r.getLong(1)}"))
    require(auditRows.forall(_.getBoolean(2)),
      "quality-rules audit failed — slice rejected")

    // 1. quality floor: keep docs with a stopword ratio above the corpus
    // P25 (the adaptive-floor pattern of x_quality_floor; gibberish has
    // few stopwords)
    val scored = TextAnalysis.quality(raw, "doc_id", "text")
      .select("doc_id", "stopword_ratio").join(raw, "doc_id")
    val floor = scored.agg(
      percentile(col("stopword_ratio"), lit(0.25)).as("p25"))
    val q = scored.crossJoin(broadcast(floor))
      .filter(col("stopword_ratio") >= col("p25"))
      .select(raw.columns.map(col): _*).localCheckpoint(true)
    report("quality floor", q.count())

    // 2. perplexity filter: drop the top-5% bigram-CE outliers
    val ce = TextAnalysis.bigramCrossEntropy(q, "doc_id", "text")
    val ceCut = ce.agg(
      percentile_approx(col("bigram_ce"), lit(0.95), lit(10000)).as("p95"))
    val fluent = q.join(ce, "doc_id").crossJoin(broadcast(ceCut))
      .filter(col("bigram_ce") <= col("p95"))
      .select(q.columns.map(col): _*).localCheckpoint(true)
    report("bigram-CE filter", fluent.count())

    // 3 + 4. exact dedup, then verified near-dedup: LSH candidates →
    // exact-Jaccard pairs → connected components → keep-best survivor
    val exact = Dedup.dropExactDuplicates(fluent, "doc_id", Seq("text"))
      .localCheckpoint(true)
    val nearPairs = Dedup.minhashDedup(exact, "doc_id", "text",
      threshold = 0.7).select("id_a", "id_b")
    val labels = Dedup.connectedComponents(nearPairs, exact.select("doc_id"))
    val clustered = exact.join(labels, exact("doc_id") === labels("id"))
      .select(col("root").as("cluster"), col("doc_id"), col("n_chars"))
    val best = Dedup.keepBestPerCluster(clustered, "cluster", "doc_id", "n_chars")
    val deduped = exact.join(best.select("doc_id"), Seq("doc_id"))
      .localCheckpoint(true)
    report("dedup (exact+near)", deduped.count())

    // 5. decontamination against a small held-out benchmark
    val bench = raw.orderBy("doc_id").limit(20)
      .select(col("doc_id"), col("text"))
    val clean = Corpus.decontaminate(deduped, bench, "doc_id", "text", 5)
      .filter(!col("contaminated")).select("doc_id")
      .join(deduped, "doc_id").localCheckpoint(true)
    report("decontaminated", clean.count())

    // 6. leakage-safe split
    val split = Corpus.leakageSafeSplit(clean, "text",
      valPermille = 50, testPermille = 50)

    // 7. mixture sampling on the train split only
    val train = split.filter(col("split") === "train")
    val mixed = Corpus.mixtureSample(train, "doc_id", "source",
      Map("src0" -> 1000, "src1" -> 1000), defaultPermille = 700)
    report("train after mixing", mixed.count())

    // 8. deterministic pack order + a token budget per source
    val budgeted = Corpus.capTokensPerStratum(mixed, "doc_id", "source",
      "text", tokenBudget = 100000L)
    val ordered = budgeted
      .withColumn("train_order", Corpus.sampleHash(col("doc_id")))
    report("final train corpus", ordered.count())

    ordered.select("doc_id", "text", "source", "split", "train_order")
      .unionByName(split.filter(col("split") =!= "train")
        .select("doc_id", "text", "source", "split")
        .withColumn("train_order", lit(null).cast("long")))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)
    println(s"[curation] wrote $outDir")

    // 9. byte-reproducible JSONL export of the train shard (r7): a
    // re-run of this pipeline diffs empty unless the DATA changed
    graft.sink.JsonlSink.write(
      ordered.select("doc_id", "text", "source", "train_order"),
      "doc_id", s"$outDir-jsonl", shards = 4)
    println(s"[curation] exported $outDir-jsonl (4 jsonl shards)")
    spark.stop()
  }
}
