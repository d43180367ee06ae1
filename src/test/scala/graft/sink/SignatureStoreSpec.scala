package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class SignatureStoreSpec extends SparkSpec {
  import spark.implicits._

  // near-dup planted pairs: (1,2) and (5,6) share almost all shingles;
  // 3/4/7 are distinct texts
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "completely different content about distributed query engines"),
    (4L, "spark catalyst optimizes declarative plans into physical stages"),
    (5L, "training data pipelines dedupe crawl shards before tokenizing text"),
    (6L, "training data pipelines dedupe crawl shards before tokenizing words"),
    (7L, "unrelated final document mentioning neither foxes nor pipelines"))
    .toDF("doc_id", "text")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("probe finds cross(base,batch) and within-batch pairs; union of probes ≡ one-shot LSH") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val base = corpus.filter(col("doc_id") <= 4)
    val batch = corpus.filter(col("doc_id") > 4)
    SignatureStore.write(base, "doc_id", "text", dir, nPb = 8)
    val probed = SignatureStore.probe(batch, dir)
    // (5,6) is within-batch; (1,2) is base-internal so a probe must NOT
    // re-report it — the base was screened when IT was admitted
    assert(pairs(probed).contains((5L, 6L)))
    assert(!pairs(probed).contains((1L, 2L)))
    // est_jaccard is a [0,1] signature-agreement fraction
    val est = probed.filter(col("id_a") === 5 && col("id_b") === 6)
      .select("est_jaccard").as[Double].head()
    assert(est > 0.0 && est <= 1.0)
    // incremental ≡ full corpus one-shot candidates
    val incr = pairs(Dedup.minhashLshCandidates(base, "doc_id", "text")) ++
      pairs(probed)
    val full = pairs(Dedup.minhashLshCandidates(corpus, "doc_id", "text"))
    assert(incr == full)
  }

  test("probeAndAppend ≡ probe-then-append: same pairs, same store state") {
    // two stores, same base; one advances via probe+append, the other
    // via the fused sign-once step — pairs and final state must match
    val dirA = java.nio.file.Files.createTempDirectory("sigstore-pa1").toString
    val dirB = java.nio.file.Files.createTempDirectory("sigstore-pa2").toString
    val base = corpus.filter(col("doc_id") <= 4)
    val b1 = corpus.filter(col("doc_id") === 5 || col("doc_id") === 6)
    val b2 = corpus.filter(col("doc_id") === 7)
    SignatureStore.write(base, "doc_id", "text", dirA, nPb = 8)
    SignatureStore.write(base, "doc_id", "text", dirB, nPb = 8)
    val pa1 = SignatureStore.probe(b1, dirA)
    val ref1 = pairs(pa1)
    SignatureStore.append(b1, dirA)
    val fused1 = pairs(SignatureStore.probeAndAppend(b1, dirB))
    assert(fused1 == ref1 && fused1.contains((5L, 6L)), fused1.toString)
    // second batch probes against a store that already holds batch 1 —
    // the fused path's commit must be visible to the NEXT call
    val ref2 = pairs(SignatureStore.probe(b2, dirA))
    SignatureStore.append(b2, dirA)
    val fused2 = pairs(SignatureStore.probeAndAppend(b2, dirB))
    assert(fused2 == ref2, s"$fused2 vs $ref2")
    // store states identical: the corpus-wide audit answers the same
    assert(pairs(SignatureStore.selfPairs(spark, dirB)) ==
      pairs(SignatureStore.selfPairs(spark, dirA)))
    assert(SignatureStore.stats(spark, dirB).head()
      .getAs[Long]("n_docs") == 7L)
  }

  test("append is one O(batch) commit; base files untouched; probe sees appended docs") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-app").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SignatureStore.write(corpus.filter(col("doc_id") <= 4), "doc_id", "text",
      dir, nPb = 8)
    def baseState = fs.listFiles(
      new Path(DeltaLog.currentBase(spark, dir, "buckets")), true)
    val before = {
      val it = baseState
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) { val f = it.next(); b += ((f.getPath.toString, f.getModificationTime)) }
      b.result().toSet
    }
    val seq1 = SignatureStore.append(corpus.filter(col("doc_id") === 5), dir)
    assert(seq1 == 1)
    // the commit holds exactly the batch's banded rows, nothing corpus-sized
    val committed = spark.read.parquet(s"$dir/commits/$seq1/buckets")
    assert(committed.select("_id").distinct().as[Long].collect().toSeq == Seq(5L))
    // base directory is byte-for-byte untouched (merge-on-read, not rewrite)
    val after = {
      val it = baseState
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) { val f = it.next(); b += ((f.getPath.toString, f.getModificationTime)) }
      b.result().toSet
    }
    assert(after == before)
    // a later probe collides doc 6 with the APPENDED doc 5
    val p = SignatureStore.probe(corpus.filter(col("doc_id") === 6), dir)
    assert(pairs(p).contains((5L, 6L)))
  }

  test("probe prunes base partitions by residue and broadcasts the batch side") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-prune").toString
    // a single probed doc hashes into ≤ bands residues — far fewer than nPb
    SignatureStore.write(corpus, "doc_id", "text", dir, nPb = 64)
    val probed = SignatureStore.probe(
      Seq((8L, "the quick brown fox jumps over the lazy dog near the river side"))
        .toDF("doc_id", "text"), dir)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pb"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    probed.collect()
    val scanned = probed.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("pb") =>
        f.metrics("numFiles").value
    }.sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "buckets"))
      .inputFiles.length.toLong
    assert(scanned < total, s"scanned $scanned of $total base files")
    // and the near-dup of doc 1 is still found through the pruned scan
    assert(pairs(probed).contains((1L, 8L)))
  }

  test("compact folds commits; probes unchanged; stats reports the log") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-compact").toString
    SignatureStore.write(corpus.filter(col("doc_id") <= 3), "doc_id", "text",
      dir, nPb = 8)
    SignatureStore.append(corpus.filter(col("doc_id") === 4), dir)
    SignatureStore.append(corpus.filter(col("doc_id") === 5), dir)
    val pre = SignatureStore.stats(spark, dir)
      .as[(Long, Long, Long, Boolean)].head()
    assert(pre._1 == 5 && pre._3 == 2)
    // 8 banded rows per live doc, log-depth recommendation thresholds
    assert(pre._2 == 5 * 8)
    assert(!pre._4) // depth 2 ≤ default maxDeltas
    assert(SignatureStore.stats(spark, dir, maxDeltas = 1)
      .select("compact_recommended").as[Boolean].head())
    val probeBatch = corpus.filter(col("doc_id") === 6)
    val before = pairs(SignatureStore.probe(probeBatch, dir))
    // below threshold: maybeCompact is a no-op and the log stays
    assert(!SignatureStore.maybeCompact(spark, dir, maxDeltas = 2))
    assert(DeltaLog.listSeqs(spark, s"$dir/commits").length == 2)
    // over threshold: it folds, exactly like an explicit compact
    assert(SignatureStore.maybeCompact(spark, dir, maxDeltas = 1))
    assert(DeltaLog.listSeqs(spark, s"$dir/commits").isEmpty)
    val post = SignatureStore.stats(spark, dir)
      .as[(Long, Long, Long, Boolean)].head()
    assert(post._1 == 5 && post._3 == 0 && !post._4)
    assert(pairs(SignatureStore.probe(probeBatch, dir)) == before)
  }

  test("selfPairs reproduces one-shot LSH from persisted signatures, across appends") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-self").toString
    SignatureStore.write(corpus.filter(col("doc_id") <= 5), "doc_id", "text",
      dir, nPb = 8)
    SignatureStore.append(corpus.filter(col("doc_id") > 5), dir)
    val self = SignatureStore.selfPairs(spark, dir)
    assert(pairs(self) == pairs(Dedup.minhashLshCandidates(corpus, "doc_id", "text")))
    // est_jaccard comes from the stored signatures: (1,2) near-identical
    val est = self.filter(col("id_a") === 1 && col("id_b") === 2)
      .select("est_jaccard").as[Double].head()
    assert(est > 0.5 && est <= 1.0)
  }

  test("streaming micro-batches drive continuous dedup via foreachBatch") {
    // the continuous-ingest admission loop end-to-end: per micro-batch,
    // probe → drop docs near-dupping the store (est >= 0.5) → append the
    // survivors. Copies of already-admitted docs are rejected no matter
    // which batch they arrive in; novel docs are admitted.
    val dir = java.nio.file.Files.createTempDirectory("sigstore-stream").toString
    SignatureStore.write(corpus.filter(col("doc_id") <= 4), "doc_id", "text",
      dir, nPb = 8)
    val admitted = collection.mutable.ArrayBuffer(1L, 2L, 3L, 4L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dupIds = SignatureStore.probe(batch, dir)
            .filter(col("est_jaccard") >= 0.5)
            .select(col("id_b")).as[Long].collect().toSet
          val keep = batch.filter(!col("doc_id").isin(dupIds.toSeq: _*))
          SignatureStore.append(keep, dir)
          admitted ++= keep.select("doc_id").as[Long].collect().sorted
        }
        ()
      }
      .start()
    try {
      // 8 = copy of admitted doc 1 (reject); 5 novel (admit)
      input.addData(
        (8L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (5L, "training data pipelines dedupe crawl shards before tokenizing text"))
      q.processAllAvailable()
      // 9 = copy of doc 5 admitted ONE BATCH AGO from the stream (reject);
      // 7 novel (admit)
      input.addData(
        (9L, "training data pipelines dedupe crawl shards before tokenizing text"),
        (7L, "unrelated final document mentioning neither foxes nor pipelines"))
      q.processAllAvailable()
    } finally q.stop()
    assert(admitted.sorted == Seq(1L, 2L, 3L, 4L, 5L, 7L))
    // the store's doc set is exactly the admitted set
    val docs = SignatureStore.stats(spark, dir).select("n_docs", "n_rows", "n_pending_commits").as[(Long, Long, Long)].head()
    assert(docs._1 == 6 && docs._3 == 2)
  }

  test("hot-bucket cap skips boilerplate mega-buckets, keeps genuine pairs") {
    // 40 identical boilerplate docs (one mega-bucket per band) + the
    // genuine near-dup pair (1, 2) from the small corpus
    val boiler = spark.range(100, 140)
      .selectExpr("id AS doc_id",
        "'subscribe to our newsletter for updates and offers' AS text")
    val docs = corpus.unionByName(boiler)
    // uncapped: the mega-bucket contributes 40·39/2 = 780 pairs
    val uncapped = Dedup.minhashLshCandidates(docs, "doc_id", "text")
    assert(uncapped.count() >= 780)
    // capped at 10: boilerplate pairs vanish, (1, 2) and (5, 6) survive
    val capped = Dedup.minhashLshCandidates(docs, "doc_id", "text",
      3, 32, 8, maxBucketOccupancy = 10)
    val cp = capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!cp.exists(_._1 >= 100L), cp.toString)
    assert(cp.contains((1L, 2L)) && cp.contains((5L, 6L)))
    // the store probe honors the same cap, and capped probe ≡ capped
    // one-shot over the union
    val dir = java.nio.file.Files.createTempDirectory("sigstore-hot").toString
    val base = docs.filter(col("doc_id") <= 120)
    val batch = docs.filter(col("doc_id") > 120)
    SignatureStore.write(base, "doc_id", "text", dir, nPb = 8)
    val probed = SignatureStore.probe(batch, dir, maxBucketOccupancy = 10)
    assert(probed.filter(col("id_a") >= 100 || col("id_b") >= 100).count() == 0)
    val incr = pairs(SignatureStore.selfPairs(spark, dir, 10)) ++ pairs(probed)
    assert(incr == cp)
  }

  test("keyed mutation: upsert supersedes, delete tombstones, append resurrects") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-mut").toString
    SignatureStore.write(corpus.filter(col("doc_id") <= 4), "doc_id", "text",
      dir, nPb = 8)
    // UPSERT: re-sign doc 2 with doc 5's text — its OLD signatures must
    // stop pairing (probe of doc 1's near-copy no longer sees doc 2) and
    // its new ones must pair with doc 6's text
    SignatureStore.append(
      Seq((2L, "training data pipelines dedupe crawl shards before tokenizing text"))
        .toDF("doc_id", "text"), dir)
    val probe1 = pairs(SignatureStore.probe(
      Seq((8L, "the quick brown fox jumps over the lazy dog near the river side"))
        .toDF("doc_id", "text"), dir))
    assert(probe1.contains((1L, 8L)) && !probe1.exists(_._1 == 2L), probe1)
    val probe6 = pairs(SignatureStore.probe(
      corpus.filter(col("doc_id") === 6), dir))
    assert(probe6.contains((2L, 6L)), probe6)
    // live doc count unchanged by an upsert
    assert(SignatureStore.stats(spark, dir)
      .select("n_docs").as[Long].head() == 4)

    // DELETE: tombstone doc 1 — its stale signatures must stop vetoing
    // admissions immediately
    SignatureStore.delete(Seq(1L).toDF("doc_id"), "doc_id", dir)
    val afterDel = pairs(SignatureStore.probe(
      Seq((8L, "the quick brown fox jumps over the lazy dog near the river side"))
        .toDF("doc_id", "text"), dir))
    assert(!afterDel.exists(p => p._1 == 1L || p._2 == 1L), afterDel)
    assert(SignatureStore.stats(spark, dir)
      .select("n_docs").as[Long].head() == 3)
    // selfPairs sees the mutated corpus: (2, 6)-style pairs only via
    // live signatures (6 is not in the store; no pair involves 1)
    assert(!SignatureStore.selfPairs(spark, dir)
      .as[(Long, Long, Double)].collect()
      .exists(p => p._1 == 1L || p._2 == 1L))

    // RESURRECT: re-append doc 1 — a newer commit wins over the tombstone
    SignatureStore.append(corpus.filter(col("doc_id") === 1), dir)
    val back = pairs(SignatureStore.probe(
      Seq((8L, "the quick brown fox jumps over the lazy dog near the river side"))
        .toDF("doc_id", "text"), dir))
    assert(back.contains((1L, 8L)), back)

    // COMPACT folds upserts and tombstones physically; probes unchanged
    val before = pairs(SignatureStore.probe(
      corpus.filter(col("doc_id") === 6), dir))
    SignatureStore.compact(spark, dir)
    assert(DeltaLog.listSeqs(spark, s"$dir/commits").isEmpty)
    assert(pairs(SignatureStore.probe(
      corpus.filter(col("doc_id") === 6), dir)) == before)
    assert(SignatureStore.stats(spark, dir)
      .select("n_docs").as[Long].head() == 4)
  }

  test("a compact that crashed before sealing is invisible to reads") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-crash").toString
    SignatureStore.write(corpus.filter(col("doc_id") <= 4), "doc_id", "text",
      dir, nPb = 8)
    SignatureStore.append(corpus.filter(col("doc_id") === 5), dir)
    val before = pairs(SignatureStore.probe(
      corpus.filter(col("doc_id") === 6), dir))
    // crash window of the versioned protocol: a newer generation fully
    // or partly written but NEVER sealed — readers must stay on the
    // previous sealed generation, and the next compact installs past it
    val f = DeltaLog.fs(spark, dir)
    f.mkdirs(new Path(s"$dir/buckets-v9/pb=0"))
    assert(pairs(SignatureStore.probe(
      corpus.filter(col("doc_id") === 6), dir)) == before)
    SignatureStore.compact(spark, dir)
    assert(DeltaLog.currentBase(spark, dir, "buckets") == s"$dir/buckets-v10")
    assert(pairs(SignatureStore.probe(
      corpus.filter(col("doc_id") === 6), dir)) == before)
  }

  test("null id in a probed or appended batch fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-null").toString
    SignatureStore.write(corpus, "doc_id", "text", dir, nPb = 8)
    val bad = Seq((java.lang.Long.valueOf(9L), "some text here ok"),
        (null.asInstanceOf[java.lang.Long], "null id text here"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] { SignatureStore.probe(bad, dir).collect() }
    assert(e.getMessage != null)
  }
}
