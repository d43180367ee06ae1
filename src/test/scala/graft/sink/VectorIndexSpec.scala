package graft.sink

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Ivf

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  test("persisted search ≡ in-memory IVF search on the same model") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0)
    val model = VectorIndex.write(e, "vec_id", "embedding", dir, k = 4, iters = 3)
    val persisted = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    val inMem = Ivf.search(Ivf.assign(e, "embedding", model), "vec_id",
      "embedding", model, q, topK = 10, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(persisted == inMem)
    assert(persisted.nonEmpty)
    // round-tripped model matches the one write() trained
    val loaded = VectorIndex.loadModel(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq)
  }

  test("append inserts without retraining; search sees old and new") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-append").toString
    val e = Tables.embeddings(spark, sf)
    val model = VectorIndex.write(e.filter(col("vec_id") >= 100),
      "vec_id", "embedding", dir, k = 4, iters = 3)
    VectorIndex.append(e.filter(col("vec_id") < 100),
      "vec_id", "embedding", dir)
    // the model is untouched by append
    assert(VectorIndex.loadModel(spark, dir).centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq)
    // full-probe search over the appended index ≡ brute force on ALL rows
    val q = e.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0)
    val got = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 10, nProbe = model.k).as[(Long, Double)].collect().toSeq
    val exact = graft.operators.Similarity.bruteForceTopK(
      e, "vec_id", "embedding", q, 10).as[(Long, Double)].collect().toSeq
    assert(got == exact)
    // and the index holds the full corpus
    assert(VectorIndex.cells(spark, dir).count() == e.count())
  }

  test("knnSearch pre-filter: true filtered top-k, never rank-then-discard") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-filt").toString
    val e = Tables.embeddings(spark, sf)
    val model = VectorIndex.write(e, "vec_id", "embedding", dir,
      k = 4, iters = 3)
    val q = e.filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = VectorIndex.knnSearch(spark, dir, q, "qid", "qv",
        k = 5, nProbe = model.k, filter = Some(col("label") === 1))
      .as[(Long, Int, Long, Double)].collect().toSeq
    // k filled from the ALLOWED set, ranked like brute force on it
    val exact = graft.operators.Similarity.bruteForceTopK(
        e.filter(col("label") === 1), "vec_id", "embedding",
        e.filter(col("vec_id") === 7).select("embedding")
          .head().getSeq[Float](0), 5)
      .select(col("vec_id"), round(col("cosine"), 6))
      .as[(Long, Double)].collect().toSeq
    assert(got.map(r => (r._3, r._4)) == exact)
    assert(got.size == 5, "selective filter must not under-fill k")
    // every result satisfies the predicate
    val allowed = e.filter(col("label") === 1)
      .select("vec_id").as[Long].collect().toSet
    assert(got.forall(r => allowed(r._3)))
  }

  test("knnSearch filter at nProbe < all cells: recall-bounded, never wrong") {
    // Pins the softened contract: with partial probing a selective
    // filter may under-fill k (filtered neighbors can live in unprobed
    // cells), but every returned row must (a) satisfy the predicate and
    // (b) appear in the exact filtered ranking — results are a
    // rank-consistent subset, never fabricated or post-filter-discarded.
    val dir = java.nio.file.Files.createTempDirectory("vecidx-partial").toString
    val e = Tables.embeddings(spark, sf)
    VectorIndex.write(e, "vec_id", "embedding", dir, k = 4, iters = 3)
    val q = e.filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = VectorIndex.knnSearch(spark, dir, q, "qid", "qv",
        k = 5, nProbe = 1, filter = Some(col("label") === 1))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got.size <= 5)
    val allowed = e.filter(col("label") === 1)
      .select("vec_id").as[Long].collect().toSet
    assert(got.forall(r => allowed(r._3)), "filter must hold on every row")
    val exact = graft.operators.Similarity.bruteForceTopK(
        e.filter(col("label") === 1), "vec_id", "embedding",
        e.filter(col("vec_id") === 7).select("embedding")
          .head().getSeq[Float](0), allowed.size)
      .select(col("vec_id"), round(col("cosine"), 6))
      .as[(Long, Double)].collect().toSeq
    val exactRank = exact.zipWithIndex.map { case ((id, _), i) => id -> i }.toMap
    // subset of the exact filtered ranking, in rank order
    val ranks = got.map(r => exactRank(r._3))
    assert(ranks == ranks.sorted, "results must respect the exact rank order")
  }

  test("radiusSearch: sound cell prune ≡ brute-force threshold scan") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-rad").toString
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    VectorIndex.write(e, "vec_id", "embedding", dir, k = 4, iters = 3)
    def brute(tau: Double): Map[Long, Double] = {
      val qLit = array(q.map(x => lit(x.toDouble)): _*)
      e.filter(col("embedding").isNotNull)
        .select(col("vec_id"), graft.functions.VectorExpressions
          .cosineFast(col("embedding"), qLit).as("c"))
        .filter(col("c") >= tau)
        .select(col("vec_id"), round(col("c"), 6).as("c"))
        .as[(Long, Double)].collect().toMap
    }
    for (tau <- Seq(0.2, 0.5, 0.9)) {
      val got = VectorIndex.radiusSearch(spark, dir, "vec_id", "embedding",
        q, tau).as[(Long, Double)].collect().toMap
      assert(got == brute(tau), s"tau=$tau")
    }
    // the self-match survives every threshold
    assert(VectorIndex.radiusSearch(spark, dir, "vec_id", "embedding",
      q, 0.99).as[(Long, Double)].collect().toMap.contains(0L))
  }

  test("radiusSearch prunes base cells on clustered data; upserts escape the bound") {
    // three TIGHT clusters on orthogonal axes (small deterministic
    // jitter): centroids land on the axes and cell radii stay narrow,
    // so a tight threshold near one axis must skip the other cells —
    // the broad-fixture test above proves correctness when nothing can
    // prune; this one proves the prune actually engages
    val dir = java.nio.file.Files.createTempDirectory("vecidx-radprune").toString
    val pts = (0 until 300).map { i =>
      val axis = i % 3
      val v = Array.fill(4)(0f)
      v(axis) = 1f
      v(3) = 0.01f * ((i / 3) % 7) // jitter: ≤ ~3.4° off-axis
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    VectorIndex.write(pts, "vec_id", "embedding", dir, k = 3, iters = 5)
    val q = Seq(1f, 0f, 0f, 0f)
    val rad = VectorIndex.radiusSearch(spark, dir, "vec_id", "embedding",
      q, 0.9)
    val got = rad.as[(Long, Double)].collect().toMap
    // exactly the axis-0 cluster qualifies (cos to other axes ≈ 0)
    assert(got.keySet == (0 until 300 by 3).map(_.toLong).toSet)
    rad.collect()
    val scanned = rad.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("cell") =>
        f.metrics("numFiles").value
    }.sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(scanned < total, s"scanned $scanned of $total cell files")
    // an upsert whose vector lies OUTSIDE its cell's stored radius is
    // still found (commit legs are never pruned) …
    VectorIndex.upsert(Seq((9999L, Seq(0.95f, 0f, 0f, 0.31f)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    val afterUpsert = VectorIndex.radiusSearch(spark, dir, "vec_id",
      "embedding", q, 0.9).as[(Long, Double)].collect().toMap
    assert(afterUpsert.contains(9999L), afterUpsert.toString)
    // … and after compact the recomputed bound still covers it
    VectorIndex.compact(spark, dir)
    val afterCompact = VectorIndex.radiusSearch(spark, dir, "vec_id",
      "embedding", q, 0.9).as[(Long, Double)].collect().toMap
    assert(afterCompact == afterUpsert)
  }

  test("search prunes unprobed cells at the partition level") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-prune").toString
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    VectorIndex.write(e, "vec_id", "embedding", dir, k = 4, iters = 3)
    val search = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 5, nProbe = 1)
    val plan = search.queryExecution.executedPlan.toString
    // the probe filter is a partition-column predicate: file-listing-time
    // pruning, not a post-scan filter
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    // and the scan actually reads fewer files than the full index holds
    search.collect()
    val scanned = search.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    val total = VectorIndex.cells(spark, dir).inputFiles.length.toLong
    assert(scanned > 0 && scanned < total, s"scanned $scanned of $total files")
  }

  private def tinyCorpus = Seq(
    (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
    (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)))
    .toDF("vec_id", "embedding")

  private def liveTopK(df: org.apache.spark.sql.DataFrame, q: Seq[Float]) =
    graft.operators.Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq

  test("upsert supersedes by key and delete tombstones — search sees only survivors") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-upsert").toString
    VectorIndex.write(tinyCorpus, "vec_id", "embedding", dir, k = 2, iters = 3)
    // id 2 moves ACROSS clusters (new vector lands in the other cell);
    // id 5 is fresh
    VectorIndex.upsert(Seq((2L, Seq(0.0f, 0.95f)), (5L, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    VectorIndex.delete(Seq(3L).toDF("vec_id"), "vec_id", dir)
    val live = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.95f)),
      (4L, Seq(0.1f, 0.9f)), (5L, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val q = Seq(1.0f, 0.0f)
    // full probe ≡ brute force over exactly the surviving corpus
    val got = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(got == liveTopK(live, q))
    // the resolved view holds one row per live id, with the NEW vectors
    val cells = VectorIndex.cells(spark, dir)
    assert(cells.count() == 4)
    assert(cells.filter(col("vec_id") === 2L)
      .select("embedding").as[Seq[Float]].head() == Seq(0.0f, 0.95f))
    // compaction folds the commit log and preserves every answer
    VectorIndex.compact(spark, dir)
    assert(java.nio.file.Files.notExists(
      java.nio.file.Paths.get(s"$dir/commits/1")))
    val after = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(after == got)
  }

  test("a mutation commit writes O(batch) bytes, never touching the base cells") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-bytes").toString
    val base = (1L to 500L).map(i =>
      (i, Seq((i % 7).toFloat + 1f, (i % 5).toFloat))).toDF("vec_id", "embedding")
    VectorIndex.write(base, "vec_id", "embedding", dir, k = 4, iters = 2)
    def bytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists) 0L
      else if (f.isFile) f.length
      else f.listFiles.map(c => bytes(c.getPath)).sum
    }
    val basePath = DeltaLog.currentBase(spark, dir, "cells")
    val baseBytes = bytes(basePath)
    val baseMtime = new java.io.File(basePath).lastModified
    VectorIndex.upsert(Seq((1L, Seq(9.0f, 9.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    VectorIndex.delete(Seq(2L).toDF("vec_id"), "vec_id", dir)
    assert(new java.io.File(basePath).lastModified == baseMtime,
      "commit must not rewrite the base cell layout")
    assert(bytes(s"$dir/commits") < baseBytes / 5,
      s"commits ${bytes(s"$dir/commits")} B vs base $baseBytes B")
  }

  test("stats flags a drifted index and pending commits") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-stats").toString
    // two tight clusters, 250 vectors each — near-uniform cells
    val base = (1L to 500L).map { i =>
      if (i % 2 == 0) (i, Seq(1.0f + (i % 3) * 0.01f, 0.0f))
      else (i, Seq(0.0f, 1.0f + (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    VectorIndex.write(base, "vec_id", "embedding", dir, k = 2, iters = 3)
    val balanced = VectorIndex.stats(spark, dir).head()
    assert(balanced.getAs[Long]("n_vectors") == 500L)
    assert(balanced.getAs[Long]("n_cells") == 2L)
    assert(balanced.getAs[Double]("skew") <= 1.2, balanced.toString)
    assert(balanced.getAs[Long]("n_pending_commits") == 0L)
    // sustained one-sided ingest: 500 new vectors, ALL in one cluster
    val drift = (1001L to 1500L).map(i => (i, Seq(1.0f, 0.01f)))
      .toDF("vec_id", "embedding")
    VectorIndex.upsert(drift, "vec_id", "embedding", dir)
    val drifted = VectorIndex.stats(spark, dir).head()
    assert(drifted.getAs[Long]("n_vectors") == 1000L)
    // 750 of 1000 in one of 2 cells → skew 1.5: the rebuild signal fires
    assert(drifted.getAs[Double]("skew") >= 1.4, drifted.toString)
    assert(drifted.getAs[Long]("n_pending_commits") == 1L)
    // threshold hook: no-op at depth 1 ≤ maxDeltas, folds above; the
    // live view is unchanged by the fold
    val liveBefore = VectorIndex.cells(spark, dir).count()
    assert(!VectorIndex.maybeCompact(spark, dir, maxDeltas = 1))
    assert(VectorIndex.stats(spark, dir).head()
      .getAs[Long]("n_pending_commits") == 1L)
    assert(VectorIndex.maybeCompact(spark, dir, maxDeltas = 0))
    assert(VectorIndex.stats(spark, dir).head()
      .getAs[Long]("n_pending_commits") == 0L)
    assert(VectorIndex.cells(spark, dir).count() == liveBefore)
  }

  test("wrong-dimension and null/duplicate-id batches are rejected loudly") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-guard").toString
    VectorIndex.write(tinyCorpus, "vec_id", "embedding", dir, k = 2, iters = 2)
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    val dim = intercept[Exception] {
      VectorIndex.upsert(Seq((9L, Seq(1.0f, 2.0f, 3.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    }
    assert(chain(dim).contains("vector dim"), chain(dim))
    val dup = intercept[IllegalArgumentException] {
      VectorIndex.upsert(Seq((9L, Seq(1.0f, 0.0f)), (9L, Seq(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    }
    assert(dup.getMessage.contains("null or duplicated"))
    val cols = intercept[IllegalArgumentException] {
      VectorIndex.upsert(tinyCorpus.withColumnRenamed("vec_id", "other"),
        "other", "embedding", dir)
    }
    assert(cols.getMessage.contains("built over"))
    // nothing committed by any failed mutation
    assert(VectorIndex.stats(spark, dir)
      .head().getAs[Long]("n_pending_commits") == 0L)
  }

  test("a vector compact that crashed before sealing is invisible to reads") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-crash").toString
    VectorIndex.write(tinyCorpus, "vec_id", "embedding", dir, k = 2, iters = 2)
    val before = VectorIndex.cells(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    // unsealed newer generation = the versioned protocol's crash window
    DeltaLog.fs(spark, dir)
      .mkdirs(new org.apache.hadoop.fs.Path(s"$dir/cells-v9/cell=0"))
    val after = VectorIndex.cells(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(after == before)
  }

  test("search prunes unprobed cells even with a live commit log") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-prune2").toString
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    VectorIndex.write(e.filter(col("vec_id") >= 20), "vec_id", "embedding",
      dir, k = 4, iters = 3)
    VectorIndex.upsert(e.filter(col("vec_id") < 20),
      "vec_id", "embedding", dir)
    val search = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 5, nProbe = 1)
    search.collect()
    // the BASE leg still partition-prunes: its (partition-filtered) scan
    // reads fewer files than the base holds. Commit legs are unpartitioned
    // O(batch) scans and excluded from the count.
    val plan = search.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // the scans sit inside AQE query stages once the owner join is in the
    // plan — descend through them rather than collectLeaves
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case o => (o.children ++ o.subqueries).flatMap(scans)
    }
    val baseScanned = scans(search.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
      .map(_.metrics("numFiles").value).sum
    val baseFiles = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(baseScanned > 0 && baseScanned < baseFiles,
      s"scanned $baseScanned of $baseFiles base files")
  }

  test("knnSearch over the index matches the corpus-scan knnJoin; probes prune files") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-knn").toString
    val e = Tables.embeddings(spark, sf)
    val model = VectorIndex.write(e, "vec_id", "embedding", dir, k = 4, iters = 3)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // full probe ≡ exact batch retrieval
    val got = VectorIndex.knnSearch(spark, dir, q, "qid", "qv",
        k = 5, nProbe = model.k)
      .orderBy("qid", "rk").as[(Long, Int, Long, Double)].collect().toSeq
    val exact = graft.operators.Similarity.knnJoin(e, q, "vec_id", "embedding",
        "qid", "qv", k = 5)
      .orderBy("qid", "rk").as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == exact && got.nonEmpty)
    // partial probe: dynamic partition pruning cuts the files scanned to
    // the union of the queries' probed cells
    val pruned = VectorIndex.knnSearch(spark, dir, q, "qid", "qv",
      k = 5, nProbe = 1)
    pruned.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case o => (o.children ++ o.subqueries).flatMap(scans)
    }
    val cellScans = scans(pruned.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    assert(cellScans.nonEmpty)
    assert(cellScans.exists(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning"))),
      cellScans.map(_.partitionFilters).toString)
    val scanned = cellScans.map(_.metrics("numFiles").value).sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(scanned > 0 && scanned < total, s"scanned $scanned of $total files")
  }

  test("streaming micro-batches drive the vector index via foreachBatch") {
    // the continuous-ingestion loop on the vector layout: every
    // micro-batch is one O(batch) upsert commit; full-probe search over
    // the live view equals brute force on the final corpus
    val dir = java.nio.file.Files.createTempDirectory("vecidx-stream").toString
    VectorIndex.write(tinyCorpus, "vec_id", "embedding", dir, k = 2, iters = 2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          VectorIndex.upsert(batch, "vec_id", "embedding", dir): Unit
        ()
      }
      .start()
    try {
      input.addData((2L, Seq(0.2f, 0.8f)), (6L, Seq(0.5f, 0.5f)))
      q.processAllAvailable()
      input.addData((6L, Seq(0.6f, 0.4f))) // superseded across batches
      q.processAllAvailable()
    } finally q.stop()
    val finalCorpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.2f, 0.8f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.1f, 0.9f)), (6L, Seq(0.6f, 0.4f)))
      .toDF("vec_id", "embedding")
    val qv = Seq(1.0f, 0.0f)
    val got = VectorIndex.search(spark, dir, "vec_id", "embedding",
      qv, topK = 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(got == liveTopK(finalCorpus, qv) && got.nonEmpty)
  }

  test("maintain compacts a deep commit log and signals rebuild on skew") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx-maint").toString
    VectorIndex.write(tinyCorpus, "vec_id", "embedding", dir, k = 2, iters = 2)
    (1 to 3).foreach { i =>
      VectorIndex.upsert(Seq((100L + i, Seq(1.0f, 0.02f * i)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    }
    // below the depth threshold: log untouched, no rebuild needed yet
    assert(!VectorIndex.maintain(spark, dir, maxPendingCommits = 16,
      skewThreshold = 2.0))
    assert(VectorIndex.stats(spark, dir)
      .head().getAs[Long]("n_pending_commits") == 3L)
    // at the threshold: compacted; still balanced enough not to rebuild
    assert(!VectorIndex.maintain(spark, dir, maxPendingCommits = 3,
      skewThreshold = 2.0))
    assert(VectorIndex.stats(spark, dir)
      .head().getAs[Long]("n_pending_commits") == 0L)
    // drive skew up: everything lands in one cell → rebuild signal fires
    VectorIndex.upsert((200L to 230L).map(i => (i, Seq(1.0f, 0.01f)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    assert(VectorIndex.maintain(spark, dir, maxPendingCommits = 16,
      skewThreshold = 1.5))
  }
}
