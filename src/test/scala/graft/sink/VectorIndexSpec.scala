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
}
