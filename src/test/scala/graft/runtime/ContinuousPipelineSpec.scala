package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity
import graft.sink.{DocQueries, GeoIndex, IncrementalPostings, SignatureStore, StatsStore, VectorIndex}

/** The whole continuous-ingest story in ONE loop: every micro-batch is
  * screened against the persisted signature index (near-dup admission),
  * survivors are upserted into the incremental BM25 index, the vector
  * index, and the geo index, AND contribute an O(columns) statistics
  * commit — four O(batch) persisted updates plus one O(columns) update
  * per batch, zero corpus rescans, all five stores on the shared
  * DeltaLog mutation contract. The assertions close the loop: after the
  * stream, each live view must equal a from-scratch batch build over
  * exactly the admitted corpus. This is the architecture a 100 TB
  * deployment runs — the spec proves the composed parts agree, not just
  * each part alone.
  */
class ContinuousPipelineSpec extends SparkSpec {
  import spark.implicits._

  // deterministic per-doc embedding: the vector leg of the loop without
  // a real encoder (dim 4, id-derived, distinct per id)
  private def vecFor(id: Long): Seq[Float] =
    Seq((id % 7).toFloat, (id * 3 % 5).toFloat, (id % 2).toFloat, 1f)

  // deterministic per-doc coordinate: the geo leg of the loop
  private def geoFor(id: Long): (Double, Double) =
    ((id * 37 % 170).toDouble - 85.0, (id * 91 % 360).toDouble - 180.0)

  test("dedup-admit → index upsert → stats commit compose over a stream") {
    val tmp = java.nio.file.Files.createTempDirectory("contpipe").toString
    val sigDir = s"$tmp/signatures"
    val idxDir = s"$tmp/postings"
    val statsDir = s"$tmp/stats"
    val vecDir = s"$tmp/vectors"
    val geoDir = s"$tmp/geo"

    val seed = Seq(
      (1L, "merge scan pipelines dedupe crawl shards before tokenizing text"),
      (2L, "window join distributed query engines optimize physical stages"))
      .toDF("doc_id", "text")
    SignatureStore.write(seed, "doc_id", "text", sigDir, nPb = 8)
    IncrementalPostings.init(seed, "doc_id", "text", idxDir)
    StatsStore.init(seed, Seq("doc_id", "text"), statsDir)
    VectorIndex.write(
      Seq(1L, 2L).map(i => (i, vecFor(i))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", vecDir, k = 2)
    GeoIndex.write(
      Seq(1L, 2L).map(i => (i, geoFor(i)._1, geoFor(i)._2))
        .toDF("doc_id", "lat", "lon"),
      "doc_id", "lat", "lon", geoDir, cellDeg = 30.0)

    val admitted = collection.mutable.ArrayBuffer(1L, 2L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint(true)
          val dupIds = SignatureStore.probe(b, sigDir)
            .filter(col("est_jaccard") >= 0.5)
            .select("id_b").as[Long].collect().toSet
          val keep = b.filter(!col("doc_id").isin(dupIds.toSeq: _*))
            .localCheckpoint(true)
          if (!keep.isEmpty) {
            SignatureStore.append(keep, sigDir)
            IncrementalPostings.commitUpserts(keep, "doc_id", "text", idxDir)
            StatsStore.append(keep, statsDir)
            val keepIds = keep.select("doc_id").as[Long].collect()
            VectorIndex.upsert(
              keepIds.toSeq.map(i => (i, vecFor(i))).toDF("doc_id", "embedding"),
              "doc_id", "embedding", vecDir)
            GeoIndex.upsert(
              keepIds.toSeq.map(i => (i, geoFor(i)._1, geoFor(i)._2))
                .toDF("doc_id", "lat", "lon"),
              "doc_id", "lat", "lon", geoDir)
            admitted ++= keepIds
            // the uniform auto-compaction hook every store now exposes:
            // depth-1 threshold makes the SECOND micro-batch fold all
            // five logs mid-stream — live views must be unaffected
            SignatureStore.maybeCompact(spark, sigDir, maxDeltas = 1)
            IncrementalPostings.maybeCompact(spark, idxDir, maxDeltas = 1)
            StatsStore.maybeCompact(spark, statsDir, maxDeltas = 1)
            VectorIndex.maybeCompact(spark, vecDir, maxDeltas = 1)
            GeoIndex.maybeCompact(spark, geoDir, maxDeltas = 1)
          }
        }
        ()
      }
      .start()
    try {
      // 3 novel; 9 a near-copy of seed doc 1 → rejected
      input.addData(
        (3L, "training data quality scoring uses perplexity proxies"),
        (9L, "merge scan pipelines dedupe crawl shards before tokenizing words"))
      q.processAllAvailable()
      // 4 novel; 8 a near-copy of 3 which was admitted FROM THE STREAM
      input.addData(
        (8L, "training data quality scoring uses perplexity proxy"),
        (4L, "vector indexes partition embeddings into coarse cells"))
      q.processAllAvailable()
    } finally q.stop()

    assert(admitted.sorted == Seq(1L, 2L, 3L, 4L))
    val corpus = seed.unionByName(Seq(
      (3L, "training data quality scoring uses perplexity proxies"),
      (4L, "vector indexes partition embeddings into coarse cells"))
      .toDF("doc_id", "text"))

    // live BM25 ≡ batch scorer over the admitted corpus, bit for bit
    val live = IncrementalPostings.bm25Search(spark, idxDir, "merge quality", 10)
      .as[(Long, Double)].collect().toSeq
    val batchTwin = DocQueries.matchTextBM25(corpus, "doc_id", "text",
      "merge quality", 10).as[(Long, Double)].collect().toSeq
    assert(live == batchTwin && live.nonEmpty)

    // signature store holds exactly the admitted docs
    assert(SignatureStore.stats(spark, sigDir)
      .select("n_docs").as[Long].collect().head == 4)

    // vector search off the live index (all cells probed → exact) ≡
    // brute force over exactly the admitted docs' vectors
    val qv = Seq(3f, 2f, 1f, 1f)
    val fromIndex = VectorIndex.search(spark, vecDir, "doc_id", "embedding",
      qv, topK = 3, nProbe = 2).as[(Long, Double)].collect().toSeq
    val brute = Similarity.bruteForceTopK(
      admitted.toSeq.map(i => (i, vecFor(i))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", qv, 3).as[(Long, Double)].collect().toSeq
    assert(fromIndex == brute && fromIndex.nonEmpty)

    // geo knn off the live index ≡ brute-force haversine cut over
    // exactly the admitted docs' coordinates
    val geoKnn = GeoIndex.knnSearch(spark, geoDir, 0.0, 0.0, 3)
      .select("doc_id").as[Long].collect().toSeq
    val geoBrute = admitted.toSeq
      .map(i => (i, geoFor(i)._1, geoFor(i)._2)).toDF("doc_id", "lat", "lon")
      .withColumn("dist_km", round(graft.functions.GeoFunctions.haversineKm(
        col("lat"), col("lon"), lit(0.0), lit(0.0)), 3))
      .orderBy(col("dist_km"), col("doc_id")).limit(3)
      .select("doc_id").as[Long].collect().toSeq
    assert(geoKnn == geoBrute && geoKnn.nonEmpty)

    // stats profile: exact counts + min/max over exactly the admitted docs
    val prof = StatsStore.profile(spark, statsDir)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(prof("doc_id") == (("doc_id", 4L, 0L, 4L, "1.000000", "4.000000")))
    assert(prof("text")._2 == 4L && prof("text")._4 == 4L)
  }
}
