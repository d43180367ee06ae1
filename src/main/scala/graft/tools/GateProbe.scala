package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-leg wall-time breakdown of the multi-commit gate queries
  * (`x_geo_upsert`, `x_dedup_incremental`, `x_sim_ivf_upsert`) — the
  * rows BENCH_NOTES tags as gate-cost. The bench times each gate as one
  * opaque body; this main times every protocol step inside, so "which
  * commit grew" questions (the r9 IVF drift) get measured answers
  * instead of board-total archaeology.
  *
  * Usage: runMain graft.tools.GateProbe [sfDir]
  */
object GateProbe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[gate] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-gateprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, d)
    docs.count(): Unit // warm the scan
    // two passes: the first warms JIT/codegen caches, the second is the
    // reported number (the Bench warm-pass methodology)
    for (pass <- 1 to 2) {
    println(s"[gate] ---- pass $pass ----")

    // ---- x_geo_upsert ------------------------------------------------
    locally {
      val pts = docs.select("doc_id")
        .withColumn("lat",
          (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      val dir = java.nio.file.Files.createTempDirectory("geoups").toString
      t("geo.write")(graft.sink.GeoIndex.write(
        pts.filter(col("doc_id") >= 50), "doc_id", "lat", "lon", dir,
        cellDeg = 30.0))
      t("geo.upsert1")(graft.sink.GeoIndex.upsert(
        pts.filter(col("doc_id") < 50), "doc_id", "lat", "lon", dir))
      t("geo.upsert2")(graft.sink.GeoIndex.upsert(
        pts.filter(col("doc_id") < 10)
          .withColumn("lat", col("lat") / 4 + 47)
          .withColumn("lon", col("lon") / 2 + 183),
        "doc_id", "lat", "lon", dir))
      t("geo.delete")(graft.sink.GeoIndex.delete(
        pts.filter((col("doc_id") >= 10 && col("doc_id") < 30) ||
            (col("doc_id") >= 290 && col("doc_id") < 300))
          .select("doc_id"), "doc_id", dir))
      t("geo.radius")(graft.sink.GeoIndex.radiusSearch(
          spark, dir, 26.0, 93.0, 1500.001)
        .withColumn("dist_km", round(col("dist_km"), 3))
        .filter(col("dist_km") <= 1500.0).count())
    }

    // ---- x_dedup_incremental_build / _probe (r11 split shape) ---------
    locally {
      val base = docs.filter(pmod(col("doc_id"), lit(5)) < 3)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) >= 3)
      // BUILD row body: base sign + one fused probe-and-append
      val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
      t("sig.write")(graft.sink.SignatureStore.write(
        base, "doc_id", "text", dir))
      t("sig.probeAppend")(graft.sink.SignatureStore
        .probeAndAppend(batch, dir).count())
      t("sig.stats")(graft.sink.SignatureStore.stats(spark, dir).collect())
      // PROBE row body: screen one batch against an existing store and
      // exact-verify the candidates (broadcast-pruned shingling)
      val store = docs.filter(pmod(col("doc_id"), lit(5)) < 4)
      val b2 = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      val dir2 = java.nio.file.Files.createTempDirectory("sigprobe").toString
      t("sig.writeStore")(graft.sink.SignatureStore.write(
        store, "doc_id", "text", dir2))
      val cand = t("sig.probe")(graft.sink.SignatureStore.probe(b2, dir2)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val candIds = cand.select(explode(array(col("id_a"), col("id_b")))
        .as("doc_id")).distinct()
      val candDocs = docs.join(broadcast(candIds), "doc_id")
      t("sig.verify+agg")(graft.operators.Dedup
        .verifyJaccard(cand, candDocs, "doc_id", "text", 3)
        .filter(col("jaccard") >= 0.5)
        .agg(count(lit(1)).as("n_verified")).collect())
      cand.unpersist()
    }

    // ---- x_sim_ivf_upsert ----------------------------------------------
    locally {
      val e = Tables.embeddings(spark, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dir = java.nio.file.Files.createTempDirectory("vecups").toString
      val model = t("ivf.write")(graft.sink.VectorIndex.write(
        e.filter(col("vec_id") >= 50), "vec_id", "embedding", dir,
        k = 8, iters = 3))
      t("ivf.upsert1")(graft.sink.VectorIndex.upsert(
        e.filter(col("vec_id") < 50), "vec_id", "embedding", dir))
      t("ivf.upsert2")(graft.sink.VectorIndex.upsert(
        e.filter(col("vec_id") < 10).withColumn("embedding",
          transform(col("embedding"), x => x * lit(-1.0f))),
        "vec_id", "embedding", dir))
      t("ivf.delete")(graft.sink.VectorIndex.delete(
        e.filter(col("vec_id") >= 10 && col("vec_id") < 30)
          .select("vec_id"), "vec_id", dir))
      t("ivf.search")(graft.sink.VectorIndex.search(
          spark, dir, "vec_id", "embedding", qv,
          topK = 10, nProbe = model.k).count())
    }
    }
    spark.stop()
  }
}
