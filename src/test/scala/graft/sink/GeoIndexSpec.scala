package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GeoFunctions

class GeoIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic global scatter (the gate's synthetic coordinates)
  private def pts = spark.range(2000).select(col("id").as("pid"),
    ((col("id") * 37 % 17000).cast("double") / 100.0 - 85.0).as("lat"),
    ((col("id") * 91 % 36000).cast("double") / 100.0 - 180.0).as("lon"))

  test("radiusSearch off the cell layout ≡ whole-corpus scan; prunes files") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    val idx = GeoIndex.radiusSearch(spark, dir, 40.0, -74.0, 2000.0)
    val scan = pts
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col("lat"), col("lon"), lit(40.0), lit(-74.0)))
      .filter(col("dist_km") <= 2000.0)
    assert(idx.select("pid").as[Long].collect().toSet ==
      scan.select("pid").as[Long].collect().toSet)
    assert(idx.count() > 0)
    // disk-level pruning: the scan touches only covered cell dirs
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    idx.collect()
    val scanned = idx.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("cell") =>
        f.metrics("numFiles").value
    }.sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(scanned < total, s"scanned $scanned of $total cell files")
  }

  test("radiusSearch wraps the antimeridian through the cell cover") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-am").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    val idx = GeoIndex.radiusSearch(spark, dir, 5.0, 179.0, 1500.0)
    val scan = pts
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col("lat"), col("lon"), lit(5.0), lit(179.0)))
      .filter(col("dist_km") <= 1500.0)
    assert(idx.select("pid").as[Long].collect().toSet ==
      scan.select("pid").as[Long].collect().toSet)
    // the seam cover reaches points stored at lon ≈ -180
    assert(idx.filter(col("lon") < -170.0).count() > 0)
  }

  test("radiusJoin off the layout ≡ scan-form geoRadiusJoin; prunes files") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-join").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    val centers = Seq((1L, 40.0, -74.0), (2L, 5.0, 179.0)) // incl. the seam
    val idx = GeoIndex.radiusJoin(spark, dir, centers, 1500.0)
    val scan = graft.operators.GeoJoin.geoRadiusJoin(pts, "pid", "lat",
      "lon", centers, 1500.0)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("center_id", "pid").as[(Long, Long)].collect().toSet
    assert(rows(idx) == rows(scan) && rows(idx).nonEmpty)
    idx.collect()
    val scanned = idx.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("cell") =>
        f.metrics("numFiles").value
    }.sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(scanned < total, s"scanned $scanned of $total cell files")
  }

  test("knnSearch ring expansion is exact vs the brute-force cut") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-knn").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    for (k <- Seq(1, 15, 40)) {
      val idx = GeoIndex.knnSearch(spark, dir, 40.0, -74.0, k)
        .as[(Long, Double)].collect().toSeq
      val brute = pts
        .withColumn("dist_km", round(GeoFunctions.haversineKm(
          col("lat"), col("lon"), lit(40.0), lit(-74.0)), 3))
        .orderBy(col("dist_km"), col("pid"))
        .limit(k)
        .select("pid", "dist_km").as[(Long, Double)].collect().toSeq
      assert(idx == brute, s"k=$k")
    }
    // k beyond the corpus saturates to every point, still ordered
    val all = GeoIndex.knnSearch(spark, dir, 40.0, -74.0, 3000)
    assert(all.count() == 2000)
  }

  test("polygonSearch off the layout ≡ scan-form ray cast; prunes; sees mutations") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-poly").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    val poly = Seq((10.0, -120.0), (70.0, -100.0), (60.0, -20.0), (0.0, -60.0))
    val idx = GeoIndex.polygonSearch(spark, dir, poly)
    val scan = pts.filter(GeoFunctions.inPolygon(col("lat"), col("lon"), poly))
    assert(idx.select("pid").as[Long].collect().toSet ==
      scan.select("pid").as[Long].collect().toSet)
    assert(idx.count() > 0)
    idx.collect()
    val scanned = idx.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("cell") =>
        f.metrics("numFiles").value
    }.sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(scanned > 0 && scanned < total,
      s"scanned $scanned of $total cell files")
    // mutation-aware: move a far-away point INTO the polygon, delete an
    // inside one — the pruned live view reflects both
    val inside = scan.select("pid").as[Long].head()
    GeoIndex.upsert(Seq((999999L, 40.0, -80.0)).toDF("pid", "lat", "lon"),
      "pid", "lat", "lon", dir)
    GeoIndex.delete(Seq(inside).toDF("pid"), "pid", dir)
    val after = GeoIndex.polygonSearch(spark, dir, poly)
      .select("pid").as[Long].collect().toSet
    assert(after.contains(999999L) && !after.contains(inside))
    intercept[IllegalArgumentException] {
      GeoIndex.polygonSearch(spark, dir, Seq((0.0, 0.0), (1.0, 1.0)))
    }
  }

  test("knnJoin: per-center exact vs brute force, incl. sparse/seam centers") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-knnj").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    // a dense mid-latitude center, an antimeridian center, a polar one
    // (sparse — forces extra ring-expansion rounds for it alone)
    val centers = Seq((1L, 40.0, -74.0), (2L, 5.0, 179.0), (3L, -84.0, 10.0))
    for (k <- Seq(1, 7)) {
      val idx = GeoIndex.knnJoin(spark, dir, centers, k)
        .select("center_id", "pid", "dist_km")
        .as[(Long, Long, Double)].collect().toSet
      val brute = centers.map { case (cid, clat, clon) =>
        pts.withColumn("dist_km", round(GeoFunctions.haversineKm(
            col("lat"), col("lon"), lit(clat), lit(clon)), 3))
          .orderBy(col("dist_km"), col("pid")).limit(k)
          .select(lit(cid).as("center_id"), col("pid"), col("dist_km"))
      }.reduce(_.unionByName(_)).as[(Long, Long, Double)].collect().toSet
      assert(idx == brute, s"k=$k")
    }
    // k beyond the corpus saturates to every point for every center
    assert(GeoIndex.knnJoin(spark, dir, Seq((9L, 0.0, 0.0)), 3000)
      .count() == 2000)
    intercept[IllegalArgumentException] {
      GeoIndex.knnJoin(spark, dir, Seq.empty, 5)
    }
  }

  test("DataFrame-centers radiusJoin/knnJoin ≡ Seq forms over a live commit log") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-df").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    // mutations in the log: the DF path must resolve the same live view
    GeoIndex.upsert(Seq((999999L, 40.5, -74.5), (5L, 5.2, 178.9))
      .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    GeoIndex.delete(Seq(7L).toDF("pid"), "pid", dir)
    val centers = Seq((1L, 40.0, -74.0), (2L, 5.0, 179.0), (3L, -84.0, 10.0))
    val cdf = centers.toDF("cid", "clat", "clon")
    val rSeq = GeoIndex.radiusJoin(spark, dir, centers, 1500.0)
      .select("center_id", "pid").as[(Long, Long)].collect().toSet
    val rDf = GeoIndex.radiusJoin(spark, dir, cdf, "cid", "clat", "clon",
        lit(1500.0))
      .select("center_id", "pid").as[(Long, Long)].collect().toSet
    assert(rDf == rSeq && rDf.nonEmpty)
    // knn: dense, antimeridian, and sparse-polar centers; k saturation
    for (k <- Seq(1, 7, 3000)) {
      val kSeq = GeoIndex.knnJoin(spark, dir, centers, k)
        .select("center_id", "pid", "dist_km")
        .as[(Long, Long, Double)].collect().toSet
      val kDf = GeoIndex.knnJoin(spark, dir, cdf, "cid", "clat", "clon", k)
        .select("center_id", "pid", "dist_km")
        .as[(Long, Long, Double)].collect().toSet
      assert(kDf == kSeq, s"k=$k")
    }
  }

  test("DataFrame-centers radiusJoin construction is lazy — no driver collect") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-lazy").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    val centers = Seq((1L, 40.0, -74.0))
    val cdf = centers.toDF("cid", "clat", "clon")
    // MAX job id, not retained-count: the status store evicts old jobs
    // past spark.ui.retainedJobs, so a length delta goes NEGATIVE once
    // the suite has run enough jobs before this test — ids are
    // monotonic, eviction-proof
    def jobCount(): Int = {
      Thread.sleep(300)
      spark.sparkContext.statusTracker.getJobIdsForGroup(null)
        .foldLeft(-1)(math.max)
    }
    // constructing ANY live-view read runs the parquet listing/schema
    // jobs; the pin is RELATIVE — the DataFrame-centers form must add
    // no driver work beyond what the (collect-free, plan-literal) Seq
    // form's construction already does. A per-center collect would add
    // at least one extra job here.
    val beforeSeq = jobCount()
    GeoIndex.radiusJoin(spark, dir, centers, 1500.0)
    val seqJobs = jobCount() - beforeSeq
    val beforeDf = jobCount()
    val q = GeoIndex.radiusJoin(spark, dir, cdf, "cid", "clat", "clon",
      lit(1500.0))
    val dfJobs = jobCount() - beforeDf
    assert(dfJobs <= seqJobs,
      s"DF-centers construction ran $dfJobs job(s) vs Seq form's $seqJobs")
    assert(q.count() > 0)
  }

  test("upsert supersedes across cells, delete tombstones — searches see survivors") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-mut").toString
    val base = Seq((1L, 40.7, -74.0), (2L, 40.8, -73.9), (3L, 41.0, -74.2),
      (4L, 51.5, -0.1), (5L, 48.9, 2.3)).toDF("pid", "lat", "lon")
    GeoIndex.write(base, "pid", "lat", "lon", dir)
    // id 2 moves ACROSS cells (NYC → Tokyo); id 6 is fresh
    GeoIndex.upsert(Seq((2L, 35.7, 139.7), (6L, 40.6, -74.1))
      .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    GeoIndex.delete(Seq(3L).toDF("pid"), "pid", dir)
    val live = Seq((1L, 40.7, -74.0), (2L, 35.7, 139.7), (4L, 51.5, -0.1),
      (5L, 48.9, 2.3), (6L, 40.6, -74.1)).toDF("pid", "lat", "lon")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("pid").as[Long].collect().toSet
    // the moved id must NOT appear near its old position...
    val nyc = GeoIndex.radiusSearch(spark, dir, 40.7, -74.0, 100.0)
    assert(ids(nyc) == Set(1L, 6L))
    // ...and MUST appear at its new one (an out-of-base-cover commit leg)
    val tokyo = GeoIndex.radiusSearch(spark, dir, 35.7, 139.7, 50.0)
    assert(ids(tokyo) == Set(2L))
    // knn over the live set matches the brute-force cut over survivors
    val knn = GeoIndex.knnSearch(spark, dir, 40.7, -74.0, 3)
      .select("pid").as[Long].collect().toSeq
    val brute = live
      .withColumn("dist_km", round(GeoFunctions.haversineKm(
        col("lat"), col("lon"), lit(40.7), lit(-74.0)), 3))
      .orderBy(col("dist_km"), col("pid")).limit(3)
      .select("pid").as[Long].collect().toSeq
    assert(knn == brute)
    // compaction folds the log and preserves every answer
    GeoIndex.compact(spark, dir)
    assert(java.nio.file.Files.notExists(
      java.nio.file.Paths.get(s"$dir/commits/1")))
    assert(ids(GeoIndex.radiusSearch(spark, dir, 40.7, -74.0, 100.0)) ==
      Set(1L, 6L))
    assert(ids(GeoIndex.radiusSearch(spark, dir, 35.7, 139.7, 50.0)) ==
      Set(2L))
  }

  test("a geo mutation commit writes O(batch) bytes, never touching the base") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-bytes").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir)
    def bytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists) 0L
      else if (f.isFile) f.length
      else f.listFiles.map(c => bytes(c.getPath)).sum
    }
    val basePath = DeltaLog.currentBase(spark, dir, "cells")
    val baseBytes = bytes(basePath)
    val baseMtime = new java.io.File(basePath).lastModified
    GeoIndex.upsert(Seq((1L, 10.0, 10.0)).toDF("pid", "lat", "lon"),
      "pid", "lat", "lon", dir)
    GeoIndex.delete(Seq(2L).toDF("pid"), "pid", dir)
    assert(new java.io.File(basePath).lastModified == baseMtime,
      "commit must not rewrite the base cell layout")
    assert(bytes(s"$dir/commits") < baseBytes / 5,
      s"commits ${bytes(s"$dir/commits")} B vs base $baseBytes B")
    // pruning survives a live commit log: the base leg still skips files.
    // The scans sit inside AQE query stages once the owner join is in the
    // plan — descend through them rather than collectLeaves.
    val q = GeoIndex.radiusSearch(spark, dir, 40.0, -74.0, 2000.0)
    q.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case o => (o.children ++ o.subqueries).flatMap(scans)
    }
    val scanned = scans(q.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
      .map(_.metrics("numFiles").value).sum
    val total = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .inputFiles.length.toLong
    assert(scanned > 0 && scanned < total,
      s"scanned $scanned of $total cell files with commits pending")
  }

  test("invalid coordinates are rejected loudly; lon normalizes to [-180,180)") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-guard").toString
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    val badLat = intercept[Exception] {
      GeoIndex.write(Seq((1L, 95.0, 0.0)).toDF("pid", "lat", "lon"),
        "pid", "lat", "lon", dir)
    }
    assert(chain(badLat).contains("invalid coordinate"), chain(badLat))
    val nullLon = intercept[Exception] {
      GeoIndex.write(Seq((1L, Some(10.0), Option.empty[Double]))
        .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    }
    assert(chain(nullLon).contains("invalid coordinate"), chain(nullLon))
    // lon=190 normalizes to -170: correct cell AND correct post-filter
    GeoIndex.write(Seq((1L, 5.0, 190.0), (2L, 5.0, 170.0))
      .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    val near = GeoIndex.radiusSearch(spark, dir, 5.0, -170.0, 200.0)
    assert(near.select("pid").as[Long].collect().toSet == Set(1L))
    assert(near.select("lon").as[Double].head() == -170.0)
    // in-range longitudes are stored bit-identical
    val kept = spark.read.parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .filter(col("pid") === 2L).select("lon").as[Double].head()
    assert(kept == 170.0)
    // same hygiene on the upsert leg
    val upBad = intercept[Exception] {
      GeoIndex.upsert(Seq((3L, -91.0, 0.0)).toDF("pid", "lat", "lon"),
        "pid", "lat", "lon", dir)
    }
    assert(chain(upBad).contains("invalid coordinate"), chain(upBad))
    // non-finite longitudes must fail LOUDLY too — a NaN/±Inf lon would
    // otherwise pass isNotNull, yield a null cell, and hide the point in
    // a null Hive partition invisible to every cell-pruned query
    for (badLon <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)) {
      val nf = intercept[Exception] {
        GeoIndex.write(Seq((1L, 10.0, badLon)).toDF("pid", "lat", "lon"),
          "pid", "lat", "lon", dir)
      }
      assert(chain(nf).contains("invalid coordinate"), s"lon=$badLon: ${chain(nf)}")
    }
  }

  test("meta cache invalidates on an out-of-band rebuild (mtime change)") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-meta").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir, cellDeg = 15.0)
    // populate the session's meta cache through a real query
    assert(GeoIndex.radiusSearch(spark, dir, 40.0, -74.0, 500.0).count() >= 0)
    // out-of-band rebuild with a DIFFERENT lattice: build elsewhere and
    // move into place, bypassing write()'s same-session cache refresh —
    // the shape of a rebuild done by another job/session
    val dir2 = java.nio.file.Files.createTempDirectory("geoidx-meta2").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir2, cellDeg = 5.0)
    Thread.sleep(10) // ensure a distinct directory mtime
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // the base is a sealed versioned dir now: move the RESOLVED current
    // generation of each store (same generation name on both sides here,
    // but resolve both to stay layout-agnostic)
    val srcBase = DeltaLog.currentBase(spark, dir2, "cells").split('/').last
    val dstBase = DeltaLog.currentBase(spark, dir, "cells").split('/').last
    for ((srcPart, part) <- Seq(("meta", "meta"), (srcBase, dstBase))) {
      val src = Paths.get(s"$dir2/$srcPart")
      val dst = Paths.get(s"$dir/$part")
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).forEach(c => rm(c))
        Files.delete(p)
      }
      rm(dst)
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
      // the move preserves the source's own mtime; touch the dir so the
      // rebuild is visible however the local fs handles rename
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis))
    }
    // a stale cached cellDeg=15 lattice would compute 15° cover cells
    // against 5° directories — wrong pruning, missing points. The mtime
    // check must re-read meta and answer exactly.
    val idx = GeoIndex.radiusSearch(spark, dir, 40.0, -74.0, 2000.0)
    val scan = pts
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col("lat"), col("lon"), lit(40.0), lit(-74.0)))
      .filter(col("dist_km") <= 2000.0)
    assert(idx.select("pid").as[Long].collect().toSet ==
      scan.select("pid").as[Long].collect().toSet)
    assert(idx.count() > 0)
  }

  test("upsert guards: null/duplicate ids and wrong key columns fail fast") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-upguard").toString
    GeoIndex.write(Seq((1L, 10.0, 10.0)).toDF("pid", "lat", "lon"),
      "pid", "lat", "lon", dir)
    val dup = intercept[IllegalArgumentException] {
      GeoIndex.upsert(Seq((9L, 1.0, 1.0), (9L, 2.0, 2.0))
        .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    }
    assert(dup.getMessage.contains("null or duplicated"))
    val cols = intercept[IllegalArgumentException] {
      GeoIndex.upsert(Seq((9L, 1.0, 1.0)).toDF("other", "lat", "lon"),
        "other", "lat", "lon", dir)
    }
    assert(cols.getMessage.contains("was built over"))
    // nothing committed by any failed mutation
    assert(GeoIndex.stats(spark, dir).head()
      .getAs[Long]("n_pending_commits") == 0L)
  }

  test("stats reports occupancy skew and commit depth; maybeCompact hook") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-stats").toString
    // two cells, 10 points each — balanced over OCCUPIED cells
    val base = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, 40.0 + (i % 5) * 0.1, -74.0) // one NYC cell
      else (i, 35.0 + (i % 5) * 0.1, 139.0)            // one Tokyo cell
    }.toDF("pid", "lat", "lon")
    GeoIndex.write(base, "pid", "lat", "lon", dir)
    val s0 = GeoIndex.stats(spark, dir).head()
    assert(s0.getAs[Long]("n_points") == 20L)
    assert(s0.getAs[Long]("n_nonempty_cells") == 2L)
    assert(s0.getAs[Double]("skew") == 1.0)
    assert(s0.getAs[Long]("n_pending_commits") == 0L)
    // one-sided ingest: 20 more points, ALL into the NYC cell
    GeoIndex.upsert((101L to 120L).map(i => (i, 40.5, -74.5))
      .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    val s1 = GeoIndex.stats(spark, dir).head()
    assert(s1.getAs[Long]("n_points") == 40L)
    // 30 of 40 in one of 2 occupied cells → skew 1.5: rebuild signal
    assert(s1.getAs[Double]("skew") == 1.5, s1.toString)
    assert(s1.getAs[Long]("n_pending_commits") == 1L)
    // threshold hook: no-op at depth ≤ maxDeltas, folds above
    assert(!GeoIndex.maybeCompact(spark, dir, maxDeltas = 1))
    assert(GeoIndex.maybeCompact(spark, dir, maxDeltas = 0))
    assert(GeoIndex.stats(spark, dir).head()
      .getAs[Long]("n_pending_commits") == 0L)
    assert(GeoIndex.stats(spark, dir).head().getAs[Long]("n_points") == 40L)
  }

  test("pickCellDeg picks the coarsest lattice meeting the occupancy target") {
    // generous target: the global 2000-point scatter fits the coarsest rung
    assert(GeoIndex.pickCellDeg(pts, "lat", "lon",
      targetPerCell = 10000L) == 45.0)
    // tightening the target can only refine the pitch (monotone), and a
    // tight one must leave the coarsest rung
    val tight = GeoIndex.pickCellDeg(pts, "lat", "lon", targetPerCell = 5L)
    val loose = GeoIndex.pickCellDeg(pts, "lat", "lon", targetPerCell = 50L)
    assert(tight <= loose && tight < 45.0, s"tight=$tight loose=$loose")
    // the picked pitch is write()-legal and serves correctly
    val dir = java.nio.file.Files.createTempDirectory("geoidx-pick").toString
    GeoIndex.write(pts, "pid", "lat", "lon", dir, cellDeg = tight)
    val idx = GeoIndex.radiusSearch(spark, dir, 40.0, -74.0, 2000.0)
    val scan = pts
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col("lat"), col("lon"), lit(40.0), lit(-74.0)))
      .filter(col("dist_km") <= 2000.0)
    assert(idx.select("pid").as[Long].collect().toSet ==
      scan.select("pid").as[Long].collect().toSet)
    intercept[IllegalArgumentException] {
      GeoIndex.pickCellDeg(pts, "lat", "lon", 0L)
    }
  }

  test("a geo compact that crashed before sealing is invisible to reads") {
    val dir = java.nio.file.Files.createTempDirectory("geoidx-crash").toString
    GeoIndex.write(Seq((1L, 40.7, -74.0), (2L, 48.9, 2.3))
      .toDF("pid", "lat", "lon"), "pid", "lat", "lon", dir)
    // unsealed newer generation: the crash window of the versioned
    // protocol — reads stay on the sealed generation
    DeltaLog.fs(spark, dir).mkdirs(new Path(s"$dir/cells-v9/cell=0"))
    val r = GeoIndex.radiusSearch(spark, dir, 40.7, -74.0, 100.0)
    assert(r.select("pid").as[Long].collect().toSet == Set(1L))
  }
}
