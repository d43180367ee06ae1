package graft.sink

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
    val total = spark.read.parquet(s"$dir/cells").inputFiles.length.toLong
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
    val total = spark.read.parquet(s"$dir/cells").inputFiles.length.toLong
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
}
