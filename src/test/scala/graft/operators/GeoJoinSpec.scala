package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GeoFunctions

class GeoJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = spark.range(4000).select(col("id"),
    ((col("id") * 37 % 17000).cast("double") / 100.0 - 85.0).as("lat"),
    ((col("id") * 91 % 36000).cast("double") / 100.0 - 180.0).as("lon"))

  private def brute(centers: Seq[(Long, Double, Double)],
      radiusKm: Double): Set[(Long, Long)] = {
    val c = centers.toDF("center_id", "clat", "clon")
    pts.crossJoin(c)
      .withColumn("d", GeoFunctions.haversineKm(
        col("lat"), col("lon"), col("clat"), col("clon")))
      .filter(col("d") <= radiusKm)
      .select("center_id", "id").as[(Long, Long)].collect().toSet
  }

  test("grid equi-join ≡ brute force, including antimeridian and polar centers") {
    val centers = Seq(
      (1L, 40.0, -74.0),     // mid-latitude
      (2L, -51.0, 179.5),    // hugs the antimeridian — cells wrap the seam
      (3L, 88.0, 10.0))      // near-polar — lon pad saturates to the ring
    val got = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon", centers, 1200.0)
      .select("center_id", "id").as[(Long, Long)].collect().toSet
    val expect = brute(centers, 1200.0)
    assert(got == expect && expect.nonEmpty)
    // every center actually matched something (the seam/pole paths ran)
    assert(got.map(_._1) == Set(1L, 2L, 3L), got.map(_._1).toString)
  }

  test("the join is an equi-join on the cell key — no cartesian plan") {
    val plan = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon",
        Seq((1L, 0.0, 0.0)), 500.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("DataFrame-centers form ≡ Seq form, incl. per-center radius column") {
    val centers = Seq(
      (1L, 40.0, -74.0),
      (2L, -51.0, 179.5),    // antimeridian — the wrap path
      (3L, 88.0, 10.0))      // near-polar — the ring-saturation path
    val cdf = centers.toDF("cid", "clat", "clon")
    val seqForm = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon",
        centers, 1200.0)
      .select("center_id", "id").as[(Long, Long)].collect().toSet
    val dfForm = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon",
        cdf, "cid", "clat", "clon", lit(1200.0), 5.0)
      .select("center_id", "id").as[(Long, Long)].collect().toSet
    assert(dfForm == seqForm && dfForm.nonEmpty)
    // per-center radius: center 1 at 1000 km, center 2 at 2000 km —
    // each pair verified against ITS center's radius, not a global one
    val perR = Seq((1L, 40.0, -74.0, 1000.0), (2L, -51.0, 179.5, 2000.0))
      .toDF("cid", "clat", "clon", "r")
    val got = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon",
        perR, "cid", "clat", "clon", col("r"), 5.0)
      .select("center_id", "id").as[(Long, Long)].collect().toSet
    val expect = (brute(Seq((1L, 40.0, -74.0)), 1000.0) ++
      brute(Seq((2L, -51.0, 179.5)), 2000.0))
    assert(got == expect && got.map(_._1) == Set(1L, 2L))
  }

  test("DataFrame-centers construction is fully lazy — zero driver jobs") {
    val cdf = Seq((1L, 40.0, -74.0)).toDF("cid", "clat", "clon")
    // job-start events are posted at submit time; give the async status
    // store a beat to settle on both reads so the counts are comparable
    def jobCount(): Int = {
      Thread.sleep(300)
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    }
    val before = jobCount()
    val joined = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon",
      cdf, "cid", "clat", "clon", lit(1200.0), 5.0)
    val after = jobCount()
    assert(after == before,
      s"building the DF-centers join ran ${after - before} driver job(s)")
    assert(joined.count() > 0) // and it still answers
  }

  test("center replication is bounded by the covered-cell count") {
    // 500 km at the equator with 5° cells: lat span ≤ 3 cells, lon span
    // ≤ 3 cells → at most 9 replicas — not the whole grid
    val centers = Seq((1L, 0.0, 0.0))
    val joined = GeoJoin.geoRadiusJoin(pts, "id", "lat", "lon", centers, 500.0)
    // indirect pin: distinct cells on the broadcast side ≤ 9 means the
    // result can only draw points from ≤ 9 cells
    val cells = pts
      .withColumn("_cla", floor(col("lat") / 5.0).cast("int"))
      .withColumn("_clo", floor(pmod(col("lon"), lit(360.0)) / 5.0).cast("int"))
      .join(joined.select(col("id")), "id")
      .select("_cla", "_clo").distinct().count()
    assert(cells <= 9, cells.toString)
  }
}
