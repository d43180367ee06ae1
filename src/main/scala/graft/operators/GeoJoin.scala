package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Spatial radius join — every (center, point) pair within `radiusKm`,
  * WITHOUT the point × center cross product: the geo analogue of the
  * range-join bin trick (`operators/RangeJoin`). Points project once
  * onto a fixed `cellDeg°` grid; each center replicates to exactly the
  * grid cells its (exact-extent, wrap-aware) bounding box touches —
  * bounded by O((2r/cell + 2)²) cells per center — and the join is a
  * plain equi-join on the cell key, haversine-verified. At 100 TB of
  * points the shuffle carries each point ONCE (its cell key), the
  * replicated center list stays centers × cells-sized and broadcasts,
  * and no Cartesian/BroadcastNestedLoop plan can appear because the
  * join has an equality key by construction.
  *
  * Antimeridian: a box spanning ±180° covers its longitude range mod
  * 360, so cells on both sides of the seam are enumerated; poles: a box
  * reaching a pole covers the full longitude ring at that latitude.
  */
object GeoJoin {

  /** `(centerId, idCol, dist_km)` for every point within `radiusKm` of a
    * center. `centers` is the small side (serving sites, cities, POIs) —
    * a Scala list that becomes a broadcast literal relation.
    */
  def geoRadiusJoin(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, centers: Seq[(Long, Double, Double)],
      radiusKm: Double, cellDeg: Double = 5.0): DataFrame = {
    require(centers.nonEmpty, "geoRadiusJoin needs at least one center")
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    require(cellDeg > 0 && cellDeg <= 45,
      s"cellDeg must be in (0, 45], got $cellDeg")
    val spark = points.sparkSession

    // exact-extent pads (the inBoundingBox math, reused driver-side)
    val delta = radiusKm / GeoFunctions.EarthRadiusKm
    val dLat = math.toDegrees(delta)
    def lonPad(centerLat: Double): Double = {
      val cosLat = math.cos(math.toRadians(centerLat))
      val sinD = math.sin(delta)
      if (math.abs(centerLat) + dLat >= 90.0 || sinD >= cosLat) 180.0
      else math.toDegrees(math.asin(sinD / cosLat))
    }
    val lonCells = math.ceil(360.0 / cellDeg).toInt
    def latCell(lat: Double): Int = math.floor(lat / cellDeg).toInt
    // canonical longitude cell domain [0, lonCells): normalize to
    // [0, 360) first so both sides of the antimeridian share ids
    def lonCell(lon: Double): Int = {
      val n = ((lon % 360.0) + 360.0) % 360.0
      math.min(math.floor(n / cellDeg).toInt, lonCells - 1)
    }

    val replicated = centers.flatMap { case (cid, clat, clon) =>
      val dLon = lonPad(clat)
      val latLo = latCell(math.max(-90.0, clat - dLat))
      val latHi = latCell(math.min(90.0, clat + dLat))
      val lonRange: Seq[Int] =
        if (dLon >= 180.0) 0 until lonCells
        else {
          val lo = lonCell(clon - dLon)
          val hi = lonCell(clon + dLon)
          // wrap-aware: enumerate mod the ring size
          val span = ((hi - lo) % lonCells + lonCells) % lonCells
          (0 to span).map(i => ((lo + i) % lonCells + lonCells) % lonCells)
        }
      for (la <- latLo to latHi; lo <- lonRange)
        yield (cid, clat, clon, la, lo)
    }
    val centersDf = broadcast(spark.createDataFrame(replicated)
      .toDF("center_id", "_clat", "_clon", "_cla", "_clo"))

    points
      .withColumn("_cla", floor(col(latCol) / cellDeg).cast("int"))
      .withColumn("_clo", least(
        floor(pmod(col(lonCol), lit(360.0)) / cellDeg).cast("int"),
        lit(lonCells - 1)))
      .join(centersDf, Seq("_cla", "_clo"))
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col(latCol), col(lonCol), col("_clat"), col("_clon")))
      .filter(col("dist_km") <= radiusKm)
      .select(col("center_id"), col(idCol), col("dist_km"))
  }
}
