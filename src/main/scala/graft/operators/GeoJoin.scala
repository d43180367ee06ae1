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

  /** Longitude cells in a `cellDeg°` grid ring. */
  private[graft] def lonCellCount(cellDeg: Double): Int =
    math.ceil(360.0 / cellDeg).toInt

  private[graft] def latCellOf(lat: Double, cellDeg: Double): Int =
    math.floor(lat / cellDeg).toInt

  /** Canonical longitude cell in `[0, lonCellCount)`: normalized to
    * `[0, 360)` first so both sides of the antimeridian share ids.
    */
  private[graft] def lonCellOf(lon: Double, cellDeg: Double): Int = {
    val n = ((lon % 360.0) + 360.0) % 360.0
    math.min(math.floor(n / cellDeg).toInt, lonCellCount(cellDeg) - 1)
  }

  /** The `(latCell, lonCell)` grid cells a radius ball around a center
    * touches — exact-extent (the [[GeoFunctions.inBoundingBox]] math),
    * wrap-aware at ±180°, saturating to the full ring when the box
    * reaches a pole. Bounded by O((2r/cell + 2)²) cells; never excludes
    * a cell containing an in-radius point, so any cell-pruned scan is a
    * safe prefilter ([[graft.sink.GeoIndex]] serves off exactly this
    * cover).
    */
  private[graft] def coveredCells(clat: Double, clon: Double,
      radiusKm: Double, cellDeg: Double): Seq[(Int, Int)] = {
    val delta = radiusKm / GeoFunctions.EarthRadiusKm
    val dLat = math.toDegrees(delta)
    val cosLat = math.cos(math.toRadians(clat))
    val sinD = math.sin(delta)
    val dLon =
      if (math.abs(clat) + dLat >= 90.0 || sinD >= cosLat) 180.0
      else math.toDegrees(math.asin(sinD / cosLat))
    val nLon = lonCellCount(cellDeg)
    val latLo = latCellOf(math.max(-90.0, clat - dLat), cellDeg)
    val latHi = latCellOf(math.min(90.0, clat + dLat), cellDeg)
    val lonRange: Seq[Int] =
      if (dLon >= 180.0) 0 until nLon
      else {
        val lo = lonCellOf(clon - dLon, cellDeg)
        val hi = lonCellOf(clon + dLon, cellDeg)
        // wrap-aware: enumerate mod the ring size
        val span = ((hi - lo) % nLon + nLon) % nLon
        (0 to span).map(i => ((lo + i) % nLon + nLon) % nLon)
      }
    for (la <- latLo to latHi; lo <- lonRange) yield (la, lo)
  }

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
    val lonCells = lonCellCount(cellDeg)

    val replicated = centers.flatMap { case (cid, clat, clon) =>
      coveredCells(clat, clon, radiusKm, cellDeg).map { case (la, lo) =>
        (cid, clat, clon, la, lo)
      }
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
