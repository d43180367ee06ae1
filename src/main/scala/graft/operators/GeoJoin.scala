package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Columnar twin of [[coveredCells]]: replicate each center ROW to the
    * grid cells its (exact-extent, wrap/pole-aware) radius box touches,
    * appending `_cla`/`_clo` cell columns — one output row per
    * (center, covered cell), bounded by O((2r/cell + 2)²) per center.
    * Same IEEE-double math, floor, and ring-modulus as the driver-side
    * enumeration, so both forms produce identical cell sets and the
    * DataFrame-centers join paths answer exactly like the Seq forms.
    * `radius` (km) may be a literal or a PER-CENTER column (the knn
    * join's per-center stopping radius). Preserves every input column.
    */
  private[graft] def replicateToCells(centers: DataFrame, latCol: String,
      lonCol: String, radius: Column, cellDeg: Double): DataFrame = {
    val nLon = lonCellCount(cellDeg)
    def lonCell(c: Column): Column =
      least(floor(pmod(c, lit(360.0)) / cellDeg).cast("int"), lit(nLon - 1))
    val delta = radius / GeoFunctions.EarthRadiusKm
    val sinD = sin(delta)
    val cosLat = cos(radians(col(latCol)))
    val dLat = degrees(delta)
    val dLon = when(abs(col(latCol)) + dLat >= 90.0 || sinD >= cosLat,
        lit(180.0))
      .otherwise(degrees(asin(sinD / cosLat)))
    centers
      .withColumn("_dlat", dLat)
      .withColumn("_dlon", dLon)
      .withColumn("_latlo",
        floor(greatest(lit(-90.0), col(latCol) - col("_dlat")) / cellDeg)
          .cast("int"))
      .withColumn("_lathi",
        floor(least(lit(90.0), col(latCol) + col("_dlat")) / cellDeg)
          .cast("int"))
      .withColumn("_lonlo", lonCell(col(lonCol) - col("_dlon")))
      // full-ring saturation (pole / antimeridian-wide box) = span nLon-1
      .withColumn("_span", when(col("_dlon") >= 180.0, lit(nLon - 1))
        .otherwise(pmod(lonCell(col(lonCol) + col("_dlon")) - col("_lonlo"),
          lit(nLon))))
      .withColumn("_cla", explode(sequence(col("_latlo"), col("_lathi"))))
      .withColumn("_i", explode(sequence(lit(0), col("_span"))))
      .withColumn("_clo", pmod(col("_lonlo") + col("_i"), lit(nLon)))
      .drop("_dlat", "_dlon", "_latlo", "_lathi", "_lonlo", "_span", "_i")
  }

  /** DataFrame-centers form of [[geoRadiusJoin]] — the UNBOUNDED-centers
    * path ("every order × depots within r"): centers never touch the
    * driver. The cell cover is computed natively ([[replicateToCells]] —
    * two generators, no collect) and the join is the same grid-cell
    * equi-join, so the shuffle still carries each point once; the
    * replicated center side is centers × cells rows — broadcast when
    * small (AQE decides), shuffled on the cell key when not. `radius`
    * may be `lit(km)` or a per-center column of `centers`. Output
    * `(center_id, idCol, dist_km)` — identical rows to the Seq form on
    * the same centers (the covers are computed with the same math).
    */
  def geoRadiusJoin(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, centers: DataFrame, cIdCol: String, cLatCol: String,
      cLonCol: String, radius: Column, cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && cellDeg <= 45,
      s"cellDeg must be in (0, 45], got $cellDeg")
    val nLon = lonCellCount(cellDeg)
    val c = centers.withColumn("_r", radius)
      .select(col(cIdCol).as("center_id"), col(cLatCol).as("_clat"),
        col(cLonCol).as("_clon"), col("_r"))
    val repl = replicateToCells(c, "_clat", "_clon", col("_r"), cellDeg)
    points
      .withColumn("_cla", floor(col(latCol) / cellDeg).cast("int"))
      .withColumn("_clo", least(
        floor(pmod(col(lonCol), lit(360.0)) / cellDeg).cast("int"),
        lit(nLon - 1)))
      .join(repl, Seq("_cla", "_clo"))
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col(latCol), col(lonCol), col("_clat"), col("_clon")))
      .filter(col("dist_km") <= col("_r"))
      .select(col("center_id"), col(idCol), col("dist_km"))
  }

  /** `(centerId, idCol, dist_km)` for every point within `radiusKm` of a
    * center. `centers` is the small side (serving sites, cities, POIs) —
    * a Scala list that becomes a broadcast literal relation. For center
    * sets too large for the driver, use the DataFrame overload.
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
