package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo distance as COLUMN COMPOSITIONS over builtin math — every term is
  * codegen'd (no UDF), so a radius filter runs at scan speed and pushes
  * nothing to the driver. The reference's geo surface is sharding-side
  * (geohash partitioning, `shard/Sharding.scala`); these give the
  * query-side complement: distance, radius predicates, bounding-box
  * prefilters.
  *
  * Cross-engine determinism: trig libms differ in the last ULP across
  * engines, so gated comparisons round the final distance (the BM25
  * `round(ln(...), 6)` convention) — never the intermediate terms.
  */
object GeoFunctions {

  /** Mean Earth radius (IUGG), km. */
  val EarthRadiusKm: Double = 6371.0088

  /** Great-circle distance in km between two (degree) points — the
    * haversine formula: `2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))`.
    */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // one recognizable Catalyst node (bit-identical math, see
    // Haversine.compute) so the GeoRadiusPrefilter optimizer rule can
    // pattern-match `haversine <= r` and inject the pushable bbox
    // the no-op double casts vanish in SimplifyCasts, so the optimizer
    // rule still sees bare literals; non-double inputs coerce here
    column(Haversine(
      expression(lat1.cast("double")), expression(lon1.cast("double")),
      expression(lat2.cast("double")), expression(lon2.cast("double"))))
  }

  /** Radius predicate: point within `radiusKm` of the center. Combine
    * with [[inBoundingBox]] so the cheap rectangle (plain comparisons —
    * pushable, row-group prunable on lat/lon-sorted layouts) rejects the
    * bulk before any trig runs.
    */
  def withinRadiusKm(lat: Column, lon: Column,
      centerLat: Double, centerLon: Double, radiusKm: Double): Column =
    haversineKm(lat, lon, lit(centerLat), lit(centerLon)) <= radiusKm

  /** Point-in-polygon (ray casting): odd number of polygon edges crossed
    * by the eastward ray from the point ⇒ inside. The polygon is a plan
    * literal, so the even-odd test UNROLLS into one codegen'd arithmetic
    * expression per edge (comparisons + one division — no trig, no HOF,
    * no UDF) and is bit-identical in any engine: planar semantics over
    * (lat, lon) degrees, the GeoJSON-style convention for region tagging
    * (polygons spanning the antimeridian must be pre-split by the
    * caller, as in GeoJSON). Points exactly on a boundary follow the
    * half-open edge rule (`(y1 > p) != (y2 > p)`), so shared edges of
    * adjacent polygons never double-count a point.
    */
  def inPolygon(lat: Column, lon: Column,
      polygon: Seq[(Double, Double)]): Column = {
    require(polygon.size >= 3, "polygon needs at least 3 vertices")
    val closed = if (polygon.head == polygon.last) polygon.dropRight(1)
      else polygon
    require(closed.size >= 3, "polygon needs at least 3 distinct vertices")
    val crossings = closed.indices.map { i =>
      val (y1, x1) = closed(i)
      val (y2, x2) = closed((i + 1) % closed.size)
      when((lit(y1) > lat) =!= (lit(y2) > lat),
        when(lon < (lit(x2 - x1) * (lat - y1) / lit(y2 - y1) + x1), 1)
          .otherwise(0))
        .otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** Conservative bounding box around a radius — the latitude pad is the
    * exact angular radius `δ = r/R`, and the longitude pad is the EXACT
    * circle extent `asin(sin δ / cos φ)` (the circle bulges widest at a
    * latitude poleward of the center, so the naive `δ / cos φ`
    * approximation UNDER-covers at high latitude); a circle crossing a
    * pole saturates to the full longitude range. Never excludes a point
    * inside the radius — safe as a prefilter.
    */
  /** The exact-extent box bounds as PLAN-TIME doubles: `(minLat,
    * maxLat, lonRanges)` where `lonRanges` is `None` for "all
    * longitudes" (polar saturation) or 1–2 inclusive `[lo, hi]` ranges
    * (2 when the box crosses ±180). Shared by the Column form below and
    * the [[graft.plans.GeoRules.GeoRadiusPrefilter]] optimizer rule,
    * which must assemble RAW catalyst expressions.
    */
  private[graft] def boxBounds(centerLat: Double, centerLon: Double,
      radiusKm: Double): (Double, Double, Option[Seq[(Double, Double)]]) = {
    val delta = radiusKm / EarthRadiusKm // angular radius, radians
    val dLat = math.toDegrees(delta)
    val cosLat = math.cos(math.toRadians(centerLat))
    val sinD = math.sin(delta)
    val dLon =
      if (math.abs(centerLat) + dLat >= 90.0 || sinD >= cosLat) 180.0
      else math.toDegrees(math.asin(sinD / cosLat))
    // Antimeridian-safe longitude ranges, decided at PLAN time: a box
    // like lon∈[152, 206] around centerLon=179 must admit a point
    // stored at -170 (≡ 190), so a box crossing ±180 splits into a
    // two-range disjunction. Ranges stay plain comparisons on the raw
    // column — parquet-pushable, unlike a pmod wrap.
    val (lo, hi) = (centerLon - dLon, centerLon + dLon)
    val ranges =
      if (dLon >= 180.0) None
      else if (lo < -180.0) Some(Seq((-180.0, hi), (lo + 360.0, 180.0)))
      else if (hi > 180.0) Some(Seq((lo, 180.0), (-180.0, hi - 360.0)))
      else Some(Seq((lo, hi)))
    (centerLat - dLat, centerLat + dLat, ranges)
  }

  def inBoundingBox(lat: Column, lon: Column,
      centerLat: Double, centerLon: Double, radiusKm: Double): Column = {
    val (minLat, maxLat, ranges) = boxBounds(centerLat, centerLon, radiusKm)
    val lonPred = ranges match {
      case None => lit(true)
      case Some(rs) => rs.map { case (lo, hi) => lon.between(lo, hi) }
        .reduce(_ || _)
    }
    lat.between(minLat, maxLat) && lonPred
  }

  /** Explicit bounding-box membership (the ES `geo_bounding_box`
    * query): `[minLat, maxLat]` × a longitude range that may CROSS the
    * antimeridian — `minLon > maxLon` means the box wraps (`lon ≥
    * minLon OR lon ≤ maxLon`, the Fiji/Bering case every naive BETWEEN
    * silently empties). Plain literal comparisons on the raw columns,
    * so the lat leg and a non-wrapping lon leg push to parquet
    * row-group pruning.
    */
  def inBox(lat: Column, lon: Column, minLat: Double, maxLat: Double,
      minLon: Double, maxLon: Double): Column = {
    require(minLat <= maxLat,
      s"minLat ($minLat) must be <= maxLat ($maxLat)")
    require(minLat >= -90 && maxLat <= 90, "lat bounds must be in [-90,90]")
    require(minLon >= -180 && minLon <= 180 &&
      maxLon >= -180 && maxLon <= 180, "lon bounds must be in [-180,180]")
    val lonPred =
      if (minLon <= maxLon) lon >= minLon && lon <= maxLon
      else lon >= minLon || lon <= maxLon // antimeridian wrap
    lat.between(minLat, maxLat) && lonPred
  }
}
