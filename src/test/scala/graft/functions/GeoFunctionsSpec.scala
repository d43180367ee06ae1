package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val cities = Seq(
    ("nyc", 40.7128, -74.0060),
    ("la", 34.0522, -118.2437),
    ("london", 51.5074, -0.1278),
    ("sydney", -33.8688, 151.2093))
    .toDF("name", "lat", "lon")

  test("haversine matches known great-circle distances") {
    val d = cities.select(col("name"),
        GeoFunctions.haversineKm(col("lat"), col("lon"),
          lit(40.7128), lit(-74.0060)).as("km"))
      .as[(String, Double)].collect().toMap
    assert(d("nyc") == 0.0)
    assert(math.abs(d("la") - 3935.7) < 2.0, d("la").toString)      // NYC–LA
    assert(math.abs(d("london") - 5570.2) < 3.0, d("london").toString)
    assert(math.abs(d("sydney") - 15989.0) < 10.0, d("sydney").toString)
  }

  test("haversine expression: codegen compiles (no silent fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = spark.range(5).select(
          (col("id") * 10.0 - 20.0).as("lat"),
          (col("id") * 30.0 - 60.0).as("lon"))
        .select(GeoFunctions.haversineKm(col("lat"), col("lon"),
          lit(40.0), lit(-74.0)).as("d"))
        .as[Double].collect()
      assert(out.length == 5 && out.forall(d => d >= 0 && d.isFinite))
      // interpreted eval agrees with the generated code
      assert(math.abs(out(2) -
        Haversine.compute(0.0, 0.0, 40.0, -74.0)) < 1e-9)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("inPolygon: ray casting with half-open edges, convex and concave") {
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    def in(poly: Seq[(Double, Double)], lat: Double, lon: Double): Boolean =
      Seq((lat, lon)).toDF("lat", "lon")
        .filter(GeoFunctions.inPolygon(col("lat"), col("lon"), poly))
        .count() == 1
    assert(in(square, 5.0, 5.0))
    assert(!in(square, 15.0, 5.0) && !in(square, 5.0, 15.0))
    assert(!in(square, -1.0, 5.0))
    // closed-ring input (first == last vertex) accepted
    assert(in(square :+ square.head, 5.0, 5.0))
    // concave L-shape: the notch is OUTSIDE
    val ell = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
      (4.0, 10.0), (0.0, 10.0))
    assert(in(ell, 2.0, 8.0))    // lower arm
    assert(in(ell, 8.0, 2.0))    // left arm
    assert(!in(ell, 8.0, 8.0))   // the notch
    // shared-edge rule: a point on the boundary between two adjacent
    // squares belongs to exactly one of them
    val left = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (0.0, 5.0))
    val right = Seq((0.0, 5.0), (10.0, 5.0), (10.0, 10.0), (0.0, 10.0))
    val onEdge = Seq(in(left, 5.0, 5.0), in(right, 5.0, 5.0))
    assert(onEdge.count(identity) == 1, onEdge.toString)
  }

  test("bounding box is conservative: never excludes an in-radius point") {
    // 5000 deterministic points; every point the radius keeps must be in
    // the box (the prefilter contract), at a latitude where lon widening
    // matters (60°N → cos factor 0.5)
    val pts = spark.range(5000).select(col("id"),
      ((col("id") * 37 % 17000).cast("double") / 100.0 - 85.0).as("lat"),
      ((col("id") * 91 % 36000).cast("double") / 100.0 - 180.0).as("lon"))
    val escaped = pts.filter(
      GeoFunctions.withinRadiusKm(col("lat"), col("lon"), 60.0, 10.0, 2000.0) &&
        !GeoFunctions.inBoundingBox(col("lat"), col("lon"), 60.0, 10.0, 2000.0))
    assert(escaped.count() == 0)
    // and the box is a real prefilter: it rejects most of the globe
    val boxed = pts.filter(
      GeoFunctions.inBoundingBox(col("lat"), col("lon"), 60.0, 10.0, 2000.0))
    assert(boxed.count() < 2000, boxed.count().toString)
    // polar center: longitude pad saturates instead of dividing by ~0
    val polar = pts.filter(
      GeoFunctions.withinRadiusKm(col("lat"), col("lon"), 89.9, 0.0, 500.0) &&
        !GeoFunctions.inBoundingBox(col("lat"), col("lon"), 89.9, 0.0, 500.0))
    assert(polar.count() == 0)
  }

  test("bounding box wraps the antimeridian") {
    // center 5°N 179°E, 1000 km radius: the box spans lon∈[170, -172]
    // across the seam — a point stored at lon=-175 (≡ 185°E, ~670 km
    // away) is inside the radius and MUST pass the prefilter
    val fiji = Seq(("wrapped", 5.0, -175.0), ("inside", 5.0, 176.0),
      ("far", 5.0, 150.0)).toDF("name", "lat", "lon")
    val kept = fiji.filter(
        GeoFunctions.inBoundingBox(col("lat"), col("lon"), 5.0, 179.0, 1000.0))
      .select("name").as[String].collect().toSet
    assert(kept == Set("wrapped", "inside"), kept.toString)
    // full sweep on both sides of the seam: no in-radius point escapes
    val pts = spark.range(5000).select(col("id"),
      ((col("id") * 37 % 17000).cast("double") / 100.0 - 85.0).as("lat"),
      ((col("id") * 91 % 36000).cast("double") / 100.0 - 180.0).as("lon"))
    for (centerLon <- Seq(179.0, -179.5)) {
      val escaped = pts.filter(
        GeoFunctions.withinRadiusKm(col("lat"), col("lon"), 5.0, centerLon,
          1500.0) &&
          !GeoFunctions.inBoundingBox(col("lat"), col("lon"), 5.0, centerLon,
            1500.0))
      assert(escaped.count() == 0, s"centerLon=$centerLon")
    }
  }

  test("inBox: explicit box, plain and antimeridian-wrapping") {
    val pts = Seq(
      ("inPlain", 10.0, 20.0), ("outLat", 60.0, 20.0),
      ("outLon", 10.0, 80.0),
      ("fijiE", 5.0, 175.0), ("fijiW", 5.0, -175.0),
      ("greenwich", 5.0, 0.0)).toDF("name", "lat", "lon")
    // plain box
    assert(pts.filter(GeoFunctions.inBox(col("lat"), col("lon"),
        -30.0, 45.0, -10.0, 40.0))
      .select("name").as[String].collect().toSet ==
      Set("inPlain", "greenwich"))
    // wrapping box: minLon > maxLon spans the antimeridian
    assert(pts.filter(GeoFunctions.inBox(col("lat"), col("lon"),
        -30.0, 45.0, 170.0, -170.0))
      .select("name").as[String].collect().toSet == Set("fijiE", "fijiW"))
    intercept[IllegalArgumentException] {
      GeoFunctions.inBox(col("lat"), col("lon"), 50.0, -50.0, 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      GeoFunctions.inBox(col("lat"), col("lon"), 0.0, 1.0, -200.0, 0.0)
    }
  }
}
