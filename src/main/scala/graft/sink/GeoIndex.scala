package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GeoFunctions
import graft.operators.GeoJoin

/** Persisted geo layout: points Hive-partitioned by their `cellDeg°`
  * grid cell — the [[VectorIndex]] cell pattern on [[GeoJoin]]'s grid.
  * Radius and nearest-k queries enumerate the covered cells DRIVER-side
  * (`GeoJoin.coveredCells`, exact-extent / wrap / pole-aware) and read
  * only those directories: `cell IN (…)` is a partition-column
  * predicate, so the file index never lists the unprobed cells
  * (`PartitionFilters` in the scan — spec-pinned). Per-query scan cost
  * is covered-cells / total-cells of the index regardless of corpus
  * size; the reference's geo surface is sharding-side (geohash
  * partitioning, `shard/Sharding.scala` cites it) and this is the
  * serving-side complement.
  *
  * Layout under `dir`:
  *   - `meta/` — one row `(id_col, lat_col, lon_col, cell_deg)`.
  *   - `cells/cell=<i>/` — the points, one directory per non-empty grid
  *     cell, `cell = (latCell - latCell(-90)) · lonCells + lonCell`.
  *
  * The layout is immutable (rebuild = re-[[write]]); a mutable variant
  * would add the [[DeltaLog]] commit protocol exactly as
  * [[VectorIndex]] does — same grid, same pruning.
  */
object GeoIndex {

  private val metaSchema = StructType(Seq(
    StructField("id_col", StringType, nullable = false),
    StructField("lat_col", StringType, nullable = false),
    StructField("lon_col", StringType, nullable = false),
    StructField("cell_deg", DoubleType, nullable = false)))

  private final case class Meta(idCol: String, latCol: String,
      lonCol: String, cellDeg: Double)

  private def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.schema(metaSchema).parquet(s"$dir/meta").head()
    Meta(r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))
  }

  /** Combined non-negative cell id for a (latCell, lonCell) pair. */
  private def cellId(la: Int, lo: Int, cellDeg: Double): Int =
    (la - GeoJoin.latCellOf(-90.0, cellDeg)) *
      GeoJoin.lonCellCount(cellDeg) + lo

  /** Lay `points` out by grid cell. One shuffle on the cell key keeps
    * one file per cell (not tasks × cells small files).
    */
  def write(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, dir: String, cellDeg: Double = 15.0): Unit = {
    require(cellDeg > 0 && cellDeg <= 45,
      s"cellDeg must be in (0, 45], got $cellDeg")
    val spark = points.sparkSession
    val nLon = GeoJoin.lonCellCount(cellDeg)
    val latOff = GeoJoin.latCellOf(-90.0, cellDeg)
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(idCol, latCol, lonCol, cellDeg)), 1), metaSchema)
      .write.mode("overwrite").parquet(s"$dir/meta")
    points
      .withColumn("cell",
        ((floor(col(latCol) / cellDeg).cast("int") - lit(latOff)) * nLon +
          least(floor(pmod(col(lonCol), lit(360.0)) / cellDeg).cast("int"),
            lit(nLon - 1))).cast("int"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Every indexed point within `radiusKm` of the center, with
    * `dist_km` appended — reads ONLY the covered cell directories.
    */
  def radiusSearch(spark: SparkSession, dir: String, centerLat: Double,
      centerLon: Double, radiusKm: Double): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    val m = readMeta(spark, dir)
    val cells = GeoJoin.coveredCells(centerLat, centerLon, radiusKm,
        m.cellDeg)
      .map { case (la, lo) => cellId(la, lo, m.cellDeg) }
    spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(cells: _*))
      .filter(GeoFunctions.inBoundingBox(col(m.latCol), col(m.lonCol),
        centerLat, centerLon, radiusKm))
      .withColumn("dist_km", GeoFunctions.haversineKm(
        col(m.latCol), col(m.lonCol), lit(centerLat), lit(centerLon)))
      .filter(col("dist_km") <= radiusKm)
      .drop("cell")
  }

  /** Spatial radius JOIN off the persisted layout: every
    * `(center, point)` pair within `radiusKm`, reading ONLY the union
    * of the centers' covered cells — the serving twin of
    * [[GeoJoin.geoRadiusJoin]] (which it delegates to for the join
    * itself, on the pruned frame). At 100 TB the base scan is bounded
    * by covered-cells/total-cells however many points exist; the join
    * stays the grid-cell equi-join with no cross product.
    */
  def radiusJoin(spark: SparkSession, dir: String,
      centers: Seq[(Long, Double, Double)], radiusKm: Double): DataFrame = {
    require(centers.nonEmpty, "radiusJoin needs at least one center")
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    val m = readMeta(spark, dir)
    val cells = centers.flatMap { case (_, clat, clon) =>
      GeoJoin.coveredCells(clat, clon, radiusKm, m.cellDeg)
        .map { case (la, lo) => cellId(la, lo, m.cellDeg) }
    }.distinct
    val pruned = spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(cells: _*))
      .drop("cell")
    GeoJoin.geoRadiusJoin(pruned, m.idCol, m.latCol, m.lonCol,
      centers, radiusKm)
  }

  /** The `k` nearest indexed points to the center by haversine —
    * ring-expansion off the cell layout: probe a radius, double until
    * ≥ k points fall inside (≤ ~8 bounded driver-side counts), then
    * top-k. Exactness: the covered-cell set fully contains each probed
    * ball, so once k points sit within `r`, no unread cell can hold a
    * closer point. The final radius saturates at half the circumference
    * (the whole index) for k > matching points. Output
    * `(idCol, dist_km rounded 3dp)` ranked `(dist_km, id)` — the
    * engine-reproducible cut the scan-form nearest-k uses.
    */
  def knnSearch(spark: SparkSession, dir: String, centerLat: Double,
      centerLon: Double, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val m = readMeta(spark, dir)
    val maxR = math.Pi * GeoFunctions.EarthRadiusKm // antipode distance
    var r = m.cellDeg * 111.2 // ~km per degree: one cell ring
    while (radiusSearch(spark, dir, centerLat, centerLon, r)
        .limit(k).count() < k && r < maxR) {
      r = math.min(r * 2, maxR)
    }
    // +10 m margin: a point just OUTSIDE r can 3dp-round-tie with the
    // kth point inside and win the id tie-break — include the boundary
    // shell so the cut is identical to the whole-corpus scan form
    radiusSearch(spark, dir, centerLat, centerLon, math.min(r + 0.01, maxR))
      .withColumn("dist_km", round(col("dist_km"), 3))
      .orderBy(col("dist_km"), col(m.idCol))
      .limit(k)
      .select(col(m.idCol), col("dist_km"))
  }
}
