package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's vectorized
  * parquet reader rejects unless `spark.sql.legacy.parquet.nanosAsLong` is
  * set; we read the raw nanos and expose a proper microsecond timestamp
  * column so downstream operators see a normal `TimestampType`. The conf
  * belongs to SESSION CONSTRUCTION (set it in the builder, as Bench /
  * Verify / PlanProbe and the test harness do — see [[nanosAsLongConf]]):
  * a table loader that mutated session state as a side effect would
  * surprise any library user sharing the session. [[load]] only verifies
  * it and fails with guidance.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Loaded relations are memoized per (session, path) — a fresh
    * `spark.read.parquet` re-lists files and re-reads footers for schema
    * on EVERY query, a flat per-query tax that a catalog's cached
    * relation metadata avoids (exactly what a table catalog does on a
    * real cluster). The cached object is the lazy DataFrame, not data.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The session conf the nanos-timestamped test tables need. */
  val nanosAsLongConf: String = "spark.sql.legacy.parquet.nanosAsLong"

  /** Read one table from a scale-factor directory. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"), { case (_, path) =>
      require(name != "events" ||
          spark.conf.get(nanosAsLongConf, "false") == "true",
        s"set .config(\"$nanosAsLongConf\", \"true\") on the SparkSession " +
          "builder (events.parquet carries INT64 TIMESTAMP(NANOS))")
      val df = spark.read.parquet(path)
      if (name == "events")
        // raw column is nanos-since-epoch (long); expose micros
        // TimestampType. Integer `div`, NOT `/`: float division on
        // ~1.7e18 nanos exceeds double's exact integer range and corrupts
        // the low digits. The raw nanos survive as `ts_ns`: predicates
        // against the derived timestamp cannot reach the parquet scan (no
        // pushdown through timestamp_micros), so time-range scans must
        // filter on ts_ns.
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
