package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV corpus reader with the same source-level poison-pill contract as
  * [[JsonlSource]]: rows that do not parse against the EXPLICIT schema
  * route to a DLQ relation instead of failing the scan (the reference's
  * converter-failure semantics — kafka-plugin's per-record capture —
  * applied to the file format training-data drops second-most-arrive
  * in). RFC-4180 quoting is the scan's job, not a downstream regex:
  * quoted fields may contain the delimiter, escaped double-quotes, and
  * EMBEDDED NEWLINES (multiLine mode — one logical record can span
  * physical lines, so a naive line-split corrupts from the first quoted
  * paragraph onward).
  *
  * The schema is explicit, never inferred — inference is a second full
  * pass at 100 TB and silently widens on dirty rows (the JsonlSource
  * argument). Spark's documented `_corrupt_record` caveat (filtering on
  * the corrupt column alone needs a cache) is avoided the same way both
  * relations are derived: each is a fresh scan-projection with a
  * REFERENCED data column in the filter, so nothing is cached and both
  * legs stay pure scans.
  *
  * Scale shape: multiLine CSV is not line-splittable, so each FILE is
  * one task's input — parallelism = file count (exactly how the writer
  * below shards). For splittable ingestion of newline-free CSV, pass
  * `multiLine = false` and Spark splits on block boundaries as usual.
  */
object CsvSource {

  val CorruptCol = "_graft_corrupt"

  /** Read `path` as CSV against `schema`. Returns `(good, dlq)`:
    * `good` has exactly the schema's columns (a row is good only if
    * every field parsed — PERMISSIVE mode's per-field null-on-mismatch
    * is collapsed to the row-level poison contract via the corrupt
    * column); `dlq` is `(raw_record string, <schema columns>)` — the
    * raw record PLUS whatever fields did parse, the triage view a DLQ
    * consumer wants. The data columns also keep the relation legal:
    * Spark refuses a CSV query whose only read column is the corrupt
    * record (the documented caveat) — so don't project `dlq` down to
    * `raw_record` alone without another column or a cache.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true,
      multiLine: Boolean = true): (DataFrame, DataFrame) = {
    require(schema.nonEmpty, "CsvSource needs a non-empty schema")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare the reserved column $CorruptCol")
    val withCorrupt = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType)
    def scan() = spark.read
      .schema(withCorrupt)
      .option("header", header)
      .option("multiLine", multiLine)
      .option("escape", "\"") // RFC 4180: "" escapes a quote
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
    val good = scan().filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val dlq = scan().filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record") +:
        schema.fieldNames.map(col).toSeq: _*)
    (good, dlq)
  }
}
