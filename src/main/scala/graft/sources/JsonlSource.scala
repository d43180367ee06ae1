package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus reader — the interchange format
  * training-data drops actually arrive in — with the reference's
  * poison-pill contract applied at the SOURCE: corrupt lines route to a
  * DLQ relation instead of failing the scan (the row-level analogue of
  * `KafkaAvroSource.splitDecoded`'s per-record decode capture;
  * kafka-plugin's converter failure handling is the semantic model,
  * see /root/reference/kafka-plugin/.../KafkaIngestor.java batch loop).
  *
  * The schema is EXPLICIT, never inferred: schema inference is a full
  * extra pass over the data — at 100 TB a second scan just to guess
  * types — and silently widens on dirty rows, which is how a corrupt
  * shard turns every numeric column into strings. Callers state the
  * contract; rows that don't parse against it are DLQ rows.
  *
  * Implementation note: this deliberately reads `text` + `from_json`
  * rather than `spark.read.json(mode=PERMISSIVE)` with
  * `_corrupt_record` — filtering on the corrupt column alone is
  * unsupported without caching the scan (Spark's documented
  * `_corrupt_record` caveat; caching a 100 TB read is not a plan), while
  * the text form keeps both legs pure streaming projections of one scan.
  *
  * A malformed line yields a null struct → DLQ with the raw line; blank
  * lines are skipped (not data, not poison); a VALID JSON value of the
  * wrong shape (scalar, array) also fails the struct parse → DLQ.
  * Missing fields inside a well-formed object are nulls, not poison —
  * the reference's null-elision semantics, not an error.
  */
object JsonlSource {

  /** Read `path` as JSONL against `schema`. Returns `(good, dlq)`:
    * `good` has exactly the schema's columns; `dlq` is
    * `(raw_line string)` — persist it beside the run like the pipeline
    * DLQ. Both are projections of ONE text scan.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(schema.nonEmpty, "JsonlSource needs a non-empty schema")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare the reserved column $CorruptCol")
    // PERMISSIVE from_json surfaces the raw line in the corrupt column
    // for malformed input (and for valid JSON of the wrong shape), so
    // good vs poison is one null-check — no caching caveat, one scan
    val withCorrupt = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType)
    val parsed = spark.read.textFile(path).toDF("_line")
      .filter(trim(col("_line")) =!= "")
      .select(from_json(col("_line"), withCorrupt,
        java.util.Map.of("columnNameOfCorruptRecord", CorruptCol)).as("_r"))
    val good = parsed.filter(col(s"_r.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"_r.$f")).toSeq: _*)
    val dlq = parsed.filter(col(s"_r.$CorruptCol").isNotNull)
      .select(col(s"_r.$CorruptCol").as("raw_line"))
    (good, dlq)
  }

  val CorruptCol = "_corrupt_record"
}
