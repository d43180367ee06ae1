package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.GenericRecord

/** Kafka-side Avro → document conversion (SURVEY §2.2 P1, §1.2 Avro rows),
  * mirroring `AvroToAddDocumentConverter.java:19-104`:
  *
  *   - nested records flatten recursively to `parent_child` field names
  *   - arrays become multi-valued fields (one string per element);
  *     arrays of records stringify each record
  *   - UNION(null, T) unwraps to the value; null values are skipped
  *     entirely (no field emitted)
  *   - primitives/strings stringify via `String.valueOf`; Avro logical
  *     date/timestamp types arrive as epoch ints/longs and stringify as-is
  *
  * This is executor-side plain-JVM code: in a Kafka Structured Streaming
  * pipeline it runs inside `mapPartitions` after the broker deserializer,
  * one call per record — no driver involvement, scales with partitions.
  * (The Confluent wire-format deserializer itself needs the schema-registry
  * client, which is not shipped in this environment; the conversion
  * semantics — the hard part — are fully implemented and golden-tested.)
  */
object AvroDocConverter {

  /** One document: every value multi-valued, per the sink contract. */
  type Doc = Map[String, Seq[String]]

  def convert(record: GenericRecord): Doc = {
    val out = Map.newBuilder[String, Seq[String]]
    processRecord(record, "", out)
    out.result()
  }

  private def processRecord(record: GenericRecord, prefix: String,
      out: scala.collection.mutable.Builder[(String, Seq[String]), Doc]): Unit = {
    record.getSchema.getFields.asScala.foreach { field =>
      val name = if (prefix.isEmpty) field.name else s"${prefix}_${field.name}"
      val value = record.get(field.name)
      if (value != null) { // null → field absent (AvroToAddDocumentConverter.java:41-43)
        value match {
          case nested: GenericRecord => processRecord(nested, name, out)
          case list: java.util.Collection[_] =>
            out += name -> list.asScala.toSeq.filter(_ != null).map(elementToString)
          case other => out += name -> Seq(elementToString(other))
        }
      }
    }
  }

  /** `String.valueOf` semantics; records inside arrays use their Avro
    * `toString` (JSON-ish), matching `AvroToAddDocumentConverter.java:101-103`.
    */
  private def elementToString(v: Any): String = String.valueOf(v)

  /** True if the (possibly union) schema is a nullable union — used by
    * schema-driven planners to mark nullable columns.
    */
  def isNullableUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Non-null branch of a nullable union (first non-null, like the
    * reference's unwrap at `:77-86`).
    */
  def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s
}
