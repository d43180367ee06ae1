package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-flattening projection (SURVEY §2.2 P1).
  *
  * Recursively flattens nested struct columns into `parent_child`
  * underscore-joined top-level columns, mirroring the reference's Avro
  * nested-record flattening (`AvroToAddDocumentConverter.java:36-47`:
  * prefix + "_" + field name, applied recursively).
  *
  * The flatten is a pure projection — one `select` — so Catalyst prunes
  * unreferenced nested fields at the parquet scan (schema pruning) and the
  * whole thing stays inside whole-stage codegen. Safe at any scale: no
  * shuffle, no UDF.
  */
object Flattener {

  /** Build the flattened select list for a schema. Struct fields recurse
    * with `parent_child` naming; all other types (including arrays and
    * maps) pass through unchanged at their (prefixed) position.
    */
  def selectList(schema: StructType, prefix: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val outName =
        if (prefix.isEmpty) f.name
        else s"${prefix.replace(".", "_")}_${f.name}"
      f.dataType match {
        case st: StructType => selectList(st, name)
        case _              => Seq(col(name).alias(outName))
      }
    }

  /** Flatten every nested struct column of `df` into top-level columns. */
  def flatten(df: DataFrame): DataFrame = df.select(selectList(df.schema): _*)
}
