package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Assembles sink-side documents (SURVEY §1.1: `indexName` + fields as
  * `Map[String, Array[String]]` — every value a list of strings) from an
  * arbitrary typed DataFrame, combining:
  *
  *   - P1 nested-struct flattening (`parent_child` names)    [[Flattener]]
  *   - P2 typed → string conversion                          [[Stringifier]]
  *   - P3 column rename via a field-mapping config
  *     (`PaimonToAddDocumentConverter.java:81-88`)
  *   - P4 drop-by-prefix, checked BEFORE mapping (`:76-78,317-328`)
  *   - P5 null elision — null values produce no entry in the document map
  *     (`:112-114`)
  *   - C5 `_id` extraction: non-null, numeric/string only, stringified
  *     (`PaimonRowProcessor.java:262-297`)
  *
  * Everything is one Catalyst projection; no UDFs, no shuffle — identical
  * plan shape at sf0.001 and at 100 TB.
  */
object DocumentBuilder {

  /** Avro-source mode keeps `array<T>` as a multi-valued field (one string
    * per element, `AvroToAddDocumentConverter.java:49-61`); Paimon-source
    * mode renders arrays as a single JSON string (`:196-199`).
    */
  sealed trait ArrayMode
  case object MultiValued extends ArrayMode
  case object JsonString extends ArrayMode

  final case class Config(
      idField: String,
      fieldMapping: Map[String, String] = Map.empty,
      dropPrefixes: Seq[String] = Nil,
      arrayMode: ArrayMode = JsonString)

  /** Per-field document value: always `array<string>` (multi-valued field
    * contract). Scalars become single-element arrays.
    */
  private def fieldValue(c: Column, dt: DataType, mode: ArrayMode): Column = {
    val v = (dt, mode) match {
      case (ArrayType(et, _), MultiValued) =>
        transform(c, e => Stringifier.stringify(e, et))
      case _ =>
        array(Stringifier.stringify(c, dt))
    }
    // null source value → null entry → elided by map_filter (P5)
    when(c.isNull, lit(null).cast(ArrayType(StringType))).otherwise(v)
  }

  /** Flatten + drop + rename + stringify + null-elide into
    * `(_id string, fields map<string, array<string>>)`.
    */
  def documents(df: DataFrame, cfg: Config): DataFrame = {
    val flat = Flattener.flatten(df)
    // drop-by-prefix FIRST (the reference checks isFieldSkipped before any
    // type handling, :76-78,317-328) — an explicitly-dropped field must
    // neither warn about its type nor trip the NTZ session guard
    val afterPrefix = flat.schema.fields.toSeq
      .filterNot(f => cfg.dropPrefixes.exists(f.name.startsWith))
    val (kept, unsupported) = afterPrefix
      .partition(f => Stringifier.isSupported(f.dataType))
    // reference parity: an unsupported-typed column produces NO document
    // field, with a loud warning (PaimonToAddDocumentConverter.java:214-219)
    unsupported.foreach { f =>
      System.err.println(
        s"[graft] documents: unsupported type ${f.dataType.simpleString} for " +
          s"field ${f.name}, skipping (reference warn-and-drop)")
    }
    Stringifier.requireUtcForNtz(StructType(kept), flat.sparkSession)
    require(kept.exists(_.name == cfg.idField),
      s"index must have an ${cfg.idField} field defined which serves as primary key")
    val idType = kept.find(_.name == cfg.idField).get.dataType
    require(idType.isInstanceOf[NumericType] || idType == StringType,
      s"unsupported _id field type: $idType (numeric/string only)")
    // a rename that collides with another kept field would produce
    // duplicate map keys — Spark's default mapKeyDedupPolicy throws at
    // runtime on the first row; fail at config time instead
    val outNames = kept.map(f => cfg.fieldMapping.getOrElse(f.name, f.name))
    val dupes = outNames.groupBy(identity).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"field mapping produces duplicate document fields: ${dupes.mkString(", ")}")

    val entries: Seq[Column] = kept.map { f =>
      val outName = cfg.fieldMapping.getOrElse(f.name, f.name)
      struct(
        lit(outName).alias("key"),
        fieldValue(col(f.name), f.dataType, cfg.arrayMode).alias("value"))
    }
    flat.select(
      col(cfg.idField).cast(StringType).alias("_id"),
      map_filter(
        map_from_entries(array(entries: _*)),
        (_, v) => v.isNotNull).alias("fields"))
      .filter(col("_id").isNotNull)
  }
}
