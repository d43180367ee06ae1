package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed row → string-document projection (SURVEY §2.2 P2, §1.2 type table).
  *
  * Reproduces the reference's per-type conversion semantics
  * (`PaimonToAddDocumentConverter.java:119-220`) as pure Catalyst column
  * expressions — every rule is a built-in function composition, so the whole
  * conversion stays inside whole-stage codegen, shuffles nothing, and scales
  * linearly with input splits:
  *
  *   - bool / integral / floating → `String.valueOf` ≡ `cast(string)`
  *   - decimal                     → plain string (no scientific notation)
  *   - date                       → days-since-epoch integer string
  *   - timestamp                  → epoch-millis string
  *   - binary                     → Base64 string
  *   - array                      → JSON array string: numerics/booleans
  *     unquoted, strings quoted + escaped, nulls as `null` literal, binary
  *     as quoted base64 (`PaimonToAddDocumentConverter.java:226-274`)
  *   - map                        → JSON object, keys/values quoted
  *     (`:288-302`, simplified all-string form)
  *   - struct                     → proper JSON, recursively via the same
  *     per-type rules (the reference emits a `{"nested":"row"}`
  *     placeholder, acknowledged in its TODO.md:11 — we implement the
  *     real conversion)
  */
object Stringifier {

  /** JSON string escaping exactly as the reference's `escapeJsonString`
    * (`PaimonToAddDocumentConverter.java:277-285`): backslash, quote,
    * newline, CR, tab — nothing else.
    */
  def escapeJson(c: Column): Column = {
    // Order matters: backslash first, like the chained String.replace calls.
    val steps = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
      "\r" -> "\\r", "\t" -> "\\t")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** One array element → its JSON token (string result, never null). */
  private def jsonElement(e: Column, elemType: DataType): Column = {
    val tok = elemType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | _: DecimalType =>
        e.cast(StringType)
      case StringType => concat(lit("\""), escapeJson(e), lit("\""))
      case BinaryType => concat(lit("\""), base64(e), lit("\""))
      case _ => concat(lit("\""), escapeJson(stringify(e, elemType)), lit("\""))
    }
    when(e.isNull, lit("null")).otherwise(tok)
  }

  /** Array column → reference-format JSON array string. */
  def arrayToJson(c: Column, elemType: DataType): Column =
    concat(lit("["),
      array_join(transform(c, e => jsonElement(e, elemType)), ","),
      lit("]"))

  /** Map column → simplified JSON object (all keys/values quoted), keys
    * and values escaped like the reference's map branch
    * (`PaimonToAddDocumentConverter.java:288-302`, which routes both
    * through `escapeJsonString`). Keys and values render via [[stringify]]
    * (identity for the reference's string-map case) so nested temporal
    * types keep the top-level epoch-millis/days contract the UTC guard
    * enforces, instead of silently falling back to ISO `cast` strings.
    */
  def mapToJson(c: Column, keyType: DataType, valueType: DataType): Column =
    concat(lit("{"),
      array_join(
        transform(map_entries(c), kv =>
          concat(lit("\""),
            escapeJson(stringify(kv.getField("key"), keyType)),
            lit("\":\""),
            escapeJson(stringify(kv.getField("value"), valueType)),
            lit("\""))),
        ","),
      lit("}"))

  /** Struct column → JSON object via the same per-type rules as arrays
    * (numerics unquoted, strings quoted+escaped, null fields as `null`
    * literals, temporals as epoch strings). The reference emits a
    * `{"nested":"row"}` placeholder here (acknowledged in its TODO.md:11);
    * we implement the real conversion — recursively, so the epoch-millis
    * contract holds at any nesting depth (a plain `to_json` would render
    * nested timestamps as ISO wall-clock strings, diverging from the
    * top-level rule and from [[requireUtcForNtz]]'s invariant).
    */
  def structToJson(c: Column, st: StructType): Column = {
    def escapeLiteral(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
        .replace("\r", "\\r").replace("\t", "\\t")
    val parts = st.fields.toSeq.map { f =>
      concat(lit("\"" + escapeLiteral(f.name) + "\":"),
        jsonElement(c.getField(f.name), f.dataType))
    }
    // a NULL struct stringifies to NULL (elided at document assembly like
    // every other type) — the parts above are built from literals, so
    // without the guard a null struct would fabricate {"a":null,...}
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(lit("{"), concat_ws(",", parts: _*), lit("}")))
  }

  /** Is `dt` part of the document conversion contract? Fields of any
    * other type are warned about and DROPPED at document assembly —
    * reference parity (`PaimonToAddDocumentConverter.java:214-219` logs
    * "Unsupported type ... for field ..., skipping" and writes no field).
    */
  def isSupported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | _: DecimalType | DateType |
        TimestampType | TimestampNTZType | BinaryType =>
      true
    case ArrayType(et, _) => isSupported(et)
    // containers are supported only when every nested type is — a
    // map/struct hiding an unsupported type must warn-and-drop like its
    // top-level form would, not crash or silently diverge at render time
    case MapType(k, v, _) => isSupported(k) && isSupported(v)
    case s: StructType => s.fields.forall(f => isSupported(f.dataType))
    case _ => false
  }

  /** Fail fast when a TimestampNTZ column would be stringified under a
    * non-UTC session: NTZ→epoch-millis treats the wall-clock as UTC, and
    * a shifted session timezone would silently shift every epoch string.
    */
  def requireUtcForNtz(df: org.apache.spark.sql.DataFrame): Unit =
    requireUtcForNtz(df.schema, df.sparkSession)

  def requireUtcForNtz(schema: StructType,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    def hasNtz(dt: DataType): Boolean = dt match {
      case TimestampNTZType => true
      case ArrayType(et, _) => hasNtz(et)
      case MapType(k, v, _) => hasNtz(k) || hasNtz(v)
      case s: StructType => s.fields.exists(f => hasNtz(f.dataType))
      case _ => false
    }
    if (schema.fields.exists(f => hasNtz(f.dataType))) {
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
        s"TimestampNTZ stringification requires a UTC session timezone " +
          s"(epoch-millis strings would silently shift), got '$tz' — set " +
          s"spark.sql.session.timeZone=UTC")
    }
  }

  /** The per-type string conversion (§1.2). Result is a string column that
    * is null iff the input is null (null elision happens at document
    * assembly, SURVEY P5).
    */
  def stringify(c: Column, dt: DataType): Column = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | _: DecimalType =>
      c.cast(StringType)
    case DateType =>
      // days since epoch as integer string, NOT ISO (reference :165-168)
      datediff(c, to_date(lit("1970-01-01"))).cast(StringType)
    case TimestampType =>
      unix_millis(c).cast(StringType)
    case TimestampNTZType =>
      // NTZ treated as UTC wall-clock (session is pinned to UTC)
      unix_millis(c.cast(TimestampType)).cast(StringType)
    case BinaryType =>
      base64(c)
    case ArrayType(et, _) =>
      arrayToJson(c, et)
    case MapType(k, v, _) =>
      mapToJson(c, k, v)
    case st: StructType =>
      structToJson(c, st)
    case other =>
      // direct-call safety net only: document assembly ([[stringifyAll]],
      // DocumentBuilder) checks isSupported and warn+DROPS the field
      // first, matching the reference — a call reaching here bypassed the
      // contract, so fail loudly rather than silently diverge
      throw new IllegalArgumentException(
        s"stringify: unsupported type ${other.simpleString} — document " +
          "assembly drops such fields (reference " +
          "PaimonToAddDocumentConverter.java:214-219); check isSupported first")
  }

  /** Whole-row conversion: every column to its document string form,
    * preserving names. Unsupported-typed columns are warned about and
    * DROPPED (reference parity). One `select`, zero shuffles.
    */
  def stringifyAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (kept, dropped) = df.schema.fields.toSeq.partition(f => isSupported(f.dataType))
    dropped.foreach { f =>
      System.err.println(
        s"[graft] stringify: unsupported type ${f.dataType.simpleString} for " +
          s"field ${f.name}, skipping (reference warn-and-drop)")
    }
    // NTZ guard applies to the fields that WILL be stringified — a dropped
    // field never renders, so it must not fail an otherwise-valid session
    requireUtcForNtz(StructType(kept), df.sparkSession)
    df.select(kept.map(f => stringify(col(f.name), f.dataType).alias(f.name)): _*)
  }
}
