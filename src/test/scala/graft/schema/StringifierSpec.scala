package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Golden-value tests mirroring the reference's converter tests
  * (PaimonToAddDocumentConverterTest.java:77-353,
  * AvroToAddDocumentConverterTest.java:28-209): exact output strings for
  * every type conversion rule in SURVEY §1.2.
  */
class StringifierSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.cast(StringType)).head.getString(0)

  test("numerics and booleans via String.valueOf semantics") {
    assert(one(Stringifier.stringify(lit(true), BooleanType)) == "true")
    assert(one(Stringifier.stringify(lit(42), IntegerType)) == "42")
    assert(one(Stringifier.stringify(lit(123456789012345L), LongType)) == "123456789012345")
    assert(one(Stringifier.stringify(lit(0.6789f), FloatType)) == "0.6789")
    assert(one(Stringifier.stringify(lit(-0.12345), DoubleType)) == "-0.12345")
  }

  test("decimal renders plain, preserving scale") {
    assert(one(Stringifier.stringify(lit(BigDecimal("123.45")).cast(DecimalType(10, 2)),
      DecimalType(10, 2))) == "123.45")
  }

  test("date is days-since-epoch integer string, not ISO") {
    // 2024-01-01 = 19723 days after 1970-01-01 (reference test :140-146)
    assert(one(Stringifier.stringify(to_date(lit("2024-01-01")), DateType)) == "19723")
  }

  test("timestamp is epoch millis string") {
    assert(one(Stringifier.stringify(
      lit("2024-01-01 00:00:00").cast(TimestampType), TimestampType)) == "1704067200000")
  }

  test("binary is base64") {
    assert(one(Stringifier.stringify(lit("hello".getBytes("UTF-8")), BinaryType)) == "aGVsbG8=")
  }

  test("numeric array renders unquoted JSON incl. null literal") {
    val c = Stringifier.stringify(
      array(lit(1.5), lit(null).cast(DoubleType), lit(2.5)), ArrayType(DoubleType))
    assert(one(c) == "[1.5,null,2.5]") // reference test :263-266
  }

  test("float embedding array matches String.valueOf formatting") {
    val c = Stringifier.stringify(
      array(lit(-0.12345f), lit(0.6789f)), ArrayType(FloatType))
    assert(one(c) == "[-0.12345,0.6789]") // reference test :231 (no padding)
  }

  test("string array quotes and escapes elements") {
    val c = Stringifier.stringify(
      array(lit("a"), lit("デー"), lit("q\"x\\y\n")), ArrayType(StringType))
    assert(one(c) == "[\"a\",\"デー\",\"q\\\"x\\\\y\\n\"]") // escaping :277-285
  }

  test("binary array elements render as quoted base64") {
    val c = Stringifier.stringify(
      array(lit("hi".getBytes("UTF-8"))), ArrayType(BinaryType))
    assert(one(c) == "[\"aGk=\"]")
  }

  test("map renders as all-quoted JSON object") {
    val c = Stringifier.stringify(
      map(lit("k1"), lit("v1"), lit("k2"), lit("v2")),
      MapType(StringType, StringType))
    assert(one(c) == "{\"k1\":\"v1\",\"k2\":\"v2\"}")
  }

  test("map keys and values are JSON-escaped like the reference") {
    val c = Stringifier.stringify(
      map(lit("k\"1"), lit("line1\nline2"), lit("back\\slash"), lit("tab\there")),
      MapType(StringType, StringType))
    assert(one(c) ==
      "{\"k\\\"1\":\"line1\\nline2\",\"back\\\\slash\":\"tab\\there\"}")
  }

  test("struct renders as proper JSON (reference gap implemented)") {
    val c = Stringifier.stringify(
      struct(lit(1).as("a"), lit("x").as("b")),
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(one(c) == "{\"a\":1,\"b\":\"x\"}")
  }

  test("temporals nested in maps and structs keep the epoch contract") {
    // map value: timestamp → epoch millis, not an ISO cast string
    val m = Stringifier.stringify(
      map(lit("ts"), lit("2024-01-01 00:00:00").cast(TimestampType)),
      MapType(StringType, TimestampType))
    assert(one(m) == "{\"ts\":\"1704067200000\"}")
    // struct field: NTZ → epoch millis (quoted, per the array-element rule)
    val st = StructType(Seq(StructField("t", TimestampNTZType),
      StructField("n", IntegerType)))
    val s = Stringifier.stringify(
      struct(lit("2024-01-01 00:00:00").cast(TimestampNTZType).as("t"),
        lit(7).as("n")), st)
    assert(one(s) == "{\"t\":\"1704067200000\",\"n\":7}")
  }

  test("struct null field renders as null literal; nested struct recurses") {
    val inner = StructType(Seq(StructField("d", DateType)))
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("inner", inner)))
    val c = Stringifier.stringify(
      struct(lit(null).cast(IntegerType).as("a"),
        struct(to_date(lit("2024-01-01")).as("d")).as("inner")), st)
    assert(one(c) == "{\"a\":null,\"inner\":\"{\\\"d\\\":\\\"19723\\\"}\"}")
  }

  test("NULL struct stringifies to NULL like every other type") {
    val st = StructType(Seq(StructField("a", IntegerType)))
    assert(one(Stringifier.stringify(lit(null).cast(st), st)) == null)
    // non-null struct with a null FIELD still renders the field as null
    assert(one(Stringifier.stringify(
      struct(lit(null).cast(IntegerType).as("a")), st)) == "{\"a\":null}")
  }

  test("containers hiding an unsupported type are dropped, not rendered") {
    val iv = expr("INTERVAL '3' DAY")
    val df = spark.range(1).select(col("id"),
      map(lit("k"), iv).as("m"),
      struct(iv.as("x")).as("st"),
      lit("keep").as("s"))
    assert(!Stringifier.isSupported(df.schema("m").dataType))
    assert(!Stringifier.isSupported(df.schema("st").dataType))
    val out = Stringifier.stringifyAll(df)
    assert(out.columns.toSeq == Seq("id", "s"))
  }

  test("NTZ inside a DROPPED container does not trip the UTC guard") {
    // unsupported struct (interval + ntz) is dropped before the guard runs
    val df = spark.range(1).select(
      struct(expr("INTERVAL '3' DAY").as("iv"),
        lit("2024-01-01 00:00:00").cast(TimestampNTZType).as("t")).as("bad"),
      lit("keep").as("s"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val out = Stringifier.stringifyAll(df) // must NOT throw
      assert(out.columns.toSeq == Seq("s"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("unsupported-typed column is dropped by stringifyAll (reference parity)") {
    // DayTimeIntervalType is outside the document conversion contract
    val df = spark.range(1).select(col("id"),
      expr("INTERVAL '3' DAY").as("iv"), lit("keep").as("s"))
    assert(!Stringifier.isSupported(df.schema("iv").dataType))
    val out = Stringifier.stringifyAll(df)
    assert(out.columns.toSeq == Seq("id", "s")) // iv dropped, order kept
    assert(out.head().getString(1) == "keep")
    // direct stringify on an unsupported type fails loudly, never coerces
    val ex = intercept[IllegalArgumentException] {
      Stringifier.stringify(col("iv"), df.schema("iv").dataType)
    }
    assert(ex.getMessage.contains("unsupported type"))
  }

  test("NTZ stringification under a non-UTC session fails fast") {
    val df = spark.range(1)
      .select(lit("2024-01-01 00:00:00").cast(TimestampNTZType).as("t"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ex = intercept[IllegalArgumentException](Stringifier.stringifyAll(df))
      assert(ex.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // back under UTC the same frame converts
    assert(Stringifier.stringifyAll(df).head().getString(0) == "1704067200000")
  }
}
