package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecordBuilder}

import org.scalatest.funsuite.AnyFunSuite

/** Goldens mirroring AvroToAddDocumentConverterTest.java:28-209. */
class AvroDocConverterSpec extends AnyFunSuite {

  test("primitives stringify via String.valueOf") {
    val schema = SchemaBuilder.record("R").fields()
      .requiredString("s").requiredInt("i").requiredLong("l")
      .requiredFloat("f").requiredDouble("d").requiredBoolean("b")
      .endRecord()
    val rec = new GenericRecordBuilder(schema)
      .set("s", "hello").set("i", 42).set("l", 9999999999L)
      .set("f", 0.6789f).set("d", -0.12345).set("b", true).build()
    val doc = AvroDocConverter.convert(rec)
    assert(doc == Map(
      "s" -> Seq("hello"), "i" -> Seq("42"), "l" -> Seq("9999999999"),
      "f" -> Seq("0.6789"), "d" -> Seq("-0.12345"), "b" -> Seq("true")))
  }

  test("nullable union: value unwraps, null skipped entirely") {
    val schema = SchemaBuilder.record("R").fields()
      .optionalString("present").optionalString("absent")
      .endRecord()
    val rec = new GenericRecordBuilder(schema)
      .set("present", "x").build() // absent stays null
    val doc = AvroDocConverter.convert(rec)
    assert(doc == Map("present" -> Seq("x")))
  }

  test("arrays become multi-valued fields, not JSON") {
    val schema = SchemaBuilder.record("R").fields()
      .name("tags").`type`().array().items().stringType().noDefault()
      .endRecord()
    val arr = new java.util.ArrayList[String]()
    arr.add("a"); arr.add("b"); arr.add("c")
    val rec = new GenericRecordBuilder(schema).set("tags", arr).build()
    assert(AvroDocConverter.convert(rec) == Map("tags" -> Seq("a", "b", "c")))
  }

  test("nested records flatten with parent_child names") {
    val inner = SchemaBuilder.record("Meta").fields()
      .requiredString("author").requiredInt("year").endRecord()
    val outer = SchemaBuilder.record("Doc").fields()
      .requiredString("title")
      .name("metadata").`type`(inner).noDefault()
      .endRecord()
    val meta = new GenericRecordBuilder(inner)
      .set("author", "ada").set("year", 1843).build()
    val rec = new GenericRecordBuilder(outer)
      .set("title", "notes").set("metadata", meta).build()
    val doc = AvroDocConverter.convert(rec)
    assert(doc == Map("title" -> Seq("notes"),
      "metadata_author" -> Seq("ada"), "metadata_year" -> Seq("1843")))
  }

  test("array of records stringifies each element") {
    val item = SchemaBuilder.record("Item").fields()
      .requiredString("k").endRecord()
    val schema = SchemaBuilder.record("R").fields()
      .name("items").`type`().array().items().`type`(item).noDefault()
      .endRecord()
    val i1 = new GenericRecordBuilder(item).set("k", "a").build()
    val arr = new java.util.ArrayList[Any](); arr.add(i1)
    val rec = new GenericRecordBuilder(schema).set("items", arr).build()
    val doc = AvroDocConverter.convert(rec)
    assert(doc("items") == Seq("""{"k": "a"}"""))
  }

  test("Utf8 values stringify like plain strings") {
    val schema = SchemaBuilder.record("R").fields()
      .requiredString("s").endRecord()
    val rec = new GenericData.Record(schema)
    rec.put("s", new org.apache.avro.util.Utf8("データ"))
    assert(AvroDocConverter.convert(rec) == Map("s" -> Seq("データ")))
  }

  test("nullable union helpers") {
    val s = SchemaBuilder.unionOf().nullType().and().stringType().endUnion()
    assert(AvroDocConverter.isNullableUnion(s))
    assert(AvroDocConverter.nonNullBranch(s).getType == Schema.Type.STRING)
  }
}
