package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions.{col, element_at}

import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.avro.io.EncoderFactory

import graft.SparkSpec

/** End-to-end wire decode: Confluent-framed Avro bytes → distributed
  * GenericDatumReader decode → [[AvroDocConverter]] documents, matching
  * the per-record goldens — the full consumer path of
  * `KafkaIngestor.java:145-159,190-198`, no broker needed.
  */
class KafkaAvroDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = SchemaBuilder.record("Event").fields()
    .requiredString("id").requiredLong("ts")
    .optionalString("note")
    .name("tags").`type`().array().items().stringType().noDefault()
    .name("meta").`type`(SchemaBuilder.record("Meta").fields()
      .requiredString("author").requiredInt("rev").endRecord()).noDefault()
    .endRecord()

  private def record(i: Int): GenericRecord = {
    val tags = new java.util.ArrayList[String]()
    tags.add(s"t$i"); tags.add("common")
    val meta = new GenericRecordBuilder(schema.getField("meta").schema())
      .set("author", s"a$i").set("rev", i).build()
    val b = new GenericRecordBuilder(schema)
      .set("id", s"id$i").set("ts", 1700000000000L + i)
      .set("tags", tags).set("meta", meta)
    if (i % 2 == 0) b.set("note", s"n$i") // odd records: null branch
    b.build()
  }

  /** Confluent framing: magic 0x00 + 4-byte BE schema id + avro binary. */
  private def frame(rec: GenericRecord, schemaId: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x00)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("confluent-framed bytes decode distributed and match direct goldens") {
    val records = (0 until 20).map(record)
    val framed = records.map(frame(_, schemaId = 7))
    val df = framed.toDF("value").repartition(4) // force multi-task decode

    val decoded = KafkaAvroSource.decodeConfluentDocs(df, "value", schema.toString)
      .filter(org.apache.spark.sql.functions.col("error").isNull)
      .select("schema_id", "doc")
      .as[(Int, Map[String, Seq[String]])].collect()

    assert(decoded.length == 20)
    assert(decoded.forall(_._1 == 7)) // schema id carried through
    val expected = records.map(AvroDocConverter.convert).toSet
    assert(decoded.map(_._2).toSet == expected)
    // spot-check golden shape: flattening, arrays, skipped nulls
    val doc0 = decoded.map(_._2).find(_("id") == Seq("id0")).get
    assert(doc0("meta_author") == Seq("a0"))
    assert(doc0("tags") == Seq("t0", "common"))
    val doc1 = decoded.map(_._2).find(_("id") == Seq("id1")).get
    assert(!doc1.contains("note"))
  }

  test("decoded documents flow through the sink to queryable state") {
    import org.apache.spark.sql.functions._
    val framed = (0 until 10).map(i => frame(record(i), 7)).toDF("value")
    val (good, _) = KafkaAvroSource.splitDecoded(
      KafkaAvroSource.decodeConfluentDocs(framed, "value", schema.toString))
    val docs = good.select(element_at(col("doc")("id"), 1).as("_id"), col("doc"))
    val dir = java.nio.file.Files.createTempDirectory("kafka-sink").toString
    val sink = new graft.sink.ParquetIndexSink(spark, dir)
    sink.addDocuments(docs)
    sink.commit()
    val idx = sink.searchable()
    assert(idx.count() == 10)
    // point lookup (TermQuery shape) straight off the committed index
    val hit = idx.filter(col("_id") === "id3")
      .select(element_at(col("doc")("meta_author"), 1)).as[String].collect()
    assert(hit.toSeq == Seq("a3"))
    // replay the same wire batch: upsert idempotence, still 10 docs
    sink.addDocuments(docs)
    sink.commit()
    assert(sink.searchable().count() == 10)
  }

  test("one corrupt frame is DLQ'd; the rest of the batch decodes") {
    // corrupt cases: bad magic, short header, valid header + garbage body
    val corrupt = Seq(
      Array[Byte](1, 2, 3, 4, 5, 6),
      Array[Byte](0, 1),
      Array[Byte](0, 0, 0, 0, 7, 127, 126, 125, 124, 123, 122, 121))
    val good = (0 until 9).map(i => frame(record(i), 7))
    val df = scala.util.Random.shuffle(good ++ corrupt).toDF("value")
      .repartition(3)
    val (ok, dlq) = KafkaAvroSource.splitDecoded(
      KafkaAvroSource.decodeConfluentDocs(df, "value", schema.toString))
    // never a task failure: the whole batch evaluates
    assert(ok.count() == 9)
    assert(dlq.count() == 3)
    val errors = dlq.select("error").as[String].collect()
    assert(errors.count(_.contains("not Confluent wire format")) == 2)
    assert(errors.count(_.contains("avro decode failed")) == 1)
    // decoded docs are intact despite the poison neighbors
    val ids = ok.select(element_at(col("doc")("id"), 1)).as[String].collect()
    assert(ids.toSet == (0 until 9).map(i => s"id$i").toSet)
  }

  test("multi-schema dispatch: two schema ids in one batch, unknown id DLQ'd") {
    val other = SchemaBuilder.record("Ping").fields()
      .requiredString("host").requiredInt("ms").endRecord()
    def frameOther(host: String, ms: Int, schemaId: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(0x00)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array())
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      val rec = new GenericRecordBuilder(other)
        .set("host", host).set("ms", ms).build()
      new GenericDatumWriter[GenericRecord](other).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val batch = Seq(
      frame(record(1), 7), frameOther("h1", 12, 9),
      frame(record(2), 7), frameOther("h2", 34, 9),
      frameOther("zz", 1, 42)) // id 42: not registered
    val decoded = KafkaAvroSource.decodeConfluentDocs(
      batch.toDF("value"), "value",
      Map(7 -> schema.toString, 9 -> other.toString), None)
    val (ok, dlq) = KafkaAvroSource.splitDecoded(decoded)
    assert(ok.count() == 4)
    assert(dlq.select("error").as[String].head().contains("unknown schema id 42"))
    val hosts = ok.filter(col("schema_id") === 9)
      .select(element_at(col("doc")("host"), 1)).as[String].collect()
    assert(hosts.toSet == Set("h1", "h2"))
    val ids = ok.filter(col("schema_id") === 7)
      .select(element_at(col("doc")("id"), 1)).as[String].collect()
    assert(ids.toSet == Set("id1", "id2"))
  }

  test("a 5-byte frame (empty avro body) is a valid Confluent message") {
    val empty = SchemaBuilder.record("Nothing").fields().endRecord()
    val wire = Array[Byte](0, 0, 0, 0, 3) // header only: empty record body
    val decoded = KafkaAvroSource.decodeConfluentDocs(
      Seq(wire).toDF("value"), "value", Map(3 -> empty.toString), None)
    val rows = decoded.as[(Option[Int], Option[Map[String, Seq[String]]], Option[String])]
      .collect()
    assert(rows.toSeq == Seq((Some(3), Some(Map.empty[String, Seq[String]]), None)))
  }

  test("SchemaProvider resolves an id unseen at construction (registry shape)") {
    // a provider that derives the schema from the id at RESOLVE time —
    // nothing registered up front, like a live registry lookup; id 999
    // stays unknown to prove misses still DLQ (and are cached per task)
    val dynamicProvider = new SchemaProvider {
      def resolve(schemaId: Int): Option[String] =
        if (schemaId == 999) None
        else Some(SchemaBuilder.record(s"R$schemaId").fields()
          .requiredString("id").requiredLong("ts")
          .optionalString("note")
          .name("tags").`type`().array().items().stringType().noDefault()
          .name("meta").`type`(SchemaBuilder.record(s"M$schemaId").fields()
            .requiredString("author").requiredInt("rev").endRecord())
          .noDefault()
          .endRecord().toString)
    }
    val batch = Seq(frame(record(1), 31), frame(record(2), 57),
      frame(record(3), 999))
    val (ok, dlq) = KafkaAvroSource.splitDecoded(
      KafkaAvroSource.decodeConfluentDocs(
        batch.toDF("value"), "value", dynamicProvider))
    assert(ok.select("schema_id").as[Int].collect().toSet == Set(31, 57))
    val ids = ok.select(element_at(col("doc")("id"), 1)).as[String].collect()
    assert(ids.toSet == Set("id1", "id2"))
    assert(dlq.select("error").as[String].head()
      .contains("unknown schema id 999"))
  }
}
