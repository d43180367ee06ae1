package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroOcfSpec extends SparkSpec {
  import spark.implicits._

  private val st = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ok", BooleanType),
    StructField("payload", BinaryType)))

  private def fixture(n: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize((0 until n).map { i =>
      Row(i.toLong,
        if (i % 7 == 3) null else s"name-$i",
        if (i % 5 == 4) null else i * 0.25,
        i % 2 == 0,
        if (i % 11 == 5) null else Array.tabulate(3)(j => (i + j).toByte))
    }, 3), st)

  test("round-trip: all supported primitive types, nulls and binary survive") {
    val dir = java.nio.file.Files.createTempDirectory("ocf-rt").toString
    val written = AvroOcf.write(fixture(200), s"$dir/data")
    assert(written.size == 3) // one file per non-empty partition
    val back = AvroOcf.read(spark, s"$dir/data", st).orderBy("id").collect()
    val want = fixture(200).orderBy("id").collect()
    assert(back.length == want.length)
    back.zip(want).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getAs[String](1) == b.getAs[String](1))
      assert(a.getAs[Any](2) == b.getAs[Any](2))
      assert(a.getBoolean(3) == b.getBoolean(3))
      val (pa, pb) = (a.getAs[Array[Byte]](4), b.getAs[Array[Byte]](4))
      assert((pa == null && pb == null) || pa.toSeq == pb.toSeq)
    }
    // empty partitions write no file
    val empty = AvroOcf.write(fixture(1).repartition(5), s"$dir/empty")
    assert(empty.size == 1)
  }

  test("byte ranges partition the record stream exactly at EVERY split width") {
    // one file, tiny blocks (sync interval near the Avro minimum), so
    // even small widths cut mid-block and between blocks; the range
    // union must be the exact multiset for adversarial widths —
    // including widths far below one block, a prime width, and a width
    // larger than the file
    val dir = java.nio.file.Files.createTempDirectory("ocf-split").toString
    val df = fixture(2000).coalesce(1)
    val Seq(file) = AvroOcf.write(df, s"$dir/data", syncIntervalBytes = 64)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(file).getFileSystem(conf)
    val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(file)).getLen
    def rangeIds(width: Long): Seq[Long] =
      (0L until len by width).flatMap { start =>
        AvroOcf.readRange(file, start, math.min(start + width, len),
          st, conf).map(_.getLong(0)).toSeq
      }
    val whole = rangeIds(len + 1)
    assert(whole.sorted == (0L until 2000L))
    for (w <- Seq(97L, 1024L, len / 3, len)) {
      val ids = rangeIds(w)
      assert(ids.sorted == (0L until 2000L),
        s"width $w lost or duplicated records (${ids.size}/2000)")
    }
  }

  test("reader schema projects, reorders, and fills absent nullable columns") {
    val dir = java.nio.file.Files.createTempDirectory("ocf-proj").toString
    AvroOcf.write(fixture(50), s"$dir/data")
    // projection + reorder: decode skips unrequested writer fields
    val proj = StructType(Seq(
      StructField("name", StringType), StructField("id", LongType)))
    val rows = AvroOcf.read(spark, s"$dir/data", proj)
      .orderBy("id").collect()
    assert(rows.length == 50)
    assert(rows(4).getAs[String](0) == "name-4" && rows(4).getLong(1) == 4L)
    // width-only evolution: a requested nullable column the writer
    // never had resolves to null for every record
    val wider = StructType(Seq(
      StructField("id", LongType),
      StructField("added_later", StringType)))
    val w = AvroOcf.read(spark, s"$dir/data", wider).orderBy("id").collect()
    assert(w.length == 50 && w.forall(_.isNullAt(1)))
    // an absent NON-nullable column fails loudly, not silently-null
    val bad = StructType(Seq(
      StructField("id", LongType),
      StructField("required_missing", LongType, nullable = false)))
    val e = intercept[Exception] {
      AvroOcf.read(spark, s"$dir/data", bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("torn file fails loudly naming the file — no silent corpus shrink") {
    val dir = java.nio.file.Files.createTempDirectory("ocf-torn").toString
    val Seq(file) = AvroOcf.write(fixture(500).coalesce(1), s"$dir/data",
      syncIntervalBytes = 64)
    val p = java.nio.file.Paths.get(new java.net.URI(
      if (file.startsWith("file:")) file else s"file:$file"))
    val bytes = java.nio.file.Files.readAllBytes(p)
    // truncate mid-block: the container header stays valid, a block is torn
    java.nio.file.Files.write(p, bytes.take(bytes.length / 2))
    val e = intercept[org.apache.spark.SparkException] {
      AvroOcf.read(spark, s"$dir/data", st).count()
    }
    val msg = e.getCause match { case null => e.getMessage; case c => c.getMessage }
    assert(msg.contains("AvroOcf") || e.getMessage.contains("AvroOcf"),
      s"torn-file error must carry the AvroOcf context: $msg")
  }

  test("block codecs: deflate/snappy/zstandard round-trip, split exactly, and shrink") {
    val dir = java.nio.file.Files.createTempDirectory("ocf-codec").toString
    // compressible payload (repeated text) so size actually drops
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 1500).map { i =>
        Row(i.toLong, ("lorem ipsum dolor sit amet " * 8) + (i % 7))
      }, 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("t", StringType))))
    val pst = df.schema
    val Seq(plain) = AvroOcf.write(df, s"$dir/null", syncIntervalBytes = 1024)
    val plainLen = new java.io.File(new java.net.URI(
      if (plain.startsWith("file:")) plain else s"file:$plain")).length()
    for (codec <- Seq("deflate", "snappy", "zstandard")) {
      val Seq(f) = AvroOcf.write(df, s"$dir/$codec",
        syncIntervalBytes = 1024, codec = codec)
      val len = new java.io.File(new java.net.URI(
        if (f.startsWith("file:")) f else s"file:$f")).length()
      assert(len < plainLen / 2,
        s"$codec: $len vs plain $plainLen — block compression not applied")
      // split exactness over COMPRESSED blocks (the reader auto-detects
      // the codec from the header; sync markers sit between blocks)
      val conf = spark.sessionState.newHadoopConf()
      val ids = (0L until len by 777L).flatMap { start =>
        AvroOcf.readRange(f, start, math.min(start + 777L, len), pst, conf)
          .map(_.getLong(0)).toSeq
      }
      assert(ids.sorted == (0L until 1500L),
        s"$codec: split union lost or duplicated records (${ids.size}/1500)")
    }
    // unknown codec fails on the DRIVER, before any task launches
    val e = intercept[IllegalArgumentException] {
      AvroOcf.write(df, s"$dir/bad", codec = "lzma-nope")
    }
    assert(e.getMessage.contains("unknown codec"))
  }

  test("logical types round-trip: date, timestamp-micros, decimal") {
    val lst = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("price", DecimalType(14, 4))))
    def mk(n: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until n).map { i =>
        Row(i.toLong,
          if (i % 9 == 2) null
          else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i * 37L - 100)),
          if (i % 7 == 5) null
          // deliberately micro-precision: millis would truncate this
          else java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(i * 86400L - 3600, i * 1001L * 1000)),
          if (i % 5 == 1) null
          else new java.math.BigDecimal(java.math.BigInteger.valueOf(i * 123457L - 999), 4))
      }, 2), lst)
    val dir = java.nio.file.Files.createTempDirectory("ocf-logical").toString
    AvroOcf.write(mk(300), s"$dir/data", syncIntervalBytes = 256)
    val back = AvroOcf.read(spark, s"$dir/data", lst, maxSplitBytes = 2048)
      .orderBy("id").collect()
    val want = mk(300).orderBy("id").collect()
    assert(back.length == 300)
    back.zip(want).foreach { case (a, b) =>
      assert(a.getAs[java.sql.Date]("d") == b.getAs[java.sql.Date]("d"))
      assert(a.getAs[java.sql.Timestamp]("ts") == b.getAs[java.sql.Timestamp]("ts"))
      assert(a.getAs[java.math.BigDecimal]("price") ==
        b.getAs[java.math.BigDecimal]("price"))
    }
  }

  test("foreign writers: timestamp-millis longs scale up, fixed-backed decimals decode") {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // a writer schema this sink never emits: timestamp-millis + decimal
    // over FIXED — the reader must honor the WRITER's contract
    val fixed = ASchema.createFixed("amount_fixed", null, "graft", 6)
    val wjson =
      s"""{"type":"record","name":"row","namespace":"graft","fields":[
         |{"name":"id","type":"long"},
         |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}},
         |{"name":"amt","type":${LogicalTypes.decimal(12, 2).addToSchema(fixed)}}
         |]}""".stripMargin
    val ws = new ASchema.Parser().parse(wjson)
    val dir = java.nio.file.Files.createTempDirectory("ocf-foreign").toString
    val file = s"$dir/foreign.avro"
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](ws))
    w.create(ws, new java.io.File(file))
    (0 until 40).foreach { i =>
      val rec = new GenericData.Record(ws)
      rec.put(0, i.toLong)
      rec.put(1, i * 1000L + 7) // millis
      val unscaled = java.math.BigInteger.valueOf(i * 100L + 25)
      val raw = unscaled.toByteArray
      val padded = new Array[Byte](6)
      // sign-extend into the fixed width (value is non-negative here)
      java.lang.System.arraycopy(raw, 0, padded, 6 - raw.length, raw.length)
      rec.put(2, new GenericData.Fixed(ws.getFields.get(2).schema(), padded))
      w.append(rec)
    }
    w.close()
    val want = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("amt", DecimalType(12, 2), nullable = false)))
    val rows = AvroOcf.read(spark, dir, want).orderBy("id").collect()
    assert(rows.length == 40)
    val r7 = rows(7)
    assert(r7.getAs[java.sql.Timestamp]("ts").getTime == 7007L)
    assert(r7.getAs[java.math.BigDecimal]("amt") ==
      new java.math.BigDecimal("7.25"))
    // a NARROWER decimal request fails loudly — no silent rounding
    val narrow = StructType(Seq(StructField("id", LongType),
      StructField("amt", DecimalType(12, 1))))
    val e = intercept[Exception] {
      AvroOcf.read(spark, dir, narrow).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("decimal") || e.getMessage.contains("decimal"))
  }

  test("property: byte ranges partition the stream for RANDOM layouts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val pst = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val avro = AvroOcf.avroSchema(pst)
    val json = avro.toString
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("ocf-prop").toString
    val ctr = new java.util.concurrent.atomic.AtomicInteger(0)
    val layout = for {
      n <- Gen.choose(0, 400)
      sync <- Gen.choose(64, 2048) // near the Avro floor up to a few blocks
      fracPm <- Gen.choose(15, 1200) // width = len * frac/1000, incl. > len
      codec <- Gen.oneOf("null", "deflate", "snappy", "zstandard")
    } yield (n, sync, fracPm, codec)
    val prop = Prop.forAll(layout) { case (n, sync, fracPm, codec) =>
      val schema = new org.apache.avro.Schema.Parser().parse(json)
      val file = s"$dir/f${ctr.incrementAndGet()}.avro"
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setSyncInterval(sync)
      w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
      w.create(schema, new java.io.File(file))
      (0 until n).foreach { i =>
        val rec = new GenericData.Record(schema)
        rec.put(0, i.toLong)
        rec.put(1, if (i % 3 == 0) null else "x" * (i % 97))
        w.append(rec)
      }
      w.close()
      val len = new java.io.File(file).length()
      val width = math.max(64L, len * fracPm / 1000)
      val ids = (0L until len by width).flatMap { start =>
        AvroOcf.readRange(file, start, math.min(start + width, len),
          pst, conf).map(_.getLong(0)).toSeq
      }
      Prop(ids.sorted == (0L until n.toLong)) :|
        s"n=$n sync=$sync width=$width codec=$codec got ${ids.size}"
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  test("unsupported column types are rejected at write, naming the flattener") {
    val df = spark.range(1).select(
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.lit(1)).as("arr"))
    val e = intercept[IllegalArgumentException] {
      AvroOcf.write(df, "/tmp/never")
    }
    assert(e.getMessage.contains("flatten"))
  }
}
