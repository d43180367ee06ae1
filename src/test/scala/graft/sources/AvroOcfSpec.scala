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
    val fs = new org.apache.hadoop.fs.Path(file)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(file)).getLen
    val readerJson = AvroOcf.avroSchema(st).toString
    def rangeIds(width: Long): Seq[Long] =
      (0L until len by width).flatMap { start =>
        AvroOcf.readRange(file, start, math.min(start + width, len),
          readerJson, st.fields.length).map(_.getLong(0)).toSeq
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
