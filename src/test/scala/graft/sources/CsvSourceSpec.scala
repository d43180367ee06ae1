package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CsvSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("txt", StringType),
    StructField("n", LongType)))

  test("RFC-4180 quoting: delimiter, escaped quote, embedded newline") {
    val dir = java.nio.file.Files.createTempDirectory("csv-rfc").toString
    val rows = Seq(
      (1L, "plain", 3L),
      (2L, "comma, inside", 4L),
      (3L, "she said \"hi\" twice", 5L),
      (4L, "line one\nline two", 6L),
      (5L, null.asInstanceOf[String], 7L))
    rows.toDF("id", "txt", "n").write.mode("overwrite")
      .option("header", true).option("escape", "\"").csv(s"$dir/data")
    val (good, dlq) = CsvSource.read(spark, s"$dir/data", schema)
    assert(good.as[(Long, Option[String], Long)].collect().toSet ==
      rows.map { case (i, t, n) => (i, Option(t), n) }.toSet)
    assert(dlq.select("raw_record", "id").collect().isEmpty)
  }

  test("poison rows route to the DLQ with the raw record and parsed fields") {
    val dir = java.nio.file.Files.createTempDirectory("csv-poison").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/data"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data/a.csv"),
      "id,txt,n\n" +
        "1,ok,10\n" +
        "zzz,badid,11\n" +        // id fails the LongType contract
        "2,\"unclosed,12\n")      // unterminated quote eats to EOF
    val (good, dlq) = CsvSource.read(spark, s"$dir/data", schema)
    assert(good.as[(Long, String, Long)].collect().toSeq == Seq((1L, "ok", 10L)))
    val bad = dlq.select("raw_record", "id").collect()
    assert(bad.length == 2, bad.mkString("; "))
    assert(bad.exists(_.getString(0).startsWith("zzz")))
    // the partially-parsed fields ride along for triage: the unclosed-
    // quote record still parsed its leading id
    assert(bad.exists(r => !r.isNullAt(1) && r.getLong(1) == 2L))
  }

  test("reserved corrupt column and empty schema are rejected") {
    intercept[IllegalArgumentException] {
      CsvSource.read(spark, "/tmp/x", StructType(Seq(
        StructField(CsvSource.CorruptCol, StringType))))
    }
    intercept[IllegalArgumentException] {
      CsvSource.read(spark, "/tmp/x", StructType(Seq.empty))
    }
  }
}
