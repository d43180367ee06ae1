package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonlSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("txt", StringType)

  private def writeLines(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-0.json"), lines.mkString("\n"))
    dir
  }

  test("good rows, nulls for missing fields, poison to DLQ, blanks skipped") {
    val dir = writeLines(
      """{"id": 1, "txt": "hello"}""",
      """{"id": 2}""",          // missing field → null, NOT poison
      "",                       // blank → skipped entirely
      "{broken",                // malformed → DLQ
      """[1, 2]""",             // valid JSON, wrong shape → DLQ
      """"scalar"""",           // ditto
      """{"id": 3, "txt": "end", "extra": true}""") // extra field tolerated
    val (good, dlq) = JsonlSource.read(spark, dir, schema)
    val g = good.as[(Option[Long], Option[String])].collect().toSet
    assert(g == Set((Some(1L), Some("hello")), (Some(2L), None),
      (Some(3L), Some("end"))))
    assert(good.columns.toSeq == Seq("id", "txt"))
    val d = dlq.as[String].collect().toSet
    assert(d == Set("{broken", "[1, 2]", "\"scalar\""))
  }

  test("reserved corrupt column in the caller schema is rejected") {
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, "/tmp/nonexistent",
        new StructType().add("_corrupt_record", StringType))
    }
  }
}
