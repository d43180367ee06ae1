package graft.sink

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonlSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  private def shardDigests(dir: String): Map[String, String] = {
    val md = MessageDigest.getInstance("MD5")
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.contains("part-") && !p.endsWith(".crc"))
      .map { p =>
        val name = Paths.get(p).getFileName.toString.takeWhile(_ != '-') +
          Paths.get(p).getFileName.toString.split("-")(1)
        name -> md.digest(Files.readAllBytes(Paths.get(p)))
          .map("%02x".format(_)).mkString
      }.toMap
  }

  test("roundtrip + byte-identical re-export, shard by shard") {
    val docs = Seq((3L, "alpha beta", "en"), (1L, "gamma", "de"),
      (2L, "delta eps", "en"), (7L, "zeta", "fr"))
      .toDF("doc_id", "text", "lang")
    val d1 = Files.createTempDirectory("jsonl1").toString
    val d2 = Files.createTempDirectory("jsonl2").toString
    JsonlSink.write(docs, "doc_id", d1, shards = 3)
    // roundtrip with the explicit schema contract
    val back = JsonlSink.read(spark, d1, schema)
      .as[(Long, String, String)].collect().toSet
    assert(back == docs.as[(Long, String, String)].collect().toSet)
    // re-export is byte-identical per shard (the auditability pin)
    JsonlSink.write(docs, "doc_id", d2, shards = 3)
    val (h1, h2) = (shardDigests(d1), shardDigests(d2))
    assert(h1.nonEmpty && h1 == h2, s"$h1 vs $h2")
    intercept[IllegalArgumentException] {
      JsonlSink.write(docs, "doc_id", d1, 0)
    }
  }
}
