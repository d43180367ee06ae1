package graft.schema

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DocumentBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "alice", Some(3.5), "tmp_x"),
    (2L, "bob", None, "tmp_y"))
    .toDF("id", "name", "score", "tmp_field")

  test("flatten produces parent_child columns recursively") {
    val nested = fixture.select(col("id"),
      struct(col("name"), struct(col("score").as("s")).as("inner")).as("meta"))
    val flat = Flattener.flatten(nested)
    assert(flat.columns.toSeq == Seq("id", "meta_name", "meta_inner_s"))
  }

  test("documents: id extraction, rename, drop-prefix, null elision") {
    val docs = DocumentBuilder.documents(fixture, DocumentBuilder.Config(
      idField = "id",
      fieldMapping = Map("name" -> "author"),
      dropPrefixes = Seq("tmp_")))
    val rows = docs.orderBy("_id")
      .select(col("_id"), map_keys(col("fields")).as("ks"))
      .as[(String, Seq[String])].collect()
    assert(rows(0)._1 == "1")
    assert(rows(0)._2.toSet == Set("id", "author", "score")) // renamed, dropped
    assert(rows(1)._2.toSet == Set("id", "author")) // null score elided
  }

  test("missing id field is rejected with the reference's contract") {
    val ex = intercept[IllegalArgumentException] {
      DocumentBuilder.documents(fixture, DocumentBuilder.Config(idField = "nope"))
    }
    assert(ex.getMessage.contains("primary key"))
  }

  test("document values are multi-valued string arrays") {
    val docs = DocumentBuilder.documents(fixture, DocumentBuilder.Config(idField = "id"))
    val score = docs.filter(col("_id") === "1")
      .select(element_at(col("fields"), "score")).as[Seq[String]].head()
    assert(score == Seq("3.5"))
  }

  test("unsupported-typed column produces NO document field (warn+drop)") {
    val df = Seq((1L, "x")).toDF("id", "v")
      .withColumn("iv", expr("INTERVAL '2' DAY"))
    val docs = DocumentBuilder.documents(df, DocumentBuilder.Config(idField = "id"))
    val fields = docs.select(map_keys(col("fields"))).as[Seq[String]].head()
    assert(fields.toSet == Set("id", "v"), s"interval field must be dropped, got $fields")
  }

  test("NTZ column dropped by prefix does not trip the UTC guard") {
    val df = Seq((1L, "x")).toDF("id", "v")
      .withColumn("audit_ts",
        lit("2024-01-01 00:00:00").cast(org.apache.spark.sql.types.TimestampNTZType))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // the column is configured away — assembling documents must not fail
      val docs = DocumentBuilder.documents(df, DocumentBuilder.Config(
        idField = "id", dropPrefixes = Seq("audit_")))
      val fields = docs.select(map_keys(col("fields"))).as[Seq[String]].head()
      assert(fields.toSet == Set("id", "v"))
      // but a KEPT NTZ column still fails fast under the non-UTC session
      val ex = intercept[IllegalArgumentException] {
        DocumentBuilder.documents(df, DocumentBuilder.Config(idField = "id"))
      }
      assert(ex.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("avro mode keeps arrays as one value per element") {
    val df = Seq((1L, Seq("x", "y"))).toDF("id", "tags")
    val docs = DocumentBuilder.documents(df, DocumentBuilder.Config(
      idField = "id", arrayMode = DocumentBuilder.MultiValued))
    val tags = docs.select(element_at(col("fields"), "tags")).as[Seq[String]].head()
    assert(tags == Seq("x", "y"))
    val json = DocumentBuilder.documents(df, DocumentBuilder.Config(idField = "id"))
      .select(element_at(col("fields"), "tags")).as[Seq[String]].head()
    assert(json == Seq("[\"x\",\"y\"]"))
  }
}
