package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._
  import QualityRules._

  test("audit: every rule kind counts its documented violations") {
    val df = Seq(
      (Some(1L), Some(10.0), "a"),
      (Some(1L), Some(10.0), "b"),   // duplicate key 1 → 1 surplus row
      (Some(2L), Some(-5.0), "c"),   // out of range
      (None, None, "d"),             // null key + null value
      (Some(9L), Some(3.0), "e"))    // FK miss (ref has 1, 2)
      .toDF("k", "v", "tag")
    val ref = Seq(1L, 2L).toDF("rk")
    val out = audit(df, Seq(
        NotNull("k_not_null", "k"),
        InRange("v_0_100", "v", 0.0, 100.0),
        Check("tag_not_d", col("tag") =!= "d"),
        Unique("k_unique", Seq("k")),
        ForeignKey("k_fk", Seq("k"), ref, Seq("rk"))))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("k_not_null") == ((1L, false)))
    // null v is NOT a range violation (NotNull's business)
    assert(out("v_0_100") == ((1L, false)))
    assert(out("tag_not_d") == ((1L, false)))
    // 5 rows, 4 distinct key values (incl. null-as-value) → 1 surplus
    assert(out("k_unique") == ((1L, false)))
    // FK misses: 9 (absent) and null (matches nothing) → 2
    assert(out("k_fk") == ((2L, false)))
    // a clean frame passes everything
    val clean = audit(ref.withColumnRenamed("rk", "k"), Seq(
        NotNull("nn", "k"), Unique("u", Seq("k"))))
      .as[(String, Long, Boolean)].collect()
    assert(clean.forall(r => r._2 == 0L && r._3))
    intercept[IllegalArgumentException] { audit(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      audit(df, Seq(NotNull("x", "k"), NotNull("x", "v")))
    }
  }

  test("audit: rule names with dots/backticks resolve as plain aliases") {
    // a dotted name must not be parsed as a nested-field reference
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("k", "tag")
    val out = audit(df, Seq(
        NotNull("checks.k.not_null", "k"),
        Check("tag`quoted", col("tag") =!= "b")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out("checks.k.not_null") == 1L)
    assert(out("tag`quoted") == 1L)
  }
}
