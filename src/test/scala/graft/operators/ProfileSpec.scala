package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("double-column min/max render as deterministic 6dp fixed-point") {
    val df = Seq(
      (1L, 0.5, 1.25f),
      (2L, -3.0001, 0.125f),
      (3L, 1e-4, 2.0f)).toDF("id", "d", "f")
    val p = Profile.profile(df, Seq("id", "d", "f"))
      .select("col_name", "min_v", "max_v")
      .as[(String, String, String)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    // golden strings: NOT engine float formatting ("1.0E-4"), a fixed
    // 6-decimal contract that any engine can reproduce
    assert(p("d") == ("-3.000100", "0.500000"), p("d").toString)
    assert(p("f") == ("0.125000", "2.000000"), p("f").toString)
    // integer columns keep the exact plain rendering
    assert(p("id") == ("1", "3"), p("id").toString)
  }

  test("float magnitudes beyond decimal(38,6) fall back to engine rendering") {
    val df = Seq((1L, 1e40), (2L, 2e40)).toDF("id", "big")
    val p = Profile.profile(df, Seq("big"))
      .select("min_v", "max_v").as[(String, String)].head()
    // documented fallback: the decimal overflows to null, raw cast steps in
    assert(p._1 == "1.0E40" && p._2 == "2.0E40", p.toString)
  }
}
