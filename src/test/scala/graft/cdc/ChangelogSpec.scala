package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Op-sequence goldens mirroring PaimonRowProcessorTest.java:59-349 and
  * the reference E2E upsert/delete scenarios
  * (PaimonIngestorE2ETest.java:470-476, :649-766).
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, kind, payload)
  private def cl(rows: (String, Long, String, String)*) =
    rows.toSeq.toDF("k", "seq", "op", "v")

  private def finalState(raw: org.apache.spark.sql.DataFrame) =
    Changelog.compact(Changelog.classify(raw, "op"), "k", Seq(col("seq")))

  test("UPDATE_BEFORE rows are skipped entirely") {
    val out = Changelog.classify(
      cl(("a", 1, "+I", "v1"), ("a", 2, "-U", "v1"), ("a", 3, "+U", "v2")), "op")
    assert(out.count() == 2)
    assert(!out.select("op").as[String].collect().contains("-U"))
  }

  test("unknown row kinds are dropped, not fatal") {
    val out = Changelog.classify(cl(("a", 1, "+I", "v1"), ("a", 2, "??", "x")), "op")
    assert(out.count() == 1)
  }

  test("mixed sequence +D,+I,-U,+U,+D compacts to the last op per key") {
    // PaimonRowProcessorTest.java:126-140 golden: net effect = last op
    val raw = cl(("a", 1, "-D", ""), ("a", 2, "+I", "v1"), ("a", 3, "-U", "v1"),
      ("a", 4, "+U", "v2"), ("a", 5, "-D", ""))
    val fin = finalState(raw)
    assert(fin.count() == 1)
    assert(fin.select("_action").as[String].head() == "delete")
  }

  test("INSERT→DELETE→INSERT leaves exactly one live doc") {
    // PaimonIngestorE2ETest.java:649-766
    val raw = cl(("a", 1, "+I", "v1"), ("a", 2, "-D", ""), ("a", 3, "+I", "v3"))
    val base = cl().select(col("k"), col("seq"), col("v")).limit(0)
      .select("k", "seq", "v")
    val merged = Changelog.merge(
      base.select("k", "v"),
      finalState(raw).select("k", "v", "_action"), "k")
    assert(merged.count() == 1)
    assert(merged.select("v").as[String].head() == "v3")
  }

  test("final version wins across multiple snapshots") {
    // PaimonIngestorE2ETest.java:470-476: v3 wins after 3 snapshots
    val s1 = cl(("a", 1, "+I", "v1"), ("b", 2, "+I", "b1"))
    val s2 = cl(("a", 3, "+U", "v2"))
    val s3 = cl(("a", 4, "+U", "v3"))
    val afterS1 = Changelog.applyChangelog(
      s1.select("k", "v").limit(0), s1, "op", "k", Seq(col("seq")))
    val afterS2 = Changelog.applyChangelog(afterS1, s2, "op", "k", Seq(col("seq")))
    val afterS3 = Changelog.applyChangelog(afterS2, s3, "op", "k", Seq(col("seq")))
    val rows = afterS3.orderBy("k").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("a", "v3"), ("b", "b1")))
  }

  test("ordering comes from sequence columns, not arrival order") {
    // rows deliberately out of arrival order (SURVEY §7.4 risk 1)
    val raw = cl(("a", 5, "+U", "last"), ("a", 1, "+I", "first"), ("a", 3, "+U", "mid"))
    val fin = finalState(raw)
    assert(fin.select("v").as[String].head() == "last")
  }

  test("delete-by-key-set removes exactly the listed keys") {
    val base = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    val ids = Seq("a", "c").toDF("id")
    val out = Changelog.deleteByKeySet(base, "k", ids)
    assert(out.select("k").as[String].collect().toSeq == Seq("b"))
  }

  test("scd2: half-open intervals partition each key's timeline") {
    val ch = cl(("a", 10L, "+I", "v1"), ("a", 20L, "+U", "v2"),
      ("a", 30L, "+U", "v3"), ("b", 15L, "+I", "w1"))
    val h = Changelog.scd2(ch, "k", Seq(col("seq")))
      .select("k", "version", "seq", "valid_to", "is_current", "v")
      .as[(String, Long, Long, Option[Long], Boolean, String)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(h.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      ("a", 1L, 10L, Some(20L)), ("a", 2L, 20L, Some(30L)),
      ("a", 3L, 30L, None), ("b", 1L, 15L, None)))
    // exactly one current row per key
    assert(h.count(_._5) == 2)
    assert(h.filter(_._5).map(_._6).sorted == Seq("v3", "w1"))
    // as-of lookup at t=25 sees v2 for a, w1 for b
    val asOf = Changelog.scd2(ch, "k", Seq(col("seq")))
      .filter(col("valid_from") <= 25 &&
        (col("valid_to").isNull || col("valid_to") > 25))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(asOf == Map("a" -> "v2", "b" -> "w1"))
    intercept[IllegalArgumentException] {
      Changelog.scd2(ch, "k", Seq.empty)
    }
  }
}
