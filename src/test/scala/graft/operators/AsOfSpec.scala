package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("aapl", 10L, "t1"), ("aapl", 25L, "t2"), ("msft", 5L, "t3"))
    .toDF("sym", "t", "trade")
  private def quotes = Seq(
    ("aapl", 5L, 1.0), ("aapl", 10L, 2.0), ("aapl", 20L, 3.0),
    ("msft", 9L, 9.0))
    .toDF("sym", "qt", "px")

  test("each left row gets the latest right row at or before its time") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt")
      .orderBy("t").select("trade", "px").as[(String, Option[Double])].collect()
    // t=10 sees the qt=10 quote (<= semantics); t=25 sees qt=20
    assert(out.toSeq == Seq(("t3", None), ("t1", Some(2.0)), ("t2", Some(3.0))))
  }

  test("left rows with no prior right row keep null payload (left join)") {
    val out = AsOf.join(trades, quotes.filter($"sym" === "aapl"),
      Seq("sym"), "t", "qt")
    val msft = out.filter($"sym" === "msft").select("px")
      .as[Option[Double]].head()
    assert(msft.isEmpty)
  }

  test("a null field in the newest right row is NOT replaced by a staler row") {
    val l = Seq(("a", 12L, "t1")).toDF("sym", "t", "trade")
    val r = Seq(("a", 5L, Some(1.0), "m1"), ("a", 10L, None, "m2"))
      .toDF("sym", "qt", "px", "mk")
    val out = AsOf.join(l, r, Seq("sym"), "t", "qt")
      .select("px", "mk").as[(Option[Double], String)].head()
    // the t=10 quote wins atomically: px=null, mk=m2 — never (1.0, m2)
    assert(out == ((None, "m2")))
  }

  test("right rows tied on (key, time) resolve deterministically (max payload)") {
    val l = Seq(("a", 12L, "t1")).toDF("sym", "t", "trade")
    val r = Seq(("a", 10L, 1.0, "m1"), ("a", 10L, 2.0, "m2"),
      ("a", 10L, 2.0, "m0")) // tie on px too → mk breaks it
      .toDF("sym", "qt", "px", "mk")
    // repeat under different partitionings: the answer must never flip
    (1 to 4).foreach { p =>
      val out = AsOf.join(l, r.repartition(p), Seq("sym"), "t", "qt")
        .select("px", "mk").as[(Double, String)].head()
      assert(out == ((2.0, "m2")), s"tie resolution flipped at partitioning $p")
    }
  }

  test("overlapping payload column names are rejected") {
    assertThrows[IllegalArgumentException] {
      AsOf.join(trades, trades.withColumnRenamed("t", "t2"),
        Seq("sym"), "t", "t2")
    }
  }

  test("tolerance: stale right rows null out, in-range ones attach") {
    import org.apache.spark.sql.functions._
    // gap 5: t=10 sees qt=10 (gap 0 ✓); t=25's latest is qt=20 (gap 5 ✓);
    // with gap 4 the qt=20 quote is too stale for t=25
    val out5 = AsOf.joinWithTolerance(trades, quotes, Seq("sym"),
        "t", "qt", lit(5L))
      .orderBy("t").select("trade", "px")
      .as[(String, Option[Double])].collect().toSeq
    assert(out5 == Seq(("t3", None), ("t1", Some(2.0)),
      ("t2", Some(3.0))))
    val out4 = AsOf.joinWithTolerance(trades, quotes, Seq("sym"),
        "t", "qt", lit(4.0))
      .orderBy("t").select("trade", "px")
      .as[(String, Option[Double])].collect().toSeq
    // msft t=5 has no quote at or before → still null (left semantics)
    assert(out4 == Seq(("t3", None), ("t1", Some(2.0)), ("t2", None)))
    // no-match rows stay null rather than erroring on the bound
    val none = AsOf.joinWithTolerance(trades.filter($"sym" === "msft"),
        quotes.filter($"qt" > 100), Seq("sym"), "t", "qt", lit(5L))
      .select("px").as[Option[Double]].head()
    assert(none.isEmpty)
    // the helper column never leaks
    assert(!AsOf.joinWithTolerance(trades, quotes, Seq("sym"), "t", "qt",
      lit(5L)).columns.contains("_asof_rt"))
  }
}
