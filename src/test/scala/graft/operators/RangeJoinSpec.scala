package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive non-equi join") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts")))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"ts_us".as("pts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("cid"), $"ts_us".as("cts"))
    val tol = 600000000L // 10 minutes in micros

    val naive = p.join(c, Seq("user_id"))
      .filter(abs($"pts" - $"cts") <= tol)
      .select("pid", "cid").as[(Long, Long)].collect().toSet
    val binned = RangeJoin.within(p, c, Seq("user_id"), "pts", "cts", tol)
      .select("pid", "cid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("boundary: pairs exactly at tolerance are included, beyond excluded") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "lt", "lid")
    val r = Seq((1L, 200L, 20L), (1L, 201L, 21L)).toDF("k", "rt", "rid")
    val out = RangeJoin.within(l, r, Seq("k"), "lt", "rt", 100L)
      .select("rid").as[Long].collect().toSet
    assert(out == Set(20L)) // |100-200| = 100 <= 100; |100-201| = 101 > 100
  }

  test("overlapping non-key columns are rejected") {
    val l = Seq((1L, 100L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 100L, "y")).toDF("k", "t2", "v")
    assertThrows[IllegalArgumentException] {
      RangeJoin.within(l, r, Seq("k"), "t", "t2", 10L)
    }
  }
}
