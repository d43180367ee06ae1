package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_l_quantity"),
        count("l_orderkey").as("count_l_orderkey"),
        max("l_extendedprice").as("max_l_extendedprice"))
      .orderBy("l_returnflag")
      .as[(String, Double, Long, Double)].collect().toSeq
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), Seq(
      Skew.AggSpec("l_quantity", "sum"),
      Skew.AggSpec("l_orderkey", "count"),
      Skew.AggSpec("l_extendedprice", "max")), salts = 8)
      .orderBy("l_returnflag")
      .as[(String, Double, Long, Double)].collect().toSeq
    assert(salted.map(r => (r._1, math.round(r._2 * 100), r._3, r._4)) ==
      direct.map(r => (r._1, math.round(r._2 * 100), r._3, r._4)))
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), salts = 4).count()
    assert(salted == plain)
  }

  test("a row-unique spread column fans a hot key across salt buckets") {
    val hot = spark.range(1000)
      .select(col("id"), lit("hotkey").as("k"), lit(1.0).as("v"))
    val buckets = hot.select(Skew.saltCol(8, Seq(col("id"))).as("s"))
      .distinct().count()
    assert(buckets > 1, "unique-id salting failed to spread the hot key")
    // and the salt is deterministic: same input → same buckets
    val a = hot.select(Skew.saltCol(8, Seq(col("id"))).as("s")).collect()
    val b = hot.select(Skew.saltCol(8, Seq(col("id"))).as("s")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("non-mergeable aggregates are rejected") {
    assertThrows[IllegalArgumentException] { Skew.AggSpec("x", "avg") }
  }
}
