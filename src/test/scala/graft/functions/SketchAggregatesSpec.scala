package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(SketchAggregates.misraGries(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.count").as[(String, Long)].collect().toMap

  test("exact when k covers the domain; counts match GROUP BY") {
    val df = spark.range(3000)
      .select(concat(lit("t"), pmod(col("id"), lit(7))).as("v"))
    val exact = df.groupBy("v").count().as[(String, Long)].collect().toMap
    assert(hh(df, 7) == exact)
    assert(hh(df, 64) == exact)
  }

  test("MG guarantees under k < domain, across a multi-partition merge") {
    // 10k rows: "hot" 60%, "warm" 20%, 2000 distinct cold singletons
    val df = spark.range(10000).select(
      when(col("id") % 10 < 6, lit("hot"))
        .when(col("id") % 10 < 8, lit("warm"))
        .otherwise(concat(lit("cold"), col("id"))).as("v"))
      .repartition(8) // force the merge path
    val n = 10000L
    for (k <- Seq(4, 16)) {
      val got = hh(df, k)
      assert(got.size <= k, s"k=$k size=${got.size}")
      // presence guarantee: freq > N/(k+1) must survive
      assert(got.contains("hot"), s"k=$k: $got")
      if (2000L > n / (k + 1)) assert(got.contains("warm"), s"k=$k: $got")
      // every count is an under-estimate by at most N/(k+1)
      val truth = Map("hot" -> 6000L, "warm" -> 2000L).withDefaultValue(1L)
      got.foreach { case (item, c) =>
        assert(c <= truth(item), s"$item over-counted: $c > ${truth(item)}")
        assert(c >= truth(item) - n / (k + 1),
          s"$item under bound: $c < ${truth(item) - n / (k + 1)}")
      }
    }
  }

  test("rejects non-positive k and non-string input") {
    val df = spark.range(5).select(col("id").cast("string").as("v"))
    intercept[Exception] {
      df.agg(SketchAggregates.misraGries(col("v"), 0)).collect()
    }
    intercept[Exception] {
      spark.range(5).agg(SketchAggregates.misraGries(col("id"), 3)).collect()
    }
  }
}
