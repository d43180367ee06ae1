package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillLocf: holes filled forward, leading gaps stay null") {
    val e = Seq(
      ("a", "2024-01-01 00:10:00", 1.0),
      ("a", "2024-01-01 02:20:00", 3.0), // hole at hour 1
      ("b", "2024-01-01 01:15:00", 5.0)) // leading gap hour 0, trailing hour 2
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val out = TimeSeries.gapFillLocf(e, "ts", "k", sum(col("v")), "1 hour")
      .select(col("key"), unix_micros(col("bucket")).as("b"),
        col("value"), col("filled"))
      .orderBy("key", "b")
      .as[(String, Long, Option[Double], Boolean)].collect().toSeq
    // global grid: 3 hours × 2 keys
    assert(out.size == 6, out.toString)
    val a = out.filter(_._1 == "a")
    assert(a.map(_._3) == Seq(Some(1.0), Some(1.0), Some(3.0)))
    assert(a.map(_._4) == Seq(false, true, false))
    val b = out.filter(_._1 == "b")
    // leading gap must NOT borrow from the future; trailing carries
    assert(b.map(_._3) == Seq(None, Some(5.0), Some(5.0)))
    assert(b.map(_._4) == Seq(true, false, true))
  }
}
