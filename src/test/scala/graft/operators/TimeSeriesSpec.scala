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

  test("gapFillLocf: observed-null aggregate is a real observation") {
    // A bucket that WAS observed but whose aggregate is genuinely NULL
    // (sum over all-null inputs) must keep filled=false and its null
    // value — not be overwritten by a stale LOCF carry. And a
    // fabricated row after it carries that null observation forward.
    val e = Seq(
      ("a", "2024-01-01 00:10:00", Some(1.0)),
      ("a", "2024-01-01 01:20:00", None), // observed, aggregate NULL
      ("a", "2024-01-01 03:30:00", Some(4.0))) // hole at hour 2
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val out = TimeSeries.gapFillLocf(e, "ts", "k", sum(col("v")), "1 hour")
      .select(col("key"), unix_micros(col("bucket")).as("b"),
        col("value"), col("filled"))
      .orderBy("key", "b")
      .as[(String, Long, Option[Double], Boolean)].collect().toSeq
    assert(out.size == 4, out.toString)
    // hour 1: observed null — NOT filled, NOT overwritten with 1.0;
    // hour 2: fabricated — carries the hour-1 null observation forward
    assert(out.map(_._3) == Seq(Some(1.0), None, None, Some(4.0)))
    assert(out.map(_._4) == Seq(false, false, true, false))
  }
}
