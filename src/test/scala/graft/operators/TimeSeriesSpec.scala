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

  test("holtWinters: pure seasonal series is tracked exactly") {
    // period-2 cycle 10, 20, 10, 20, ...: l0 = 15, s = [-5, +5]; every
    // smoothing step sees y - s = 15, so level stays 15, trend 0,
    // seasonal updates reproduce the cycle and every one-step forecast
    // is exact.
    val b = Seq.tabulate(8)(i =>
      (i.toLong * 1000000L, if (i % 2 == 0) 10.0 else 20.0))
      .toDF("bucket_us", "y")
    val out = TimeSeries.holtWinters(b, "bucket_us", "y",
        period = 2, alpha = 0.5, beta = 0.25, gamma = 0.25)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(out.size == 6) // first `period` buckets seed, not emit
    for ((_, y, level, trend, seasonal, forecast) <- out) {
      assert(level == 15.0 && trend == 0.0)
      assert(seasonal == y - 15.0)
    }
    // each forecast predicts the NEXT bucket's value exactly
    for (Seq(cur, next) <- out.sliding(2))
      assert(cur._6 == next._2, s"forecast ${cur._6} != next y ${next._2}")
  }

  test("holtWinters: hand-computed first step") {
    // period 2, values 10, 20, then 16: l0=15, s=[-5, 5]
    // step (y=16, s1=-5): l' = .5*(16+5) + .5*(15+0) = 18
    //   t' = .25*(18-15) + .75*0 = 0.75
    //   s' = .25*(16-18) + .75*(-5) = -4.25; rotated s = [5, -4.25]
    //   forecast = 18 + 0.75 + 5 = 23.75
    val b = Seq((0L, 10.0), (1L, 20.0), (2L, 16.0)).toDF("bucket_us", "y")
    val out = TimeSeries.holtWinters(b, "bucket_us", "y", 2, 0.5, 0.25, 0.25)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq((2L, 16.0, 18.0, 0.75, -4.25, 23.75)),
      s"got $out")
  }

  test("holtWinters: series shorter than one period emits nothing") {
    val b = Seq((0L, 1.0), (1L, 2.0)).toDF("bucket_us", "y")
    assert(TimeSeries.holtWinters(b, "bucket_us", "y", 7,
      0.5, 0.25, 0.25).count() == 0)
  }
}
