package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regular-grid time-series repair — the "make the metric continuous"
  * step every monitoring/feature pipeline needs before windowed math
  * (a moving average over a series with silent holes is wrong, not
  * approximate).
  */
object TimeSeries {

  /** Fixed-interval gap fill with last-observation-carried-forward:
    * aggregate `valueAgg` per (key, bucket), then complete every key's
    * series over the GLOBAL bucket range and fill holes with the last
    * seen value. `filled` marks fabricated rows. Leading gaps — before
    * a key's first observation — stay null: carrying a value backward
    * in time would fabricate data that never existed.
    *
    * Scale shape: the aggregate is one map-side-combinable hash agg
    * over events; the grid is keys × (span/interval) rows — BUCKET
    * space, not event space — built from one broadcast min/max row and
    * a `sequence` generator (no driver collect); LOCF is a per-key
    * ordered window over buckets. Event volume never enters the window.
    */
  def gapFillLocf(df: DataFrame, tsCol: String, keyCol: String,
      valueAgg: Column, interval: String = "1 hour"): DataFrame = {
    val bucket = window(col(tsCol), interval).getField("start")
    val perBucket = df
      .groupBy(col(keyCol).as("key"), bucket.as("bucket"))
      .agg(valueAgg.as("value"))
    val bounds = perBucket.agg(min("bucket").as("_mn"), max("bucket").as("_mx"))
    val grid = perBucket.select("key").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("key"),
        explode(sequence(col("_mn"), col("_mx"),
          expr(s"interval $interval"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `filled` marks join ABSENCE (fabricated grid row), not value
    // nullness: an observed bucket whose aggregate is genuinely NULL
    // (e.g. sum over all-null inputs) is a real observation and must
    // not be LOCF-overwritten by a stale carry.
    // The carry wraps value in a struct so an observed bucket whose
    // aggregate is genuinely NULL is still "the last observation"
    // (carried as null), while fabricated rows contribute nothing.
    grid.join(perBucket.withColumn("_observed", lit(true)),
        Seq("key", "bucket"), "left")
      .withColumn("filled", col("_observed").isNull)
      .withColumn("value",
        when(col("filled"),
          last(when(!col("filled"), struct(col("value"))),
            ignoreNulls = true).over(w).getField("value"))
        .otherwise(col("value")))
      .drop("_observed")
  }

  /** Additive Holt–Winters (triple exponential smoothing): level +
    * trend + a `period`-slot seasonal component — the forecasting
    * baseline for any metric with a weekly/daily cycle, and the
    * seasonal extension of the `q_holt` double-smoothing shape.
    *
    * Input is ONE gapless bucketed series `(bucketCol ascending,
    * valueCol)` (compose with [[gapFillLocf]] first if the grid has
    * holes; for many series, group upstream and apply per key — the
    * fold is per-series state, series parallelize across the cluster).
    * Initialization: `l₀ = mean(y₁..y_m)`, `t₀ = 0`,
    * `sᵢ = yᵢ − l₀`; smoothing starts at bucket `m+1`, so only those
    * rows are emitted. The seasonal state ROTATES — slot 1 is always
    * the season of the next bucket, each step consumes the head and
    * appends its update — which is what lets a recursive-CTE oracle
    * carry the identical list with `s[2:] || [s']`.
    *
    * Determinism contract: pick α/β/γ with exact binary
    * representations (0.5, 0.25, …) so `1−α` is the same double in any
    * engine; the recursion runs on UNROUNDED doubles in fixed
    * left-associated order (the init mean folds the first `m` values
    * in bucket order) and only OUTPUTS round to 6dp — bit-identical to
    * the replayed recursion.
    *
    * Scale shape: one hash-agg collapses the series to bucket space,
    * then a single O(buckets·period) fold over the sorted bucket array
    * and one posexplode back to rows — bucket-space work, never event
    * rows. Returns `(bucketCol, valueCol, level, trend, seasonal,
    * forecast_next)`.
    */
  def holtWinters(buckets: DataFrame, bucketCol: String, valueCol: String,
      period: Int, alpha: Double, beta: Double, gamma: Double): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(buckets.schema(bucketCol).dataType == LongType,
      s"bucket column must be epoch-micros LONG, got " +
        buckets.schema(bucketCol).dataType.simpleString)
    val m = period
    val arr = sort_array(collect_list(struct(col(bucketCol).as("b"),
      col(valueCol).as("y"))))
    val outField = StructType(Seq(
      StructField("b", LongType), StructField("y", DoubleType),
      StructField("level", DoubleType), StructField("trend", DoubleType),
      StructField("seasonal", DoubleType),
      StructField("forecast", DoubleType)))
    val folded = buckets.agg(arr.as("_a"))
      .withColumn("_init", slice(col("_a"), 1, m))
      // left-associated init mean in bucket order (0 + y1 == y1 in FP,
      // so aggregate-with-zero matches the oracle's list_reduce fold)
      .withColumn("_l0",
        aggregate(col("_init"), lit(0.0), (a, x) => a + x.getField("y"))
          / m)
      .withColumn("_st", aggregate(
        slice(col("_a"), lit(m + 1),
          greatest(size(col("_a")) - m, lit(0))),
        struct(
          col("_l0").as("l"), lit(0.0).as("t"),
          transform(col("_init"), x => x.getField("y") - col("_l0"))
            .as("s"),
          array().cast(ArrayType(outField)).as("out")),
        (acc, x) => {
          val y = x.getField("y")
          val l = acc.getField("l"); val t = acc.getField("t")
          val s1 = element_at(acc.getField("s"), 1)
          // lNew is textually expanded into the trend/seasonal updates
          // on BOTH sides (SQL cannot bind intermediates in the
          // recursive arm) — identical arithmetic, identical doubles
          def lNew = lit(alpha) * (y - s1) + lit(1.0 - alpha) * (l + t)
          val tNew = lit(beta) * (lNew - l) + lit(1.0 - beta) * t
          val sNew = lit(gamma) * (y - lNew) + lit(1.0 - gamma) * s1
          val sArr = concat(slice(acc.getField("s"), 2, m - 1),
            array(sNew))
          val row = struct(x.getField("b").as("b"), y.as("y"),
            round(lNew, 6).as("level"), round(tNew, 6).as("trend"),
            round(element_at(sArr, m), 6).as("seasonal"),
            round(lNew + tNew + element_at(sArr, 1), 6).as("forecast"))
          struct(lNew.as("l"), tNew.as("t"), sArr.as("s"),
            concat(acc.getField("out"), array(row)).as("out"))
        }))
      .select(explode(col("_st.out")).as("_r"))
    folded.select(col("_r.b").as(bucketCol), col("_r.y").as(valueCol),
        col("_r.level").as("level"), col("_r.trend").as("trend"),
        col("_r.seasonal").as("seasonal"),
        col("_r.forecast").as("forecast_next"))
      .orderBy(bucketCol)
  }
}
