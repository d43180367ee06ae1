package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
