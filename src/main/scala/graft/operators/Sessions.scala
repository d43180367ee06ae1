package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream sessionization and trailing-window activity — the
  * per-event companions to [[Funnel]]'s per-user reports: instead of one
  * row per user, every event is annotated with its session or its
  * trailing activity, feeding engagement features and downstream
  * session-level aggregation.
  *
  * Scale shape: both operators are ONE window pass partitioned by the
  * user key — a high-cardinality partitioning, so window state is
  * events-per-user-sized (bounded: a user's history, not the corpus) and
  * the only shuffle is the user-keyed sort. [[sessionize]]'s two steps
  * (lag, then running sum) share that partitioning, so Catalyst plans a
  * single exchange+sort; no driver state, no corpus-wide window.
  */
object Sessions {

  /** Assign every event its user's 1-based session index: a session
    * starts at the user's first event and whenever the gap since their
    * PREVIOUS event exceeds `maxGap` (in `tsCol`'s own units — the
    * classic 30-minute-inactivity web session). Adds `session_idx`;
    * `(userCol, session_idx)` is the session key.
    *
    * Deterministic under timestamp ties: a tied row can never start a
    * session (gap 0 from its twin), so every row of a tie group lands in
    * the same session regardless of their arbitrary sort order.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      maxGap: Column): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_start",
        when(col("_prev").isNull || col(tsCol) - col("_prev") > maxGap, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("_start")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_start")
  }

  /** Annotate every event with the count of the same user's events in
    * the trailing `windowSize` (a RANGE frame over the numeric `tsCol` —
    * inclusive of the current event): the "events in the last 7 days"
    * engagement feature. Adds `n_window`. Range frames are
    * order-insensitive within ties, so the count is deterministic.
    */
  def rollingCounts(events: DataFrame, userCol: String, tsCol: String,
      windowSize: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rangeBetween(-windowSize, 0)
    events.withColumn("n_window", count(lit(1)).over(w))
  }

  /** Trailing-window spike detection per event type: each time bucket's
    * count scored against the mean/σ of its PREVIOUS `lookback` buckets
    * (z-score; `z ≥ 3` flags a spike). `z` is null until `minBuckets`
    * of history exist or when the trailing window is flat (σ = 0) —
    * cold-start buckets never alert.
    *
    * Scale shape — AGGREGATE FIRST, window over the aggregate: the
    * corpus-sized work is one (type, bucket) hash count; the window
    * runs over that tiny relation (types × buckets rows — bounded by
    * time, not traffic), so a hot event type costs the window nothing.
    * Mean/σ come from trailing integer sums (`Σn`, `Σn²` — exact in
    * double), NOT the engine's stddev aggregate, so both engines
    * compute bit-identical statistics at 6dp.
    */
  def spikeScores(events: DataFrame, typeCol: String, tsCol: String,
      bucketMicros: Long, lookback: Int = 24, minBuckets: Int = 12,
      threshold: Double = 3.0): DataFrame = {
    require(bucketMicros > 0 && lookback > 0 && minBuckets > 0,
      s"bucketMicros/lookback/minBuckets must be positive")
    val hourly = events.groupBy(col(typeCol),
        expr(s"unix_micros($tsCol) DIV $bucketMicros").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("bucket"))
      .rangeBetween(-lookback, -1)
    val s1 = sum(col("n")).over(w)
    val s2 = sum(col("n") * col("n")).over(w)
    val c = count(lit(1)).over(w)
    // expression SHAPE mirrored by the SQL oracle term-for-term
    val mean = s1.cast("double") / c
    val variance = s2.cast("double") / c - mean * mean
    val z = when(c >= minBuckets && variance > 0,
      round((col("n") - mean) / sqrt(variance), 6))
    hourly.select(col(typeCol), col("bucket"), col("n"), z.as("z"),
      coalesce(z >= threshold, lit(false)).as("spike"))
  }
}
