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

  /** Skew-resilient twin of [[sessionize]] for a HOT user key (a bot or
    * ingestion artifact holding a corpus-scale share of events —
    * `Window.partitionBy(user)` funnels that user's entire history
    * through ONE task). Two-phase layout instead, the
    * [[Batching.withGroupRowNumber]] pattern extended to sequential gap
    * detection:
    *   1. range-partition by `(user, ts)` and sort within partitions —
    *      a hot user SPREADS over a run of consecutive partitions, every
    *      partition is corpus-size/P;
    *   2. one lightweight pass emits each partition's BOUNDARY facts
    *      only (first/last user run: first/last ts, internal session
    *      starts) — O(partitions) rows, because interior users are
    *      complete within their partition and need no stitching;
    *   3. the driver walks partitions in order carrying `(user, last
    *      ts, sessions so far)` across chains — O(partitions) work —
    *      and broadcasts per-partition offsets;
    *   4. the final pass assigns `session_idx` partition-locally:
    *      continuation runs add their broadcast offset, and whether
    *      their first row opens a new session came from the stitch.
    * Results are spec-pinned identical to [[sessionize]] (including a
    * hot user spanning many partitions). `tsCol` must be numeric
    * (`maxGap` in its units), as in the gate's epoch-micros usage.
    */
  def sessionizeSpread(events: DataFrame, userCol: String, tsCol: String,
      maxGap: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = events.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ONE Dataset → ONE lazy `.rdd` → both passes run as two jobs over
    // the SAME lineage: the range shuffle's map stage executes once and
    // the second job reuses its shuffle files (skipped stage), so the
    // passes read one consistent snapshot WITHOUT materializing blocks.
    // (The earlier localCheckpoint stored deserialized Row blocks — a
    // measured memory step at ~10M rows × 32 partitions — and truncated
    // lineage, failing the job on executor loss instead of recomputing;
    // see SCALING.md session_rows.) Each pass re-runs only the
    // partition-local sort. Tie rows share the full (user, ts) key, so
    // every boundary/session fact is invariant to shuffle-arrival tie
    // order. Caveat: if a map task is lost BETWEEN the passes and the
    // source is nondeterministic, the recomputed partition may diverge —
    // the standard two-jobs-one-shuffle contract; pass 2 re-checks each
    // partition's row count against pass 1's edge facts and fails
    // loudly on divergence (Batching.snapshotDiverged) instead of
    // stitching shifted boundaries; feed a deterministic source (any
    // file scan qualifies).
    val sorted = events
      .repartitionByRange(parts, col(userCol), col(tsCol))
      .sortWithinPartitions(col(userCol), col(tsCol))
    val uIdx = sorted.schema.fieldIndex(userCol)
    val tIdx = sorted.schema.fieldIndex(tsCol)
    def tsOf(r: Row): Long = r.get(tIdx) match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"sessionizeSpread needs a numeric ts column, got $other")
    }
    // pass 1: per partition, the boundary facts — first run's (user,
    // first ts, internal starts, row count) and last run's (user, last
    // ts) plus whether the partition holds a single user run
    case class Edge(pid: Int, firstUser: Any, firstTs: Long,
      firstRunInternalStarts: Long, lastUser: Any, lastTs: Long,
      lastRunInternalStarts: Long, singleRun: Boolean, rows: Long)
    val edges: Array[Edge] = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val fu = first.get(uIdx); val fts = tsOf(first)
        var curUser = fu
        var prevTs = fts
        var lastTs = fts
        var single = true
        var rows = 1L
        var runStarts = 0L       // internal starts of the CURRENT run
        var firstRunStarts = -1L // fixed when the first run ends
        while (it.hasNext) {
          val r = it.next()
          val u = r.get(uIdx); val ts = tsOf(r)
          if (u != curUser) {
            if (firstRunStarts < 0) firstRunStarts = runStarts
            single = false; curUser = u; runStarts = 0L
          } else if (ts - prevTs > maxGap) runStarts += 1
          prevTs = ts; lastTs = ts; rows += 1L
        }
        if (firstRunStarts < 0) firstRunStarts = runStarts // single run
        Iterator.single(Edge(pid, fu, fts, firstRunStarts,
          curUser, lastTs, runStarts, single, rows))
      }
    }.collect().sortBy(_.pid)
    // driver stitch: walk partitions in order, carrying the open run
    var carryUser: Any = null
    var carryHas = false
    var carryLastTs = 0L
    var carrySessions = 0L
    // pid -> (offset for the first run, does its first row open a
    // session, pass-1 row count — the pass-2 snapshot check)
    val stitched = edges.map { e =>
      val continues = carryHas && carryUser == e.firstUser
      val firstRowStarts = !continues || e.firstTs - carryLastTs > maxGap
      val offset = if (continues) carrySessions else 0L
      if (e.singleRun) {
        // the run may keep flowing into the next partition
        carryUser = e.firstUser; carryHas = true; carryLastTs = e.lastTs
        carrySessions = offset + (if (firstRowStarts) 1L else 0L) +
          e.firstRunInternalStarts
      } else {
        // the LAST run opened fresh inside this partition: its first row
        // starts session 1, plus its internal gap starts
        carryUser = e.lastUser; carryHas = true; carryLastTs = e.lastTs
        carrySessions = 1L + e.lastRunInternalStarts
      }
      e.pid -> (offset, firstRowStarts, e.rows)
    }.toMap
    val bc = spark.sparkContext.broadcast(stitched)
    val schema = sorted.schema.add("session_idx", LongType, nullable = false)
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // empty partitions emitted no edge; the defaults are never used
      val (offset0, firstStarts, expectRows) =
        bc.value.getOrElse(pid, (0L, true, 0L))
      var started = false
      var curUser: Any = null
      var prevTs = 0L
      var idx = 0L
      val mapped = it.map { r =>
        val u = r.get(uIdx); val ts = tsOf(r)
        if (!started) {
          started = true; curUser = u; prevTs = ts
          // a continuation run whose first row does NOT start sits in
          // the carried session: idx = offset0 (>= 1 by construction)
          idx = offset0 + (if (firstStarts) 1L else 0L)
        } else if (u != curUser) {
          curUser = u; idx = 1L
        } else if (ts - prevTs > maxGap) {
          idx += 1L
        }
        prevTs = ts
        Row.fromSeq(r.toSeq :+ idx)
      }
      Batching.verifiedEnd(mapped)(n =>
        if (n != expectRows)
          Batching.snapshotDiverged("sessionizeSpread", pid,
            s"pass 1 counted $expectRows rows, pass 2 saw $n"))
    }
    spark.createDataFrame(out, schema)
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
