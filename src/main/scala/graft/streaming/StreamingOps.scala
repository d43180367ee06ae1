package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming-native operators (the streaming counterparts of
  * the batch CDC/window queries; SURVEY §2.5 + north-star extensions).
  *
  * State discipline at scale: the watermark bounds every stateful
  * operator's state (windows and dedup keys expire); the keyed-state
  * materializer keeps exactly one small state object per live key, hash-
  * partitioned by key across executors — the same layout the batch
  * `Changelog.compact` uses, so a pipeline can switch between batch
  * backfill and streaming tail with identical semantics.
  */
object StreamingOps {

  /** Tumbling event-time window aggregation with a watermark bounding
    * late data (and state size).
    */
  def windowedCounts(stream: DataFrame, tsCol: String, windowLen: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming geofence: per-window event counts inside each fence —
    * the "vehicles near each depot per hour" monitor. Fences are
    * `(id, lat, lon, radiusKm)`, a bounded static side: each fence
    * replicates to its covered grid cells
    * ([[graft.operators.GeoJoin.replicateToCells]] — exact-extent,
    * wrap/pole-aware, per-fence radius as a column) and the stream
    * joins it as a STREAM-STATIC broadcast equi-join on the cell key —
    * no cross product, each event keyed once however many fences —
    * then haversine-verifies and window-counts. The watermark bounds
    * the windowed state; the static side is fences × cells rows.
    * Batch twin on a batch frame (the ws_* gating convention).
    */
  def geofenceCounts(stream: DataFrame, tsCol: String, latCol: String,
      lonCol: String, fences: Seq[(Long, Double, Double, Double)],
      windowLen: String, watermark: String,
      cellDeg: Double = 5.0): DataFrame = {
    require(fences.nonEmpty, "geofenceCounts needs at least one fence")
    require(fences.forall(_._4 > 0), "fence radii must be positive")
    require(cellDeg > 0 && cellDeg <= 45,
      s"cellDeg must be in (0, 45], got $cellDeg")
    val spark = stream.sparkSession
    val nLon = graft.operators.GeoJoin.lonCellCount(cellDeg)
    val f = spark.createDataFrame(fences)
      .toDF("fence_id", "_flat", "_flon", "_fr")
    val repl = broadcast(graft.operators.GeoJoin.replicateToCells(
      f, "_flat", "_flon", col("_fr"), cellDeg))
    val wm = if (stream.isStreaming)
      stream.withWatermark(tsCol, watermark) else stream
    wm
      .withColumn("_cla", floor(col(latCol) / cellDeg).cast("int"))
      .withColumn("_clo", least(
        floor(pmod(col(lonCol), lit(360.0)) / cellDeg).cast("int"),
        lit(nLon - 1)))
      .join(repl, Seq("_cla", "_clo"))
      .filter(graft.functions.GeoFunctions.haversineKm(
        col(latCol), col(lonCol), col("_flat"), col("_flon")) <= col("_fr"))
      .groupBy(window(col(tsCol), windowLen).as("_w"), col("fence_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("_w.start").as("window_start"), col("fence_id"),
        col("n_events"))
  }

  /** Streaming exact dedup on key columns; watermark expires dedup state
    * so it stays bounded on an unbounded stream. On a batch frame the
    * watermark-scoped variant is rejected by the planner, so the plain
    * key dedup is the batch twin — same surviving-key-set semantics,
    * no state to bound.
    */
  def dedupeStream(stream: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    if (stream.isStreaming)
      stream
        .withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else stream.dropDuplicates(keyCols)

  /** Windowed approximate quantiles: `percentile_approx`'s mergeable
    * sketch keeps per-window state bounded by `accuracy`, not by row
    * count — the latency-percentile / value-distribution monitor for an
    * unbounded stream. Windows emit when the watermark closes them.
    */
  def windowedQuantiles(stream: DataFrame, tsCol: String, valCol: String,
      windowLen: String, watermark: String, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be in [0, 1], got $probs")
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("_w"))
      .agg(percentile_approx(col(valCol), array(probs.map(lit): _*),
        lit(accuracy)).as("qs"))
      .select(col("_w.start").as("window_start"), col("qs"))
  }

  /** Session windows: activity bursts per key separated by `gap` of
    * silence — `session_window` keeps one open-window state object per
    * live key; the watermark closes and emits sessions once no
    * earlier-than-gap data can arrive. State is hash-partitioned by the
    * grouping key, so session assembly scales horizontally like any
    * keyed aggregation.
    */
  def sessionCounts(stream: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Batch REPLAY of append-mode event-time watermark semantics: given
    * an arrival-batch column (which micro-batch each row arrives in),
    * label every row with its tumbling window and whether a streaming
    * `withWatermark(tsCol, delay) → groupBy(window(...))` aggregation
    * would DROP it as too late.
    *
    * Spark's global watermark mechanics, reproduced exactly:
    *   - max event time is tracked in MILLISECONDS (EventTimeStatsAccum
    *     truncates µs → ms), and the watermark is that max minus the
    *     delay, updated at micro-batch BOUNDARIES — so the watermark in
    *     force while batch `b` runs is derived from batches `< b` only;
    *   - a row is late iff its window END ≤ the in-force watermark (the
    *     state for that window has been evicted and its result emitted —
    *     `WatermarkSupport`'s `≤` eviction predicate).
    * The first batch runs with no watermark (nothing is late).
    *
    * Scale shape: one groupBy over the batch column (a handful of rows),
    * a window over that TINY frame, and a broadcast join back — the big
    * side is never shuffled. The fidelity of the replay to a real
    * MemoryStream run, including the ≤ boundary, is pinned in
    * StreamingOpsSpec.
    */
  def watermarkReplay(df: DataFrame, tsCol: String, batchCol: String,
      windowLen: String, delayMs: Long): DataFrame = {
    require(delayMs >= 0, s"watermark delay must be >= 0 ms, got $delayMs")
    val perBatch = df.groupBy(col(batchCol).cast("long").as("_b"))
      .agg(max(unix_micros(col(tsCol))).as("_mx"))
    // running max over STRICTLY PRIOR batches; the frame is
    // batch-count-sized, so the single-partition window is driver-tiny
    val prior = org.apache.spark.sql.expressions.Window.orderBy("_b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val wm = perBatch
      .withColumn("_wm_us",
        (floor(max(col("_mx")).over(prior) / 1000) - delayMs) * 1000)
      .select(col("_b"), col("_wm_us"))
    // a NULL arrival batch would silently vanish through the inner join
    // below (no batch ⇒ no watermark row) — fail loudly instead
    val checked = when(col(batchCol).isNull,
        raise_error(lit("watermarkReplay: null arrival-batch value — " +
          "every row needs a micro-batch assignment")).cast("long"))
      .otherwise(col(batchCol).cast("long"))
    df.withColumn("_b", checked)
      .join(broadcast(wm), "_b")
      .withColumn("_w", window(col(tsCol), windowLen))
      .withColumn("late", col("_wm_us").isNotNull &&
        unix_micros(col("_w.end")) <= col("_wm_us"))
      .drop("_b", "_wm_us")
  }

  /** Windowed APPROXIMATE distinct keys (HLL++): per-window unique-key
    * counts on an unbounded stream. Exact distinct needs the per-window
    * key SET in state — unbounded on a high-cardinality stream; the
    * sketch keeps fixed-size state per window, mergeable across
    * partitions and micro-batches (`rsd` defaults to 2%). The batch
    * twin gates the estimate against the exact count.
    */
  def windowedDistinct(stream: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, watermark: String,
      rsd: Double = 0.02): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(approx_count_distinct(col(keyCol), rsd).as("n_approx"))
      .select(col("window.start").as("window_start"), col("n_approx"))

  /** Windowed heavy hitters (Misra–Gries): per-window top keys with
    * hard O(k) state per open window however high the key cardinality —
    * the streaming companion of the batch `misraGries` aggregate (exact
    * when k ≥ the window's distinct keys; otherwise counts
    * under-estimate by ≤ n/(k+1), the mergeable-summaries bound). An
    * exact per-key windowed count would hold the full per-window key
    * SET in the state store — unbounded on a web-scale key stream; the
    * summary is one k-entry buffer per window, mergeable across
    * partitions and micro-batches like every aggregate here.
    */
  def windowedHeavyHitters(stream: DataFrame, tsCol: String,
      keyCol: String, windowLen: String, watermark: String,
      k: Int): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.SketchAggregates.misraGries(col(keyCol), k)
        .as("hh"))
      .select(col("window.start").as("window_start"),
        explode(col("hh")).as("e"))
      .select(col("window_start"), col("e.item").as(keyCol),
        col("e.count").as("n"))

  /** Stream-stream interval join: each left event enriched with right
    * events for the same key within `[ts - lookback, ts]` — the streaming
    * twin of the batch as-of/range join. BOTH sides carry watermarks and
    * the join condition bounds event-time distance, so each side's
    * buffered state is dropped once the other side's watermark passes —
    * bounded state on unbounded streams.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
      .withColumnRenamed(keyCol, s"_r_$keyCol")
    l.join(r,
      col(keyCol) === col(s"_r_$keyCol") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
      .drop(s"_r_$keyCol")
  }

  /** Stream-static temporal enrichment: every streaming event picks up
    * the dimension VERSION valid at its event time — the streaming twin
    * of the batch SCD2 as-of composition (`x_temporal_enrich`). The
    * dimension is the STATIC side (an SCD2 table with `[valid_from,
    * valid_to)` intervals, re-read per micro-batch if backed by a live
    * store), so the non-equi interval condition is legal in structured
    * streaming and the join carries NO streaming state at all — each
    * micro-batch is a plain broadcast/hash join against the dimension.
    * Because validity intervals partition each key's timeline, at most
    * one version matches per event (left semantics keep versionless
    * events).
    */
  def temporalEnrich(stream: DataFrame, keyCol: String, tsCol: String,
      dim: DataFrame, dimKeyCol: String, validFromCol: String,
      validToCol: String): DataFrame = {
    val payloadCols = dim.columns.filterNot(c => c == dimKeyCol ||
      c == validFromCol || c == validToCol).toSeq
    val d = dim.select(col(dimKeyCol).as(s"_d_$keyCol"),
      col(validFromCol).as("_vfrom"), col(validToCol).as("_vto"),
      struct(payloadCols.map(col): _*).as("_dpay"))
    stream.join(d,
        col(keyCol) === col(s"_d_$keyCol") &&
          col(tsCol) >= col("_vfrom") &&
          (col("_vto").isNull || col(tsCol) < col("_vto")),
        "left")
      .select(stream.columns.map(col).toSeq ++
        payloadCols.map(c => col(s"_dpay.$c").as(c)): _*)
  }

  /** One observed value in a keyed metric stream. */
  final case class ValuePoint(k: String, seq: Long, x: Double)
  /** A scored point: the EMA baseline/deviation BEFORE absorbing it. */
  final case class AnomalyFlag(k: String, seq: Long, x: Double,
    ema: Double, dev: Double, anomalous: Boolean)
  /** EMA anomaly state — public: Spark's encoder codegen needs the
    * accessors visible.
    */
  final case class EmaState(ema: Double, dev: Double, lastSeq: Long)

  /** Stateful streaming anomaly detection: per key, an exponentially
    * weighted baseline (EMA of the value) and spread (EMA of absolute
    * deviation) maintained in `flatMapGroupsWithState`; a point flags
    * when it sits more than `threshold × dev` from the baseline it
    * ARRIVES against (the baseline then absorbs it — a level shift
    * flags once and becomes the new normal, the Holt/EWMA monitoring
    * contract). O(1) state per key however long the stream runs; rows
    * sort by sequence inside each micro-batch and stale sequences are
    * ignored, so replay is deterministic (the [[latestStatePerKey]]
    * discipline). First point seeds the baseline and never flags.
    */
  def emaAnomalies(points: Dataset[ValuePoint], alpha: Double = 0.3,
      threshold: Double = 3.0): Dataset[AnomalyFlag] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    import points.sparkSession.implicits._
    points
      .groupByKey(_.k)
      .flatMapGroupsWithState[EmaState, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ValuePoint], state: GroupState[EmaState]) =>
          val ordered = rows.toSeq.sortBy(_.seq)
          val out = Seq.newBuilder[AnomalyFlag]
          var st = state.getOption.orNull
          ordered.foreach { p =>
            if (st == null) {
              out += AnomalyFlag(key, p.seq, p.x, p.x, 0.0,
                anomalous = false)
              st = EmaState(p.x, 0.0, p.seq)
            } else if (p.seq > st.lastSeq) {
              val diff = math.abs(p.x - st.ema)
              out += AnomalyFlag(key, p.seq, p.x, st.ema, st.dev,
                anomalous = st.dev > 0 && diff > threshold * st.dev)
              st = EmaState(alpha * p.x + (1 - alpha) * st.ema,
                alpha * diff + (1 - alpha) * st.dev, p.seq)
            } // stale/replayed sequence: ignored
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** One changelog record (the streaming twin of the batch RowKind rows). */
  final case class KeyedChange(k: String, seq: Long, op: String, v: String)
  /** Materialized state transition emitted downstream. */
  final case class KeyedState(k: String, v: String, live: Boolean, lastSeq: Long)

  /** Stateful latest-state-per-key materializer via flatMapGroupsWithState:
    * applies +I/+U/-D in sequence order against per-key state (out-of-order
    * records below the already-applied sequence are ignored), emitting the
    * new state after each micro-batch. -U records are dropped like the
    * batch classifier.
    */
  def latestStatePerKey(changes: Dataset[KeyedChange]): Dataset[KeyedState] = {
    import changes.sparkSession.implicits._
    changes
      .filter(_.op != "-U")
      .groupByKey(_.k)
      .flatMapGroupsWithState[KeyedState, KeyedState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedChange], state: GroupState[KeyedState]) =>
          val ordered = rows.toSeq.sortBy(_.seq)
          val start = state.getOption.getOrElse(KeyedState(key, null, live = false, Long.MinValue))
          val end = ordered.foldLeft(start) { (st, c) =>
            if (c.seq <= st.lastSeq) st // replayed/out-of-order: ignore
            else c.op match {
              case "+I" | "+U" => KeyedState(key, c.v, live = true, c.seq)
              case "-D" => KeyedState(key, null, live = false, c.seq)
              case _ => st
            }
          }
          state.update(end)
          if (end != start) Iterator.single(end) else Iterator.empty
      }
  }
}
