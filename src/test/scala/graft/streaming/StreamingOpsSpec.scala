package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingOps.{KeyedChange, KeyedState}

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stateful latest-state-per-key applies ops in sequence order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedChange]
    val q = StreamingOps.latestStatePerKey(input.toDS())
      .writeStream.format("memory").queryName("states")
      .outputMode("append").start()
    try {
      input.addData(
        KeyedChange("a", 1, "+I", "v1"), KeyedChange("b", 2, "+I", "b1"))
      q.processAllAvailable()
      input.addData(
        KeyedChange("a", 4, "+U", "v2"),   // out of order vs seq 3 below
        KeyedChange("a", 3, "-U", "skip"), // dropped kind
        KeyedChange("b", 5, "-D", ""))
      q.processAllAvailable()
      val states = spark.table("states").as[KeyedState].collect()
        .groupBy(_.k).map { case (k, ss) => k -> ss.maxBy(_.lastSeq) }
      assert(states("a") == KeyedState("a", "v2", live = true, 4))
      assert(states("b") == KeyedState("b", null, live = false, 5))
    } finally q.stop()
  }

  test("replayed records below the applied sequence are ignored") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedChange]
    val q = StreamingOps.latestStatePerKey(input.toDS())
      .writeStream.format("memory").queryName("states2")
      .outputMode("append").start()
    try {
      input.addData(KeyedChange("a", 5, "+I", "new"))
      q.processAllAvailable()
      input.addData(KeyedChange("a", 2, "+U", "stale")) // replay
      q.processAllAvailable()
      val live = spark.table("states2").as[KeyedState].collect().maxBy(_.lastSeq)
      assert(live == KeyedState("a", "new", live = true, 5))
    } finally q.stop()
  }

  test("windowedDistinct runs as a real stream with per-window sketches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = StreamingOps.windowedDistinct(df, "ts", "user_id",
        "1 hour", "1 hour")
      .writeStream.format("memory").queryName("wdistinct")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // hour 0: users 1,2,2,3 (3 distinct); hour 1: user 1 (1 distinct)
      input.addData(
        (t("2024-01-01 00:05:00"), 1L), (t("2024-01-01 00:10:00"), 2L),
        (t("2024-01-01 00:20:00"), 2L), (t("2024-01-01 00:40:00"), 3L),
        (t("2024-01-01 01:10:00"), 1L))
      q.processAllAvailable()
      // advance the watermark past hour 1 so both windows emit
      input.addData((t("2024-01-01 03:00:00"), 9L))
      q.processAllAvailable()
      val rows = spark.table("wdistinct")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      // HLL++ is exact at this cardinality
      assert(rows(t("2024-01-01 00:00:00")) == 3L, rows.toString)
      assert(rows(t("2024-01-01 01:00:00")) == 1L, rows.toString)
    } finally q.stop()
  }

  test("windowedQuantiles runs as a real stream; exact at small windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val q = StreamingOps.windowedQuantiles(df, "ts", "value",
        "1 hour", "1 hour", Seq(0.5, 0.9))
      .writeStream.format("memory").queryName("wquant")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // hour 0: 1..9 (p50 = 5, p90 = 9 at this accuracy); hour 1: 10,20
      input.addData((1 to 9).map(i =>
        (t(f"2024-01-01 00:${i * 5}%02d:00"), i.toDouble)): _*)
      input.addData(
        (t("2024-01-01 01:10:00"), 10.0), (t("2024-01-01 01:20:00"), 20.0))
      q.processAllAvailable()
      input.addData((t("2024-01-01 03:00:00"), 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("wquant")
        .as[(java.sql.Timestamp, Seq[Double])].collect().toMap
      assert(rows(t("2024-01-01 00:00:00")) == Seq(5.0, 9.0), rows.toString)
      assert(rows(t("2024-01-01 01:00:00")) == Seq(10.0, 20.0), rows.toString)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      StreamingOps.windowedQuantiles(df, "ts", "value", "1 hour", "1 hour",
        Seq(1.5))
    }
  }

  test("windowedHeavyHitters runs as a real stream; exact at k ≥ domain") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "k")
    val q = StreamingOps.windowedHeavyHitters(df, "ts", "k",
        "1 hour", "1 hour", k = 8)
      .writeStream.format("memory").queryName("whh")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // hour 0: a×3, b×1; hour 1: b×2 — across two micro-batches so the
      // summary MERGES through the state store
      input.addData(
        (t("2024-01-01 00:05:00"), "a"), (t("2024-01-01 00:10:00"), "b"),
        (t("2024-01-01 00:20:00"), "a"))
      q.processAllAvailable()
      input.addData(
        (t("2024-01-01 00:40:00"), "a"),
        (t("2024-01-01 01:10:00"), "b"), (t("2024-01-01 01:20:00"), "b"))
      q.processAllAvailable()
      input.addData((t("2024-01-01 03:00:00"), "z")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("whh")
        .as[(java.sql.Timestamp, String, Long)].collect()
        .map { case (w, k, n) => (w, k) -> n }.toMap
      assert(rows((t("2024-01-01 00:00:00"), "a")) == 3L, rows.toString)
      assert(rows((t("2024-01-01 00:00:00"), "b")) == 1L, rows.toString)
      assert(rows((t("2024-01-01 01:00:00"), "b")) == 2L, rows.toString)
    } finally q.stop()
  }

  test("streaming dedup keeps the first arrival per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("k", "ts", "v")
    val q = StreamingOps.dedupeStream(df, "ts", "10 minutes", Seq("k"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData(("a", t, "first"), ("a", t, "dupe"), ("b", t, "only"))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2)
    } finally q.stop()
  }

  test("session windows split on gaps and close at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val df = input.toDF().toDF("user", "ts")
    val q = StreamingOps.sessionCounts(df, "ts", "user", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        ("u1", t("2024-01-01 00:00:00")), ("u1", t("2024-01-01 00:03:00")),
        ("u1", t("2024-01-01 00:20:00")), // gap > 5m → second session
        ("u2", t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      input.addData(("u3", t("2024-01-01 02:00:00"))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user", "session_start", "n_events")
        .as[(String, java.sql.Timestamp, Long)].collect().toSet
      assert(rows.contains(("u1", t("2024-01-01 00:00:00"), 2L)))
      assert(rows.contains(("u1", t("2024-01-01 00:20:00"), 1L)))
      assert(rows.contains(("u2", t("2024-01-01 00:01:00"), 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join enriches within the lookback only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, java.sql.Timestamp)]
    val buys = MemoryStream[(String, java.sql.Timestamp, Double)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val joined = StreamingOps.intervalJoin(
      buys.toDF().toDF("user", "buy_ts", "amount"),
      clicks.toDF().toDF("user", "click_ts"),
      "user", "buy_ts", "click_ts", "10 minutes", "30 minutes")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      clicks.addData(
        ("u1", t("2024-01-01 00:00:00")),  // within 10m of the buy
        ("u1", t("2024-01-01 00:05:00")),  // within
        ("u1", t("2024-01-01 01:00:00")),  // after the buy → excluded
        ("u2", t("2024-01-01 00:01:00")))  // other key
      buys.addData(("u1", t("2024-01-01 00:08:00"), 9.99))
      q.processAllAvailable()
      // advance both watermarks so results flush (u9's click is 4h before
      // its buy — outside the 10m lookback, so the advancers don't join)
      clicks.addData(("u9", t("2024-01-01 06:00:00")))
      buys.addData(("u9", t("2024-01-01 10:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("user", "click_ts").as[(String, java.sql.Timestamp)]
        .collect().toSet
      assert(rows == Set(
        ("u1", t("2024-01-01 00:00:00")), ("u1", t("2024-01-01 00:05:00"))))
    } finally q.stop()
  }

  test("geofenceCounts runs as a real stream; per-fence windowed entries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val df = input.toDF().toDF("ts", "lat", "lon")
    val q = StreamingOps.geofenceCounts(df, "ts", "lat", "lon",
        Seq((1L, 0.0, 0.0, 200.0), (2L, 50.0, 100.0, 300.0)),
        "1 hour", "1 hour")
      .writeStream.format("memory").queryName("wgeo")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 00:05:00"), 0.5, 0.5),   // fence 1 (~78 km)
        (t("2024-01-01 00:10:00"), 1.0, -0.5),  // fence 1 (~124 km)
        (t("2024-01-01 00:20:00"), 50.5, 99.0), // fence 2 (~90 km)
        (t("2024-01-01 00:30:00"), 20.0, 20.0), // inside no fence
        (t("2024-01-01 01:10:00"), 0.1, 0.1))   // fence 1, hour 1
      q.processAllAvailable()
      // advance the watermark; the driver row itself is in no fence
      input.addData((t("2024-01-01 03:00:00"), 80.0, 80.0))
      q.processAllAvailable()
      val rows = spark.table("wgeo")
        .as[(java.sql.Timestamp, Long, Long)].collect()
        .map { case (w, f, n) => ((w, f), n) }.toMap
      assert(rows((t("2024-01-01 00:00:00"), 1L)) == 2L, rows.toString)
      assert(rows((t("2024-01-01 00:00:00"), 2L)) == 1L, rows.toString)
      assert(rows((t("2024-01-01 01:00:00"), 1L)) == 1L, rows.toString)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      StreamingOps.geofenceCounts(df, "ts", "lat", "lon", Seq.empty,
        "1 hour", "1 hour")
    }
    intercept[IllegalArgumentException] {
      StreamingOps.geofenceCounts(df, "ts", "lat", "lon",
        Seq((1L, 0.0, 0.0, -5.0)), "1 hour", "1 hour")
    }
  }

  test("watermarked tumbling window counts by event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = StreamingOps.windowedCounts(df, "ts", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("windows")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 00:10:00"), "click"), (t("2024-01-01 00:20:00"), "click"),
        (t("2024-01-01 01:10:00"), "view"))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((t("2024-01-01 09:00:00"), "late-driver"))
      q.processAllAvailable()
      val rows = spark.table("windows")
        .select("window_start", "event_type", "n")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(rows.contains((t("2024-01-01 00:00:00"), "click", 2L)))
      assert(rows.contains((t("2024-01-01 01:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("temporalEnrich: stream-static SCD2 join, stateless per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)] // (event_id, user, ts)
    val df = input.toDF().toDF("event_id", "user_id", "t")
    // SCD2 dim: user 1 has versions [10,20) and [20,∞); user 2 none
    val dim = Seq((1L, 1L, 10L, Some(20L)), (1L, 2L, 20L, None))
      .toDF("user_id", "version", "vfrom", "vto")
      .select(col("user_id"), col("version"), col("vfrom"),
        col("vto").cast("long"))
    val q = StreamingOps.temporalEnrich(df, "user_id", "t",
        dim, "user_id", "vfrom", "vto")
      .select("event_id", "version")
      .writeStream.format("memory").queryName("tenrich")
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, 5L), (2L, 1L, 15L), (3L, 1L, 20L),
        (4L, 1L, 99L), (5L, 2L, 50L))
      q.processAllAvailable()
      val rows = spark.table("tenrich")
        .as[(Long, Option[Long])].collect().toMap
      // before the first version → null; [10,20) → v1; boundary 20 and
      // beyond → v2; unknown key → null (left semantics)
      assert(rows == Map(1L -> None, 2L -> Some(1L), 3L -> Some(2L),
        4L -> Some(2L), 5L -> None), rows.toString)
    } finally q.stop()
  }

  test("emaAnomalies: level shifts flag once, state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.ValuePoint]
    val q = StreamingOps.emaAnomalies(input.toDS(), alpha = 0.5,
        threshold = 3.0)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode("append").start()
    try {
      import StreamingOps.ValuePoint
      // steady 10 ± 1, then a spike to 100 in a LATER micro-batch
      input.addData(ValuePoint("m", 1, 10.0), ValuePoint("m", 2, 11.0),
        ValuePoint("m", 3, 9.0), ValuePoint("m", 4, 10.0))
      q.processAllAvailable()
      input.addData(ValuePoint("m", 5, 100.0), ValuePoint("m", 6, 10.0))
      q.processAllAvailable()
      val rows = spark.table("anomalies")
        .as[StreamingOps.AnomalyFlag].collect().sortBy(_.seq)
      // the first point seeds, steady points never flag
      assert(!rows.take(4).exists(_.anomalous), rows.mkString("\n"))
      // the spike flags against the pre-spike baseline (state crossed
      // the micro-batch boundary)
      val spike = rows.find(_.seq == 5).get
      assert(spike.anomalous && math.abs(spike.ema - 10.0) < 1.5,
        spike.toString)
      // determinism: re-running the same feed yields identical flags
      assert(rows.map(_.anomalous).toSeq ==
        Seq(false, false, false, false, true,
          rows.find(_.seq == 6).get.anomalous))
    } finally q.stop()
  }

  test("blocklistScreen composes with a live stream, per micro-batch") {
    // the curation projection over MemoryStream micro-batches must
    // equal the batch run over the same rows — blocklistScreen is a
    // pure projection, so append mode with NO state or watermark is the
    // whole streaming story; patterns overlap ("scan" inside "window
    // scan") so the Aho–Corasick output links are exercised live
    implicit val sqlCtx = spark.sqlContext
    val pats = Seq("scan", "window scan", "merge window")
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.blocklistScreen(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", pats)
      .writeStream.format("memory").queryName("blocked")
      .outputMode("append").start()
    val rows = Seq(
      (1L, "a full window scan happened"),   // both 'scan' and 'window scan'
      (2L, "merge window scan"),             // all three, overlapping
      (3L, "nothing to see"),
      (4L, "SCAN uppercase"))                // case-insensitive
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("blocked")
        .as[(Long, Int, String, Boolean)].collect().toSeq.sortBy(_._1)
      val batch = graft.operators.TextAnalysis.blocklistScreen(
          rows.toDF("doc_id", "text"), "doc_id", "text", pats)
        .as[(Long, Int, String, Boolean)].collect().toSeq.sortBy(_._1)
      assert(streamed == batch, s"stream $streamed\nbatch  $batch")
      assert(streamed.map(_._3) ==
        Seq("scan,window scan", "scan,window scan,merge window", "", "scan"))
    } finally q.stop()
  }

  test("watermarkReplay matches a real append-mode run: exact drop set") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // shuffled event times across four micro-batches; 10-min windows,
    // 5-min watermark. After batch 0 (max 10:25) the watermark is 10:20:
    //   id 4 (10:12, window end 10:20) ties the eviction boundary — late
    //   id 6 (10:05, window end 10:10) — late
    // After batch 1 (max 10:35) the watermark is 10:30:
    //   id 8 (10:14, window end 10:20) — late
    // Batch 3 is the far-future sentinel closing every real window.
    val batches: Seq[Seq[(Long, java.sql.Timestamp)]] = Seq(
      Seq((1L, t("2024-01-01 10:02:00")), (2L, t("2024-01-01 10:12:00")),
        (3L, t("2024-01-01 10:25:00"))),
      Seq((4L, t("2024-01-01 10:12:00")), (5L, t("2024-01-01 10:22:00")),
        (6L, t("2024-01-01 10:05:00")), (7L, t("2024-01-01 10:35:00"))),
      Seq((8L, t("2024-01-01 10:14:00")), (9L, t("2024-01-01 10:31:00"))),
      Seq((99L, t("2024-01-01 12:00:07"))))
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("id", "ts")
    val q = df.withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("_w"))
      .agg(count(lit(1)).as("n"))
      .select(col("_w.start").as("ws"), col("n"))
      .writeStream.format("memory").queryName("wslate")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("wslate")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      // the analytic replay over the SAME arrival batches
      val labeled = batches.zipWithIndex.flatMap { case (rows, b) =>
        rows.map { case (id, ts) => (id, ts, b) }
      }.toDF("id", "ts", "b")
      val replay = StreamingOps.watermarkReplay(
        labeled, "ts", "b", "10 minutes", 5 * 60 * 1000L)
      assert(replay.filter(col("late")).select("id").as[Long]
        .collect().toSet == Set(4L, 6L, 8L))
      // append mode emits exactly the windows the FINAL watermark closed
      val maxUs = labeled.agg(max(unix_micros(col("ts")))).head().getLong(0)
      val finalWmUs = (maxUs / 1000 - 5 * 60 * 1000) * 1000
      val kept = replay.filter(!col("late"))
        .filter(unix_micros(col("_w.end")) <= finalWmUs)
        .groupBy(col("_w.start").as("ws")).agg(count(lit(1)).as("n"))
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(streamed == kept, s"stream $streamed\nreplay $kept")
      // the boundary row and the stragglers are really gone from output
      assert(streamed(t("2024-01-01 10:10:00")) == 1L)
      assert(streamed(t("2024-01-01 10:00:00")) == 1L)
      assert(streamed(t("2024-01-01 10:30:00")) == 2L)
    } finally q.stop()
  }
}
