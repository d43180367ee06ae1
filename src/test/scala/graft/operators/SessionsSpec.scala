package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("spikeScores flags a planted burst and stays silent in cold start") {
    // type "a": 1 event/bucket for buckets 0-23, then 50 in bucket 24;
    // type "b": flat 2/bucket — variance 0, never scored
    val rows =
      (0 to 23).map(h => ("a", h.toLong, 1)) ++ Seq(("a", 24L, 50)) ++
        (0 to 24).map(h => ("b", h.toLong, 2))
    val events = rows.flatMap { case (t, h, n) =>
      (0 until n).map(i => (t, h * 3600000000L + i))
    }.toDF("event_type", "us")
      .select(col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = Sessions.spikeScores(events, "event_type", "ts",
        bucketMicros = 3600000000L)
      .as[(String, Long, Long, Option[Double], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // cold start: first 12 buckets of "a" unscored
    assert(got(("a", 0L))._2.isEmpty && !got(("a", 0L))._3)
    assert(got(("a", 11L))._2.isEmpty)
    // steady state before the burst: flat history → σ = 0 → unscored
    assert(got(("a", 23L))._2.isEmpty && !got(("a", 23L))._3)
    // the burst over a PERFECTLY flat history is also unscored (σ = 0 is
    // the documented contract — z is undefined, not infinite)
    assert(got(("a", 24L))._2.isEmpty && !got(("a", 24L))._3)
    // type "b" flat forever: never scored, never spikes
    assert((0 to 24).forall(h => !got(("b", h.toLong))._3))

    // non-degenerate history: alternate 1/3 then burst 50
    val rows2 = (0 to 23).map(h => ("c", h.toLong, if (h % 2 == 0) 1 else 3)) ++
      Seq(("c", 24L, 50))
    val ev2 = rows2.flatMap { case (t, h, n) =>
      (0 until n).map(_ => (t, h * 3600000000L)) }
      .zipWithIndex.map { case ((t, us), i) => (t, us + i) }
      .toDF("event_type", "us")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"))
    val got2 = Sessions.spikeScores(ev2, "event_type", "ts", 3600000000L)
      .filter(col("bucket") === 24L)
      .as[(String, Long, Long, Option[Double], Boolean)].collect().head
    // mean 2, σ 1 over the trailing 24 → z = 48 → spike
    assert(got2._4.exists(z => math.abs(z - 48.0) < 1e-6), got2.toString)
    assert(got2._5)
  }

  test("session boundaries: gap strictly greater than maxGap starts a new session") {
    // user 1: gaps of 10, exactly-100 (same session), 101 (new session)
    // user 2: single event
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 110L), (4L, 1L, 211L),
      (5L, 2L, 50L))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(ev, "user_id", "ts", lit(100L))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L), got)
  }

  test("rolling count: RANGE frame includes the boundary, resets per user") {
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 50L), (3L, 1L, 100L), (4L, 1L, 151L),
      (5L, 2L, 100L))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.rollingCounts(ev, "user_id", "ts", 100L)
      .select("event_id", "n_window").as[(Long, Long)].collect().toMap
    // event 3 at t=100: window [0,100] holds events 1,2,3; event 4 at
    // t=151: window [51,151] holds events 3,4 (event 2 at 50 just out)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L), got)
  }

  test("sessionizeSpread ≡ sessionize, hot user spanning many partitions") {
    // 9/10 of events belong to ONE hot user (the bot-traffic shape that
    // makes Window.partitionBy(user) a single straggler task); the rest
    // spread over 50 users. Deterministic scrambled timestamps so gaps
    // land on both sides of maxGap, including ties.
    val rows = (0 until 4000).map { i =>
      val u = if (i % 10 != 0) 7L else 100L + (i % 500) / 10
      val ts = ((i.toLong * 7919) % 1000) * 37 + (i / 1000) * 120000L
      (i.toLong, u, ts)
    }
    val ev = rows.toDF("event_id", "user_id", "ts")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13") // force spanning
    try {
      val want = Sessions.sessionize(ev, "user_id", "ts", lit(300L))
        .select("event_id", "session_idx").as[(Long, Long)]
        .collect().toMap
      val got = Sessions.sessionizeSpread(ev, "user_id", "ts", 300L)
        .select("event_id", "session_idx").as[(Long, Long)]
        .collect().toMap
      assert(got.size == want.size)
      assert(got == want,
        got.toSeq.sorted.zip(want.toSeq.sorted)
          .filter { case (a, b) => a != b }.take(5).toString)
      // the hot user really did span several range partitions
      val hotParts = ev.filter(col("user_id") === 7L)
        .repartitionByRange(13, col("user_id"), col("ts"))
        .rdd.mapPartitionsWithIndex((p, it) =>
          if (it.hasNext) Iterator.single(p) else Iterator.empty)
        .collect().length
      assert(hotParts > 3, s"hot user covered only $hotParts partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sessionizeSpread: exact-boundary gaps across partition seams") {
    // one user, strictly increasing ts with gaps exactly at/over maxGap
    // placed so seams fall between them at 3 partitions
    val ev = (0 until 300).map { i =>
      (i.toLong, 1L, i.toLong * 100 + (i / 7) * 101)
    }.toDF("event_id", "user_id", "ts")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val want = Sessions.sessionize(ev, "user_id", "ts", lit(200L))
        .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
      val got = Sessions.sessionizeSpread(ev, "user_id", "ts", 200L)
        .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
      assert(got == want)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("one exchange: both sessionize windows share the user partitioning") {
    val ev = Seq((1L, 1L, 0L), (2L, 1L, 10L)).toDF("event_id", "user_id", "ts")
    val plan = Sessions.sessionize(ev, "user_id", "ts", lit(100L))
      .queryExecution.executedPlan.toString
    // the lag window and the running-sum window must not re-shuffle
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
