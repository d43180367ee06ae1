package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property checks over GENERATED event streams (seeded — failures
  * reproduce) for the two round-11 operators whose correctness rests on
  * distributed-layout reasoning:
  *
  *   - [[Sessions.sessionizeSpread]] ≡ [[Sessions.sessionize]] on every
  *     generated stream, across skew regimes and shuffle-partition
  *     counts — the two-phase boundary stitch must be invisible at any
  *     seam placement.
  *   - [[graft.streaming.StreamingOps.watermarkReplay]] ≡ a pure-Scala
  *     single-threaded simulator of Spark's global-watermark mechanics —
  *     the DataFrame plumbing (per-batch maxes, prior-batch window,
  *     broadcast join) must reproduce the sequential definition exactly.
  */
class SessionsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("sessionizeSpread ≡ sessionize over random skewed streams") {
    val r = new Random(20260815L)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (trial <- 0 until 4) {
        val n = 500 + r.nextInt(1500)
        val nUsers = 1 + r.nextInt(12)
        val hotShare = r.nextDouble() * 0.8 // up to 80% on user 0
        val gap = 50L + r.nextInt(200)
        val rows = (0 until n).map { i =>
          val u = if (r.nextDouble() < hotShare) 0L else 1L + r.nextInt(nUsers)
          (i.toLong, u, r.nextInt(5000).toLong) // ts ties likely
        }
        val ev = rows.toDF("event_id", "user_id", "ts")
        spark.conf.set("spark.sql.shuffle.partitions",
          (2 + r.nextInt(15)).toString)
        val want = Sessions.sessionize(ev, "user_id", "ts", lit(gap))
          .select("event_id", "session_idx").as[(Long, Long)]
          .collect().toMap
        val got = Sessions.sessionizeSpread(ev, "user_id", "ts", gap)
          .select("event_id", "session_idx").as[(Long, Long)]
          .collect().toMap
        assert(got == want, s"trial $trial (n=$n users=$nUsers " +
          s"hot=$hotShare gap=$gap): " +
          got.toSeq.sorted.zip(want.toSeq.sorted)
            .filter { case (a, b) => a != b }.take(5).toString)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("watermarkReplay ≡ a sequential simulator over random arrivals") {
    val r = new Random(11L)
    val windowUs = 600L * 1000000 // 10 minutes
    val delayMs = 5L * 60 * 1000
    for (trial <- 0 until 3) {
      val nBatches = 2 + r.nextInt(4)
      val rows = (0 until 400).map { i =>
        val b = r.nextInt(nBatches)
        // µs timestamps with sub-ms noise: the simulator and the replay
        // must agree on the MILLISECOND truncation of the max event time
        val ts = (r.nextInt(3600).toLong * 1000000) + r.nextInt(1000000)
        (i.toLong, b, ts)
      }
      // sequential definition of Spark's global watermark: max event
      // time (ms-truncated) over batches strictly before, minus delay
      val maxMsByBatch = rows.groupBy(_._2)
        .map { case (b, rs) => b -> rs.map(_._3).max / 1000 }
      val wmUsBefore: Map[Int, Option[Long]] =
        (0 until nBatches).map { b =>
          val prior = maxMsByBatch.filter(_._1 < b).values
          b -> (if (prior.isEmpty) None
                else Some((prior.max - delayMs) * 1000))
        }.toMap
      val expectLate: Map[Long, Boolean] = rows.map { case (id, b, ts) =>
        val winEnd = (ts / windowUs) * windowUs + windowUs
        id -> wmUsBefore(b).exists(winEnd <= _)
      }.toMap
      val df = rows.toDF("id", "b", "ts_us")
        .select(col("id"), col("b"), timestamp_micros(col("ts_us")).as("ts"))
      val got = graft.streaming.StreamingOps
        .watermarkReplay(df, "ts", "b", "10 minutes", delayMs)
        .select(col("id"), col("late")).as[(Long, Boolean)]
        .collect().toMap
      assert(got == expectLate, s"trial $trial: " +
        got.toSeq.sorted.zip(expectLate.toSeq.sorted)
          .filter { case (a, c) => a != c }.take(5).toString)
    }
  }
}
