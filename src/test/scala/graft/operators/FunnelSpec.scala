package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // user 1: full ordered funnel
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    // user 2: purchase BEFORE the post-view click — must not count
    (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
    // user 3: click precedes the first view; the later click qualifies
    (3L, "click", 5L), (3L, "view", 10L), (3L, "click", 12L),
    // user 4: never viewed
    (4L, "click", 10L), (4L, "purchase", 20L)
  ).toDF("user_id", "event_type", "ts")

  test("funnelTimes enforces stage order per user") {
    val t = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // only user 1 completes all three in order
    assert(t == Seq((1L, 10L, 20L, 30L)))
    // two-stage prefix: users 1, 2 (click at 20 > view) and 3 (click 12)
    val two = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click")).as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(two == Seq((1L, 10L, 20L), (2L, 10L, 20L), (3L, 10L, 12L)))
  }

  test("retention buckets users by first-active period") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L), (1L, 3L), // cohort 0, offsets 0,1,3
      (2L, 0L), (2L, 2L),                     // cohort 0, offsets 0,2
      (3L, 1L), (3L, 2L)                      // cohort 1, offsets 0,1
    ).toDF("user_id", "p")
    val r = Funnel.retention(ev, "user_id", col("p"))
      .orderBy("cohort", "offset").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("funnelCounts reports monotone per-stage counts with checksums") {
    val r = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).head()
    // n_view=3 (users 1,2,3), n_click=3 (1,2,3), n_purchase=1 (user 1)
    assert(r.getLong(0) == 3 && r.getLong(1) == 6)  // view: sum 1+2+3
    assert(r.getLong(2) == 3 && r.getLong(3) == 6)  // click
    assert(r.getLong(4) == 1 && r.getLong(5) == 1)  // purchase: user 1
  }
}
