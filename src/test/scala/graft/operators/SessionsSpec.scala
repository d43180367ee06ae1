package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionsSpec extends SparkSpec {
  import spark.implicits._

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

  test("one exchange: both sessionize windows share the user partitioning") {
    val ev = Seq((1L, 1L, 0L), (2L, 1L, 10L)).toDF("event_id", "user_id", "ts")
    val plan = Sessions.sessionize(ev, "user_id", "ts", lit(100L))
      .queryExecution.executedPlan.toString
    // the lag window and the running-sum window must not re-shuffle
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
