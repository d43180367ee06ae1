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
}
