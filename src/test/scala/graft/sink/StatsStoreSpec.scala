package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsStoreSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 1.5, "alpha"), (2L, -2.25, "beta"), (3L, null, "alpha"),
    (4L, 8.0, null), (5L, 0.0, "gamma"))
    .toDF("id", "score", "label")

  test("incremental profile ≡ whole-table stats; commits are O(columns)") {
    val dir = java.nio.file.Files.createTempDirectory("statstore").toString
    StatsStore.init(frame.filter(col("id") <= 2),
      Seq("id", "score", "label"), dir)
    StatsStore.append(frame.filter(col("id") === 3 || col("id") === 4), dir)
    val seq2 = StatsStore.append(frame.filter(col("id") === 5), dir)
    // each commit holds exactly one row per tracked column
    assert(spark.read.parquet(s"$dir/commits/$seq2/stats").count() == 3)
    val prof = StatsStore.profile(spark, dir)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // exact counts and composed min/max across all three cohorts; at
    // these cardinalities the HLL estimate is exact
    assert(prof("id") == (("id", 5L, 0L, 5L, "1.000000", "5.000000")))
    assert(prof("score") == (("score", 4L, 1L, 4L, "-2.250000", "8.000000")))
    assert(prof("label") == (("label", 4L, 1L, 3L, "alpha", "gamma")))
  }

  test("sketches merge, not add: overlapping values across batches count once") {
    val dir = java.nio.file.Files.createTempDirectory("statstore-mrg").toString
    StatsStore.init(Seq(("x"), ("y")).toDF("v"), Seq("v"), dir)
    StatsStore.append(Seq(("x"), ("y"), ("z")).toDF("v"), dir)
    StatsStore.append(Seq(("x")).toDF("v"), dir)
    val p = StatsStore.profile(spark, dir)
      .as[(String, Long, Long, Long, String, String)].collect().head
    assert(p._2 == 6 && p._4 == 3, p.toString) // 6 rows, 3 distinct
  }

  test("compact folds the log; profile unchanged; stats reports depth") {
    val dir = java.nio.file.Files.createTempDirectory("statstore-cmp").toString
    StatsStore.init(frame.filter(col("id") <= 3), Seq("id", "label"), dir)
    StatsStore.append(frame.filter(col("id") > 3), dir)
    val before = StatsStore.profile(spark, dir)
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(StatsStore.stats(spark, dir)
      .as[(Long, Long)].collect().head == ((2L, 1L)))
    // threshold hook: no-op below maxDeltas, folds above it
    assert(!StatsStore.maybeCompact(spark, dir, maxDeltas = 1))
    assert(DeltaLog.listSeqs(spark, s"$dir/commits").length == 1)
    assert(StatsStore.maybeCompact(spark, dir, maxDeltas = 0))
    assert(DeltaLog.listSeqs(spark, s"$dir/commits").isEmpty)
    StatsStore.compact(spark, dir) // idempotent on an empty log
    assert(StatsStore.stats(spark, dir)
      .as[(Long, Long)].collect().head == ((2L, 0L)))
    val after = StatsStore.profile(spark, dir)
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(after == before)
  }

  test("contract violations fail loudly: unknown column, kind drift") {
    val dir = java.nio.file.Files.createTempDirectory("statstore-bad").toString
    StatsStore.init(frame, Seq("id", "label"), dir)
    // batch missing a tracked column
    val e1 = intercept[IllegalArgumentException] {
      StatsStore.append(frame.drop("label"), dir)
    }
    assert(e1.getMessage.contains("no column"))
    // tracked-numeric column arriving as string
    val e2 = intercept[IllegalArgumentException] {
      StatsStore.append(frame.withColumn("id", col("id").cast("string")), dir)
    }
    assert(e2.getMessage.contains("tracked as"))
  }

  test("incremental quantiles: merged estimate near exact, survives compact") {
    // 0..9999 split over three skewed batches (by residue mod 3, so each
    // batch's distribution differs from the whole) — the merged p50/p90
    // must land near the TRUE percentiles of the union
    val dir = java.nio.file.Files.createTempDirectory("statstore-q").toString
    val all = spark.range(10000).select(col("id").as("v"))
    StatsStore.init(all.filter(col("v") % 3 === 0), Seq("v"), dir)
    StatsStore.append(all.filter(col("v") % 3 === 1), dir)
    StatsStore.append(all.filter(col("v") % 3 === 2), dir)
    def check(): Unit = {
      val r = StatsStore.quantiles(spark, dir, Seq(0.5, 0.9))
        .as[(String, Long, Seq[Double])].head()
      assert(r._1 == "v" && r._2 == 10000L)
      assert(math.abs(r._3(0) - 5000.0) <= 200.0, s"p50 ${r._3(0)}")
      assert(math.abs(r._3(1) - 9000.0) <= 200.0, s"p90 ${r._3(1)}")
    }
    check()
    // compaction folds the grid and must not lose the percentile view
    StatsStore.compact(spark, dir)
    check()
    // string columns have no quantiles; bad probs rejected
    val dir2 = java.nio.file.Files.createTempDirectory("statstore-q2").toString
    StatsStore.init(Seq("a", "b").toDF("s"), Seq("s"), dir2)
    assert(StatsStore.quantiles(spark, dir2, Seq(0.5)).count() == 0)
    intercept[IllegalArgumentException] {
      StatsStore.quantiles(spark, dir, Seq(0.0))
    }
  }
}
