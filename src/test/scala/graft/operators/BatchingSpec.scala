package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

class BatchingSpec extends SparkSpec {
  import spark.implicits._

  test("withGroupRowNumber equals the window form on skewed groups") {
    // group sizes 1, 10, 200 — the skew the per-group window would
    // funnel into single tasks at scale
    val rows = Seq.tabulate(1)(i => ("tiny", i.toLong)) ++
      Seq.tabulate(10)(i => ("mid", i.toLong)) ++
      Seq.tabulate(200)(i => ("big", i.toLong))
    val df = rows.toDF("g", "v")
    val got = Batching.withGroupRowNumber(df, "g", col("v"), "rk")
      .select("g", "v", "rk").as[(String, Long, Long)].collect().toSet
    val want = df.withColumn("rk",
        row_number().over(Window.partitionBy("g").orderBy("v"))
          .cast("long"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("withGroupRowNumber: each group numbers 1..n contiguously") {
    val df = spark.range(1000).select(
      (col("id") % 7).cast("string").as("g"), col("id").as("v"))
    val out = Batching.withGroupRowNumber(df, "g", col("v"), "rk")
    val perGroup = out.groupBy("g").agg(count(lit(1)).as("n"),
      min("rk").as("mn"), max("rk").as("mx"),
      countDistinct("rk").as("d"))
      .as[(String, Long, Long, Long, Long)].collect()
    for ((g, n, mn, mx, d) <- perGroup)
      assert(mn == 1L && mx == n && d == n, s"group $g: $mn..$mx/$n")
  }

  test("two-phase numbering rejects high-cardinality group columns loudly") {
    // the per-(partition, group) collect is partitions x groups-sized;
    // a unique-per-row groupCol must fail with guidance, not OOM the
    // driver silently at scale
    val wide = spark.range(Batching.MaxGroupsPerPartition + 2L)
      .select(col("id").cast("string").as("g"), col("id").as("v"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val e1 = intercept[Exception] {
        Batching.withGroupRowNumber(wide, "g", col("v"), "rk").count()
      }
      assert(e1.toString.contains("distinct") ||
        Option(e1.getCause).exists(_.toString.contains("distinct")), e1)
      val e2 = intercept[Exception] {
        Corpus.groupPercentRank(wide, "g", col("v"), "pr").count()
      }
      assert(e2.toString.contains("distinct") ||
        Option(e2.getCause).exists(_.toString.contains("distinct")), e2)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("interleaveBySource round-robins sources by rank") {
    val docs = (1L to 30L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val out = Corpus.interleaveBySource(docs, "doc_id", "source")
      .orderBy("position")
      .as[(Long, Long, String, Long)].collect().toSeq
    // positions group into rounds of 3 distinct sources; within a
    // round, sources appear in lexicographic order
    for (round <- out.grouped(3)) {
      assert(round.map(_._3).toSet.size == 3)
      assert(round.map(_._3) == round.map(_._3).sorted)
      assert(round.map(_._4).toSet.size == 1) // same rank across the round
    }
  }
}
