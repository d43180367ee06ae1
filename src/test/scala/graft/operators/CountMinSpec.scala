package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def items = Seq.concat(
    Seq.fill(10)("a"), Seq.fill(7)("b"), Seq.fill(3)("c"),
    Seq.fill(1)("d"), Seq.fill(5)("e")
  ).map(Tuple1(_)).toDF("term")

  test("count-min never undercounts any term") {
    val cells = CountMin.sketch(items, "term", 4, 4) // heavy collisions
    val est = CountMin.estimate(cells,
      Seq("a", "b", "c", "d", "e"), 4, 4)
      .as[(String, Long)].collect().toMap
    val truth = Map("a" -> 10L, "b" -> 7L, "c" -> 3L, "d" -> 1L, "e" -> 5L)
    for ((t, n) <- truth)
      assert(est(t) >= n, s"undercount for $t: ${est(t)} < $n")
  }

  test("wide sketch with few terms is exact; absent term reads zero") {
    val cells = CountMin.sketch(items, "term", 4, 1024)
    val est = CountMin.estimate(cells,
      Seq("a", "d", "nope"), 4, 1024).as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 10L, "d" -> 1L, "nope" -> 0L), s"got $est")
  }

  test("sketches merge by cell-wise addition") {
    val left = Seq.fill(6)("x").map(Tuple1(_)).toDF("term")
    val right = (Seq.fill(4)("x") ++ Seq.fill(3)("y"))
      .map(Tuple1(_)).toDF("term")
    val merged = CountMin.sketch(left, "term", 4, 8)
      .union(CountMin.sketch(right, "term", 4, 8))
      .groupBy("r", "bucket").agg(sum("n").as("n"))
    val whole = CountMin.sketch(left.union(right), "term", 4, 8)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val w = whole.as[(Int, Long, Long)].collect().toSet
    assert(m == w, s"merged $m != whole $w")
  }

  test("live streaming sketch: running cell counts equal the batch grid") {
    // the sketch as ONE streaming aggregation (item -> depth cells ->
    // running count, update mode): after all batches, the in-memory
    // state must equal the batch-built grid — mergeability live, not
    // just via the split-union gate
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = input.toDF().select(col("value").as("term"),
        explode(sequence(lit(0), lit(3))).as("r"))
      .groupBy(col("r"), CountMin.bucket(col("r"), col("term"), 8)
        .as("bucket"))
      .count()
      .writeStream.format("memory").queryName("cm_cells")
      .outputMode("complete").start()
    try {
      input.addData("x", "x", "y")
      q.processAllAvailable()
      input.addData("x", "z", "z", "z")
      q.processAllAvailable()
      val streamed = spark.table("cm_cells")
        .select(col("r"), col("bucket"), col("count").as("n"))
        .as[(Int, Long, Long)].collect().toSet
      val batch = CountMin.sketch(
        Seq("x", "x", "y", "x", "z", "z", "z").map(Tuple1(_)).toDF("term"),
        "term", 4, 8).as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed $streamed != batch $batch")
    } finally q.stop()
  }

  test("sketch size is bounded by the grid, not the input") {
    val many = spark.range(5000)
      .select(concat(lit("t"), col("id")).as("term"))
    assert(CountMin.sketch(many, "term", 4, 16).count() <= 64)
  }
}
