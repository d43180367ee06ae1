package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorAggregates

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("vector_sum aggregates element-wise with partial aggregation") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 6.0f))
      .toDF("v").repartition(3) // forces partial buffers + merge
    val s = df.agg(VectorAggregates.vectorSum(col("v"))).head.getSeq[Double](0)
    assert(s == Seq(9.0, 12.0))
  }

  test("vector_sum of all-null input is null") {
    val df = Seq(Option.empty[Seq[Float]], Option.empty[Seq[Float]]).toDF("v")
    assert(df.agg(VectorAggregates.vectorSum(col("v"))).head.isNullAt(0))
  }

  test("top_k_by_score keeps the k best with id tie-break across partitions") {
    // 100 rows, scores collide in pairs (score = id / 2), shuffled over
    // 7 partitions to force partial buffers + serde + merge
    val df = spark.range(100).select(col("id"),
      (col("id") / 2).cast("long").cast("double").as("s"))
      .repartition(7)
    val top = df.agg(VectorAggregates.topKByScore(col("s"), col("id"), 5).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.score"), col("p.id")).as[(Double, Long)].collect().toSeq
    // best scores 49 (ids 98,99), 48 (96,97), 47 (94) — ties keep lower id
    assert(top == Seq((49.0, 98L), (49.0, 99L), (48.0, 96L), (48.0, 97L),
      (47.0, 94L)))
    // fewer rows than k → all rows, still sorted
    val small = spark.range(3).select(col("id"),
      col("id").cast("double").as("s"))
      .agg(VectorAggregates.topKByScore(col("s"), col("id"), 10).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.id")).as[Long].collect().toSeq
    assert(small == Seq(2L, 1L, 0L))
    // null scores are skipped, not ranked
    val withNull = Seq((Some(1.0), 1L), (None, 2L), (Some(3.0), 3L))
      .toDF("s", "id")
      .agg(VectorAggregates.topKByScore(col("s"), col("id"), 2).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.id")).as[Long].collect().toSeq
    assert(withNull == Seq(3L, 1L))
  }

  test("k-means converges to the obvious clusters on separable data") {
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)), (3L, Seq(0.0f, 0.1f)),
      (4L, Seq(9.0f, 9.0f)), (5L, Seq(9.1f, 9.0f)), (6L, Seq(9.0f, 9.1f)))
      .toDF("id", "v")
    val model = Ivf.fit(pts, "id", "v", k = 2, iters = 5)
    val cells = Ivf.assign(pts, "v", model)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(Set(cells(1L), cells(2L), cells(3L)).size == 1)
    assert(Set(cells(4L), cells(5L), cells(6L)).size == 1)
    assert(cells(1L) != cells(4L))
  }

  test("IVF search recall vs brute force on real embeddings") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val model = Ivf.fit(e, "vec_id", "embedding", k = 8, iters = 3)
    val assigned = Ivf.assign(e, "embedding", model)
    val ivf = Ivf.search(assigned, "vec_id", "embedding", model, q,
      topK = 10, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(ivf.contains(7L))
    assert(recall >= 0.4, s"IVF recall@10 = $recall")
  }
}
