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

  test("ivf_assign equals the literal array_min(struct(l2sq, id)) formulation") {
    // the expression it replaced, rebuilt verbatim — any drift in
    // arithmetic order, length truncation or tie-break diverges a cell
    import graft.functions.{VectorExpressions => VE}
    def oldExpr(vec: org.apache.spark.sql.Column, m: Ivf.Model) =
      array_min(array(m.centroids.zipWithIndex.map { case (c, i) =>
        struct(VE.l2sqFast(vec, array(c.toSeq.map(lit): _*)).as("d"),
          lit(i).as("id"))
      }.toSeq: _*)).getField("id")
    val rnd = new scala.util.Random(7)
    val pts = (0L until 500L).map(id =>
      (id, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("id", "v")
    val model = Ivf.Model(Array.fill(8)(Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val diff = pts.select(
        Ivf.assignExpr(col("v"), model).as("a"),
        oldExpr(col("v"), model).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
    // exact tie (duplicate centroids) → lowest id, both formulations
    val tied = Ivf.Model(Array(Array(0.5, 0.5), Array(0.5, 0.5), Array(9.0, 9.0)))
    val one = Seq((1L, Seq(0.5f, 0.5f))).toDF("id", "v")
    assert(one.select(Ivf.assignExpr(col("v"), tied)).head.getInt(0) == 0)
    // double-typed vectors take the other element getter
    val dbl = Seq((1L, Seq(0.4, 0.6))).toDF("id", "v")
    assert(dbl.select(Ivf.assignExpr(col("v"), tied)).head.getInt(0) == 0)
    // null vector → null cell
    val nul = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "v")
    assert(nul.select(Ivf.assignExpr(col("v"), tied)).head.isNullAt(0))
  }

  test("ivf_assign generates model-independent source: two models, one codegen class") {
    // the reference-object design guarantees BY CONSTRUCTION what the
    // old literal formulation only got from the optimizer's constant
    // folding (probed in a spark-shell: its optimized source was also
    // model-stable): the generated source embeds no centroid values,
    // so every model shares one compiled class. Pinned here at the
    // expression level, where no optimizer can save us.
    import graft.functions.IvfAssign
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def src(m: Array[Array[Double]]): String = {
      val ctx = new CodegenContext
      IvfAssign(BoundReference(0, ArrayType(FloatType), nullable = true), m)
        .genCode(ctx).code.toString
    }
    val s1 = src(Array(Array(1.25, -3.5), Array(0.75, 2.5)))
    val s2 = src(Array(Array(8.125, 9.25), Array(-0.5, 4.75), Array(1.0, 1.0)))
    assert(s1 == s2, "generated source must be model-independent")
    assert(!s1.contains("1.25") && !s2.contains("9.25"),
      "centroid values must ride as references, not inlined literals")
  }

  test("ivf_probe equals the array_sort(struct(l2sq, id)) slice formulation") {
    import graft.functions.{VectorExpressions => VE}
    // the tree it replaced, rebuilt verbatim — drift in ordering, the
    // nProbe cut, NaN placement or tie-breaks diverges a probe list
    def oldExpr(vec: org.apache.spark.sql.Column, m: Ivf.Model, nProbe: Int) =
      transform(
        slice(array_sort(array(m.centroids.zipWithIndex.map { case (c, i) =>
          struct(VE.l2sqFast(vec, array(c.toSeq.map(lit): _*)).as("d"),
            lit(i).as("id"))
        }.toSeq: _*)), 1, nProbe),
        s => s.getField("id"))
    val rnd = new scala.util.Random(11)
    val pts = (0L until 400L).map(id =>
      (id, Seq.fill(12)(rnd.nextFloat() * 2f - 1f))).toDF("id", "v")
    val model = Ivf.Model(Array.fill(7)(Array.fill(12)(rnd.nextDouble() * 2 - 1)))
    for (nProbe <- Seq(1, 3, 9)) { // 9 > k: all cells, still ordered
      val diff = pts.select(
          Ivf.probeCellsExpr(col("v"), model, nProbe).as("a"),
          oldExpr(col("v"), model, nProbe).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0L, s"nProbe=$nProbe diverged from the struct sort")
    }
    // exact ties (duplicate centroids) keep ascending id order
    val tied = Ivf.Model(Array(Array(0.5, 0.5), Array(0.5, 0.5), Array(9.0, 9.0)))
    val one = Seq((1L, Seq(0.5f, 0.5f))).toDF("id", "v")
    assert(one.select(Ivf.probeCellsExpr(col("v"), tied, 3)).head
      .getSeq[Int](0) == Seq(0, 1, 2))
    // NaN components: NaN distances rank LAST, tie by id — the
    // DoubleType ordering inside the struct sort (Double.compare parity)
    val nanCen = Ivf.Model(Array(
      Array(Double.NaN, 0.0), Array(9.0, 9.0), Array(Double.NaN, 1.0)))
    val q = Seq((1L, Seq(9.0f, 9.0f))).toDF("id", "v")
    assert(q.select(Ivf.probeCellsExpr(col("v"), nanCen, 3)).head
      .getSeq[Int](0) == Seq(1, 0, 2))
    assert(q.select(oldExpr(col("v"), nanCen, 3)).head
      .getSeq[Int](0) == Seq(1, 0, 2))
    // null vector → null
    val nul = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "v")
    assert(nul.select(Ivf.probeCellsExpr(col("v"), tied, 2)).head.isNullAt(0))
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
