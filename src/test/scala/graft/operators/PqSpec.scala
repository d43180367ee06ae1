package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("fit/encode: deterministic codes, reconstruction beats random") {
    val model = Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 8,
      codebookSize = 4, iters = 2)
    assert(model.m == 8 && model.subDim == 8 && model.codebookSize == 4)
    val enc = Pq.encode(emb, "embedding", model)
    // codes are total and in range
    val codes = enc.select(col("vec_id"), col("codes")).collect()
    assert(codes.forall(r => {
      val c = r.getSeq[Int](1)
      c.length == 8 && c.forall(x => x >= 0 && x < 4)
    }))
    // deterministic: re-encoding yields identical codes
    val enc2 = Pq.encode(emb, "embedding", model)
      .select("vec_id", "codes").collect().map(r =>
        (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(codes.forall(r => enc2(r.getLong(0)) == r.getSeq[Int](1)))
    // reconstruction error strictly below the trivial zero-vector
    // baseline (= |v|²) on average — the codebooks learned something
    val err = Pq.encode(emb, "embedding", model)
      .select(
        graft.functions.VectorExpressions.l2sqFast(
          transform(col("embedding"), _.cast("double")),
          Pq.decodeExpr(col("codes"), model)).as("e"),
        graft.functions.VectorExpressions.l2sqFast(
          transform(col("embedding"), _.cast("double")),
          array((0 until 64).map(_ => lit(0.0)): _*)).as("z"))
      .agg(avg("e").as("e"), avg("z").as("z"))
      .as[(Double, Double)].head()
    assert(err._1 < err._2, s"reconstruction $err did not beat zero baseline")
  }

  test("ADC + rescore equals exact top-k at the gated pool width") {
    val model = Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 8,
      codebookSize = 16, iters = 3)
    val qv = emb.filter(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0)
    val pq = Pq.searchTopK(emb, "vec_id", "embedding", model, qv,
      k = 10, rescoreK = 200).select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv,
      k = 10).select("vec_id").as[Long].collect().toSeq
    assert(pq == exact, s"pq=$pq exact=$exact")
    // the self-match always survives the pool
    assert(pq.head == 1L)
  }

  test("ADC candidate scan reads ONLY codes from a persisted layout") {
    val dir = java.nio.file.Files.createTempDirectory("pq-layout").toString
    val model = Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 8,
      codebookSize = 16, iters = 1)
    Pq.encode(emb, "embedding", model).write.mode("overwrite").parquet(dir)
    val enc = spark.read.parquet(dir)
    val qv = emb.filter(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0)
    val plan = Pq.adcCandidates(enc, "vec_id", model, qv, 50)
      .queryExecution.executedPlan.toString
    // the 32× byte-reduction claim: the vector column must not be read
    assert(!plan.contains("embedding"),
      s"ADC scan must prune the raw vectors:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"candidate cut should be top-k:\n$plan")
  }

  test("batch knnJoin: per-query ADC pool + rescore ≡ exact brute force") {
    val model = Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 8,
      codebookSize = 16, iters = 3)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Pq.knnJoin(emb, "vec_id", "embedding", q, "qid", "qv",
        model, k = 5, rescoreK = 200)
      .orderBy("qid", "rk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val exact = (0L until 3L).flatMap { id =>
      val qv = emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0)
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 5)
        .select(lit(id), col("vec_id"), round(col("cosine"), 6))
        .as[(Long, Long, Double)].collect().toSeq
        .zipWithIndex.map { case ((q0, v, c), i) => (q0, i + 1, v, c) }
    }
    assert(got == exact, s"got=$got\nexact=$exact")
    intercept[IllegalArgumentException] {
      Pq.knnJoin(emb, "vec_id", "embedding", q, "qid", "qv", model,
        k = 10, rescoreK = 5)
    }
    // REGRESSION PIN (ScaleProbe r8): an Exchange must sit between the
    // encode projection and the broadcast pair join — without the
    // barrier, whole-stage codegen defers the m-argmin encoding into
    // the pair loop and re-derives it per (query, row) pair
    // (probe-measured ~12× slower at every scale).
    val plan = Pq.knnJoin(emb, "vec_id", "embedding", q, "qid", "qv",
      model, k = 5, rescoreK = 200).queryExecution.executedPlan.toString
    assert(plan.contains("RoundRobinPartitioning"),
      s"encode/join materialization barrier missing:\n$plan")
  }

  test("guards fail fast") {
    intercept[IllegalArgumentException] {
      Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 7, codebookSize = 4)
    }
    val model = Pq.fit(emb.limit(50), "vec_id", "embedding", dim = 64,
      m = 4, codebookSize = 4, iters = 1)
    intercept[IllegalArgumentException] {
      Pq.searchTopK(emb, "vec_id", "embedding", model,
        Seq.fill(64)(0.0f), k = 10, rescoreK = 5)
    }
    intercept[IllegalArgumentException] {
      Pq.adcCandidates(Pq.encode(emb, "embedding", model), "vec_id",
        model, Seq.fill(32)(0.0f), 10)
    }
  }
}
