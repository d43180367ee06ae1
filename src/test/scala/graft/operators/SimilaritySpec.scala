package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = spark.range(1).select(
      VectorFunctions.cosine(array(lit(1.0f), lit(0.0f)), array(lit(1.0f), lit(0.0f))).as("same"),
      VectorFunctions.cosine(array(lit(1.0f), lit(0.0f)), array(lit(0.0f), lit(1.0f))).as("orth"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("nearest-centroid classification routes to the closest label mean") {
    // two labeled clusters on orthogonal axes + probes near each; one
    // deliberately unlabeled-like outlier between them
    val seed = Seq(
      (1L, Seq(1.0f, 0.05f, 0f), 10), (2L, Seq(0.95f, 0f, 0.05f), 10),
      (3L, Seq(0f, 1.0f, 0.05f), 20), (4L, Seq(0.05f, 0.9f, 0f), 20),
      (5L, Seq(0.9f, 0.1f, 0f), 10), (6L, Seq(0.1f, 1.1f, 0f), 20))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.nearestCentroid(seed, "vec_id", "embedding", "label")
      .as[(Long, Int, Double)].collect().map(t => t._1 -> t._2).toMap
    // every member routes back to its own cluster's centroid
    assert(got == Map(1L -> 10, 2L -> 10, 5L -> 10,
      3L -> 20, 4L -> 20, 6L -> 20), got.toString)
    // null vectors train nothing and classify nothing
    val withNull = seed.unionByName(
      Seq((9L, null.asInstanceOf[Seq[Float]], 10))
        .toDF("vec_id", "embedding", "label"))
    val cls = Similarity.nearestCentroid(withNull, "vec_id", "embedding",
      "label")
    assert(cls.filter(col("vec_id") === 9L).count() == 0)
    assert(cls.count() == 6)
    intercept[IllegalArgumentException] {
      Similarity.nearestCentroid(
        seed.filter(col("vec_id") > 100), "vec_id", "embedding", "label")
    }
  }

  test("brute-force top-k returns the query itself first") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val top = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect()
    assert(top.head == 0L)
    assert(top.length == 5)
  }

  test("quantized-pool + exact rescore equals brute force at gated width") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    val viaQ8 = Similarity.quantizedTopK(e, "vec_id", "embedding", q,
      k = 10, rescoreK = 100).as[(Long, Double)].collect().toSeq
    // rescore restores FULL-precision scores, so rows match exactly
    assert(viaQ8 == exact)
    // degenerate pool (rescoreK == k): candidates come from the
    // quantized ordering alone — still k rows, scores full-precision
    val tight = Similarity.quantizedTopK(e, "vec_id", "embedding", q,
      k = 10, rescoreK = 10).as[(Long, Double)].collect().toSeq
    assert(tight.size == 10)
    intercept[IllegalArgumentException] {
      Similarity.quantizedTopK(e, "vec_id", "embedding", q, 10, 5)
    }
  }

  test("ANN with multi-probe achieves usable recall vs brute force") {
    // The synthetic embeddings are near-uniform on the sphere (max pair
    // cosine ≈ 0.37), the hardest case for angular LSH — so the bound here
    // is modest; real near-dup corpora cluster far more tightly.
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val bucketed = Similarity.annBuckets(e, "embedding", nBits = 4)
    val ann = Similarity.annTopK(bucketed, "vec_id", "embedding", q, 10, nBits = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(ann.contains(7L)) // the query's own bucket is always probed
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.2, s"ANN recall@10 = $recall")
  }

  test("hardNegatives excludes the query's own label, ranks the rest") {
    val vecs = Seq(
      (0L, "pos", Seq(1.0f, 0.0f)),   // the query
      (1L, "pos", Seq(0.99f, 0.1f)),  // same label — MUST be excluded
      (2L, "neg", Seq(0.9f, 0.4f)),   // nearest wrong-label → rk 1
      (3L, "neg", Seq(0.0f, 1.0f)),   // far wrong-label → rk 2
      (4L, "pos", Seq(1.0f, 0.01f))   // same label again
    ).toDF("vec_id", "label", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("ql"))
    val got = Similarity.hardNegatives(vecs, q, "vec_id", "embedding",
        "label", "qid", "qv", "ql", k = 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got.map(_._3) == Seq(2L, 3L), got)  // only wrong-label rows
    assert(got.map(_._2) == Seq(1, 2))
  }

  test("knnJoin matches the window-rank reference per query") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val got = Similarity.knnJoin(e, q, "vec_id", "embedding", "query_id", "qv", 4)
      .orderBy("query_id", "rk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // reference: window rank over the exact scored cross product
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("c").desc, col("vec_id"))
    val ref = e.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        graft.functions.VectorExpressions.cosineFast(col("embedding"), col("qv")).as("c"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
      .select(col("query_id"), col("rk"), col("vec_id"), round(col("c"), 6).as("c"))
      .orderBy("query_id", "rk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == ref)
    // each query's rank-1 neighbor is itself (cosine 1.0)
    got.filter(_._2 == 1).foreach { case (qid, _, nid, c) =>
      assert(nid == qid && c == 1.0)
    }
  }

  test("knnJoin plans a partial top-k aggregate, not a corpus window") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val plan = Similarity.knnJoin(e, q, "vec_id", "embedding", "query_id", "qv", 4)
      .queryExecution.executedPlan.toString
    // map-side combinable: partial_top_k_by_score before the shuffle,
    // and no Window over the scored corpus rows
    assert(plan.contains("partial_top_k_by_score"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("maxSimScores sums per-query maxima over each group's bag") {
    // group A holds the exact query vectors (max cos 1.0 each);
    // group B holds orthogonal vectors (max cos 0.0 per query)
    val corpus = Seq(
      ("A", Seq(1.0f, 0.0f, 0.0f)), ("A", Seq(0.0f, 1.0f, 0.0f)),
      ("B", Seq(0.0f, 0.0f, 1.0f)), ("B", Seq(0.0f, 0.0f, 2.0f))
    ).toDF("label", "v")
    val q = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("qid", "qv")
    val got = Similarity.maxSimScores(corpus, q, "label", "v", "qid", "qv")
      .orderBy("label").as[(String, Double)].collect().toSeq
    assert(got == Seq(("A", 2.0), ("B", 0.0)))
    // both aggregations keep map-side partials; no window anywhere
    val plan = Similarity.maxSimScores(corpus, q, "label", "v", "qid", "qv")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("zero vectors (NaN cosine) rank last, never first") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)),      // zero vector: cosine = 0/0 = NaN
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f)),
      (4L, Seq(0.6f, 0.8f))).toDF("id", "v")
    val got = Similarity.bruteForceTopK(df, "id", "v", Seq(1.0f, 0.0f), 4)
      .select("id").as[Long].collect().toSeq
    // real scores first (1.0, 0.6, -1.0), the NaN row dead last
    assert(got == Seq(2L, 4L, 3L, 1L), got.toString)
    // and the two top-k paths agree on the placement: knnJoin's bounded
    // aggregate also sorts the NaN corpus row last
    val knn = Similarity.knnJoin(df, Seq((9L, Seq(1.0f, 0.0f)))
        .toDF("qid", "qv"), "id", "v", "qid", "qv", 4)
      .orderBy("rk").select("id").as[Long].collect().toSeq
    assert(knn == got, s"paths disagree: knn=$knn brute=$got")
  }

  test("bucket signature is deterministic across evaluations") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = Similarity.annBuckets(e, "embedding").select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    val b = Similarity.annBuckets(e, "embedding").select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("centroidOutliers: lower-tail flag per label, nulls excluded") {
    // label 1: three aligned vectors + one anti-aligned — the outlier.
    // label 2: two identical vectors — no outlier at any quantile
    // (every cosine equals the threshold, and the flag is STRICT <).
    val e = Seq(
      (1L, Array(1.0f, 0.0f), Some(1)),
      (2L, Array(0.9f, 0.1f), Some(1)),
      (3L, Array(1.0f, 0.05f), Some(1)),
      (4L, Array(-1.0f, 0.0f), Some(1)),  // the outlier
      (5L, Array(0.0f, 1.0f), Some(2)),
      (6L, Array(0.0f, 1.0f), Some(2)),
      (7L, Array(1.0f, 1.0f), None),      // unlabeled: excluded
      (8L, null.asInstanceOf[Array[Float]], Some(1))) // null vec: excluded
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(e, "vec_id", "embedding",
        "label", tailQuantile = 0.3)
      .orderBy("vec_id")
      .as[(Long, Int, Double, Double, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val flags = out.map(r => r._1 -> r._5).toMap
    assert(flags(4L), "anti-aligned vector must flag")
    assert(!flags(1L) && !flags(2L) && !flags(3L))
    assert(!flags(5L) && !flags(6L), "degenerate label must not flag")
    intercept[IllegalArgumentException] {
      Similarity.centroidOutliers(e, "vec_id", "embedding", "label", 1.5)
    }
  }

  test("binaryTopK: sign-bit Hamming shortlist with exact rescore") {
    // vectors built so sign patterns are known: query [+,+,+,+]
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),    // query: sig 0b1111
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f)),    // hamming 0, cosine high
      (2L, Array(1.0f, 1.0f, 1.0f, -1.0f)),   // hamming 1
      (3L, Array(-1.0f, -1.0f, -1.0f, -1.0f)),// hamming 4, anti-aligned
      (4L, null.asInstanceOf[Array[Float]]))  // excluded
      .toDF("vec_id", "embedding")
    val out = Similarity.binaryTopK(df, "vec_id", "embedding", dim = 4,
        queryId = 0L, rerank = 4, k = 4)
      .orderBy(col("cosine").desc, col("vec_id"))
      .as[(Long, Int, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L)) // cosine order
    val ham = out.map(r => r._1 -> r._2).toMap
    assert(ham == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 4))
    assert(out.head._3 == 1.0) // self-cosine exact
    // the Hamming cut really prunes: rerank=2 keeps only hamming<=0 ids
    val cut = Similarity.binaryTopK(df, "vec_id", "embedding", 4, 0L,
        rerank = 2, k = 2).as[(Long, Int, Double)].collect().toSeq
    assert(cut.map(_._1).toSet == Set(0L, 1L))
    intercept[IllegalArgumentException] {
      Similarity.binaryTopK(df, "vec_id", "embedding", 4, 0L, 1, 2)
    }
  }

  test("md5_56 matches the Column-side sampleHash convention") {
    // the plan-time JVM hash must agree with Corpus.sampleHash (and so
    // with DuckDB's md5_number_lower % 2^56) — the projection sign
    // matrix depends on it being ONE family
    val inputs = Seq("7:0:0", "7:63:15", "42:1:2", "", "doc:123")
    val fromCol = inputs.toDF("s")
      .select(Corpus.sampleHash(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(fromCol == inputs.map(Similarity.md5_56))
  }

  test("randomProjection: deterministic Achlioptas JL with sane geometry") {
    val dim = 16
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => ((seed * 31 + i * 7) % 13 - 6).toFloat)
    val df = Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)),
      (4L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    def run() = Similarity.randomProjection(df, "vec_id", "embedding",
        inDim = dim, outDim = 8, seed = 7)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    val out = run()
    assert(out == run()) // deterministic
    assert(out.map(_._1) == Seq(1L, 2L, 3L)) // null vector excluded
    assert(out.forall(_._2.size == 8))
    // sign matrix: ~1/3 nonzero, both signs present at these sizes
    val signs = Similarity.projectionSigns(7, 64, 16).flatten
    val nz = signs.count(_ != 0)
    assert(nz > signs.length / 6 && nz < signs.length / 2, s"nonzero $nz")
    assert(signs.contains(1) && signs.contains(-1))
    // JL sanity: projected norms are within a loose distortion band of
    // the original norms (Achlioptas E[|y|^2] = |x|^2)
    for ((id, p) <- out) {
      val x = vec(id.toInt)
      val nx = math.sqrt(x.map(v => v.toDouble * v).sum)
      val ny = math.sqrt(p.map(v => v * v).sum)
      assert(ny > 0.3 * nx && ny < 3.0 * nx,
        s"vec $id norm distortion: $nx -> $ny")
    }
  }

  test("sparseRandomProject is bit-identical to the unrolled element_at form") {
    // The r9 oracle was minted against the unrolled
    // element_at/reduceLeft/round(…,6) Column tree; the native
    // expression must reproduce it BIT-for-bit (same left-associated
    // term order starting from the first term, same HALF_UP 6dp round)
    // on real float embeddings — the oracle convention is unchanged.
    val emb = Tables.embeddings(spark, sf).filter(col("embedding").isNotNull)
    val signs = Similarity.projectionSigns(7, 64, 16)
    val scale = math.sqrt(3.0 / 16)
    val comps = (0 until 16).map { j =>
      val terms = (0 until 64).flatMap { i =>
        signs(j)(i) match {
          case 1 => Some(element_at(col("embedding"), i + 1).cast("double"))
          case -1 => Some(-element_at(col("embedding"), i + 1).cast("double"))
          case _ => None
        }
      }
      val sum = if (terms.isEmpty) lit(0.0) else terms.reduceLeft(_ + _)
      round(lit(scale) * sum, 6)
    }
    val unrolled = emb.select(col("vec_id"), array(comps: _*).as("projected"))
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    val native = Similarity.randomProjection(
        Tables.embeddings(spark, sf), "vec_id", "embedding", 64, 16, 7)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    assert(native.nonEmpty && native == unrolled)
  }

  test("sparseRandomProject: null elements nullify only their components") {
    // element_at(null).cast propagation of the unrolled form: a null
    // input element makes every component whose sign row reads it null,
    // leaves the rest intact.
    val signs = Similarity.projectionSigns(7, 8, 4)
    val touching = (0 until 4).filter(j => signs(j)(2) != 0).toSet
    assume(touching.nonEmpty && touching.size < 4)
    val df = Seq((1L, Seq[java.lang.Float](1f, 2f, null, 4f, 5f, 6f, 7f, 8f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.randomProjection(df, "vec_id", "embedding", 8, 4, 7)
      .as[(Long, Seq[java.lang.Double])].head()._2
    for (j <- 0 until 4)
      assert((p(j) == null) == touching.contains(j), s"component $j: $p")
  }

  test("matryoshkaTopK: prefix shortlist + exact rescore, query first") {
    val e = Tables.embeddings(spark, sf).filter(col("embedding").isNotNull)
    val qv = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val out = Similarity.matryoshkaTopK(e.select("vec_id", "embedding"),
        "vec_id", "embedding", qv, dims = 16, k = 5, rescoreK = 50)
      .as[(Long, Double)].collect().toSeq
    // the query's own prefix ranks itself first in BOTH spaces
    assert(out.head._1 == 0L && math.abs(out.head._2 - 1.0) < 1e-9, out)
    assert(out.size == 5 && out.map(_._2) == out.map(_._2).sorted.reverse)
    // plan: two top-k cuts, broadcast semi-join, no corpus shuffle join
    val plan = Similarity.matryoshkaTopK(e.select("vec_id", "embedding"),
        "vec_id", "embedding", qv, 16, 5, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("mmrRerank: diversity penalty demotes the near-duplicate") {
    // candidates: id 1 most relevant; id 2 almost identical to 1 and
    // second-most relevant; id 3 orthogonal to 1, least relevant.
    // Relevance-only order is 1,2,3 — MMR at λ=0.5 must pick 1 then 3
    // (2's cosine-to-1 penalty ≈ 1 swamps its relevance edge).
    val cand = Seq(
      (0L, 1L, 0.90, Array(1.0f, 0.0f)),
      (0L, 2L, 0.85, Array(0.999f, 0.001f)),
      (0L, 3L, 0.60, Array(0.0f, 1.0f)))
      .toDF("query_id", "cand_id", "rel", "vec")
    val mmr = Similarity.mmrRerank(cand, "query_id", "cand_id", "rel",
        "vec", k = 3, lambda = 0.5)
      .orderBy("rk").as[(Long, Int, Long, Double)].collect().toSeq
    assert(mmr.map(_._3) == Seq(1L, 3L, 2L), mmr)
    // λ=1 disables the penalty: pure relevance order
    val rel = Similarity.mmrRerank(cand, "query_id", "cand_id", "rel",
        "vec", k = 3, lambda = 1.0)
      .orderBy("rk").as[(Long, Int, Long, Double)].collect().toSeq
    assert(rel.map(_._3) == Seq(1L, 2L, 3L), rel)
    // k caps at the candidate count; ties break on ascending id
    val tied = Similarity.mmrRerank(
        Seq((7L, 5L, 0.5, Array(1.0f, 0.0f)), (7L, 4L, 0.5, Array(0.0f, 1.0f)))
          .toDF("query_id", "cand_id", "rel", "vec"),
        "query_id", "cand_id", "rel", "vec", k = 10, lambda = 1.0)
      .orderBy("rk").as[(Long, Int, Long, Double)].collect().toSeq
    assert(tied.map(_._3) == Seq(4L, 5L) && tied.size == 2, tied)
    // multiple queries rerank independently
    val two = Similarity.mmrRerank(
        cand.unionByName(cand.withColumn("query_id", lit(9L))),
        "query_id", "cand_id", "rel", "vec", k = 2, lambda = 0.5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(two.count(_._1 == 9L) == 2 && two.count(_._1 == 0L) == 2)
  }

  test("binaryTopK fails loudly when the query id is missing or null-vec") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val missing = intercept[IllegalArgumentException] {
      Similarity.binaryTopK(df, "vec_id", "embedding", 2,
        queryId = 99L, rerank = 2, k = 1)
    }
    assert(missing.getMessage.contains("99"))
    val nullVec = intercept[IllegalArgumentException] {
      Similarity.binaryTopK(df, "vec_id", "embedding", 2,
        queryId = 3L, rerank = 2, k = 1)
    }
    assert(nullVec.getMessage.contains("3"))
  }

  test("sparseRandomProject fails loudly on vectors shorter than inDim") {
    val df = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProjection(df, "vec_id", "embedding", 8, 4, 7).collect()
    }
    assert(e.getMessage != null)
  }

  test("jacobiEigen: known symmetric matrices, orthonormal eigenvectors") {
    // [[2,1],[1,2]] -> eigenvalues {3, 1}
    val (ev, v) = Similarity.jacobiEigen(Array(2.0, 1.0, 1.0, 2.0), 2)
    assert(math.abs(ev.max - 3.0) < 1e-12 && math.abs(ev.min - 1.0) < 1e-12)
    // columns orthonormal
    val dot = v(0) * v(1) + v(2) * v(3)
    val n0 = v(0) * v(0) + v(2) * v(2)
    assert(math.abs(dot) < 1e-12 && math.abs(n0 - 1.0) < 1e-12)
    // A·x = λ·x for column 0
    val l0 = ev(0)
    assert(math.abs(2 * v(0) + v(2) - l0 * v(0)) < 1e-10)
  }

  test("pcaRotate: decorrelates, orders variance, preserves distances") {
    // rank-2 structure in 4 dims (dim 3 constant, dim 1 = 2×dim 0 signal)
    val rows = (0 until 200).map { i =>
      val a = math.sin(i * 0.7) * 3
      val b = math.cos(i * 1.3)
      (i.toLong, Seq((a + 1.0).toFloat, (2 * a - 0.5).toFloat,
        (b + 2.0).toFloat, 0.0f))
    }
    val df = rows.toDF("id", "v")
    val proj = Similarity.pcaRotate(df, "id", "v", dim = 4, k = 4)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val m = proj.map(_._2.toArray)
    val n = m.length
    def meanC(c: Int) = m.map(_(c)).sum / n
    def covC(c1: Int, c2: Int) = {
      val (m1, m2) = (meanC(c1), meanC(c2))
      m.map(r => (r(c1) - m1) * (r(c2) - m2)).sum / (n - 1)
    }
    val vars = (0 until 4).map(c => covC(c, c))
    // descending variance down to the fp noise floor (the two null
    // directions of rank-2 data project to ~1e-15 variances whose
    // relative order is noise); rank-2 data -> components 3,4 are ~0
    assert(vars(0) >= vars(1) && vars(1) >= math.max(vars(2), vars(3)))
    assert(vars(0) > 1.0 && vars(2) < 1e-9 && vars(3) < 1e-9)
    // decorrelated: off-diagonals vanish
    assert(math.abs(covC(0, 1)) < 1e-9 && math.abs(covC(0, 2)) < 1e-9)
    // orthogonal full-rank rotation preserves pairwise distances
    def l2(x: Array[Double], y: Array[Double]) =
      math.sqrt(x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum)
    val orig = rows.map(_._2.map(_.toDouble).toArray)
    Seq((0, 7), (3, 150), (42, 43)).foreach { case (i, j) =>
      assert(math.abs(l2(m(i), m(j)) - l2(orig(i), orig(j))) < 1e-9)
    }
    // whitening: unit variance on the informative components
    val white = Similarity.pcaRotate(df, "id", "v", dim = 4, k = 2,
        whiten = true)
      .as[(Long, Seq[Double])].collect().map(_._2.toArray)
    def wvar(c: Int) = {
      val mu = white.map(_(c)).sum / n
      white.map(r => (r(c) - mu) * (r(c) - mu)).sum / (n - 1)
    }
    assert(math.abs(wvar(0) - 1.0) < 1e-9 && math.abs(wvar(1) - 1.0) < 1e-9)
    // null vector -> null projection; null element -> loud failure
    val withNullVec = Seq((1L, Seq(1f, 2f, 3f, 4f)),
      (2L, null.asInstanceOf[Seq[Float]]),
      (3L, Seq(5f, 6f, 7f, 8f))).toDF("id", "v")
    val out = Similarity.pcaRotate(withNullVec, "id", "v", 4, 2)
      .as[(Long, Option[Seq[Double]])].collect().sortBy(_._1)
    assert(out(1)._2.isEmpty && out(0)._2.nonEmpty)
  }

  test("centroid family rejects high-cardinality label columns loudly") {
    // one label PER ROW — the hazard shape (cluster id / url host): the
    // centroid collect would pull rows-many dim-length centroids to the
    // driver and fuse them all into one scoring expression
    val n = Similarity.MaxCentroidLabels + 8
    val wide = spark.range(n.toLong).selectExpr(
      "id", "array(cast(id as double), 1.0d) as v",
      "concat('lbl_', id) as label")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.nearestCentroid(wide, "id", "v", "label").collect()
    }
    assert(e1.getMessage.contains("MaxCentroidLabels")
      || e1.getMessage.contains("distinct 'label' labels"))
    assert(e1.getMessage.contains("min_by")) // the documented high-L path
    val e2 = intercept[IllegalArgumentException] {
      Similarity.centroidOutliers(wide, "id", "v", "label").collect()
    }
    assert(e2.getMessage.contains("distinct 'label' labels"))
  }
}
