package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sink.{DocQueries, GeoIndex, IncrementalPostings, InvertedIndex, VectorIndex}

/** End-to-end SEARCH-SERVING example — build every persisted serving
  * structure once, then answer queries off the layouts with disk-level
  * pruning (each structure and query family is individually
  * oracle-checked by `SparkEntry`; this demo shows them COMPOSED the way
  * a serving deployment runs them):
  *
  *   build (the "indexing job"):
  *     1. incremental postings store — BM25 text retrieval + phrases
  *     2. IVF vector index           — embedding KNN + cosine radius
  *     3. geo cell layout            — radius / nearest-k / radius join
  *
  *   serve (each query reads ONLY its pruned slice):
  *     a. ranked BM25 lookup          (term row-group pruning)
  *     b. DisjunctionMax multi-clause (pruned postings legs)
  *     c. vector top-k                (probed cells only)
  *     d. cosine-radius               (angular-bound cell prune, exact)
  *     e. geo radius / polygon        (covered cells only)
  *     f. hybrid fusion               (bounded top-k legs, rank fusion)
  *     g. function-score              (relevance × length decay)
  *     h. significant terms           (slice-characteristic vocabulary)
  *
  *   then MUTATE the geo layout in place (the live-index story): upsert
  *   moves a point, delete tombstones one, the same radius query reads
  *   the last-writer-wins view off O(batch) commits.
  *
  *   runMain graft.examples.SearchPipeline [sfDir] [indexRoot]
  */
object SearchPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-serving").toString)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-search")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val vecs = Tables.embeddings(spark, sfDir)
    def report(stage: String, extra: String): Unit =
      println(f"[search] $stage%-28s $extra")

    // ---- build: one indexing job per structure --------------------------
    val tdir = s"$root/postings"
    IncrementalPostings.init(docs, "doc_id", "text", tdir)
    report("postings store", tdir)

    val vdir = s"$root/vectors"
    VectorIndex.write(vecs, "vec_id", "embedding", vdir, k = 8, iters = 3)
    report("vector index", vdir)

    val gdir = s"$root/geo"
    GeoIndex.write(
      docs.select(col("doc_id"),
        ((col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
          .as("lat"),
        ((col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
          .as("lon")),
      "doc_id", "lat", "lon", gdir)
    report("geo layout", gdir)

    // ---- serve: every query off a pruned read ---------------------------
    val (postings, norms) = IncrementalPostings.liveViews(spark, tdir)

    val bm25 = InvertedIndex.bm25Search(postings, norms,
      "merge window scan", 5)
    report("bm25 top-5", bm25.collect().map(_.getLong(0)).mkString(", "))

    val dismax = InvertedIndex.disMaxSearch(postings, norms,
      Seq("merge window", "scan stream"), tieBreaker = 0.3, k = 5)
    report("dismax top-5", dismax.collect().map(_.getLong(0)).mkString(", "))

    val qv = vecs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val knn = VectorIndex.search(spark, vdir, "vec_id", "embedding", qv,
      topK = 5, nProbe = 3)
    report("vector top-5", knn.collect().map(_.getLong(0)).mkString(", "))

    val rad = VectorIndex.radiusSearch(spark, vdir, "vec_id", "embedding",
      qv, minCosine = 0.4)
    report("cosine>=0.4", s"${rad.count()} vectors")

    val geo = GeoIndex.radiusSearch(spark, gdir, 40.0, -74.0, 6000.0)
    report("geo radius 6000km", s"${geo.count()} points")

    val poly = GeoIndex.polygonSearch(spark, gdir,
      Seq((10.0, -120.0), (70.0, -100.0), (60.0, -20.0), (0.0, -60.0)))
    report("geo polygon", s"${poly.count()} points")

    val fscore = DocQueries.functionScoreGauss(
      Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars"),
      "doc_id", "text", "merge window scan", "n_chars",
      origin = 0.0, scale = 2000.0, offset = 500.0, decay = 0.5, k = 5)
    report("function-score top-5",
      fscore.collect().map(_.getLong(0)).mkString(", "))

    val sig = DocQueries.significantTerms(
      Tables.documents(spark, sfDir).select("doc_id", "text", "lang"),
      "doc_id", "text", col("lang") === "de", minDocCount = 2, k = 5)
    report("significant terms (de)",
      sig.collect().map(_.getString(0)).mkString(", "))

    // hybrid: text + vector legs, reciprocal-rank fusion over bounded
    // top-k lists (the x_hybrid_indexed shape)
    val textLeg = InvertedIndex.bm25Search(postings, norms,
        "merge window scan", 20)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))).as("r_text"))
    val vecLeg = VectorIndex.search(spark, vdir, "vec_id", "embedding", qv,
        topK = 20, nProbe = 8)
      .select(col("vec_id").as("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine").desc, col("vec_id"))).as("r_vec"))
    val fused = textLeg.join(vecLeg, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (lit(1.0) / (lit(60) + coalesce(col("r_text"), lit(1000))) +
          lit(1.0) / (lit(60) + coalesce(col("r_vec"), lit(1000))))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(5)
    report("hybrid top-5", fused.collect().map(_.getLong(0)).mkString(", "))

    // query-box surface: a user query string compiled to ONE pushed
    // predicate; a typo corrected against the live vocabulary; a
    // date-math range resolved without a hidden clock (r7 additions)
    val qs = graft.sink.QueryString.search(
      Tables.documents(spark, sfDir), "text",
      """lang:de AND (merge OR "window scan")""", Set("text"))
    report("query_string (de)", s"${qs.count()} docs")
    val sug = DocQueries.phraseSuggest(Tables.documents(spark, sfDir),
      "doc_id", "text", "mrge windw", maxEdits = 1)
    report("did-you-mean",
      sug.collect().map(r => s"${r.getString(1)}→${r.getString(2)}")
        .mkString(", "))

    // filtered KNN: the metadata predicate restricts candidates BEFORE
    // ranking — the true filtered top-k
    val fknn = VectorIndex.knnSearch(spark, vdir,
      vecs.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "qid", "qv", k = 5, nProbe = 8,
      filter = Some(pmod(col("label"), lit(2)) === 0))
    report("filtered knn top-5",
      fknn.collect().map(_.getLong(2)).mkString(", "))

    // PQ serving: codes-only candidate scan + bounded exact rescore
    val pqModel = graft.operators.Pq.fit(vecs, "vec_id", "embedding",
      dim = 64, m = 8, codebookSize = 16, iters = 2)
    val pq = graft.operators.Pq.searchTopK(vecs, "vec_id", "embedding",
      pqModel, qv, k = 5, rescoreK = 100)
    report("pq top-5", pq.collect().map(_.getLong(0)).mkString(", "))

    // ---- live mutation: the serving index is not a rebuild-only artifact
    import spark.implicits._
    val moved = geo.select("doc_id").as[Long].head()
    GeoIndex.upsert(Seq((moved, 35.7, 139.7)).toDF("doc_id", "lat", "lon"),
      "doc_id", "lat", "lon", gdir)
    val tombstoned = GeoIndex.radiusSearch(spark, gdir, 40.0, -74.0, 6000.0)
      .select("doc_id").as[Long].head()
    GeoIndex.delete(Seq(tombstoned).toDF("doc_id"), "doc_id", gdir)
    val after = GeoIndex.radiusSearch(spark, gdir, 40.0, -74.0, 6000.0)
    report("geo after upsert+delete",
      s"${after.count()} points (moved $moved, deleted $tombstoned)")
    GeoIndex.maybeCompact(spark, gdir, maxDeltas = 1)
    report("geo compacted",
      s"${GeoIndex.stats(spark, gdir).head().getAs[Long]("n_pending_commits")} pending commits")

    spark.stop()
  }
}
