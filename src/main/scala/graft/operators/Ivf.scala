package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorAggregates, VectorExpressions}

/** IVF-style approximate-nearest-neighbor index: k-means partitions the
  * corpus into `k` cells; a query probes only the `nProbe` cells whose
  * centroids are nearest, then brute-forces inside them.
  *
  * Scale design:
  *   - training: Lloyd's iterations where assignment is a narrow
  *     projection (the native `ivf_assign` argmin — one fused k×dim
  *     loop, one expression node, zero per-row allocation, centroid
  *     matrix a codegen reference object) and the re-centering
  *     aggregate is [[VectorAggregates.vectorSum]]
  *     — map-side partial sums, one shuffle of `partitions × k × dim`
  *     doubles per iteration, independent of corpus size;
  *   - the trained model is `k × dim` doubles on the driver (a task
  *     reference in the plan, implicitly broadcast);
  *   - search cost is `corpus × nProbe / k` rows (assuming balanced
  *     cells) + a TakeOrderedAndProject top-k, vs the LSH variant's
  *     fixed-bucket recall. Higher recall than random-hyperplane buckets
  *     on weakly-clustered data because cells adapt to the distribution.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Cluster id = argmin_i l2sq(vec, centroid_i), ties to the lowest id
    * — the native [[graft.functions.IvfAssign]] expression: one fused
    * k×dim loop with the matrix as a codegen reference object, replacing
    * the k-literal `array_min(struct(l2sq, id))` tree (which allocated k
    * structs per row and re-ran ~50 nodes of analysis per Lloyd
    * iteration; see the expression's scaladoc for what was and wasn't
    * the cost).
    */
  private[operators] def assignExpr(vec: Column, model: Model): Column =
    VectorExpressions.ivfAssign(vec, model.centroids)

  /** Lloyd's k-means. Deterministic: initial centroids are the `k`
    * lowest-id vectors; empty cells keep their previous centroid.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5): Model = {
    // null vectors train nothing (and would skew centroids: vector_sum
    // skips them but a bare count(1) would still divide by them).
    // Persisted across the Lloyd loop (r17, guide §5): training makes
    // iters+1 passes over the SAME projected input — without the persist
    // each pass re-reads and re-decodes the source scan. Projected to
    // (id, vec) first so only the vectors are cached, and released
    // before returning.
    val vecs = df.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = vecs.orderBy(col(idCol)).limit(k)
        .select(transform(col(vecCol), _.cast("double")).as("c"))
        .collect().map(_.getSeq[Double](0).toArray)
      require(init.length == k, s"need at least $k non-null vectors, got ${init.length}")
      var model = Model(init)
      for (_ <- 0 until iters) {
        val assigned = vecs.select(col(vecCol),
          assignExpr(col(vecCol), model).as("_cell"))
        val sums = assigned.groupBy("_cell")
          .agg(VectorAggregates.vectorSum(col(vecCol)).as("s"),
            count(col(vecCol)).as("n"))
          .collect()
        val next = model.centroids.clone()
        sums.foreach { r =>
          val cell = r.getInt(0)
          val s = r.getSeq[Double](1)
          val n = r.getLong(2).toDouble
          if (s != null && n > 0) next(cell) = s.map(_ / n).toArray
          // else: empty cell keeps its previous centroid
        }
        model = Model(next)
      }
      model
    } finally vecs.unpersist(blocking = false): Unit
  }

  /** Attach the cell id (the IVF partition key). */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("cell", assignExpr(col(vecCol), model))

  /** The `nProbe` nearest cell ids for a vector COLUMN — the expression
    * twin of [[probeCells]], for a whole DataFrame of queries at once
    * (the batch-retrieval path, [[graft.sink.VectorIndex.knnSearch]]).
    * The native [[graft.functions.IvfProbe]]: one fused k×dim distance
    * loop + an O(k·nProbe) partial selection per row, replacing the
    * k-struct array_sort/slice/transform tree (ordering parity, incl.
    * NaN-last and id tie-breaks, is spec-pinned). Matrix rides as a
    * codegen reference — nothing shuffled or broadcast explicitly.
    */
  def probeCellsExpr(vec: Column, model: Model, nProbe: Int): Column =
    VectorExpressions.ivfProbe(vec, model.centroids, nProbe)

  /** The `nProbe` cells whose centroids are nearest the query — driver
    * math over the k×dim model, shared by the in-memory and persisted
    * ([[graft.sink.VectorIndex]]) search paths.
    */
  def probeCells(model: Model, query: Seq[Float], nProbe: Int): Seq[Int] = {
    val q = query.map(_.toDouble).toArray
    def l2sq(c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      val n = math.min(c.length, q.length)
      while (i < n) { val t = c(i) - q(i); d += t * t; i += 1 }
      d
    }
    model.centroids.zipWithIndex
      .sortBy { case (c, i) => (l2sq(c), i) }.take(nProbe).map(_._2).toSeq
  }

  /** Top-k by cosine among the `nProbe` nearest cells to the query. */
  def search(assigned: DataFrame, idCol: String, vecCol: String,
      model: Model, query: Seq[Float], topK: Int, nProbe: Int): DataFrame = {
    val probes = probeCells(model, query, nProbe)
    Similarity.bruteForceTopK(
      assigned.filter(col("cell").isin(probes: _*)), idCol, vecCol, query, topK)
  }
}
