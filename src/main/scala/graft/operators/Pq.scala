package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Product quantization (PQ) — the memory-bound ANN representation that
  * defines billion-vector serving: each vector splits into `m`
  * contiguous sub-vectors and each sub-vector is replaced by the id of
  * its nearest subspace centroid, so a `dim`-float vector (4·dim bytes)
  * becomes `m` small codes. At 100 TB the candidate scan reads ONLY the
  * code columns — a 32× byte reduction at dim=64/m=8 — and scores with
  * per-query lookup tables; exact vectors are touched only for the
  * bounded rescore pool (the [[Similarity.quantizedTopK]] int8 pattern,
  * pushed to its asymmetric-distance limit).
  *
  * Everything is deterministic: subspace codebooks train with
  * [[Ivf.fit]]'s lowest-id initialization and fixed iterations; code
  * assignment and ADC scoring are argmin/argmax over plan-literal
  * structs with id tie-breaks.
  *
  * Scale shape: training is `m` independent Ivf fits over narrow
  * slices (each iteration one `partitions × k × subDim` shuffle);
  * the model is `m × k × subDim` doubles of driver state (plan
  * literals, like the k-centroids contract); encode and ADC are pure
  * projections; the rescore leg is a broadcast semi-join of candidate
  * IDS — vectors never travel twice.
  */
object Pq {

  final case class Model(subModels: Array[Ivf.Model], dim: Int) {
    def m: Int = subModels.length
    def subDim: Int = dim / m
    def codebookSize: Int = subModels.head.k
  }

  private def subVec(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Train `m` independent subspace codebooks of `codebookSize`
    * centroids each over the vector column's contiguous slices.
    * `dim` must split evenly into `m` subspaces.
    *
    * The `m` Lloyd loops are FUSED: initialization is one collect of
    * the `codebookSize` lowest-id vectors (sliced per subspace —
    * [[Ivf.fit]]'s deterministic seed, so the result is identical to m
    * independent fits), and each iteration is ONE job — per-row, every
    * subspace's assignment rides the same projection, the sub-vectors
    * explode keyed `(subspace, cell)`, and a single hash aggregate
    * produces all `m × codebookSize` re-centering sums (same bytes as
    * one corpus pass: m sub-vectors of dim/m each). m× fewer scans and
    * driver roundtrips than fitting the subspaces one by one.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, codebookSize: Int, iters: Int = 3): Model = {
    require(m >= 1, s"m must be positive, got $m")
    require(dim % m == 0, s"dim ($dim) must split evenly into m ($m) subspaces")
    require(codebookSize >= 1, s"codebookSize must be positive, got $codebookSize")
    val subDim = dim / m
    val vecs = df.filter(col(vecCol).isNotNull)
    val seed = vecs.orderBy(col(idCol)).limit(codebookSize)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(seed.length == codebookSize,
      s"need at least $codebookSize non-null vectors, got ${seed.length}")
    var models = (0 until m).toArray.map { j =>
      Ivf.Model(seed.map(_.slice(j * subDim, (j + 1) * subDim)))
    }
    for (_ <- 0 until iters) {
      val perSub = explode(array((0 until m).map { j =>
        struct(lit(j).as("j"),
          Ivf.assignExpr(subVec(col(vecCol), j, subDim), models(j))
            .as("cell"),
          subVec(col(vecCol), j, subDim).as("sv"))
      }: _*))
      val sums = vecs.select(perSub.as("_s"))
        .groupBy(col("_s.j").as("j"), col("_s.cell").as("cell"))
        .agg(graft.functions.VectorAggregates.vectorSum(col("_s.sv")).as("s"),
          count(col("_s.sv")).as("n"))
        .collect() // m × codebookSize rows — bounded driver state
      val next = models.map(_.centroids.clone())
      sums.foreach { r =>
        val (j, cell) = (r.getInt(0), r.getInt(1))
        val s = r.getSeq[Double](2)
        val n = r.getLong(3).toDouble
        if (s != null && n > 0) next(j)(cell) = s.map(_ / n).toArray
        // else: empty cell keeps its previous centroid (the Ivf rule)
      }
      models = next.map(Ivf.Model(_))
    }
    Model(models, dim)
  }

  /** Attach the `m`-code representation as an `array<int>` column
    * `codes` — per subspace the nearest centroid id ([[Ivf]]'s
    * deterministic argmin). The compressed serving layout persists
    * (id, codes) and drops the raw vectors from the hot path.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("codes", array((0 until model.m).map { j =>
      Ivf.assignExpr(subVec(col(vecCol), j, model.subDim),
        model.subModels(j))
    }: _*))

  /** The decoded (reconstructed) vector for a codes column — each code
    * replaced by its subspace centroid, concatenated. The
    * reconstruction-error audit path (and the symmetric-distance
    * fallback when queries are themselves encoded).
    */
  def decodeExpr(codes: Column, model: Model): Column =
    concat((0 until model.m).map { j =>
      val cents = model.subModels(j).centroids
      element_at(
        array(cents.map(c => array(c.toSeq.map(lit): _*)): _*),
        element_at(codes, j + 1) + 1)
    }: _*)

  /** Asymmetric-distance (ADC) approximate dot products for one query
    * over an ENCODED frame: per subspace a `codebookSize`-entry lookup
    * table of `dot(query_j, centroid)` becomes a plan literal, and each
    * row's score is `Σ_j table_j[code_j]` — `m` array lookups per row,
    * no vector arithmetic, no vector bytes read. Returns the top
    * `rescoreK` candidate ids by `(adc desc, id)`.
    */
  def adcCandidates(encoded: DataFrame, idCol: String, model: Model,
      query: Seq[Float], rescoreK: Int): DataFrame = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    require(rescoreK >= 1, s"rescoreK must be positive, got $rescoreK")
    val q = query.map(_.toDouble)
    val score = (0 until model.m).map { j =>
      val qj = q.slice(j * model.subDim, (j + 1) * model.subDim)
      val table = model.subModels(j).centroids.map(c =>
        c.zip(qj).map { case (a, b) => a * b }.sum)
      element_at(array(table.toSeq.map(lit): _*),
        element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    encoded.select(col(idCol), score.as("adc"))
      .orderBy(col("adc").desc, col(idCol))
      .limit(rescoreK)
  }

  /** Batch ADC KNN join — the fleet-serving shape ([[Similarity.knnJoin]]
    * with PQ candidate generation): every query in the FRAME gets its
    * `k` nearest, with the candidate pass reading only codes. The real
    * ADC trick rides the broadcast: each query row precomputes its
    * `m × codebookSize` lookup tables (`dot(query_j, centroid)` — done
    * ONCE per query when the broadcast side materializes), so the
    * per-(query, row) cost is `m` array lookups + adds, with no vector
    * arithmetic and no vector bytes in the scan. (The probe-measured
    * alternative — `dot(query, decode(codes))` per pair — re-decoded
    * the row per query and was ~30× slower at the same exponent.)
    * Queries broadcast; candidate and final cuts are bounded per-query
    * aggregates, never corpus windows; the exact rescore joins vectors
    * for candidate ids only.
    */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, model: Model,
      k: Int, rescoreK: Int): DataFrame = {
    require(rescoreK >= k, s"rescoreK ($rescoreK) must be >= k ($k)")
    Similarity.requireIntegralId(df, idCol, "pq knnJoin corpus")
    // The exchange below is a deliberate materialization BARRIER, not a
    // partitioning choice: fused under the broadcast join, whole-stage
    // codegen defers the encode projection into the pair loop and
    // re-derives the m-argmin encoding once per (query, row) pair —
    // probe-measured 12× slower at every scale. The shuffle moves only
    // the compressed layout (id + m small ints per row), and at real
    // scale the serving path reads PERSISTED codes anyway (the
    // scaladoc contract), where no barrier is needed.
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    val encoded = encode(df, vecCol, model).select(col(idCol), col("codes"))
      .repartition(shufflePartitions)
    // per-query LUT columns, evaluated once per query row at broadcast
    // materialization: _lutj[c] = dot(query's j-th sub-vector, centroid c)
    val qLut = queries.select(col(qIdCol) +:
      (0 until model.m).map { j =>
        val qj = subVec(col(qVecCol), j, model.subDim)
        array((0 until model.codebookSize).map { c =>
          VectorExpressions.dotFast(qj,
            array(model.subModels(j).centroids(c).toSeq.map(lit): _*))
        }: _*).as(s"_lut$j")
      }: _*)
    val adc = (0 until model.m).map { j =>
      element_at(col(s"_lut$j"), element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    val candidates = Similarity.rankScoredTopK(
      encoded.crossJoin(broadcast(qLut))
        .select(col(qIdCol), adc.as("_c"), col(idCol).cast("long").as("_id")),
      qIdCol, idCol, rescoreK)
      .select(col(qIdCol), col(idCol))
    val exact = candidates
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))
      .select(col(qIdCol),
        VectorExpressions.cosineFast(col(vecCol), col(qVecCol)).as("_c"),
        col(idCol).cast("long").as("_id"))
    Similarity.rankScoredTopK(exact, qIdCol, idCol, k)
  }

  /** Full PQ serving pipeline: ADC candidate generation over the code
    * columns + exact-cosine rescore of ONLY the candidate pool (ids
    * broadcast back, the [[Similarity.quantizedTopK]] convention).
    * Exactness is probabilistic in the pool width: a true top-`k`
    * member must be displaced past `rescoreK` ADC candidates to change
    * the answer.
    */
  def searchTopK(df: DataFrame, idCol: String, vecCol: String,
      model: Model, query: Seq[Float], k: Int, rescoreK: Int): DataFrame = {
    require(rescoreK >= k, s"rescoreK ($rescoreK) must be >= k ($k)")
    val candidates = adcCandidates(encode(df, vecCol, model), idCol,
      model, query, rescoreK).select(col(idCol))
    val qLit = array(query.map(lit): _*)
    df.join(broadcast(candidates), Seq(idCol), "left_semi")
      .select(col(idCol),
        VectorExpressions.cosineFast(col(vecCol), qLit).as("cosine"))
      .orderBy(nanvl(col("cosine"), lit(Double.NegativeInfinity)).desc,
        col(idCol))
      .limit(k)
  }
}
