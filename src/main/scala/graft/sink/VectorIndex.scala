package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ivf

/** Persisted IVF vector index: the vector-side twin of the text postings
  * path ([[InvertedIndex]]/[[IncrementalPostings]]) — train once, lay the
  * corpus out by cell on disk, serve each query by READING only the
  * probed cells, and mutate by KEY through an O(batch) commit log.
  *
  * Layout under `dir`:
  *   - `centroids/` — `(cell int, centroid array<double>)`, k rows: the
  *     model. Tiny (k × dim doubles), read to the driver per search
  *     session, exactly like [[Ivf.Model]] lives as plan literals.
  *   - `meta/` — one row `(id_col, vec_col, dim)`: the indexed schema
  *     contract, so every later mutation is validated against what the
  *     index was built over.
  *   - `cells/cell=<i>/` — the base corpus partitioned by assigned cell
  *     (Hive-style directory partitioning), sequence 0.
  *   - `commits/<seq>/{cells,docs}` — one dir per [[upsert]]/[[delete]]
  *     ([[DeltaLog]] protocol, atomic rename): the batch's cell-assigned
  *     vectors plus `docs`, the ids WRITTEN BY this commit (a delete
  *     writes ids with no vectors — a keyed tombstone).
  *
  * Read-time resolution is id-granular last-writer-wins, the
  * [[IncrementalPostings]] design verbatim: a doc's vector comes from the
  * highest sequence that wrote its id (the base if none did). The owner
  * table is one row per EVER-TOUCHED id — steady-state ingest touches a
  * vanishing fraction of the corpus, so it broadcasts until [[compact]]
  * folds it away. Re-upserting an id supersedes the old vector even when
  * the new one lands in a DIFFERENT cell (the old cell's row loses the
  * owner filter), so a stale copy can never be returned by a probe.
  *
  * Scale design: the serving property is DISK-level pruning — a probe
  * filter `cell IN (…)` is a partition-column predicate on the base leg,
  * so Spark's file index never lists or reads the unprobed directories
  * (`PartitionFilters` in the scan, pinned by `VectorIndexSpec`); commit
  * legs are O(batch) files and carry `cell` as a data column (row-group
  * pruning, no directory fan-out per tiny batch). Per-query scan cost is
  * `nProbe / k` of the index regardless of index size. A commit writes
  * O(batch) bytes (pinned by spec); [[compact]] is the only index-sized
  * write and is a maintenance job. Centroid DRIFT under sustained ingest
  * degrades cell balance — [[stats]] measures it (skew vs uniform), and
  * rebuild (re-[[write]]) is the remedy.
  */
object VectorIndex {

  private val metaSchema = StructType(Seq(
    StructField("id_col", StringType, nullable = false),
    StructField("vec_col", StringType, nullable = false),
    StructField("dim", IntegerType, nullable = false)))

  private final case class Meta(idCol: String, vecCol: String, dim: Int)

  // The schema contract and the k-means model are immutable between
  // rebuilds (upsert/delete/compact never touch them), and the module is
  // single-writer — so both memoize per (session, dir), invalidated by
  // [[write]]. Saves two small parquet read jobs per query in serving
  // loops; a rebuild from ANOTHER process is a serving cutover, which
  // restarts the reader session anyway.
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Meta]()
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Ivf.Model]()

  private def readMeta(spark: SparkSession, dir: String): Meta =
    metaCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val r = s.read.schema(metaSchema).parquet(s"$d/meta").head()
      Meta(r.getString(0), r.getString(1), r.getInt(2))
    })

  private def checkMeta(spark: SparkSession, dir: String, idCol: String,
      vecCol: String): Meta = {
    val m = readMeta(spark, dir)
    require(m.idCol == idCol && m.vecCol == vecCol,
      s"index at $dir was built over ('${m.idCol}', '${m.vecCol}'), " +
        s"not ('$idCol', '$vecCol')")
    m
  }

  /** Train a k-means model on `df` and persist model + cell-partitioned
    * corpus at `dir`, resetting any previous commit log (a rebuild
    * re-trains centroids and absorbs every live row the caller passes).
    * Null vectors are excluded (they can't be probed).
    */
  def write(df: DataFrame, idCol: String, vecCol: String, dir: String,
      k: Int, iters: Int = 5): Ivf.Model = {
    val spark = df.sparkSession
    val model = Ivf.fit(df, idCol, vecCol, k, iters)
    val centroidRows = model.centroids.zipWithIndex.map { case (c, i) =>
      Row(i, c.toSeq)
    }
    val centroidSchema = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    // r17: model/meta/base are independent writes — concurrent jobs
    // (guide §2.6); only the radii pass depends on the installed base.
    // r18: advisor's meta-before-install ordering measured and rejected
    // (x_knn_indexed +14%, x_sim_ivf_stats +17%) — rationale at
    // GeoIndex.write.
    DeltaLog.inParallel(
      () => spark.createDataFrame(
          spark.sparkContext.parallelize(centroidRows.toSeq, 1), centroidSchema)
        .write.mode("overwrite").parquet(s"$dir/centroids"),
      () => spark.createDataFrame(
          spark.sparkContext.parallelize(
            Seq(Row(idCol, vecCol, model.centroids.head.length)), 1), metaSchema)
        .write.mode("overwrite").parquet(s"$dir/meta"),
      () => DeltaLog.installBase(spark, dir, "cells", fenceDomain = dir) { tmp =>
        Ivf.assign(df.filter(col(vecCol).isNotNull), vecCol, model)
          .write.mode("overwrite").partitionBy("cell").parquet(tmp)
      }: Unit)
    writeRadii(spark, dir, vecCol)
    // a rebuild starts a fresh history: everything live is in the base
    DeltaLog.fs(spark, dir).delete(new Path(s"$dir/commits"), true)
    DeltaLog.initRoot(spark, s"$dir/commits")
    // the rebuild replaced the contract + model: refresh the memos
    metaCache.put((spark, dir), Meta(idCol, vecCol, model.centroids.head.length))
    modelCache.put((spark, dir), model)
    model
  }

  /** Guard a mutation batch: vectors must match the index's trained
    * dimensionality — the fused min-length loops in the vector
    * expressions would otherwise assign a wrong-dim vector to a cell
    * from a TRUNCATED distance, silently corrupting the layout. Fails
    * loudly at execution (the `raise_error` precedent of the sink's
    * null-`_id` guard). Null vectors are excluded like in [[write]].
    */
  private def checkedBatch(df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    val vecType = df.schema(vecCol).dataType
    df.filter(col(vecCol).isNotNull)
      .withColumn(vecCol,
        when(size(col(vecCol)) === dim, col(vecCol))
          .otherwise(raise_error(concat(
            lit(s"VectorIndex: vector dim must be $dim, got "),
            size(col(vecCol)).cast("string"))).cast(vecType)))
  }

  /** Upsert a batch by key: assign against the persisted centroids (no
    * retrain) and commit ONE O(batch) delta — the batch's cell-assigned
    * vectors plus its ids as the ownership record. A re-upserted id
    * supersedes its previous vector at read time (last-writer-wins);
    * ids new to the index simply appear. Returns the commit sequence.
    *
    * Each id at most once per batch — same contract and same loud guard
    * as [[IncrementalPostings.commitUpserts]] (two versions of an id in
    * one commit would BOTH survive the one-owner-sequence-per-id filter).
    */
  def upsert(df: DataFrame, idCol: String, vecCol: String,
      dir: String): Int = {
    val spark = df.sparkSession
    val m = checkMeta(spark, dir, idCol, vecCol)
    // ONE aggregate action rejects BOTH commit-corrupting id shapes: a
    // null id (invisible to the equality-keyed owner join — the row could
    // never be superseded or deleted) and a duplicated id (two versions
    // would both survive the one-owner-sequence-per-id filter)
    val g = df.agg(count(lit(1)).as("n"),
      count_distinct(col(idCol)).as("nd"),
      count(when(col(idCol).isNull, 1)).as("nn")).head()
    require(g.getLong(2) == 0 && g.getLong(0) == g.getLong(1),
      s"upsert: batch carries a null or duplicated '$idCol' " +
        s"(${g.getLong(0)} rows, ${g.getLong(1)} distinct non-null ids); " +
        "a commit owns each non-null id once — dedupe last-writer-wins " +
        "upstream")
    val model = loadModel(spark, dir)
    // one file per O(batch) commit leg, cell-sorted for row-group
    // pruning: the batch inherits the source scan's partitioning (32
    // near-empty files per tiny commit otherwise), and every later read
    // re-lists every commit's files — commit-leg file count is a
    // SERVING cost, not just a write cost
    val assigned = Ivf.assign(checkedBatch(df, vecCol, m.dim), vecCol, model)
      .coalesce(1).sortWithinPartitions("cell")
    DeltaLog.commit(spark, s"$dir/commits",
        DeltaLog.nextSeq(spark, s"$dir/commits"), "docs", fenceDomain = dir) { tmp =>
      // r17: the two O(batch) legs are independent — concurrent jobs
      // (guide §2.6); the docs leg derives from `assigned`, not from the
      // raw df, because checkedBatch DROPS null-vector rows and a doc id
      // must not be tombstoned by a row that contributed no vector
      DeltaLog.inParallel(
        () => assigned.write.mode("overwrite").parquet(s"$tmp/cells"),
        () => assigned.select(col(idCol)).distinct()
          .write.mode("overwrite").parquet(s"$tmp/docs"))
    }
  }

  /** Delete by key: the ids claim ownership with no vectors — a keyed
    * tombstone, O(ids) bytes ([[IncrementalPostings.commitDeletes]]
    * design). Returns the commit sequence.
    */
  def delete(ids: DataFrame, idCol: String, dir: String): Int = {
    val spark = ids.sparkSession
    val m = readMeta(spark, dir)
    require(m.idCol == idCol,
      s"index at $dir is keyed by '${m.idCol}', not '$idCol'")
    // an empty vectors file with the BASE's schema so resolution's
    // unionByName sees every commit leg schema-complete
    val baseSchema = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "cells")).schema
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], baseSchema).repartition(1)
    DeltaLog.commit(spark, s"$dir/commits",
        DeltaLog.nextSeq(spark, s"$dir/commits"), "docs", fenceDomain = dir) { tmp =>
      DeltaLog.inParallel( // independent legs → concurrent jobs (r17)
        () => empty.write.mode("overwrite").parquet(s"$tmp/cells"),
        () => ids.select(col(idCol)).distinct().coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/docs"))
    }
  }

  /** Insert-only alias kept for the ingestion shape where ids are known
    * fresh (the r3 append path). Same commit as [[upsert]] — an id that
    * DOES collide now supersedes its old vector instead of leaving two
    * live copies.
    */
  def append(df: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    upsert(df, idCol, vecCol, dir): Unit
  }

  /** Load the persisted model (k rows to the driver; memoized per
    * session — see the cache note above).
    */
  def loadModel(spark: SparkSession, dir: String): Ivf.Model =
    modelCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val rows = s.read.parquet(s"$d/centroids")
        .orderBy("cell").collect()
      require(rows.nonEmpty, s"no centroids at $d/centroids")
      Ivf.Model(rows.map(_.getSeq[Double](1).toArray))
    })

  private def commitSeqs(spark: SparkSession, dir: String): Seq[Int] =
    DeltaLog.listSeqs(spark, s"$dir/commits", Some("docs"))

  /** Per-cell max member-to-centroid ANGLE of the BASE layout — the
    * prune bound [[radiusSearch]] uses. Written at [[write]] and
    * recomputed at [[compact]]; between compactions mutations only
    * REMOVE base members (supersede/tombstone), so the stored radius
    * stays a sound upper bound. A zero vector's NaN angle propagates
    * through max, which un-prunes its cell — conservative, never wrong.
    */
  private def writeRadii(spark: SparkSession, dir: String,
      vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids")
    spark.read.parquet(DeltaLog.currentBase(spark, dir, "cells"))
      .join(broadcast(cents), "cell")
      .select(col("cell"),
        acos(least(lit(1.0), greatest(lit(-1.0),
          graft.functions.VectorExpressions.cosineFast(
            col(vecCol), col("centroid"))))).as("_a"))
      .groupBy("cell").agg(max("_a").as("r"))
      .write.mode("overwrite").parquet(s"$dir/radii")
  }

  /** The LIVE corpus (all cells), id-granular last-writer-wins over
    * base + commits. With an empty commit log this is exactly the base
    * scan; with commits, the owner table (one row per ever-touched id)
    * broadcasts against the union, and only the winning sequence's row
    * per id survives. The probe filter `cell IN (…)` pushes through the
    * join and union into every leg's scan — partition pruning on the
    * base leg is unaffected by resolution.
    */
  def cells(spark: SparkSession, dir: String): DataFrame =
    cellsPruned(spark, dir, None)

  /** [[cells]] with an optional partition filter applied to the BASE
    * leg ONLY: [[radiusSearch]]'s cell bound is proven over base
    * members, so commit legs (O(batch) files, no directory fan-out)
    * always scan in full — an upserted vector landing outside its
    * cell's stored radius must still be found.
    */
  private def cellsPruned(spark: SparkSession, dir: String,
      baseCells: Option[Seq[Int]]): DataFrame = {
    val m = readMeta(spark, dir)
    val seqs = commitSeqs(spark, dir)
    val base0 = spark.read.parquet(DeltaLog.currentBase(spark, dir, "cells"))
    val base = baseCells.fold(base0)(cs =>
      base0.filter(col("cell").isin(cs: _*)))
    if (seqs.isEmpty) base
    else {
      val all = seqs.foldLeft(base.withColumn("_seq", lit(0))) { (acc, s) =>
        acc.unionByName(spark.read.parquet(s"$dir/commits/$s/cells")
          .withColumn("_seq", lit(s)))
      }
      val owners = seqs.map { s =>
        spark.read.parquet(s"$dir/commits/$s/docs")
          .select(col(m.idCol), lit(s).as("_live_seq"))
      }.reduce(_.unionByName(_))
        .groupBy(col(m.idCol)).agg(max("_live_seq").as("_live_seq"))
      val cols = base.columns.map(col).toSeq
      all.join(broadcast(owners), Seq(m.idCol), "left")
        .filter(col("_seq") === coalesce(col("_live_seq"), lit(0)))
        .select(cols: _*) // the join moved the id first; restore the layout
    }
  }

  /** Fold all commits into a fresh cell-partitioned base — the only
    * index-sized write, run as maintenance (same contract as
    * [[IncrementalPostings.compact]]). Installed via
    * [[DeltaLog.installBase]]: written in place, sealed by the marker —
    * no directory rename, so an object-store reader never sees a
    * partial base.
    *
    * MAINTENANCE CONTRACT (all five stores' compact, and
    * [[ParquetIndexSink.vacuum]]): call from the owning writer's
    * process (the session epoch is reused), or pass the owner's
    * explicit [[WriterEpoch]] as `epoch`. Calling with no epoch from a
    * SECOND JVM while the writer is live ACQUIRES a fresh claim and
    * FENCES the live writer — that shape is a deliberate takeover
    * (stop the writer first). See the README runbook.
    */
  def compact(spark: SparkSession, dir: String,
      keepGenerations: Int = 1, epoch: WriterEpoch = null): Unit = {
    val seqs = commitSeqs(spark, dir)
    if (seqs.isEmpty) return
    val we = DeltaLog.resolveEpoch(spark, dir, epoch)
    val live = cells(spark, dir)
    DeltaLog.installBase(spark, dir, "cells", keepGenerations, fenceDomain = dir, epoch = we) { tmp =>
      live.write.mode("overwrite").partitionBy("cell").parquet(tmp)
    }: Unit
    // fenced since the install => never GC the folded log: a
    // zombie compactor must not delete commits a rival's view holds
    DeltaLog.checkFence(spark, we)
    val f = DeltaLog.fs(spark, dir)
    seqs.foreach(s => f.delete(new Path(s"$dir/commits/$s"), true))
    // the folded base has new membership: tighten the radius bounds —
    // behind its own fence check (radii is a plain overwrite a zombie
    // could otherwise clobber after the rival took the store)
    DeltaLog.checkFence(spark, we)
    writeRadii(spark, dir, readMeta(spark, dir).vecCol)
  }

  /** Top-k by cosine reading ONLY the `nProbe` probed cell directories —
    * `cell` is a partition column on the base leg, so the filter prunes
    * at file-listing time and the scan never touches the rest of the
    * index. Tombstoned/superseded rows are resolved away before ranking.
    */
  def search(spark: SparkSession, dir: String, idCol: String, vecCol: String,
      query: Seq[Float], topK: Int, nProbe: Int): DataFrame = {
    checkMeta(spark, dir, idCol, vecCol)
    val model = loadModel(spark, dir)
    val probes = Ivf.probeCells(model, query, nProbe)
    graft.operators.Similarity.bruteForceTopK(
      cells(spark, dir).filter(col("cell").isin(probes: _*)),
      idCol, vecCol, query, topK)
  }

  /** Cosine-threshold range search ("every live vector with
    * cosine ≥ minCosine") with a SOUND disk-level prune: by the
    * spherical triangle inequality `θ(q,v) ≥ θ(q,c) − R_c`, where `R_c`
    * is the cell's stored max member-to-centroid angle — a cell is
    * skipped only when even its angularly-extreme member could not
    * reach the threshold (`θ(q,c) − R_c > arccos(minCosine)`), so the
    * prune never loses a qualifying vector. The bound covers BASE
    * members; commit legs (O(batch)) always scan in full, and a cell
    * with no base rows has no radius row and drops from the base scan
    * outright. Unlike [[search]]'s fixed `nProbe`, the probed set here
    * ADAPTS to the threshold: a tight τ near a cluster reads one cell,
    * a loose τ reads many — exactness at every setting, pruning where
    * the geometry allows it.
    */
  def radiusSearch(spark: SparkSession, dir: String, idCol: String,
      vecCol: String, query: Seq[Float], minCosine: Double): DataFrame = {
    checkMeta(spark, dir, idCol, vecCol)
    require(minCosine >= -1.0 && minCosine <= 1.0,
      s"minCosine must be in [-1, 1], got $minCosine")
    val q = query.map(_.toDouble).toArray
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    require(qNorm > 0, "radiusSearch query must be non-zero")
    val theta = math.acos(math.min(1.0, math.max(-1.0, minCosine)))
    // an index written before radii existed still answers EXACTLY —
    // every base cell scans (no radius rows → no prune evidence);
    // re-write or compact to regain the pruned read
    val radii =
      try spark.read.parquet(s"$dir/radii")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          loadModel(spark, dir).centroids.indices
            .map(_ -> Double.NaN).toMap // NaN never prunes
      }
    val probe = loadModel(spark, dir).centroids.zipWithIndex.flatMap {
      case (c, i) =>
        // no radius row = no base members in the cell: drop it from the
        // base scan outright (commit legs still cover any upserts there)
        radii.get(i).flatMap { r =>
          val cNorm = math.sqrt(c.map(x => x * x).sum)
          val qcAngle =
            if (cNorm == 0) 0.0 // degenerate centroid: never prune
            else math.acos(math.min(1.0, math.max(-1.0,
              q.zip(c).map { case (a, b) => a * b }.sum / (qNorm * cNorm))))
          // NaN radius makes the comparison false → cell kept
          if (qcAngle - r > theta) None else Some(i)
        }
    }.toSeq
    val qLit = array(q.map(lit).toIndexedSeq: _*)
    cellsPruned(spark, dir, Some(probe))
      .select(col(idCol),
        graft.functions.VectorExpressions.cosineFast(col(vecCol), qLit)
          .as("_c"))
      .filter(col("_c") >= minCosine)
      .select(col(idCol), round(col("_c"), 6).as("cosine"))
  }

  /** Batch KNN over the persisted index: the k nearest live vectors per
    * QUERY ROW — the retrieval shape of [[graft.operators.Similarity.knnJoin]]
    * (embed a batch of prompts, fetch neighbors for each) served off the
    * index instead of a corpus scan. Returns `(qIdCol, rk, idCol,
    * cosine)` with `rk ∈ [1, k]`, ties broken by corpus id.
    *
    * Scale shape: each query computes its `nProbe` nearest cells as a
    * model-literal expression ([[Ivf.probeCellsExpr]] — no driver loop
    * over queries), explodes to `(query, cell)` pairs, and BROADCASTS
    * against the cell-partitioned corpus with an equi-join on `cell`:
    * Spark's dynamic partition pruning turns the broadcast values into a
    * partition filter, so the scan reads only the UNION of probed cells
    * — file-listing-time pruning for a whole query batch at once
    * (spec-pinned). Scoring is map-side codegen cosine; ranking is the
    * bounded top-k aggregate — the corpus is never shuffled. A doc lives
    * in exactly one cell, so no (query, doc) pair is scored twice.
    * Serve compacted for the tightest pruning: a live commit log adds
    * its O(batch) legs to the scan.
    */
  def knnSearch(spark: SparkSession, dir: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, k: Int, nProbe: Int,
      filter: Option[Column] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val m = readMeta(spark, dir)
    // PRE-filter (the ES `knn` + `filter` shape): the predicate — any
    // expression over the STORED metadata columns, which `write`
    // persists alongside (id, vec, cell) — restricts the candidate set
    // BEFORE ranking, so within the probed cells the top-k is the true
    // filtered top-k, never "rank then discard". The predicate rides
    // the pruned cell scan: parquet row-group pushdown applies, and a
    // selective filter makes the ranking leg cheaper.
    //
    // Recall contract: the filter applies AFTER cell pruning, so it is
    // exact only when `nProbe` covers all cells; at nProbe < k-cells a
    // selective filter can empty the probed cells and under-fill k (or
    // miss true filtered neighbors that live in unprobed cells) —
    // recall-bounded exactly like unfiltered IVF search, and the bound
    // degrades with filter selectivity. Callers pairing a highly
    // selective filter with small nProbe should widen nProbe (rule of
    // thumb: divide by the filter's expected pass rate) or probe all
    // cells for exactness.
    val corpus0 = cells(spark, dir)
    val corpus = filter.map(corpus0.filter).getOrElse(corpus0)
    graft.operators.Similarity.requireIntegralId(
      corpus, m.idCol, "knnSearch corpus")
    val model = loadModel(spark, dir)
    val probed = queries
      .withColumn("_cells",
        graft.operators.Ivf.probeCellsExpr(col(qVecCol), model, nProbe))
      .select(col(qIdCol), col(qVecCol), explode(col("_cells")).as("cell"))
    val scored = corpus
      .join(broadcast(probed), Seq("cell"))
      .select(col(qIdCol),
        graft.functions.VectorExpressions
          .cosineFast(col(m.vecCol), col(qVecCol)).as("_c"),
        col(m.idCol).cast("long").as("_id"))
    graft.operators.Similarity.rankScoredTopK(scored, qIdCol, m.idCol, k)
  }

  /** Maintenance driver wiring [[stats]] to actions: folds the commit
    * log once it is `maxPendingCommits` deep (read-time resolution cost
    * grows with log depth), and returns whether the operator should
    * REBUILD (re-[[write]]) because cell skew crossed `skewThreshold` —
    * rebuild retrains centroids, which only the caller can schedule (it
    * owns the corpus and the serving cutover). The ingest-loop shape:
    * `upsert…; if (maintain(…)) rebuild`.
    */
  def maintain(spark: SparkSession, dir: String,
      maxPendingCommits: Int = 16, skewThreshold: Double = 2.0): Boolean = {
    val s = stats(spark, dir).head()
    if (s.getAs[Long]("n_pending_commits") >= maxPendingCommits)
      compact(spark, dir)
    s.getAs[Double]("skew") >= skewThreshold
  }

  /** Per-cell occupancy of the LIVE index: `(cell, n_vectors)`. One hash
    * aggregate over the resolved view (cells with zero live vectors are
    * absent — [[stats]] folds them in from the model's k).
    */
  def cellCounts(spark: SparkSession, dir: String): DataFrame =
    cells(spark, dir).groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"))

  /** One-row index health report — the REBUILD SIGNAL for centroid drift
    * under sustained ingest:
    * `(n_vectors, n_cells, n_empty_cells, max_cell, skew, n_pending_commits)`
    * where `skew = max_cell / (n_vectors / k)` — 1.0 is perfectly
    * uniform, k means everything landed in one cell. An operator alerts
    * on `skew` (cells no longer match the data distribution → probed
    * searches read ever-larger fractions of the index) and on
    * `n_pending_commits` (read-time resolution cost → run [[compact]]).
    * Cost: one aggregate over the live view + the k-row model.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val k = loadModel(spark, dir).k
    val pending = commitSeqs(spark, dir).length
    cellCounts(spark, dir)
      .agg(coalesce(sum("n_vectors"), lit(0L)).as("n_vectors"),
        count(lit(1)).as("n_nonempty"),
        coalesce(max("n_vectors"), lit(0L)).as("max_cell"))
      .select(
        col("n_vectors"),
        lit(k).cast("long").as("n_cells"),
        (lit(k) - col("n_nonempty")).cast("long").as("n_empty_cells"),
        col("max_cell"),
        when(col("n_vectors") > 0,
            round(col("max_cell") * lit(k) / col("n_vectors"), 4))
          .otherwise(lit(0.0)).as("skew"),
        lit(pending).cast("long").as("n_pending_commits"))
  }

  /** Compact iff the commit log is deeper than `maxDeltas` — the
    * stats-driven auto-compaction policy an ingest loop calls after each
    * upsert/delete, completing the shared mutation contract
    * ([[IncrementalPostings.maybeCompact]] / `SignatureStore.maybeCompact`
    * parity). Returns whether a compaction ran. Centroid DRIFT is the
    * other rebuild signal and stays a [[stats]] judgement call (skew),
    * because the remedy there is a re-[[write]], not a fold.
    */
  def maybeCompact(spark: SparkSession, dir: String,
      maxDeltas: Int = 8, keepGenerations: Int = 1): Boolean = {
    val rec = commitSeqs(spark, dir).length > maxDeltas
    if (rec) compact(spark, dir, keepGenerations)
    rec
  }
}
