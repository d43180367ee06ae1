package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ivf

/** Persisted IVF vector index: the vector-side twin of the text postings
  * path ([[InvertedIndex]]) — train once, lay the corpus out by cell on
  * disk, and serve each query by READING only the probed cells.
  *
  * Layout under `dir`:
  *   - `centroids/` — `(cell int, centroid array<double>)`, k rows: the
  *     model. Tiny (k × dim doubles), read to the driver per search
  *     session, exactly like [[Ivf.Model]] lives as plan literals.
  *   - `cells/cell=<i>/` — the corpus partitioned by assigned cell
  *     (Hive-style directory partitioning).
  *
  * Scale design: the serving property is DISK-level pruning — a probe
  * filter `cell IN (…)` is a partition-column predicate, so Spark's file
  * index never lists or reads the unprobed directories
  * (`PartitionFilters` in the scan, pinned by `VectorIndexSpec`).
  * Per-query scan cost is `nProbe / k` of the index regardless of index
  * size; writing re-shuffles the corpus once by cell (the same one-off
  * layout cost as [[InvertedIndex.writePostings]]'s term-bucketed
  * layout). Rebuild to retrain centroids — an IVF layout is only as good
  * as its cells, and incremental drift is a re-layout decision, not an
  * append path.
  */
object VectorIndex {

  /** Train a k-means model on `df` and persist model + cell-partitioned
    * corpus at `dir`. Null vectors are excluded (they can't be probed).
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
    spark.createDataFrame(
        spark.sparkContext.parallelize(centroidRows.toSeq, 1), centroidSchema)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    Ivf.assign(df.filter(col(vecCol).isNotNull), vecCol, model)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    model
  }

  /** Append new vectors to an existing index WITHOUT retraining: assign
    * against the persisted centroids and append into the cell layout
    * (dynamic partition append touches only the cells the batch lands
    * in — O(batch) files). The model is unchanged, so searches stay
    * consistent; centroid DRIFT under sustained append degrades cell
    * balance, which is a rebuild (re-`write`) decision — the same
    * maintenance split as [[IncrementalPostings.compact]].
    *
    * Append-only: ids are NOT deduplicated — re-appending an existing id
    * leaves both copies in the cell layout. Vector UPSERTS go through a
    * rebuild (or route the keyed mutation through [[ParquetIndexSink]]
    * and rebuild the vector layout from its searchable view).
    */
  def append(df: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val spark = df.sparkSession
    val model = loadModel(spark, dir)
    Ivf.assign(df.filter(col(vecCol).isNotNull), vecCol, model)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Load the persisted model (k rows to the driver). */
  def loadModel(spark: SparkSession, dir: String): Ivf.Model = {
    val rows = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
    require(rows.nonEmpty, s"no centroids at $dir/centroids")
    Ivf.Model(rows.map(_.getSeq[Double](1).toArray))
  }

  /** The full indexed corpus (all cells) as a DataFrame. */
  def cells(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/cells")

  /** Top-k by cosine reading ONLY the `nProbe` probed cell directories —
    * `cell` is a partition column, so the filter prunes at file-listing
    * time and the scan never touches the rest of the index.
    */
  def search(spark: SparkSession, dir: String, idCol: String, vecCol: String,
      query: Seq[Float], topK: Int, nProbe: Int): DataFrame = {
    val model = loadModel(spark, dir)
    val probes = Ivf.probeCells(model, query, nProbe)
    graft.operators.Similarity.bruteForceTopK(
      cells(spark, dir).filter(col("cell").isin(probes: _*)),
      idCol, vecCol, query, topK)
  }
}
