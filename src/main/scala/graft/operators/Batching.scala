package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Size-bounded batching (SURVEY §2.5 C3/B1) over a global order — the
  * reference cuts its upload batches every `batchSize` records in arrival
  * order (`IngestionConfig.java:47`).
  *
  * A naive `row_number().over(Window.orderBy(...))` funnels the entire
  * dataset through ONE partition (`Exchange SinglePartition` + WindowExec
  * warning) — correct at test scale, a single straggler task at 100 TB.
  *
  * [[withGlobalRowNumber]] is the standard two-phase layout instead:
  *   1. range-partition by the order column and sort within partitions
  *      (partition p's keys all precede partition p+1's — a total order
  *      across the cluster without a global sort to one node);
  *   2. `RDD.zipWithIndex`: one lightweight job counts rows per partition,
  *      cumulative counts become per-partition offsets, and the final pass
  *      adds partition-local indices to the offsets.
  * Both passes run over the SAME shuffle output (the range partitioner's
  * boundaries are sampled once, when the partitioner is built), so the
  * numbering is consistent and every partition works in parallel.
  */
object Batching {

  /** Upper bound on the DISTINCT groups any single partition may feed
    * into a two-phase numbering's driver-side count collect. The
    * per-(partition, group) frame those collects pull to the driver is
    * partitions × groups-sized — driver-tiny for the intended
    * source/language/shard-cardinality groups, a silent driver OOM if a
    * caller passes a high-cardinality `groupCol` (a document id). The
    * guard bounds driver state to partitions × this value and fails
    * LOUDLY in the counting task instead.
    */
  val MaxGroupsPerPartition: Int = 65536

  /** Executor-side cardinality guard for the two-phase group-numbering
    * collects ([[withGroupRowNumber]], `Corpus.groupPercentRank`).
    * Cheap (one int compare per row); throws with guidance once a
    * partition has seen more than [[MaxGroupsPerPartition]] distinct
    * groups.
    */
  private[graft] def guardGroupCardinality(seen: Int, where: String,
      groupCol: String): Unit =
    if (seen > MaxGroupsPerPartition) throw new IllegalArgumentException(
      s"$where: more than $MaxGroupsPerPartition distinct '$groupCol' " +
        "groups in one partition — the two-phase numbering collects a " +
        "partitions x groups count frame to the driver and is meant for " +
        "FEW, LARGE groups (sources, languages, shards). For " +
        "high-cardinality groups use a per-group window " +
        "(row_number().over(Window.partitionBy(...))) instead: each group " +
        "is small, so window partitioning does not straggle.")

  /** Append a 1-based global row number in `orderCol` order, without a
    * single-partition window. Ties in `orderCol` are numbered arbitrarily
    * (same contract as `row_number()` over a non-unique order).
    */
  def withGlobalRowNumber(df: DataFrame, orderCol: Column,
      outCol: String = "_row_number"): DataFrame = {
    val spark = df.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(shufflePartitions, orderCol)
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-GROUP 1-based row numbers in `orderCol` order — the grouped
    * twin of [[withGlobalRowNumber]], for when the groups are FEW and
    * LARGE (sources, languages, shards): a
    * `row_number().over(partitionBy(group))` window puts each group's
    * entire corpus through one task, so five sources at 100 TB become
    * five stragglers. Same two-phase layout instead: range-partition by
    * `(group, orderCol)` (each group spans a RUN of consecutive
    * partitions, every partition is corpus-size/P), count each
    * partition's per-group rows in one lightweight pass (a
    * partitions × groups frame — driver-tiny by the FEW-groups
    * precondition), turn the counts into per-(partition, group) prefix
    * offsets, broadcast them back, and add partition-local indices.
    */
  def withGroupRowNumber(df: DataFrame, groupCol: String, orderCol: Column,
      outCol: String = "_group_row_number"): DataFrame = {
    val spark = df.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // No materialization: `Dataset.rdd` is a lazy val, so pass 1 and
    // pass 2 are two jobs over the SAME lineage — the range shuffle's
    // map stage runs once and the second job reads its shuffle files
    // (skipped stage), one consistent snapshot with zero block storage.
    // (The earlier localCheckpoint held deserialized Row blocks — a
    // measured memory step past ~10M rows — and truncated lineage,
    // failing on executor loss instead of recomputing.) Offsets align
    // with rows because partition MEMBERSHIP is fixed by the shuffle
    // files; within-partition tie order may vary between passes, which
    // only permutes which tie row gets which number — the documented
    // arbitrary-ties contract. Nondeterministic sources are snapshotted
    // by the map stage unless a map task is lost between the passes
    // (the standard two-jobs-one-shuffle contract).
    val sorted = df
      .repartitionByRange(shufflePartitions, col(groupCol), orderCol)
      .sortWithinPartitions(col(groupCol), orderCol)
    val gIdx = sorted.schema.fieldIndex(groupCol)
    // pass 1: per-(partition, group) counts — partitions × groups rows
    val counts: Array[(Int, Any, Long)] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[Any, Long]()
        it.foreach { r =>
          val g = r.get(gIdx); m.update(g, m.getOrElse(g, 0L) + 1L)
          Batching.guardGroupCardinality(m.size, "withGroupRowNumber", groupCol)
        }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()
    val offsets: Map[(Int, Any), Long] = counts.groupBy(_._2).iterator
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, c) =>
          val off = acc; acc += c; ((pid, g), off)
        }
      }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[Any, Long]()
      it.map { r =>
        val g = r.get(gIdx)
        val i = local.getOrElse(g, 0L) + 1L
        local.update(g, i)
        Row.fromSeq(r.toSeq :+ (bc.value((pid, g)) + i))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** One summary row per size-bounded batch: batch_id in `orderCol` order,
    * count and id range — the per-batch accounting line the reference logs.
    */
  def sizeBatchSummary(df: DataFrame, orderCol: String, batchSize: Int): DataFrame =
    withGlobalRowNumber(df.select(col(orderCol)), col(orderCol))
      .withColumn("batch_id", floor((col("_row_number") - 1) / batchSize))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"),
        min(orderCol).as("first_id"), max(orderCol).as("last_id"))
}
