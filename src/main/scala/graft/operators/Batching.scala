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
