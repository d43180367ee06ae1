package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Changelog

/** The sink contract the reference engine drives (SURVEY §2.6): exactly
  * four operations against a keyed index —
  * `addDocuments` (upsert by `_id`), `commit`, `deleteByQuery`
  * (key-set delete), and the `_id` field definition.
  *
  * Implementations must make re-adding an existing `_id` replace the old
  * document (Lucene `updateDocument` semantics — E2E-asserted by the
  * reference: final version wins across snapshots, INSERT→DELETE→INSERT
  * leaves exactly one doc). That upsert idempotence is what makes
  * at-least-once replay safe (SURVEY §7.4 risk 3).
  */
trait IndexSink {
  def idField: String = "_id"

  /** Upsert a batch of documents keyed by [[idField]]. Returns a
    * monotonically increasing sequence number (reference: Lucene seqnum).
    */
  def addDocuments(docs: DataFrame): Long

  /** Delete every document whose id is in the set (TermInSetQuery). */
  def deleteByIds(ids: Seq[String]): Unit

  /** Delete by a distributed key set — the scale path for unbounded
    * delete batches (no driver materialization). Default falls back to
    * the bounded-id form; MERGE-capable sinks override with an anti-join.
    */
  def deleteByKeys(ids: DataFrame): Unit = {
    val c = ids.columns.head
    // drop null keys: String.valueOf(null) would delete a document whose
    // id is literally "null"
    deleteByIds(ids.select(c).filter(col(c).isNotNull).distinct()
      .collect().map(r => String.valueOf(r.get(0))).toSeq)
  }

  /** Make all preceding adds/deletes durable + visible. */
  def commit(): Unit

  /** Current committed view of the index. */
  def searchable(): DataFrame
}

/** Driver-side keyed store for tests: a plain map guarded by a lock.
  * Mirrors the reference's E2E in-process index. NOT a scale path — the
  * scale path is [[ParquetIndexSink]] / any MERGE-capable table format.
  */
final class InMemoryIndexSink(spark: SparkSession, schema: org.apache.spark.sql.types.StructType)
    extends IndexSink {
  private val store = scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.Row]()
  private var committed: Seq[org.apache.spark.sql.Row] = Nil
  private var seq = 0L

  override def addDocuments(docs: DataFrame): Long = synchronized {
    val idIdx = docs.schema.fieldIndex(idField)
    docs.collect().foreach { r => store(r.getString(idIdx)) = r; seq += 1 }
    seq
  }
  override def deleteByIds(ids: Seq[String]): Unit = synchronized {
    ids.foreach(store.remove)
  }
  override def commit(): Unit = synchronized { committed = store.values.toSeq }
  override def searchable(): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(committed.toList), schema)
}

/** Scale-path sink: a parquet directory versioned by commit, updated with
  * the relational MERGE from [[Changelog]]. Each `commit()` writes the next
  * version atomically (write-new-then-repoint), so a failed/replayed
  * micro-batch never corrupts the committed view — the same
  * commit-after-index contract as the reference's checkpoint protocol.
  */
class ParquetIndexSink(spark: SparkSession, path: String)
    extends IndexSink {
  /** Pending operations in CALL ORDER — a delete issued after an upsert
    * of the same key must win, exactly like the serial index the
    * reference drives (an earlier draft folded all deletes before all
    * upserts, silently resurrecting add-then-delete keys).
    */
  private sealed trait Op
  private case class Upsert(df: DataFrame) extends Op
  private case class DeleteIds(ids: Seq[String]) extends Op
  private case class DeleteKeys(ids: DataFrame) extends Op

  private var ops: Vector[Op] = Vector.empty
  private var seq = 0L

  private def versionFile = new java.io.File(path, "_VERSION")
  private def currentVersion: Long =
    if (versionFile.exists)
      new String(java.nio.file.Files.readAllBytes(versionFile.toPath)).trim.toLong
    else -1L

  override def addDocuments(docs: DataFrame): Long = synchronized {
    ops :+= Upsert(docs)
    seq += 1; seq
  }
  override def deleteByIds(ids: Seq[String]): Unit = synchronized {
    ops :+= DeleteIds(ids)
  }
  override def deleteByKeys(ids: DataFrame): Unit = synchronized {
    ops :+= DeleteKeys(ids)
  }

  override def commit(): Unit = synchronized {
    val firstUpsert = ops.collectFirst { case Upsert(df) => df }
    val base =
      if (currentVersion >= 0) searchable()
      else firstUpsert match {
        case Some(u) => u.limit(0) // first commit: empty base w/ doc schema
        case None => return // nothing committed yet, nothing pending
      }
    val next = ops.foldLeft(base) {
      case (acc, Upsert(df)) =>
        // last add per _id wins inside one batch
        val compacted = Changelog.compact(
          df.withColumn("_seq", monotonically_increasing_id()),
          idField, Seq(col("_seq"))).drop("_seq")
        acc.join(compacted.select(idField), Seq(idField), "left_anti")
          .unionByName(compacted)
      case (acc, DeleteIds(ids)) =>
        if (ids.isEmpty) acc else acc.filter(!col(idField).isin(ids: _*))
      case (acc, DeleteKeys(ids)) =>
        Changelog.deleteByKeySet(acc, idField, ids)
    }
    val v = currentVersion + 1
    next.write.mode("overwrite").parquet(s"$path/v$v")
    java.nio.file.Files.write(versionFile.toPath, v.toString.getBytes)
    ops = Vector.empty
  }

  override def searchable(): DataFrame = {
    val v = currentVersion
    if (v < 0)
      throw new IllegalStateException(s"index at $path has no committed version")
    spark.read.parquet(s"$path/v$v")
  }
}
