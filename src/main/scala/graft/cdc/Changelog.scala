package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog / CDC merge (SURVEY §2.4 C1–C7) — the heart of the Paimon
  * plugin, re-expressed relationally.
  *
  * The reference processes RowKind-tagged rows strictly in (snapshot,
  * sequence) order per bucket, batching consecutive same-kind ops and
  * flushing on transitions (`PaimonRowProcessor.java:119-183`). Because the
  * sink is keyed (upsert replaces, delete removes), the net effect of any
  * ordered op sequence on one key is decided by its LAST op — so per
  * micro-batch we can compact to one op per key with a window, which Spark
  * executes as one shuffle-by-key instead of a serial per-bucket loop. The
  * per-key ordering the reference gets from single-threaded buckets we get
  * from explicit (snapshotId, sequenceNumber) ordering columns — arrival
  * order is never relied on (SURVEY §7.4 risk 1).
  *
  * At scale: `compact` is one hash shuffle on the key; `merge` is one join
  * on the key (broadcast if the change-set is small, AQE decides); both
  * partition cleanly across 1000 executors.
  */
object Changelog {

  /** Paimon RowKind short strings (`RowKind` enum). */
  val Insert = "+I"; val UpdateBefore = "-U"
  val UpdateAfter = "+U"; val Delete = "-D"

  /** C1 — RowKind state machine: +I/+U → upsert, -D → delete, -U dropped
    * (the reference relies on `changelog-producer.row-deduplicate` and
    * skips UPDATE_BEFORE, `PaimonRowProcessor.java:126-129`); unknown kinds
    * are dropped with the same warn-and-skip semantics.
    */
  def classify(df: DataFrame, opCol: String): DataFrame =
    df.filter(col(opCol).isin(Insert, UpdateAfter, Delete))
      .withColumn("_action",
        when(col(opCol) === Delete, lit("delete")).otherwise(lit("upsert")))

  /** C2/C6 — compact an ordered changelog to the final op per key.
    * `orderCols` are the explicit ordering columns (snapshotId,
    * sequenceNumber analogs); highest wins. Ties must not exist upstream
    * (Paimon sequence numbers are unique per key); we break them
    * deterministically anyway by the full tuple.
    */
  def compact(df: DataFrame, keyCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** C4 — delete-by-key-set: remove every row of `base` whose key appears
    * in `ids` (the reference's single `TermInSetQuery` delete,
    * `PaimonRowProcessor.java:299-315`). Left-anti join ≡ NOT IN at any
    * scale.
    */
  def deleteByKeySet(base: DataFrame, keyCol: String, ids: DataFrame): DataFrame =
    base.join(ids.select(col(ids.columns.head).alias(keyCol)).distinct(),
      Seq(keyCol), "left_anti")

  /** C7 — upsert-merge a compacted changelog into a keyed snapshot:
    * re-adding a key replaces it (Lucene `updateDocument` semantics),
    * deletes remove it; keys untouched by the batch pass through.
    * Equivalent to `MERGE INTO base USING changes ON key WHEN MATCHED
    * [AND delete] DELETE / UPDATE WHEN NOT MATCHED INSERT`.
    *
    * `changes` must carry `_action` ∈ {upsert, delete} (from [[classify]])
    * and be compacted to one row per key (from [[compact]]).
    */
  def merge(base: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val payloadCols = base.columns.toSeq
    val untouched = base.join(changes.select(keyCol), Seq(keyCol), "left_anti")
    val upserts = changes.filter(col("_action") === "upsert")
      .select(payloadCols.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Full pipeline: raw RowKind stream + base snapshot → next snapshot. */
  def applyChangelog(base: DataFrame, raw: DataFrame, opCol: String,
      keyCol: String, orderCols: Seq[Column]): DataFrame =
    merge(base, compact(classify(raw, opCol), keyCol, orderCols), keyCol)

  /** SCD type-2 history build: every change event becomes a VERSION row
    * with a half-open validity interval — `valid_from` = its own order
    * key, `valid_to` = the NEXT version's (null on the current row) —
    * the "as the dimension looked at time T" table every warehouse
    * keeps next to its merged snapshot ([[merge]] gives you the latest
    * state; this keeps the whole lineage queryable:
    * `WHERE t >= valid_from AND (valid_to IS NULL OR t < valid_to)`).
    *
    * One window per key (partitioned — no global funnel): row_number
    * for the version ordinal, lead(1) for the interval close. The
    * order key must be totally ordered within a key (pass a tiebreak
    * column, the [[compact]] convention) or versions are ambiguous.
    */
  def scd2(changes: DataFrame, keyCol: String,
      orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "scd2 needs at least one order column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", orderCols.head)
      .withColumn("valid_to", lead(orderCols.head, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
