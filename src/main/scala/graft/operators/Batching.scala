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

  /** Snapshot-divergence failure for the two-jobs-one-shuffle layout
    * every two-phase operator here uses: pass 2 replayed a partition
    * whose counts differ from what pass 1 observed — the signature of a
    * lost shuffle block whose map stage was recomputed over a
    * NONDETERMINISTIC source between the passes (partition membership
    * changed, so pass-1 offsets no longer align). Without this check
    * the numbers would silently shift; with it the job fails loudly
    * and names the fix. A membership change that preserves every
    * verified count can still slip through — but such a change only
    * permutes rows within identical count profiles, i.e. the documented
    * arbitrary-tie-order contract, not a numbering error.
    */
  private[graft] def snapshotDiverged(where: String, pid: Int,
      detail: String): Nothing = throw new IllegalStateException(
    s"$where: partition $pid diverged between the two passes ($detail) — " +
      "the range shuffle's map stage was recomputed (executor or " +
      "shuffle-block loss) over a source that did not reproduce its " +
      "rows. Feed a deterministic source (any file scan qualifies), or " +
      "persist()/checkpoint() the input first.")

  /** Wrap a pass-2 partition iterator so `verify(rowsSeen)` runs exactly
    * once, at exhaustion — the cheap membership check (one counter per
    * partition) that turns silent two-pass divergence into a loud
    * failure. The hook fires when the consumer DRAINS the partition —
    * the case for writes, aggregations, joins and full collects
    * (including empty partitions: the first hasNext triggers it).
    *
    * Consumers that pull exactly n elements via `next()` with the count
    * known (copyToArray, zip against an equal-length iterator, custom
    * mapPartitions code) never make that trailing `hasNext` call — so
    * `next()` ALSO probes the underlying iterator after each pull and
    * runs the check the moment the last element leaves (hasNext is
    * idempotent by the Iterator contract, so the extra probe is safe;
    * the element is returned only after its partition verified). Full
    * consumption therefore verifies through EITHER protocol.
    *
    * WRAPPED-ITERATOR CONTRACT (the eager probe's fine print): the probe
    * calls `it.hasNext` BEFORE the consumer acts on the element just
    * returned, so wrapped iterators must yield elements that stay valid
    * across a subsequent hasNext — an adapter whose hasNext ADVANCES the
    * source (filter/takeWhile/collect views) over buffer-reusing rows
    * (InternalRow from a columnar scan) would mutate the element in the
    * consumer's hands. Every call site here wraps iterators of
    * already-copied rows (`Row.fromSeq` / deserialized objects); keep it
    * that way, or copy before wrapping. The probe also means upstream
    * hasNext runs ~twice per element — cheap for the compute-bound
    * sources this guards, but part of the cost model.
    *
    * An early-terminating consumer (`limit`/`take`/`show`/`isEmpty`
    * abandoning the iterator mid-partition, rows still remaining)
    * cannot run the check for the rows it did take — so abandonment is
    * LOUD, not best-effort: a task-completion listener fails any
    * successful task that ends with the iterator unverified AND
    * non-exhausted, naming the persist()-then-limit pattern
    * (persist materializes every partition fully — the verification
    * runs during that pass — and the limit then reads cached blocks).
    * Failed or interrupted (speculation-killed) tasks are exempt: their
    * own error wins. Every production consumer drains through a
    * shuffle, aggregation or write, so the listener only fires on the
    * unverified-limit pattern this guard exists to forbid.
    *
    * Residual case, deliberate: if a persisted-and-verified result
    * LOSES cached blocks (executor loss, MEMORY_ONLY eviction) and a
    * later limit recomputes a partition from lineage, the guard fires
    * again — correctly: the recomputed rows came from a fresh source
    * read that the original verification never saw, so their numbers
    * are exactly as unverified as the never-persisted case. Re-running
    * the persist+verify action is the recovery, and the error says so.
    */
  private[graft] def verifiedEnd[A](it: Iterator[A])(
      verify: Long => Unit): Iterator[A] = new Iterator[A] {
    private var n = 0L
    private var checked = false
    private def verifyOnce(): Unit =
      if (!checked) { checked = true; verify(n) }
    locally {
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit] { c =>
        // last-chance drain probe: a consumer that took every element
        // without a trailing hasNext (or touched an empty partition not
        // at all) IS fully consumed — verify here instead of failing.
        // Only the PROBE is guarded (at completion time the underlying
        // iterator's resources may already be torn down by
        // later-registered, earlier-run listeners; an unprobeable
        // iterator stays unverified and takes the abandonment error
        // below) — a divergence thrown by verify() itself must
        // propagate and fail the task, never be swallowed.
        if (!checked && !c.isFailed() && !c.isInterrupted()) {
          val drained =
            try !it.hasNext catch { case _: Exception => false }
          if (drained) verifyOnce()
        }
        if (!checked && !c.isFailed() && !c.isInterrupted())
          throw new IllegalStateException(
            "two-pass numbering consumed without verification: the " +
              "consumer abandoned the partition iterator before " +
              "exhaustion (limit/take/show on an unverified numbered " +
              "result). persist() or checkpoint() the numbered " +
              "DataFrame first — the full materialization runs the " +
              "divergence check — then limit the persisted result. " +
              "(If you DID persist and this still fired, a cached " +
              "partition was lost and recomputed from lineage — the " +
              "recomputed rows are unverified again; re-run the " +
              "persist-and-verify action.)")
      }
    }
    def hasNext: Boolean = {
      val h = it.hasNext
      if (!h) verifyOnce()
      h
    }
    def next(): A = {
      val a = it.next()
      n += 1
      // eager drain detection for exact-n consumers (see scaladoc): if
      // that was the last element, verify NOW — before the consumer,
      // which may never call hasNext again, acts on it
      if (!it.hasNext) verifyOnce()
      a
    }
  }

  /** Append a 1-based global row number in `orderCol` order, without a
    * single-partition window. Ties in `orderCol` are numbered arbitrarily
    * (same contract as `row_number()` over a non-unique order).
    */
  def withGlobalRowNumber(df: DataFrame, orderCol: Column,
      outCol: String = "_row_number"): DataFrame = {
    val spark = df.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // same lazy-`.rdd` discipline as withGroupRowNumber below: both
    // passes are jobs over ONE range shuffle (skipped map stage in pass
    // 2), and pass 2 re-counts each partition against pass 1's counts so
    // a between-pass recompute over a nondeterministic source fails
    // loudly instead of shifting numbers (zipWithIndex runs the same two
    // jobs but never cross-checks them)
    val sorted = df
      .repartitionByRange(shufflePartitions, orderCol)
      .sortWithinPartitions(orderCol)
    val rdd = sorted.rdd
    val counts: Array[Long] = {
      val perPart = rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; it.foreach(_ => n += 1L); Iterator((pid, n))
      }.collect().toMap
      Array.tabulate(rdd.getNumPartitions)(perPart.getOrElse(_, 0L))
    }
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = 0L
      val mapped = it.map { r =>
        i += 1L
        Row.fromSeq(r.toSeq :+ (offsets(pid) + i))
      }
      Batching.verifiedEnd(mapped)(n =>
        if (n != counts(pid))
          Batching.snapshotDiverged("withGlobalRowNumber", pid,
            s"pass 1 counted ${counts(pid)} rows, pass 2 saw $n"))
    }
    spark.createDataFrame(out, schema)
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
    // (the standard two-jobs-one-shuffle contract) — pass 2 re-checks
    // its per-(partition, group) counts against pass 1's and fails
    // loudly on divergence instead of numbering a shifted membership.
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
    // per-partition view: group -> (exclusive offset, pass-1 count) —
    // pass 2 checks its replayed counts against the pass-1 column so a
    // between-pass recompute over a nondeterministic source fails loudly
    val perPid: Map[Int, Map[Any, (Long, Long)]] = {
      val flat = counts.groupBy(_._2).iterator.flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, c) =>
          val off = acc; acc += c; (pid, g, off, c)
        }
      }.toSeq
      flat.groupBy(_._1).map { case (pid, rows) =>
        pid -> rows.map { case (_, g, off, c) => g -> (off, c) }.toMap
      }
    }
    val bc = spark.sparkContext.broadcast(perPid)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val mine = bc.value.getOrElse(pid, Map.empty[Any, (Long, Long)])
      val local = scala.collection.mutable.HashMap[Any, Long]()
      val mapped = it.map { r =>
        val g = r.get(gIdx)
        val i = local.getOrElse(g, 0L) + 1L
        local.update(g, i)
        val (off, _) = mine.getOrElse(g,
          Batching.snapshotDiverged("withGroupRowNumber", pid,
            s"group '$g' appeared in pass 2 but not in pass 1"))
        Row.fromSeq(r.toSeq :+ (off + i))
      }
      Batching.verifiedEnd(mapped) { _ =>
        if (local.size != mine.size ||
            mine.exists { case (g, (_, c)) => local.getOrElse(g, 0L) != c })
          Batching.snapshotDiverged("withGroupRowNumber", pid,
            s"pass 1 counted ${mine.size} groups/" +
              s"${mine.valuesIterator.map(_._2).sum} rows, pass 2 saw " +
              s"${local.size} groups/${local.valuesIterator.sum} rows")
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
