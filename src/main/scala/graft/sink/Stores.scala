package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One dispatcher for the five persisted incremental stores, keyed by the
  * operator-facing kind names the [[graft.tools.Maintenance]] CLI and
  * [[graft.runtime.PipelineRunner]] share. Exists so retention has exactly
  * one code path from a configured `keepGenerations` to each store's
  * `compact` (and from there to `DeltaLog.installBase`) — a config knob
  * with two hand-rolled dispatch copies is how one of them goes stale.
  */
object Stores {
  val Kinds: Seq[String] = Seq("postings", "vector", "signature", "geo", "stats")

  /** Read-only health frame for `kind` at `dir`. */
  def stats(spark: SparkSession, kind: String, dir: String): DataFrame =
    kind match {
      case "postings" => IncrementalPostings.stats(spark, dir)
      case "vector" => VectorIndex.stats(spark, dir)
      case "signature" => SignatureStore.stats(spark, dir)
      case "geo" => GeoIndex.stats(spark, dir)
      case "stats" => StatsStore.stats(spark, dir)
      case other => throw new IllegalArgumentException(
        s"unknown store kind '$other' (expected one of ${Kinds.mkString(", ")})")
    }

  /** Pending (un-folded) commit count for `kind` at `dir` — one
    * metadata listing of the store's commit log, cheap enough to probe
    * between every batch. The paths/tags mirror each store's own
    * `commitSeqs`/`deltaSeqs` helper.
    */
  def pendingCommits(spark: SparkSession, kind: String, dir: String): Int =
    kind match {
      case "postings" =>
        DeltaLog.listSeqs(spark, s"$dir/deltas", Some("docs")).length
      case "vector" | "signature" | "geo" =>
        DeltaLog.listSeqs(spark, s"$dir/commits", Some("docs")).length
      case "stats" =>
        DeltaLog.listSeqs(spark, s"$dir/commits", Some("stats")).length
      case other => throw new IllegalArgumentException(
        s"unknown store kind '$other' (expected one of ${Kinds.mkString(", ")})")
    }

  /** Threshold-gated compaction — the dispatch twin of each store's
    * `maybeCompact` hook, for callers holding only a (kind, dir) pair
    * ([[graft.runtime.PipelineRunner.maintain]]). An EMPTY commit log
    * never compacts: folding nothing would still burn a generation
    * number and rewrite the full base, so back-to-back maintenance with
    * no intervening appends is a metadata-only no-op. With pending
    * commits, the store's own policy decides (depth > `maxDeltas`;
    * postings additionally folds on its touched-docs fraction) —
    * `maxDeltas = 0` therefore means "fold whenever anything is
    * pending", the amortization-free per-batch posture. Returns whether
    * a compaction ran.
    */
  def maybeCompact(spark: SparkSession, kind: String, dir: String,
      maxDeltas: Int = 0, keepGenerations: Int = 1): Boolean = {
    if (pendingCommits(spark, kind, dir) == 0) false
    else kind match {
      case "postings" => IncrementalPostings.maybeCompact(spark, dir,
        maxDeltas = maxDeltas, keepGenerations = keepGenerations)
      case "vector" => VectorIndex.maybeCompact(spark, dir, maxDeltas,
        keepGenerations)
      case "signature" => SignatureStore.maybeCompact(spark, dir, maxDeltas,
        keepGenerations)
      case "geo" => GeoIndex.maybeCompact(spark, dir, maxDeltas,
        keepGenerations)
      case "stats" => StatsStore.maybeCompact(spark, dir, maxDeltas,
        keepGenerations)
      case other => throw new IllegalArgumentException(
        s"unknown store kind '$other' (expected one of ${Kinds.mkString(", ")})")
    }
  }

  /** Fold `kind`'s pending commits into a fresh sealed base generation,
    * keeping `keepGenerations` previous generations alive for in-flight
    * readers (the reader-lease bound — see `DeltaLog.installBase`). A
    * MUTATION: resolves this JVM's session epoch for `dir` (or acquires
    * one), so calling from a second JVM against a live writer fences it.
    */
  def compact(spark: SparkSession, kind: String, dir: String,
      keepGenerations: Int): Unit = kind match {
    case "postings" => IncrementalPostings.compact(spark, dir, keepGenerations)
    case "vector" => VectorIndex.compact(spark, dir, keepGenerations)
    case "signature" => SignatureStore.compact(spark, dir, keepGenerations)
    case "geo" => GeoIndex.compact(spark, dir, keepGenerations)
    case "stats" => StatsStore.compact(spark, dir, keepGenerations)
    case other => throw new IllegalArgumentException(
      s"unknown store kind '$other' (expected one of ${Kinds.mkString(", ")})")
  }
}
