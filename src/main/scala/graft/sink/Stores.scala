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
