package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.sink._

/** Operator CLI for the fenced stores — the executable form of the
  * README runbook. Safe by default: with no `--takeover` flag every
  * action is STRICTLY READ-ONLY (store health stats; for the document
  * sink a `vacuum(dryRun = true)` pre-flight listing what retention
  * would delete), and the epoch ledger is never touched — so running
  * this against a LIVE store can never fence its writer.
  *
  * `--takeover` is the deliberate mutation switch: it acknowledges the
  * single writer is STOPPED, and the tool then claims the store exactly
  * like a writer restart (acquiring a fresh epoch — which fences any
  * zombie still holding the old one, the protocol working as designed).
  * Without the flag a mutating action is refused with the runbook
  * pointer, which makes the accidental zombie-maker shape — a second
  * JVM vacuuming a live store — unreachable from this entry point.
  *
  * Usage:
  *   runMain graft.tools.Maintenance <kind> <dir> [keep] [--takeover]
  * where kind ∈ sink | postings | vector | signature | geo | stats and
  * `keep` is keepVersions (sink) / keepGenerations (stores), default 1.
  */
object Maintenance {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val takeover = args.contains("--takeover")
    require(pos.length >= 2,
      "usage: Maintenance <sink|postings|vector|signature|geo|stats> " +
        "<dir> [keep] [--takeover]")
    val (kind, dir) = (pos(0), pos(1))
    val keep = pos.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, kind, dir, keep, takeover)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, kind: String, dir: String,
      keep: Int, takeover: Boolean): Unit = kind match {
    case "sink" =>
      val sink = new ParquetIndexSink(spark, dir)
      val r = sink.vacuum(keep, dryRun = !takeover)
      val verb = if (r.dryRun) "WOULD delete (dry run)" else "deleted"
      println(s"[maintenance] sink $dir retained=${r.retainedVersions
        .mkString(",")} $verb: ${r.dataDirs.size} data dirs, " +
        s"${r.deltaDirs.size} delta dirs, ${r.manifests.size} manifests, " +
        s"${r.commitDirs.size} emptied commit dirs")
      (r.dataDirs ++ r.deltaDirs ++ r.manifests ++ r.commitDirs).foreach(p =>
        println(s"[maintenance]   $p"))
      if (r.dryRun) println(refusal("vacuum"))
    case k =>
      // store health is always safe to print
      Stores.stats(spark, k, dir).show(truncate = false)
      if (takeover) {
        Stores.compact(spark, k, dir, keep)
        println(s"[maintenance] $k $dir compacted (keepGenerations=$keep)")
      } else println(refusal("compact"))
  }

  private def refusal(action: String): String =
    s"[maintenance] read-only: pass --takeover to $action. That claims " +
      "the store like a writer restart — STOP the live writer first, or " +
      "it will be fenced (README: 'Operating the fenced stores')."
}
