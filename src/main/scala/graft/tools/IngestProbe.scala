package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.{SparkEntry, Tables}

/** Per-leg wall-time breakdown of the bench's `ingest_pipeline` row —
  * the diagnosis tool for board-level ingest swings (the r14 driver
  * board recorded a 3.8× that no builder-side re-run reproduced; this
  * main answers "which leg grew" in one run instead of bisecting the
  * whole protocol).
  *
  * Legs, matching `Bench`'s ingest section exactly:
  *   - `changelog_scan`   — read the events changelog (source scan);
  *   - `classify_compact` — CDC classify + per-key compaction, forced
  *                          through the noop sink (pure dataflow, no
  *                          index);
  *   - `load`             — full `PipelineRunner.processBatch` into an
  *                          EMPTY index (classify/compact + keyed merge
  *                          + manifest commit + fencing);
  *   - `delta`            — a fixed 1,500-row micro-batch against the
  *                          EXISTING index (the steady-state
  *                          merge-on-read path).
  * Two passes; pass 2 is the steady-state number (Bench warm-pass
  * methodology). `load − classify_compact` isolates the sink-side
  * merge+commit cost; if a board swing reproduces here, the guilty leg
  * names the subsystem (scan → source/box, classify → dataflow, load →
  * sink commit protocol, delta → delta-log append/fencing).
  *
  * Usage: runMain graft.tools.IngestProbe [sfDir]
  */
object IngestProbe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ingest] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ingestprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (pass <- 1 to 2) {
      println(s"[ingest] ---- pass $pass ----")
      val batch = SparkEntry.eventsChangelog(spark, d)
      t("changelog_scan")(batch.count(): Unit)
      t("classify_compact") {
        graft.cdc.Changelog
          .compact(graft.cdc.Changelog.classify(batch, "op"), "user_id",
            Seq(col("ts_us"), col("event_id")))
          .write.format("noop").mode("overwrite").save()
      }
      val dir = SparkEntry.tempDir("ingest-probe")
      val sink = new graft.sink.ParquetIndexSink(spark, dir)
      val runner = new graft.runtime.PipelineRunner(
        graft.config.PipelineConfig(indexName = "probe-idx"), sink)
      val docs = t("load")(runner.processBatch(batch, "op", "user_id",
        Seq(col("ts_us"), col("event_id"))))
      val delta = t("delta")(runner.processBatch(batch.limit(1500), "op",
        "user_id", Seq(col("ts_us"), col("event_id"))))
      println(s"[ingest] docs=$docs delta_docs=$delta")
      SparkEntry.drainTempDirs()
    }
    spark.stop()
  }
}
