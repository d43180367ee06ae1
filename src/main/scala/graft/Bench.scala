package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` datasource sink — unlike
  * `.count()`, which lets Catalyst prune every projected column and skip
  * the actual operator work, noop fully evaluates each output row.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional arg: comma-separated query names — bench only those (the
    // Verify filter convention; used to re-run an old round's query list
    // in a fresh JVM when bisecting board-size vs per-query regressions)
    val only: Option[Set[String]] =
      if (args.nonEmpty && args(0).nonEmpty) Some(args(0).split(",").toSet)
      else None
    def selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      // The Janino compiled-class cache defaults to 100 entries; a
      // 250-query board × 3 passes thrashes it (every pass recompiles
      // nearly every codegen stage — the "board-size JVM pressure" that
      // inflated common-row medians ~13% r6→r7). Sized to hold the
      // whole board's stages, the warm passes re-run the classes the
      // cold pass compiled, so per-query cost stops tracking board
      // size. Static conf: must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the post-query block release (SparkEntry.drainTempDirs) unpersists
    // locally-checkpointed RDDs by design — every release logs a WARN
    // ("lineage truncated ... cannot be recomputed"); thousands of them
    // per board are pure log noise (nothing reads a drained RDD)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    // Session-shared dedup-family frames, run as an EXPLICIT timed board
    // row at the start of every pass (r17 verdict item 2): the frames
    // are computed once per pass and the gates that consume them read
    // the parquet copy, so the construction cost must appear in the
    // reported board total — previously the cold pass paid it invisibly
    // inside whichever consumer ran first and the warm totals understated
    // the declared work. Consumers: x_dedup_ngram, x_dedup_minhash,
    // x_dedup_edit, x_dedup_eval, x_dedup_prefix_filter,
    // x_dedup_clusters (+cluster-label gates), x_dedup_embed_pruned,
    // x_dedup_embed_clusters, x_dedup_containment.
    def framesRow(): (String, Double) = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.resetSharedFrames()
        SparkEntry.buildSharedFrames(spark, sfDir)
        "shared_frames_build" -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(
            s"[bench] shared_frames_build failed: ${e.getMessage}")
          "shared_frames_build" -> -1.0
      } finally SparkEntry.drainTempDirs()
    }
    val runFrames = only.forall(_.contains("shared_frames_build"))
    def framesLeg(): Seq[(String, Double)] =
      if (runFrames) Seq(framesRow()) else Seq.empty

    // Cold pass: build + plan + execute each query end-to-end through the
    // noop sink (what a first-time user pays, incl. analysis + codegen).
    val cold: Seq[(String, Double)] =
      framesLeg() ++ selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0 // failure marker: never report a crash as a speedup
        } finally SparkEntry.drainTempDirs() // outside the timer: dead index bytes must not pile up across 155×3 passes
      }

    // Warm pass: build + execute with the codegen/JIT/file-listing caches
    // primed by the cold pass. Construction stays INSIDE the timer —
    // queries with eager driver-side phases (IVF training, label
    // propagation) do real work there; executing via the planned physical
    // RDD avoids the noop-command re-analysis that otherwise adds a flat
    // ~0.4s/query unrelated to data size. Two passes, min per query: the
    // box's noise spikes (GC, neighbors) hit single runs at ±30%; min-of-2
    // is the standard steady-state estimator and stays honest (every
    // reported time was actually achieved end-to-end).
    def warmPass(): Seq[(String, Double)] =
      framesLeg() ++ selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.foreachPartition(
            (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
              while (it.hasNext) it.next())
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0
        } finally SparkEntry.drainTempDirs()
      }
    // pass-boundary block release (r18, verdict item 4): bound the
    // localCheckpoint block accumulation at one pass — see
    // SparkEntry.releaseCheckpointBlocks for why not per-query
    SparkEntry.releaseCheckpointBlocks()
    val results: Seq[(String, Double)] = {
      val p1 = warmPass()
      SparkEntry.releaseCheckpointBlocks()
      val p2 = warmPass()
      SparkEntry.releaseCheckpointBlocks()
      p1.zip(p2).map {
        case ((name, a), (_, b)) =>
          // a failure in either pass stays a failure, never a "fast" -1
          name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
      }
    }

    // End-to-end ingest pipeline (BASELINE.md bench plan): changelog →
    // classify/compact → keyed sink merge + commit, reporting docs/sec
    // like the reference's throughput instrumentation.
    val (ingestSecs, ingestDocs, deltaSecs, deltaDocs) =
      try {
        import org.apache.spark.sql.functions.col
        def oneBatch(): (Double, Long, Double, Long) = {
          val dir = SparkEntry.tempDir("bench-index")
          val sink = new graft.sink.ParquetIndexSink(spark, dir)
          val runner = new graft.runtime.PipelineRunner(
            graft.config.PipelineConfig(indexName = "bench-idx"), sink)
          val t0 = System.nanoTime()
          val docs = runner.processBatch(SparkEntry.eventsChangelog(spark, sfDir),
            "op", "user_id", Seq(col("ts_us"), col("event_id")))
          val loadSecs = (System.nanoTime() - t0) / 1e9
          // steady-state micro-batch against the EXISTING index: the
          // merge-on-read path (O(batch) delta append, no bucket rewrite)
          val t1 = System.nanoTime()
          val docs2 = runner.processBatch(
            SparkEntry.eventsChangelog(spark, sfDir).limit(1500),
            "op", "user_id", Seq(col("ts_us"), col("event_id")))
          (loadSecs, docs, (System.nanoTime() - t1) / 1e9, docs2)
        }
        // warm pass first (same methodology as the query warm pass): a real
        // pipeline commits thousands of micro-batches, so steady-state —
        // codegen/JIT primed — is the honest throughput number. Then
        // MIN-OF-2 over two warm runs, exactly like the query rows: the
        // r14 driver board recorded ingest_pipeline at 3.8× its band off
        // a single warm sample on a loaded box (four same-binary re-runs
        // read 1,415–1,901 docs/s) — one noise spike must not be the
        // round's recorded ingest number when every query row already
        // gets the min-of-2 treatment.
        oneBatch()
        val a = oneBatch()
        val b = oneBatch()
        // each leg picks its own (secs, docs) PAIR by that leg's time —
        // the delta batch is an unordered limit(1500), so the two runs can
        // compact to different doc counts; min-ing seconds across runs
        // while keeping the other run's count would mix run A's docs with
        // run B's time in the docs/s division
        val (ls, ld) = if (a._1 <= b._1) (a._1, a._2) else (b._1, b._2)
        val (ds, dd) = if (a._3 <= b._3) (a._3, a._4) else (b._3, b._4)
        (ls, ld, ds, dd)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ingest_pipeline failed: ${e.getMessage}")
          (-1.0, 0L, -1.0, 0L)
      } finally SparkEntry.drainTempDirs()

    // Per-query values are rounded to milliseconds: the driver captures
    // only the LAST 2000 chars of sbt stdout, and full-precision doubles
    // pushed the round-2 line past that window (its opening brace was
    // truncated → BENCH_r02 "parsed": null). ms precision keeps the whole
    // line ≈1.5 KB, comfortably inside the window alongside sbt's
    // "[success]" footer; bench noise is ±30% so nothing is lost.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = (results :+ ("ingest_pipeline" -> ingestSecs))
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // failure markers (-1) must not SHRINK the totals — exclude them and
    // surface the count instead (a query failing in EITHER pass counts)
    val failed = ((results ++ cold).filter(_._2 < 0).map(_._1).toSet ++
      (if (ingestSecs < 0) Set("ingest_pipeline") else Set.empty)).size
    val total = results.map(_._2).filter(_ >= 0).sum + math.max(ingestSecs, 0)
    val coldTotal = cold.map(_._2).filter(_ >= 0).sum
    val ingestRate = if (ingestSecs > 0) ingestDocs / ingestSecs else 0.0
    val deltaRate = if (deltaSecs > 0) deltaDocs / deltaSecs else 0.0
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","cold_total":${r3(coldTotal)},"ingest_docs":$ingestDocs,"ingest_docs_per_sec":${r3(ingestRate)},"ingest_delta_docs_per_sec":${r3(deltaRate)},"failed_queries":$failed}"""
    System.err.println(line) // second channel in case stdout is decorated
    println(line) // full contract line, per-query map included
    // The driver scrapes only the LAST ~2000 stdout chars; at 360+
    // queries the full line is ~8 KB, so its opening brace falls outside
    // the window (every BENCH_rNN so far carries "parsed": null). Emit a
    // window-sized twin LAST — same schema; the per-query map is
    // inlined when it fits the window (filtered bisect runs) and
    // otherwise lives in the full line above plus the cpus-keyed pointer
    // file. r18: stdout is no longer [info]-decorated (build.sbt
    // run/outputStrategy := StdoutOutput — the round-1 parse breaker),
    // so this last line is bare JSON the driver can json-parse, and the
    // pointer file is keyed by the core count so the low-core scaling
    // run can never clobber the 32-core map (the r17 failure).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"bench_out_c$cpus.json")
    val qsCompact = if (qs.length <= 1300) qs else "{}"
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsCompact,"queries_in":"$outFile","n_queries":${results.size},"cpus":$cpus,"sf":"$sfDir","cold_total":${r3(coldTotal)},"ingest_docs":$ingestDocs,"ingest_docs_per_sec":${r3(ingestRate)},"ingest_delta_docs_per_sec":${r3(deltaRate)},"failed_queries":$failed}"""
    println(compact)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch {
      case e: Throwable => System.err.println(s"[bench] file write failed: $e")
    }
    spark.stop()
  }
}
