package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe main: measures wall-time-vs-rows curves for the
  * scale-sensitive operator families, so the 100 TB design claims in
  * SCALING.md rest on MEASURED exponents, not plan shape alone.
  *
  * The driver-provided testdata is read-only and capped at sf0.1, so
  * the probe self-generates N× corpora in a scratch dir: documents are
  * replicated with salted ids and a per-replica suffix token (distinct
  * texts — replicas are near-dups of the base, not exact dups, so LSH
  * bucket occupancy grows the way a real corpus's does); embeddings
  * get a deterministic per-replica component perturbation. Everything
  * is written to parquet first — timed paths run against real file
  * scans with real pruning, not in-memory lineage.
  *
  * Per family it times the BUILD leg (one-time index construction —
  * allowed to scale linearly) and the SERVE leg (the recurring path —
  * the one whose exponent the 100 TB claims are about) at each scale,
  * prints one markdown table plus per-family least-squares exponents
  * of log(time) vs log(scale), and one machine-readable JSON line.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <scratchDir> [scales]
  * (default scales "1,2,5,10").
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Least-squares slope of log(t) vs log(n) — the scaling exponent. */
  private def exponent(pts: Seq[(Int, Double)]): Double = {
    val xs = pts.map(p => math.log(p._1.toDouble))
    val ys = pts.map(p => math.log(p._2))
    val mx = xs.sum / xs.size
    val my = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    if (den == 0) 0.0 else num / den
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(1).getOrElse("/tmp/graft_scaleprobe")
    val scales = args.lift(2).getOrElse("1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    // optional family filter, e.g. "pq,ivf_index" — re-measure one
    // family after an optimization without re-running the board
    val familyFilter: Option[Set[String]] =
      args.lift(3).map(_.split(",").map(_.trim).toSet)
    def famOn(f: String): Boolean = familyFilter.forall(_.contains(f))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .appName("graft-scaleprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val baseDocs = Tables.documents(spark, sfDir)
    val baseEmb = Tables.embeddings(spark, sfDir)
    val baseCl = SparkEntry.eventsChangelog(spark, sfDir)
    val docStride = baseDocs.agg(max("doc_id")).head().getLong(0) + 1
    val embStride = baseEmb.agg(max("vec_id")).head().getLong(0) + 1
    val clStrides = baseCl.agg(max("event_id"), max("user_id")).head()
    val evStride = clStrides.getLong(0) + 1
    val usStride = clStrides.getLong(1) + 1

    // ---- N× corpus generation (untimed) ------------------------------
    def docsPath(n: Int) = s"$scratch/docs_x$n"
    def embPath(n: Int) = s"$scratch/emb_x$n"
    def clPath(n: Int) = s"$scratch/changelog_x$n"
    scales.foreach { n =>
      val reps = spark.range(n).toDF("rep")
      baseDocs.crossJoin(reps)
        .select((col("doc_id") + col("rep") * docStride).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"),
              col("rep").cast("string"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(docsPath(n))
      baseEmb.crossJoin(reps)
        .select((col("vec_id") + col("rep") * embStride).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + (pmod(col("rep") * 31 + i, lit(97)).cast("double") - 48.0)
              * 1e-4).cast("float")).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(embPath(n))
      // changelog replicas for the INGEST family: salt BOTH the event
      // id (row identity) and the user id (the CDC merge key), so key
      // cardinality grows with the corpus the way a real table's does
      baseCl.crossJoin(reps)
        .withColumn("event_id", col("event_id") + col("rep") * evStride)
        .withColumn("user_id", col("user_id") + col("rep") * usStride)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(clPath(n))
    }
    def docsAt(n: Int) = spark.read.parquet(docsPath(n))
    def embAt(n: Int) = spark.read.parquet(embPath(n))

    // fixed-size probe batch: near-dups of the base docs, ids beyond
    // every scaled corpus (batch size is CONSTANT across scales — the
    // incremental claims are about corpus-size independence)
    val probeBatch = baseDocs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + lit(100L * docStride)).as("doc_id"),
        concat(col("text"), lit(" probe")).as("text"))
    val queryVecs = baseEmb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    // the pure-projection text family probed on BOTH axes (corpus rows
    // and per-doc token count) — interpreted-HOF cost bugs are
    // doc-length-superlinear and corpus-linear, so they only show on
    // the second axis. bpe merge table = the x_bpe_apply fixture.
    val probeMerges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
      ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"))
    val textOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "winnow" -> (df => operators.Dedup.winnowingFingerprints(
        df, "doc_id", "text")),
      "mask" -> (df => operators.Corpus.maskTokens(
        df, "doc_id", "text", 150)),
      "bpe_apply" -> (df => df.select(col("doc_id"),
        size(functions.TextExpressions.bpeTokens(
          lower(col("text")), probeMerges)).as("n_tokens"))),
      "chunk" -> (df => operators.Corpus.chunk(
        df, "doc_id", "text", chunkSize = 50, overlap = 10)),
      "pack" -> (df => operators.Corpus.packSequences(
        df, "doc_id", "text", 512L)),
      "mask_spans" -> (df => operators.Corpus.maskSpans(
        df, "doc_id", "text", permille = 300)),
      "dup_spans" -> (df => operators.Dedup.duplicateSpans(
        df, "doc_id", "text", k = 5)))

    // (family, leg, scale) -> seconds
    val results = collection.mutable.LinkedHashMap[(String, String),
      collection.mutable.LinkedHashMap[Int, Double]]()
    var warmingUp = true
    def record(family: String, leg: String, n: Int, secs: Double): Unit =
      if (warmingUp) println(f"[probe] warmup $family/$leg ${secs}%8.2f s")
      else {
        results.getOrElseUpdate((family, leg),
          collection.mutable.LinkedHashMap[Int, Double]()) += (n -> secs)
        println(f"[probe] $family/$leg x$n%-3d ${secs}%8.2f s")
      }

    // one untimed pass at the smallest scale first: JIT/codegen/
    // file-listing warm-up, so the x1 column measures the operator,
    // not first-touch compilation (the Bench warm-pass methodology)
    def runScale(n: Int): Unit = {
      val docsN = docsAt(n)
      val embN = embAt(n)

      // ---- SignatureStore: build linear, probe/append O(batch) -------
      if (famOn("signature_store")) locally {
        val dir = s"$scratch/sigstore_x$n"
        val (_, tBuild) = time {
          sink.SignatureStore.write(docsN, "doc_id", "text", dir)
        }
        record("signature_store", "build", n, tBuild)
        val (_, tProbe) = time {
          sink.SignatureStore.probe(probeBatch, dir,
            maxBucketOccupancy = 64).count()
        }
        record("signature_store", "probe", n, tProbe)
        val (_, tAppend) = time {
          sink.SignatureStore.append(probeBatch, dir)
        }
        record("signature_store", "append", n, tAppend)
      }

      // ---- Prefix-filtering exact Jaccard join (All-Pairs family) ----
      // NOTE on reading the exponent: probe replicas are near-dups of
      // the base BY DESIGN, so the qualifying-pair OUTPUT grows ~n² per
      // family as scale grows — any complete join (this one, LSH+verify,
      // or the naive baseline) pays that output floor here. The signal
      // is the gap to the naive all-shingle join, probed once at x1.
      if (famOn("prefix_filter")) locally {
        val (c, tJoin) = time {
          operators.Dedup.prefixFilterJoin(
            docsN, "doc_id", "text", 3, 0.8).count()
        }
        record("prefix_filter", "join", n, tJoin)
        if (!warmingUp) println(s"[probe] prefix_filter x$n pairs=$c")
      }

      // ---- IVF serving: probed-cells scan (nProbe/k of the corpus) ---
      if (famOn("ivf_index")) locally {
        val dir = s"$scratch/ivf_x$n"
        val (_, tBuild) = time {
          sink.VectorIndex.write(embN, "vec_id", "embedding", dir,
            k = 32, iters = 2)
        }
        record("ivf_index", "build", n, tBuild)
        val (_, tServe) = time {
          sink.VectorIndex.knnSearch(spark, dir, queryVecs, "qid", "qv",
            k = 10, nProbe = 4).count()
        }
        record("ivf_index", "serve", n, tServe)
      }

      // ---- PQ: fused subspace training + ADC serve over codes --------
      if (famOn("pq")) locally {
        val dim = baseEmb.select(size(col("embedding"))).head().getInt(0)
        val (model, tFit) = time {
          operators.Pq.fit(embN, "vec_id", "embedding", dim,
            m = 8, codebookSize = 16, iters = 2)
        }
        record("pq", "fit", n, tFit)
        val (_, tServe) = time {
          operators.Pq.knnJoin(embN, "vec_id", "embedding",
            queryVecs, "qid", "qv", model, k = 10, rescoreK = 50).count()
        }
        record("pq", "serve", n, tServe)
      }

      // ---- GeoIndex knnJoin (DataFrame form, the shared path) --------
      if (famOn("geo_index")) locally {
        val pts = docsN.select("doc_id")
          .withColumn("lat",
            (col("doc_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
          .withColumn("lon",
            (col("doc_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
        val dir = s"$scratch/geo_x$n"
        val (_, tBuild) = time {
          sink.GeoIndex.write(pts, "doc_id", "lat", "lon", dir,
            cellDeg = 15.0)
        }
        record("geo_index", "build", n, tBuild)
        // fixed ~50-center batch from the base id range
        val centers = pts.filter(col("doc_id") < docStride &&
            col("doc_id") % 101 === 0)
          .select(col("doc_id").as("center_id"), col("lat"), col("lon"))
        val (_, tServe) = time {
          sink.GeoIndex.knnJoin(spark, dir, centers,
            "center_id", "lat", "lon", k = 5).count()
        }
        record("geo_index", "knn_join", n, tServe)
      }

      // ---- Pruned embedding dedup (IVF cells + triangle prune) -------
      if (famOn("embed_dedup_pruned")) locally {
        val (_, tAll) = time {
          operators.Dedup.embeddingCosinePairsPruned(embN, "vec_id",
            "embedding", threshold = 0.92, k = 16, iters = 2).count()
        }
        record("embed_dedup_pruned", "fit_and_pairs", n, tAll)
      }

      // ---- Text projections (corpus axis): pure per-row ops ----------
      // time-vs-ROWS must be ~1.0; evaluation forced through the noop
      // sink (a count() would let Catalyst prune the projection away)
      if (famOn("text_proj")) locally {
        textOps.foreach { case (leg, op) =>
          val (_, t) = time {
            op(docsN).write.format("noop").mode("overwrite").save()
          }
          record("text_proj", leg, n, t)
        }
      }

      // ---- BPE training (corpus axis): per-round cost is vocab-sized,
      // round count is corpus-INDEPENDENT — the batched trainer must
      // track the sequential one in time-per-round while cutting the
      // round count on the same corpus (both train the same 8 merges)
      if (famOn("bpe_train")) locally {
        val (seqOut, tSeq) = time {
          operators.TextAnalysis.learnBpeMergesWithStats(
            docsN, "text", nMerges = 8, batchSize = 1)
        }
        record("bpe_train", "seq", n, tSeq)
        val (batOut, tBat) = time {
          operators.TextAnalysis.learnBpeMergesWithStats(
            docsN, "text", nMerges = 8, batchSize = 8)
        }
        record("bpe_train", "batched", n, tBat)
        if (!warmingUp) {
          require(batOut._1 == seqOut._1,
            s"batched BPE diverged from sequential at x$n")
          println(f"[probe] bpe_train/rounds x$n%-3d " +
            s"seq=${seqOut._2} batched=${batOut._2}")
        }
      }

      // ---- Binary-quantized serving: Hamming shortlist + rescore ----
      // the corpus pass reads one long per vector; serve time should
      // stay near-flat until the popcount scan itself dominates
      if (famOn("binary_knn")) locally {
        val (_, t) = time {
          operators.Similarity.binaryTopK(embN, "vec_id", "embedding",
            dim = 64, queryId = 0L, rerank = 20, k = 10).count()
        }
        record("binary_knn", "serve", n, t)
      }

      // ---- Random projection: pure per-row unrolled chains ----------
      if (famOn("projection")) locally {
        val (_, t) = time {
          operators.Similarity.randomProjection(embN, "vec_id",
              "embedding", inDim = 64, outDim = 16)
            .write.format("noop").mode("overwrite").save()
        }
        record("projection", "project", n, t)
      }

      // ---- Fuzzy linkage: blocked JW scoring, never all-pairs --------
      // names whose blocking-key cardinality grows WITH the corpus (the
      // realistic regime: more records, more distinct names): groups of
      // 4 ids share an md5-derived name, each copy perturbed in its
      // last character — block sizes stay group-sized at every scale,
      // so candidates AND output grow ∝ rows and time-vs-rows must be
      // ~1.0. (A fixed-cardinality key would make candidates quadratic
      // by construction — a data property the operator cannot fix, the
      // standard blocking trade documented on fuzzyLinkage.)
      if (famOn("linkage")) locally {
        val grp = floor(col("doc_id") / 4).cast("long").cast("string")
        val names = docsN.select(col("doc_id"),
          concat(substring(md5(grp), 1, 16), lit(" "),
            substring(md5(concat(lit("s"), grp)), 1, 10),
            substring(md5(col("doc_id").cast("string")), 1, 1)).as("nm"))
        val (_, t) = time {
          operators.Dedup.fuzzyLinkage(names, "doc_id", "nm",
            threshold = 0.9, blockLen = 8).count()
        }
        record("linkage", "pairs", n, t)
      }

      // ---- Star connected components: rounds ~ log(diameter) ---------
      // one chain per 1000 ids (diameter 999 — label propagation would
      // need 999 rounds at ANY scale); rows grow ×n while round count
      // stays ~log-flat, so time-vs-rows must stay near-linear and
      // never diameter-bound
      if (famOn("cc_star")) locally {
        val idsN = docsN.select("doc_id")
        val chain = idsN.filter(pmod(col("doc_id"), lit(1000)) =!= 999)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        val (_, t) = time {
          operators.Dedup.connectedComponentsStar(chain, idsN).count()
        }
        record("cc_star", "chain_label", n, t)
      }

      // ---- sessionizeSpread on the ROWS axis -------------------------
      // the KEY-SKEW axis (share grid below) pinned spread FLAT vs hot
      // share; this leg pins it ~linear vs ROWS at a fixed 8% hot share
      // — the rung that turns "flat at one size" into "holds across
      // decades of corpus growth"
      if (famOn("session_rows")) locally {
        val rows = 500000L * n
        val p = s"$scratch/sessrows_x$n"
        spark.range(rows).select(
            col("id").as("event_id"),
            when(pmod(col("id") * 2654435761L, lit(100)) < 8, lit(0L))
              .otherwise(pmod(col("id") * 40503L, lit(10000)) + 1)
              .as("user_id"),
            (pmod(col("id") * 7919L, lit(500000)) * 1000).as("ts"))
          .repartition(32)
          .write.mode("overwrite").parquet(p)
        val df = spark.read.parquet(p)
        val (_, t) = time {
          operators.Sessions.sessionizeSpread(df, "user_id", "ts", 60000L)
            .write.format("noop").mode("overwrite").save()
        }
        record("session_rows", "spread", n, t)
      }

      // ---- Media codecs: encode→decode throughput ∝ rows ------------
      // pure mapPartitions projections (no shuffle anywhere), so
      // time-vs-rows must be ~1.0 once past fixed job overhead; PNG leg
      // exercises encodePng→decodeImages, audio leg ADPCM→FFT
      if (famOn("media")) locally {
        val px = docsN.select("doc_id")
          .withColumn("pixels", array_repeat(
            pmod(col("doc_id") * 7, lit(256)).cast("int"), 256))
          .withColumn("w", lit(16))
        val (_, tPng) = time {
          operators.Multimodal.decodeImages(
            operators.Multimodal.encodePng(px, "doc_id", "pixels", "w"),
            "id", "payload")
            .write.format("noop").mode("overwrite").save()
        }
        record("media", "png_roundtrip", n, tPng)
        val pcm = docsN.select("doc_id")
          .withColumn("samples", transform(sequence(lit(0), lit(255)),
            m => round(lit(8000.0) * sin(lit(2.0 * math.Pi) *
              (pmod(col("doc_id"), lit(30)) + 1).cast("double") *
              m.cast("double") / lit(256.0))).cast("int")))
        val (_, tAdpcm) = time {
          operators.Multimodal.audioSpectrum(
            operators.Multimodal.encodeAdpcm(pcm, "doc_id", "samples", 8000),
            "id", "payload", fftSize = 256)
            .write.format("noop").mode("overwrite").save()
        }
        record("media", "adpcm_fft", n, tAdpcm)
        // MP3 Layer III (r12): the heaviest own codec — full analysis
        // filterbank + MDCT + Huffman each way per row. Same pure
        // mapPartitions shape as the other codecs, so time-vs-rows must
        // stay ~linear; two 1152-sample frames per doc (the gate shape)
        val pcm3 = docsN.select("doc_id")
          .withColumn("samples", transform(sequence(lit(0), lit(2303)),
            m => round(lit(8000.0) * sin(lit(2.0 * math.Pi) *
              (pmod(col("doc_id"), lit(30)) + 1).cast("double") *
              m.cast("double") / lit(256.0))).cast("int")))
        val (_, tMp3) = time {
          operators.Multimodal.audioSpectrum(
            operators.Multimodal.encodeMp3(pcm3, "doc_id", "samples", 44100),
            "id", "payload", fftSize = 256)
            .write.format("noop").mode("overwrite").save()
        }
        record("media", "mp3_fft", n, tMp3)
        // stereo intensity MP3 (r13): two channels through the same
        // mapPartitions projection — the per-row constant roughly
        // doubles (two analysis chains + two rate loops), the exponent
        // must not move
        val pcm3s = pcm3.withColumn("right",
          transform(sequence(lit(0), lit(2303)),
            m => round(lit(4000.0) * sin(lit(2.0 * math.Pi) *
              (pmod(col("doc_id"), lit(30)) + 1).cast("double") *
              m.cast("double") / lit(256.0))).cast("int")))
        val (_, tMp3s) = time {
          operators.Multimodal.audioSpectrum(
            operators.Multimodal.encodeMp3Stereo(pcm3s, "doc_id",
              "samples", "right", 44100, intensityBand = 8),
            "id", "payload", fftSize = 256)
            .write.format("noop").mode("overwrite").save()
        }
        record("media", "mp3_stereo_fft", n, tMp3s)
      }

      // ---- Incremental postings: init linear, commit+search O(batch) -
      if (famOn("inc_postings")) locally {
        val dir = s"$scratch/incpost_x$n"
        val (_, tInit) = time {
          sink.IncrementalPostings.init(docsN, "doc_id", "text", dir)
        }
        record("inc_postings", "init", n, tInit)
        val (_, tCommit) = time {
          sink.IncrementalPostings.commitUpserts(probeBatch,
            "doc_id", "text", dir)
        }
        record("inc_postings", "commit_upserts", n, tCommit)
        val (_, tSearch) = time {
          sink.IncrementalPostings.bm25Search(spark, dir,
            "merge window scan", 20).count()
        }
        record("inc_postings", "bm25_search", n, tSearch)
      }

      // ---- Ingest pipeline (the reference's core job): changelog →
      // CDC classify/compact → keyed sink merge + commit. The LOAD leg
      // (initial full batch into an empty index) is allowed to scale
      // linearly with the changelog; the DELTA leg (a fixed-size
      // micro-batch against the n×-size EXISTING index — the
      // steady-state path a real pipeline lives in) must stay O(batch):
      // merge-on-read appends a delta, no bucket rewrite.
      if (famOn("ingest")) locally {
        val dir = s"$scratch/ingest_x$n"
        val snk = new sink.ParquetIndexSink(spark, dir)
        val runner = new runtime.PipelineRunner(
          config.PipelineConfig(indexName = s"probe-idx-x$n"), snk)
        val clN = spark.read.parquet(clPath(n))
        val orderCols = Seq(col("ts_us"), col("event_id"))
        val (_, tLoad) = time {
          runner.processBatch(clN, "op", "user_id", orderCols): Unit
        }
        record("ingest", "load", n, tLoad)
        // fixed-size delta: the smallest requested scale's changelog
        // head re-keyed past every scaled id range (constant 1500 rows
        // at all scales; scales need not include 1)
        val delta = spark.read.parquet(clPath(scales.head)).limit(1500)
          .withColumn("user_id", col("user_id") + lit(1000000000L))
          .withColumn("event_id", col("event_id") + lit(1000000000L))
        val (_, tDelta) = time {
          runner.processBatch(delta, "op", "user_id", orderCols): Unit
        }
        record("ingest", "delta", n, tDelta)
        // document-shaped load: key on event_id, so every changelog row
        // is its own document and the SINK WRITE volume scales with n —
        // the reference's Kafka record-per-document shape (the user_id
        // leg compacts 67 events/key away and is overhead-dominated at
        // probe sizes)
        val dirW = s"$scratch/ingestw_x$n"
        val runnerW = new runtime.PipelineRunner(
          config.PipelineConfig(indexName = s"probe-idxw-x$n"),
          new sink.ParquetIndexSink(spark, dirW))
        val (_, tLoadW) = time {
          runnerW.processBatch(
            clN.filter(col("op") =!= cdc.Changelog.UpdateBefore),
            "op", "event_id", Seq(col("ts_us"), col("event_id"))): Unit
        }
        record("ingest", "load_wide", n, tLoadW)
      }
    }

    runScale(scales.head) // warm-up, untimed
    warmingUp = false
    scales.foreach(runScale)

    // ---- Text projections (DOC-LENGTH axis) --------------------------
    // The r8 winnowing quadratic was doc-length-quadratic but
    // corpus-LINEAR — the rows axis above cannot expose that class of
    // bug, so the same ops are probed against corpora whose per-doc
    // token count grows ×L at CONSTANT row count. Exponent vs L must
    // be ~1.0 for every per-token projection (winnowing's window pass
    // is O(tokens × w); pre-fix it measured ~2).
    if (famOn("text_len")) {
      val lenScales = Seq(1, 2, 4)
      def lenPath(l: Int) = s"$scratch/docs_len$l"
      lenScales.foreach { l =>
        baseDocs.select(col("doc_id"),
            array_join(transform(sequence(lit(1), lit(l)),
              i => concat(col("text"), lit(" seg"), i.cast("string"))),
              " ").as("text"))
          .repartition(32)
          .write.mode("overwrite").parquet(lenPath(l))
      }
      def docsLen(l: Int) = spark.read.parquet(lenPath(l))
      // warm-up at L=1, untimed
      textOps.foreach { case (_, op) =>
        op(docsLen(1)).write.format("noop").mode("overwrite").save()
      }
      lenScales.foreach { l =>
        textOps.foreach { case (leg, op) =>
          val (_, t) = time {
            op(docsLen(l)).write.format("noop").mode("overwrite").save()
          }
          record("text_len", leg, l, t)
        }
      }
    }

    // ---- Media codecs (PAYLOAD-SIZE axis) -----------------------------
    // constant row count (500), image side ×2 per step (pixels ×4):
    // once past fixed per-row codec setup the work is pixel-bound, so
    // the time-vs-SIDE exponent must approach 2.0 from below and never
    // exceed it (a superquadratic slope would mean per-payload overhead
    // growing with payload — the codec analog of the winnowing class)
    if (famOn("media_size")) {
      val sizeScales = Seq(64, 128, 256)
      def pixDf(side: Int) = baseDocs.select("doc_id")
        .filter(col("doc_id") < 500)
        .withColumn("pixels", array_repeat(
          pmod(col("doc_id") * 7, lit(256)).cast("int"),
          side * side))
        .withColumn("w", lit(side))
      // warm-up untimed
      operators.Multimodal.decodeImages(
        operators.Multimodal.encodePng(pixDf(sizeScales.head),
          "doc_id", "pixels", "w"), "id", "payload")
        .write.format("noop").mode("overwrite").save()
      sizeScales.foreach { side =>
        val (_, t) = time {
          operators.Multimodal.decodeImages(
            operators.Multimodal.encodePng(pixDf(side),
              "doc_id", "pixels", "w"), "id", "payload")
            .write.format("noop").mode("overwrite").save()
        }
        record("media_size", "png_roundtrip", side, t)
      }
    }

    // ---- Random projection (EMBEDDING-DIMENSION axis) -----------------
    // The r9 'weak' finding lived on THIS axis: the unrolled plan form
    // carried inDim×outDim/3 nodes, so 768→128 meant ~100k-node
    // Catalyst analysis (minutes) before a row moved — invisible on the
    // corpus-rows axis. Two legs at constant row count:
    //   analyze — executedPlan construction time at the PRODUCTION
    //             ratio (outDim = inDim/6, i.e. 768→128); must be flat
    //             now that the plan carries one native node.
    //   project — execution at FIXED outDim=16, so per-row work grows
    //             ∝ inDim (the nonzero count) and the exponent vs dim
    //             must be ~1.0, never the unrolled form's blowup.
    if (famOn("embed_dim")) {
      val dimScales = Seq(64, 256, 768)
      def dimPath(d: Int) = s"$scratch/emb_dim$d"
      dimScales.foreach { d =>
        // widen deterministically: tile the base 64 components with a
        // per-index perturbation (distinct values, no new randomness)
        baseEmb.filter(col("embedding").isNotNull)
          .select(col("vec_id"),
            transform(sequence(lit(1), lit(d)), i =>
              (element_at(col("embedding"), pmod(i - lit(1), lit(64)) + 1)
                + i.cast("float") / lit(10000.0f)).cast("float"))
              .as("embedding"))
          .repartition(32)
          .write.mode("overwrite").parquet(dimPath(d))
      }
      def embDim(d: Int) = spark.read.parquet(dimPath(d))
      // warm-up untimed
      operators.Similarity.randomProjection(embDim(dimScales.head),
          "vec_id", "embedding", dimScales.head, 16)
        .write.format("noop").mode("overwrite").save()
      dimScales.foreach { d =>
        val (_, tAnalyze) = time {
          operators.Similarity.randomProjection(embDim(d),
              "vec_id", "embedding", inDim = d, outDim = math.max(d / 6, 1))
            .queryExecution.executedPlan
        }
        record("embed_dim", "analyze", d, tAnalyze)
        val (_, tProject) = time {
          operators.Similarity.randomProjection(embDim(d),
              "vec_id", "embedding", inDim = d, outDim = 16)
            .write.format("noop").mode("overwrite").save()
        }
        record("embed_dim", "project", d, tProject)
      }
    }

    // ---- Keyed-window families (KEY-SKEW axis) ------------------------
    // Constant row count; ONE hot key's share of all rows grows 1% → 8%
    // → 32% (the bot-traffic / ingestion-artifact shape). This is the
    // 100×-scale STRAGGLER axis the rows grid cannot expose: a
    // `Window.partitionBy(user)` funnels the hot key's whole history
    // through one task, so its time grows ∝ hot share (exponent vs
    // share → 1 as the hot key dominates) while the two-phase spreads
    // stay flat. Legs:
    //   session_window — the per-user window baseline (hot-key-bound BY
    //                    DESIGN; bounded only by per-user history size)
    //   session_spread — two-phase Sessions.sessionizeSpread: flat
    //   group_rank     — two-phase Corpus.groupPercentRank: flat
    //   funnel         — per-stage hash aggs + user joins (map-side
    //                    partials absorb the hot key in the aggs; the
    //                    per-user join is AQE-skew territory)
    //   cc_hub         — large/small-star CC on a star graph whose hub
    //                    degree IS the input size: slope vs degree must
    //                    stay ≤ 1 (linear in edges, no blowup)
    if (famOn("skew")) {
      val shareScales = Seq(1, 8, 32) // hot key's percent of all rows
      val skewRows = 1500000L
      def skewPath(s: Int) = s"$scratch/skew_$s"
      shareScales.foreach { s =>
        spark.range(skewRows).select(
            col("id").as("event_id"),
            when(pmod(col("id") * 2654435761L, lit(100)) < s, lit(0L))
              .otherwise(pmod(col("id") * 40503L, lit(10000)) + 1)
              .as("user_id"),
            (pmod(col("id") * 7919L, lit(500000)) * 1000).as("ts"),
            element_at(array(lit("signup"), lit("view"), lit("click"),
                lit("purchase")),
              (pmod(col("id") * 104729L, lit(4)) + 1).cast("int"))
              .as("event_type"))
          .repartition(32)
          .write.mode("overwrite").parquet(skewPath(s))
      }
      def skewAt(s: Int) = spark.read.parquet(skewPath(s))
      val skewLegs: Seq[(String, DataFrame => DataFrame)] = Seq(
        "session_window" -> (df =>
          operators.Sessions.sessionize(df, "user_id", "ts", lit(60000L))),
        "session_spread" -> (df =>
          operators.Sessions.sessionizeSpread(df, "user_id", "ts", 60000L)),
        "group_rank" -> (df =>
          operators.Corpus.groupPercentRank(df, "user_id",
            struct(col("ts"), col("event_id")), "pr")),
        "funnel" -> (df =>
          operators.Funnel.funnelCounts(df, "user_id", "event_type", "ts",
            Seq("signup", "view", "purchase"))))
      skewLegs.foreach { case (_, op) => // warm-up untimed
        op(skewAt(shareScales.head))
          .write.format("noop").mode("overwrite").save()
      }
      shareScales.foreach { s =>
        skewLegs.foreach { case (leg, op) =>
          val (_, t) = time {
            op(skewAt(s)).write.format("noop").mode("overwrite").save()
          }
          record("skew", leg, s, t)
        }
      }
      // hub-degree axis for star CC (input size grows WITH the hub)
      val hubScales = Seq(10000, 40000, 160000)
      def starAt(h: Int) = {
        val pairs = spark.range(1, h.toLong + 1)
          .select(lit(0L).as("id_a"), col("id").as("id_b"))
        val ids = spark.range(0, h.toLong + 1).select(col("id"))
        (pairs, ids)
      }
      locally { // warm-up untimed
        val (p0, i0) = starAt(hubScales.head)
        operators.Dedup.connectedComponentsStar(p0, i0)
          .write.format("noop").mode("overwrite").save()
      }
      hubScales.foreach { h =>
        val (p, i) = starAt(h)
        val (_, t) = time {
          operators.Dedup.connectedComponentsStar(p, i)
            .write.format("noop").mode("overwrite").save()
        }
        record("skew_hub", "cc_star", h, t)
      }
    }

    // ---- report ------------------------------------------------------
    // families carry their OWN scale axis (text_len runs ×1/×2/×4 doc
    // length; everything else the corpus-rows grid), so cells are
    // labeled per family rather than sharing one column header
    println("\n| family | leg | times | exponent |")
    println("|---|---|---|---|")
    val json = new StringBuilder("{\"scales\":[" +
      scales.mkString(",") + "],\"families\":{")
    var first = true
    results.foreach { case ((fam, leg), byScale) =>
      val pts = byScale.toSeq
      val exp = exponent(pts)
      println(s"| $fam | $leg | " +
        pts.map { case (n, t) => f"x$n=${t}%.2f s" }.mkString(", ") +
        f" | ${exp}%.2f |")
      if (!first) json.append(",")
      first = false
      json.append(s""""$fam/$leg":{"scales":[""" +
        pts.map(_._1).mkString(",") + """],"times":[""" +
        pts.map(p => f"${p._2}%.3f").mkString(",") +
        f"""],"exponent":${exp}%.3f}""")
    }
    json.append("}}")
    println(json.toString)
    spark.stop()
  }
}
