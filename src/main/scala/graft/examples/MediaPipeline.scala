package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** End-to-end MULTIMODAL pipeline example — the media half of a
  * training-data build, chained from the library's gated operators
  * (each stage individually oracle-checked by `SparkEntry`; this demo
  * shows them COMPOSED over one binary column):
  *
  *   1. synthesize payloads  — PNG images (10 shared patterns with
  *                             per-doc pixel noise — near-dup groups),
  *                             FLAC audio, MJPEG video; the testdata
  *                             ships no media, every byte comes from
  *                             the REAL encoders
  *   2. sniff + route        — container detection on magic bytes, one
  *                             pipeline per modality from one union
  *   3. image leg            — decode pixels → perceptual aHash →
  *                             banded Hamming near-dup pairs
  *   4. audio leg            — decode samples → energy VAD (keep docs
  *                             with enough active frames) → FFT peak
  *   5. video leg            — AVI walk → per-frame JPEG decode →
  *                             frame stats
  *
  * Prints per-stage counts. Every decode in the loop is real (JDK
  * codecs + own FLAC/MP3/ADPCM/AVI); nothing routes through the stub.
  *
  *   runMain graft.examples.MediaPipeline [sfDir]
  */
object MediaPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-media")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .filter(col("doc_id") < 240)

    // 1. one modality per id residue: grouped near-dup images, tonal
    // audio, 3-frame clips
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val pats = typedLit((0 until 10).map { g =>
      val h = mix(g.toLong)
      (0 until 64).map(c => ((h >>> c) & 1L).toInt)
    })
    val grp = (pmod(col("doc_id"), lit(10)) + 1).cast("int")
    val images = Multimodal.encodePng(
      ids.filter(pmod(col("doc_id"), lit(3)) === 0)
        .withColumn("pixels", transform(sequence(lit(0), lit(255)), px => {
          val cell = (shiftright(px, 5) * 8 +
            shiftright(px.bitwiseAND(lit(15)), 1) + 1).cast("int")
          val bit = element_at(element_at(pats, grp), cell)
          val noise = pmod(col("doc_id") * 7 + cell, lit(8))
          when(bit === 1, lit(255) - noise).otherwise(noise).cast("int")
        }))
        .withColumn("w", lit(16)),
      "doc_id", "pixels", "w")
    // audio docs split between the LOSSLESS leg (FLAC) and the LOSSY
    // leg (own MP3 Layer III, two 1152-sample frames — the decoder's
    // codec-delay skip leaves 1152 steady-state samples); both route
    // through the SAME downstream VAD + FFT stages untouched
    val audioFlac = Multimodal.encodeFlac(
      ids.filter(pmod(col("doc_id"), lit(6)) === 1)
        .withColumn("samples", transform(sequence(lit(0), lit(255)),
          n => round(lit(6000.0) * sin(lit(2.0 * math.Pi) *
            (pmod(col("doc_id"), lit(20)) + 1).cast("double") *
            n.cast("double") / lit(256.0))).cast("int"))),
      "doc_id", "samples", 8000)
    val audioMp3 = Multimodal.encodeMp3(
      ids.filter(pmod(col("doc_id"), lit(6)) === 4)
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(6000.0) * sin(lit(2.0 * math.Pi) *
            (pmod(col("doc_id"), lit(20)) + 1).cast("double") *
            n.cast("double") / lit(256.0))).cast("int"))),
      "doc_id", "samples", 44100)
    val audio = audioFlac.unionByName(audioMp3)
    val video = Multimodal.encodeAviMjpeg(
      ids.filter(pmod(col("doc_id"), lit(3)) === 2)
        .withColumn("frames", transform(sequence(lit(0), lit(2)),
          f => array_repeat(
            (pmod(col("doc_id") + f * 30, lit(200)) + 20).cast("int"), 128)))
        .withColumn("w", lit(16)),
      "doc_id", "frames", "w", fps = 5)
    val corpus = images.unionByName(audio).unionByName(video)
      .filter(col("payload").isNotNull).localCheckpoint(true)
    println(s"[media] payloads            ${corpus.count()}")

    // 2. sniff + route: magic-byte container detection, no decode yet
    val img = corpus.join(
      Multimodal.imageMeta(corpus, "id", "payload")
        .filter(col("format").isNotNull).select("id"), "id")
    println(s"[media] routed images       ${img.count()}")

    // 3. image leg: REAL decode -> perceptual hash -> near-dup pairs
    val hashes = Multimodal.imageHashes(img, "id", "payload")
    val pairs = Multimodal.nearDuplicateImages(hashes, "id", "ahash", 3)
    println(s"[media] image near-dup pairs ${pairs.count()}")

    // 4. audio leg: VAD keep-list, then spectral features on survivors
    val vad = Multimodal.audioActivity(corpus, "id", "payload", 64, 100.0)
      .groupBy("id").agg(sum(when(col("active"), 1).otherwise(0)).as("on"))
      .filter(col("on") >= 2)
    val tones = Multimodal.audioSpectrum(
      corpus.join(vad.select("id"), "id"), "id", "payload", 256)
      .filter(col("peak_bin").isNotNull)
    println(s"[media] voiced audio docs   ${tones.count()}")

    // 5. video leg: AVI walk + per-frame JPEG decode
    val frames = Multimodal.videoFrames(corpus, "id", "payload")
    println(s"[media] decoded video frames ${frames.count()}")

    spark.stop()
  }
}
