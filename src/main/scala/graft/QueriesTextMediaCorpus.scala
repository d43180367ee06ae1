package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Changelog
import graft.schema.{Flattener, Stringifier}
import graft.shard.{ModuloSharding, ShardingStrategyFactory}
import graft.sink.DocQueries
import graft.SparkEntry.{dec, tempDir, sharedExactPairs, sharedPrunedCosinePairs}
import graft.SparkEntry.eventsChangelog
import graft.OracleDefs.bpeApplyMerges

/** Gate registry 3/4: text analysis, multimodal (codecs + features), corpus curation/mixing/packing, sketches, and skew rows.
  * (Verbatim slice of the former SparkEntry.queries literal — the
  * registry split is pure file layout, zero behavior change.)
  */
private[graft] object QueriesTextMediaCorpus {

  /** Exchange a BOUNDED media fixture across the session's cores before
    * its codec leg. The driver test tables are single-row-group parquet
    * files, so their scan is ONE task — without an exchange every
    * per-row codec chain (encode → decode → FFT, a pure projection by
    * design, PlanSpec-pinned) runs serially on one core regardless of
    * `local[N]` / cluster width (guide §2.6: idle capacity). The media
    * fixtures are bounded by construction (`doc_id < 40..320` filters),
    * so the exchange moves O(rows) ids at ANY corpus scale — this is a
    * fixture-shape fix, not a scan-width tune; an unbounded media corpus
    * arrives in many splits and never enters this path.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text quality features.
    "x_text_quality" -> ((s, d) =>
      operators.TextAnalysis.quality(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Token counting (whitespace + BPE-ish pieces).
    "x_text_tokens" -> ((s, d) =>
      operators.TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Language ID (stopword-marker argmax).
    "x_text_langid" -> ((s, d) =>
      operators.TextAnalysis.languageId(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // PII scrub: the synthetic corpus carries no PII, so each doc gets a
    // deterministic contact suffix appended FIRST (identical string
    // construction in both engines) — the redaction then provably finds
    // and masks every planted email/URL/phone.
    "x_text_pii" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(
        col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@example.com or "),
          lit("https://ex.com/p/"), col("doc_id"),
          lit(" call 555-123-4567")).as("text"))
      operators.TextAnalysis.piiScrub(planted, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Repetition/boilerplate score (top 3-gram frequency ratio).
    "x_text_repetition" -> ((s, d) =>
      operators.TextAnalysis.repetition(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Canonical content fingerprint (md5 over sorted distinct tokens).
    "x_text_fingerprint" -> ((s, d) =>
      operators.TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Vocabulary coverage (the tokenizer-design curve): what fraction
    // of all token OCCURRENCES the top-V terms cover, for candidate
    // vocab sizes — the Zipf head-mass measurement behind "how big
    // must the vocab be". Scale shape: term frequencies are one
    // map-side-combinable hash agg; the ranked head is a BOUNDED
    // TakeOrderedAndProject of max(V) rows (never a vocab-wide
    // window); totals are a one-row broadcast.
    "x_vocab_coverage" -> ((s, d) => {
      val vs = Seq(100, 1000)
      val tf = Tables.documents(s, d)
        .select(explode(filter(split(lower(col("text")), " "),
          t => t =!= lit(""))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("tf"))
      val total = tf.agg(sum("tf").as("_tot"),
        count(lit(1)).as("_nterms"))
      val head = tf.orderBy(col("tf").desc, col("term")).limit(vs.max)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("tf").desc, col("term"))))
      head.crossJoin(broadcast(total))
        .select(explode(array(vs.map(lit): _*)).as("vocab_size"),
          col("tf"), col("rk"), col("_tot"), col("_nterms"))
        .filter(col("rk") <= col("vocab_size"))
        .groupBy("vocab_size")
        .agg(max(col("_nterms")).as("n_terms"),
          sum(col("tf")).as("covered_tokens"),
          max(col("_tot")).as("total_tokens"))
        .withColumn("coverage", round(
          col("covered_tokens").cast("double") / col("total_tokens"), 6))
        .orderBy("vocab_size")
    }),

    // Multimodal: opaque binary payload + no-decode metadata.
    "x_multimodal_meta" -> ((s, d) => {
      val withBin = operators.Multimodal.withBinaryPayload(
        Tables.documents(s, d), "text", "payload")
      operators.Multimodal.payloadMetadata(withBin, "doc_id", "payload")
        .orderBy("doc_id")
    }),

    // REAL image-metadata sniffing (PNG IHDR / JPEG SOF / GIF header —
    // pure byte parsing, no codec library, so this half of the
    // multimodal path is NOT stubbed): payloads are VALID image headers
    // synthesized from testdata columns (width = n_chars%512+1,
    // height = doc_id%512+1, big-endian via hex/lpad/unhex), the JPEG
    // branch walking a leading APP0 segment like real files; every 11th
    // doc carries a non-image payload and must sniff to nulls. The
    // oracle recomputes the dims straight from the columns — wrong
    // parser offsets fail the hash.
    "x_multimodal_sniff" -> ((s, d) => {
      def be(nBytes: Int, c: Column): Column =
        unhex(lpad(hex(c), nBytes * 2, "0"))
      val w = (pmod(col("n_chars"), lit(512)) + 1).cast("int")
      val h = (pmod(col("doc_id"), lit(512)) + 1).cast("int")
      val png = concat(
        lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
          0x0a, 0, 0, 0, 0x0d)),
        lit("IHDR".getBytes("US-ASCII")), be(4, w), be(4, h),
        lit(Array[Byte](8, 2, 0, 0, 0, 0, 0, 0, 0)))
      val jpeg = concat(
        lit(Array[Byte](0xff.toByte, 0xd8.toByte)),
        lit(Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 'J', 'F')),
        lit(Array[Byte](0xff.toByte, 0xc0.toByte, 0, 0x11, 8)),
        be(2, h), be(2, w), lit(Array[Byte](3)))
      val payload = when(pmod(col("doc_id"), lit(11)) === 0,
          lit("not an image".getBytes("US-ASCII")))
        .when(pmod(col("doc_id"), lit(2)) === 0, png)
        .otherwise(jpeg)
      operators.Multimodal.imageMeta(
          Tables.documents(s, d).select(col("doc_id"), payload.as("payload")),
          "doc_id", "payload")
        .orderBy("id")
    }),

    // REAL Matroska/WebM (EBML) container sniffing: payloads are VALID
    // minimal MKV/WebM files synthesized from testdata columns — EBML
    // header with DocType (even ids matroska, odd webm), unknown-size
    // Segment (the live-mux shape), Info with TimestampScale=1e9 and a
    // float64 Duration whose IEEE754 bits are computed IN SQL from
    // doc_id (exponent via bin-length, mantissa via shiftleft), and a
    // Tracks element with a video entry (+ audio every 3rd doc). Every
    // 7th doc carries a non-EBML payload and must sniff to nulls. The
    // oracle recomputes format/duration/track flags straight from the
    // columns — wrong VINT widths or float offsets fail the hash.
    "x_multimodal_sniff_ebml" -> ((s, d) => {
      def B(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
      val base = Tables.documents(s, d).select(col("doc_id"),
          (pmod(col("doc_id"), lit(300)) + 1).cast("long").as("_v"))
        .withColumn("_e", (length(bin(col("_v"))) - 1).cast("long"))
        .withColumn("_bits", expr(
          "shiftleft(1023 + _e, 52) | " +
            "(shiftleft(_v, cast(52 - _e as int)) & 4503599627370495)"))
        .withColumn("_dur8", unhex(lpad(hex(col("_bits")), 16, "0")))
      val durEl = concat(B(0x44, 0x89, 0x88), col("_dur8"))
      val scaleEl = B(0x2A, 0xD7, 0xB1, 0x84, 0x3B, 0x9A, 0xCA, 0x00)
      val infoEl = concat(B(0x15, 0x49, 0xA9, 0x66, 0x93), scaleEl, durEl)
      val vTrack = B(0xAE, 0x83, 0x83, 0x81, 0x01)
      val aTrack = B(0xAE, 0x83, 0x83, 0x81, 0x02)
      val tracksEl = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(B(0x16, 0x54, 0xAE, 0x6B, 0x8A), vTrack, aTrack))
        .otherwise(concat(B(0x16, 0x54, 0xAE, 0x6B, 0x85), vTrack))
      val hdr = when(pmod(col("doc_id"), lit(2)) === 0,
          concat(B(0x1A, 0x45, 0xDF, 0xA3, 0x8B, 0x42, 0x82, 0x88),
            lit("matroska".getBytes("US-ASCII"))))
        .otherwise(concat(B(0x1A, 0x45, 0xDF, 0xA3, 0x87, 0x42, 0x82, 0x84),
          lit("webm".getBytes("US-ASCII"))))
      val payload = when(pmod(col("doc_id"), lit(7)) === 0,
          lit("not a video".getBytes("US-ASCII")))
        .otherwise(concat(hdr, B(0x18, 0x53, 0x80, 0x67, 0xFF),
          infoEl, tracksEl))
      operators.Multimodal.ebmlMeta(
          base.select(col("doc_id"), payload.as("payload")),
          "doc_id", "payload")
        .orderBy("id")
    }),

    // REAL MP3/ADTS-AAC stream sniffing: payloads are VALID frame
    // chains built in SQL — MPEG-1 Layer III 128 kbps @ 44100 (417-byte
    // frames) for even ids, ADTS AAC LC @ 44100 (107-byte frames, the
    // length lives in the header bits) otherwise, frame count from
    // doc_id, every 7th doc non-audio → nulls. The parser walks the
    // chain; duration = frames × samples-per-frame / rate. The oracle
    // recomputes everything from doc_id — wrong frame-size math or
    // header offsets fail the hash.
    "x_multimodal_sniff_audio" -> ((s, d) => {
      val mp3Frame = lit(Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
        Array.fill[Byte](413)(0x11))
      val aacFrame = lit(
        Array(0xFF, 0xF1, 0x50, 0x80, 0x0D, 0x7F, 0xFC).map(_.toByte) ++
          Array.fill[Byte](100)(0x22))
      val n = (pmod(col("doc_id"), lit(5)) + 1).cast("int")
      def rep(frame: Column) = aggregate(sequence(lit(1), n),
        lit(Array.empty[Byte]), (acc, _) => concat(acc, frame))
      val payload = when(pmod(col("doc_id"), lit(7)) === 0,
          lit("not audio".getBytes("US-ASCII")))
        .when(pmod(col("doc_id"), lit(2)) === 0, rep(mp3Frame))
        .otherwise(rep(aacFrame))
      operators.Multimodal.compressedAudioMeta(
          Tables.documents(s, d).select(col("doc_id"),
            payload.as("payload")),
          "doc_id", "payload")
        .withColumn("duration_s", round(col("duration_s"), 6))
        .orderBy("id")
    }),

    // REAL FLAC/Ogg-Opus container sniffing: payloads are VALID
    // headers built in SQL — a FLAC STREAMINFO block packing
    // rate/channels/bps/total-samples into its 64-bit field for even
    // ids (total = (doc_id%300+1)s at 44.1 kHz), a two-page Ogg Opus
    // stream (OpusHead + EOS page whose granule encodes pre-skip 312 +
    // (doc_id%100+1)*4800 samples) otherwise, every 7th doc non-audio
    // → nulls. The oracle recomputes rate/channels/samples/duration
    // from doc_id — wrong bit offsets, endianness, or pre-skip math
    // fail the hash.
    "x_multimodal_sniff_container" -> ((s, d) => {
      def B(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
      def zeros(n: Int): Column = lit(Array.fill[Byte](n)(0))
      val flacBase = (44100L << 44) | (1L << 41) | (15L << 36)
      val total = ((pmod(col("doc_id"), lit(300)) + 1) * 44100L).cast("long")
      val packed8 = unhex(lpad(hex(lit(flacBase) + total), 16, "0"))
      val flacPayload = concat(lit("fLaC".getBytes("US-ASCII")),
        B(0x80, 0, 0, 34), B(0x10, 0, 0x10, 0), zeros(6), packed8,
        zeros(16))
      // little-endian 8 bytes of a non-negative long (Ogg granule)
      def le8(c: Column): Column = {
        val h = lpad(hex(c), 16, "0")
        concat((7 to 0 by -1).map(i => unhex(substring(h, 2 * i + 1, 2))): _*)
      }
      val opusHead = concat(lit("OpusHead".getBytes("US-ASCII")),
        B(1, 2, 0x38, 0x01, 0x80, 0xBB, 0, 0, 0, 0, 0)) // pre-skip 312, 48 kHz
      val headPage = concat(lit("OggS".getBytes("US-ASCII")), B(0, 2),
        zeros(8), B(7, 0, 0, 0), zeros(4), zeros(4), B(1, 19), opusHead)
      val granule =
        (pmod(col("doc_id"), lit(100)) + 1) * 4800L + 312L
      val eosPage = concat(lit("OggS".getBytes("US-ASCII")), B(0, 4),
        le8(granule.cast("long")), B(7, 0, 0, 0), B(1, 0, 0, 0), zeros(4),
        B(1, 1), B(0x55))
      val payload = when(pmod(col("doc_id"), lit(7)) === 0,
          lit("not audio".getBytes("US-ASCII")))
        .when(pmod(col("doc_id"), lit(2)) === 0, flacPayload)
        .otherwise(concat(headPage, eosPage))
      operators.Multimodal.containerAudioMeta(
          Tables.documents(s, d).select(col("doc_id"),
            payload.as("payload")),
          "doc_id", "payload")
        .withColumn("duration_s", round(col("duration_s"), 6))
        .orderBy("id")
    }),

    // REAL lossless decode end-to-end: per-doc PCM derived from doc_id
    // (even ids a constant block, odd ids an 8-sample ramp) is encoded
    // to a valid FLAC stream (CONSTANT/VERBATIM subframes, CRC-8/16
    // written) and decoded back through the INDEPENDENT CRC-verifying
    // decoder inside decodeAudioFeatures. The oracle recomputes sample
    // count and RMS from doc_id alone — wrong bit-packing, CRC, or
    // sign handling anywhere in the codec fails the hash. Encoder
    // bytes are additionally pinned against the round-9 container
    // sniffer and table-driven CRCs in FlacCodecSpec.
    "x_multimodal_flac" -> ((s, d) => {
      val pcm = Tables.documents(s, d).select("doc_id")
        .withColumn("samples",
          when(pmod(col("doc_id"), lit(2)) === 0,
            array_repeat((pmod(col("doc_id"), lit(1000)) - 500).cast("int"),
              (pmod(col("doc_id"), lit(50)) + 1).cast("int")))
          .otherwise(transform(sequence(lit(0), lit(7)),
            i => (pmod(col("doc_id") * 31 + i * 7, lit(2000)) - 1000)
              .cast("int"))))
      // even ids ride the CONSTANT-subframe path; odd ids the FIXED
      // order-1 + Rice-coded-residual path — lossless either way, so
      // one doc_id-derived oracle gates both encoder/decoder legs
      val encoded = operators.Multimodal.encodeFlac(
          pcm.filter(pmod(col("doc_id"), lit(2)) === 0),
          "doc_id", "samples", 8000)
        .unionByName(operators.Multimodal.encodeFlac(
          pcm.filter(pmod(col("doc_id"), lit(2)) =!= 0),
          "doc_id", "samples", 8000, fixedOrder = Some(1)))
      operators.Multimodal.decodeAudioFeatures(encoded, "id", "payload")
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("channels"), col("n_frames"), round(col("rms"), 6).as("rms"))
        .orderBy("id")
    }),

    // REAL spectral analysis end-to-end: pure sine tones at exact FFT
    // bin centers (freq = k·8000/256 Hz, k = id%30+1, amplitude 1000),
    // FLAC-encoded, decoded back through FlacCodec, and run through the
    // radix-2 FFT — the dominant bin must land exactly on k. Sample
    // rounding (round(1000·sin)) perturbs magnitudes but cannot move an
    // on-center peak, so the oracle recomputes every row from id
    // arithmetic. No stub anywhere: encode, decode, FFT all real.
    "x_audio_spectrum" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 300))
        .withColumn("samples", transform(sequence(lit(0), lit(255)),
          n => round(lit(1000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeFlac(pcm, "doc_id", "samples", 8000)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // REAL video FRAME decode (the stub's last big class): MJPEG-in-AVI
    // — our RIFF/AVI writer around the JDK's own JPEG codec, decoded by
    // walking the movi LIST and JPEG-decoding every 00dc chunk. Dims
    // and frame structure are exact from id arithmetic; the mean luma
    // of a uniform frame survives JPEG DC quantization to within a few
    // steps, asserted Spark-side at an explicit ±5 tolerance (the
    // x_embed_pca convention: no cross-engine lossy-value compare).
    "x_video_frames" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 120)
        .withColumn("frames", transform(sequence(lit(0), lit(2)),
          f => array_repeat(
            (pmod(col("doc_id") * 7 + f * 40, lit(200)) + 20).cast("int"),
            128)))
        .withColumn("w", lit(16))
      val avi = operators.Multimodal.encodeAviMjpeg(
        docs, "doc_id", "frames", "w", fps = 5)
      operators.Multimodal.videoFrames(avi, "id", "payload")
        .select(col("id"), col("frame_idx"), col("width"), col("height"),
          (abs(col("mean_luma") -
            (pmod(col("id") * 7 + col("frame_idx") * 40, lit(200)) + 20))
            <= 5.0).as("luma_ok"))
        .orderBy("id", "frame_idx")
    }),

    // ASR-corpus utterance cuts: VAD frames → gaps-and-islands. The
    // planted pattern activates frame pairs (2g, 2g+1) where
    // (id+g)%3=0, g≤3 — so ids ≡0 (mod 3) carry utterances (0-1) and
    // (6-7), ids ≡1 carry (4-5), ids ≡2 carry (2-3); the oracle states
    // that structure directly while the engine derives it from REAL
    // decoded audio through RMS VAD and one windowed island pass.
    "x_audio_utterances" -> ((s, d) => {
      val pcm = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 250)
        .withColumn("samples", transform(sequence(lit(0), lit(511)), n => {
          val f = shiftright(n, 6)
          val loud = pmod(col("doc_id") + shiftright(f, 1), lit(3)) === 0
          when(loud,
            pmod(col("doc_id") * 31 + n * 7, lit(2000)) - 1000)
            .otherwise(pmod(col("doc_id") + n, lit(20)) - 10)
            .cast("int")
        }))
      val enc2 = operators.Multimodal.encodeFlac(pcm, "doc_id", "samples", 8000)
      val frames = operators.Multimodal.audioActivity(enc2, "id", "payload",
        frameSize = 64, threshold = 100.0)
      operators.Multimodal.utteranceSegments(frames, "id", "frame_idx",
          "active")
        .orderBy("id", "utt_idx")
    }),

    // MFCC front-end over real decode: FFT power → 10-filter mel bank →
    // log → DCT-II. A tone at bin k drops its energy into the mel filter
    // the PUBLIC formula (2595·log10(1+f/700), HTK spacing) names for
    // k·31.25 Hz — the 30-entry band table below is that formula
    // evaluated once and frozen (min argmax margin 0.044, verified), so
    // the oracle stays id-arithmetic while the engine runs the whole
    // filterbank. Cepstra ride along rounded 6dp (spec-tested, not
    // cross-engine-compared — the x_embed_pca rule for derived floats).
    "x_audio_mfcc" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 300))
        .withColumn("samples", transform(sequence(lit(0), lit(255)),
          n => round(lit(1000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeFlac(pcm, "doc_id", "samples", 8000)
      operators.Multimodal.audioMfcc(enc2, "id", "payload",
          fftSize = 256, nMel = 10, nCoef = 10)
        .select(col("id"), col("dominant_band"), col("n_coef"))
        .orderBy("id")
    }),

    // Energy VAD over the LOSSLESS path — speech-corpus curation with an
    // EXACT oracle: deterministic PCM (loud frames when (id+f)%3=0, near-
    // silence otherwise) rides FLAC encode→decode bit-for-bit, so DuckDB
    // recomputes every frame's RMS with the same ascending-index
    // sum-of-squares and the same 6dp round before the threshold.
    "x_audio_vad" -> ((s, d) => {
      val pcm = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 250)
        .withColumn("samples", transform(sequence(lit(0), lit(255)), n => {
          val f = shiftright(n, 6)
          val loud = pmod(col("doc_id") + f, lit(3)) === 0
          when(loud,
            pmod(col("doc_id") * 31 + n * 7, lit(2000)) - 1000)
            .otherwise(pmod(col("doc_id") + n, lit(20)) - 10)
            .cast("int")
        }))
      val enc2 = operators.Multimodal.encodeFlac(pcm, "doc_id", "samples", 8000)
      operators.Multimodal.audioActivity(enc2, "id", "payload",
          frameSize = 64, threshold = 100.0)
        .orderBy("id", "frame_idx")
    }),

    // Third REAL lossy leg: IMA/DVI ADPCM (4-bit PREDICTIVE coding,
    // 4:1; tag-0x11 WAV; both encoder and decoder ours from the public
    // spec — the JDK ships none). Same spectral gate: the adaptive
    // quantizer's ~11-sample ramp and tracking noise cannot move a
    // bin-centered tone's FFT peak (spec-verified for every k).
    "x_audio_adpcm" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 300)
        .withColumn("samples", transform(sequence(lit(0), lit(255)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeAdpcm(pcm, "doc_id", "samples", 8000)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // REAL lossy-codec path: G.711 µ-law (our ITU-spec encoder, the
    // JDK's own ULAW→PCM converter on decode). Companding quantization
    // perturbs every sample (~38 dB SNR) but cannot move a tone planted
    // at an exact FFT bin center, so the x_audio_spectrum oracle trick
    // gates the whole compressed path from id arithmetic — encode,
    // codec decode, FFT, all real, zero stub.
    "x_audio_g711" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 300)
        .withColumn("samples", transform(sequence(lit(0), lit(255)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeG711(pcm, "doc_id", "samples", 8000)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // REAL MP3 (MPEG-1 Layer III mono) encode→decode→FFT — the
    // x_audio_g711 convention on the own-written perceptual-transform
    // codec (Mp3Codec: structure-exact bitstream, Kraft-verified
    // Huffman subset, scalefactor-boosted |ix|<=3 quantizer; 14-37 dB
    // measured round-trip SNR): bin-centered tones at doc_id%30+1 must
    // keep their FFT peak through the full frame/side-info/Huffman/
    // requantize/IMDCT/synthesis loop. Two 1152-sample frames in; the
    // decoder drops the fixed LeadingSkip warmup, so n_samples = 1152.
    "x_audio_mp3" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 300))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples", 44100)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The 32 kHz MPEG-1 leg: the one rate whose long scalefactor-band
    // table historically shipped 21 bands (missing ISO B.8's 550
    // boundary, fixed r14) — tones through the full loop at 32 kHz pin
    // the 22-band layout's region split and scalefactor walk on the
    // driver board, not only in the property spec.
    "x_audio_mp3_32k" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples", 32000)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The SHORT-BLOCK leg of the same codec (block_type 2: short
    // scalefactor-band tables, per-(band, window) scalefactors, the
    // spec's frequency-line reorder, 3x12-point IMDCT tiling — the
    // transient window machinery real-world MP3s lean on): 150 tones
    // forced through all-short frames must keep their FFT peaks.
    "x_audio_mp3_short" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples",
        44100, blockMode = "short")
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The MIXED-block leg (mixed_block_flag: two long subbands under a
    // short granule — long bands 0-7 below line 36, short bands 3-12
    // reordered above, 17+18 scalefactors, seam alias butterflies):
    // 150 tones spanning the long/short seam keep their FFT peaks.
    "x_audio_mp3_mixed" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples",
        44100, blockMode = "mixed")
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The STEREO leg of the same codec — mid/side joint stereo (32-byte
    // side info, per-channel scalefactors/scfsi, the xr-domain MS
    // matrix inverted at decode): left carries the doc's tone, right a
    // fixed 13-bin difference tone; the media layer's channel-0
    // convention must recover the LEFT peak through the matrix.
    "x_audio_mp3_stereo" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("left", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
        .withColumn("right", transform(sequence(lit(0), lit(2303)),
          n => round(lit(2000.0) *
            sin(lit(2.0 * math.Pi * 13.0) * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3Stereo(pcm, "doc_id",
        "left", "right", 44100, msStereo = true)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The INTENSITY joint-stereo leg (mode_extension 1): both channels
    // carry the doc's tone at the exact position-4 ratio L/R = tan(60°)
    // = √3, so is_pos quantizes losslessly — tones below long band 8
    // code normally, tones above ride the summed left channel and are
    // split back by is_ratio = tan(is_pos·π/12) at decode; the
    // channel-0 convention must recover the LEFT peak either way.
    "x_audio_mp3_intensity" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("left", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
        .withColumn("right", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0 / math.sqrt(3.0)) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3Stereo(pcm, "doc_id",
        "left", "right", 44100, intensityBand = 8)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The MPEG-2 LSF leg of the same codec (22.05 kHz one-granule
    // 576-sample frames, 9-byte side info, scalefac_compress 399 — the
    // LSF slen decomposition carrying LIVE scalefactors, which the
    // third-party silence golden never exercises): 150 tones through
    // encode→decode→FFT at 96 kbps. Four LSF frames in; the decoder's
    // fixed LeadingSkip leaves 1152 steady-state samples.
    "x_audio_mp3_lsf" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples", 22050)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The MS+INTENSITY leg (mode_extension 3 — mid/side below the
    // bound, positions above, the encoder's suffix rule marking
    // anti-phase bands with the illegal position 7): the same exact
    // tan(60°) pair as x_audio_mp3_intensity, with the below-bound
    // tones riding the mid/side matrix instead of independent coding.
    "x_audio_mp3_ms_intensity" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("left", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
        .withColumn("right", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0 / math.sqrt(3.0)) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3Stereo(pcm, "doc_id",
        "left", "right", 44100, intensityBand = 8, msIntensity = true)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The LSF SHORT-block leg (13818-3 block-type-2 slen partitions —
    // 36 sfb-major values over the 9+9+9+9 groups at scalefac_compress
    // 399 — through the one-granule 22.05 kHz frame layout): 150 tones
    // forced through all-short LSF frames keep their FFT peaks.
    "x_audio_mp3_lsf_short" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples",
        22050, blockMode = "short")
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The LSF MIXED-block leg (6 long bands — every LSF long table has
    // sfb(6) = 36 — plus short bands 3-12 under the 6+9+9+9 slen
    // partition, part2 114): 150 tones spanning the seam keep their
    // FFT peaks through one-granule 22.05 kHz mixed frames.
    "x_audio_mp3_lsf_mixed" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("samples", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3(pcm, "doc_id", "samples",
        22050, blockMode = "mixed")
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The MIXED-BLOCK INTENSITY leg (mode_extension 1 on mixed
    // granules): the two shipped position halves composed — long-band
    // positions below the seam, per-window short positions above. Both
    // channels carry the doc's tone at the exact position-4 ratio
    // L/R = tan(60°) = √3, so is_pos quantizes losslessly wherever the
    // tone lands (long half for k ≤ 7, short band per window above);
    // the channel-0 convention must recover the LEFT peak either way.
    "x_audio_mp3_mixed_intensity" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("left", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
        .withColumn("right", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0 / math.sqrt(3.0)) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3Stereo(pcm, "doc_id",
        "left", "right", 44100, intensityBand = 4, blockMode = "mixed")
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // The MIXED + MODE_EXTENSION 3 leg (mid/side below the intensity
    // region on mixed granules — r14's last closed intensity surface):
    // in-phase tones at the exact tan(60°) ratio ride intensity
    // wherever they land; below-bound bands ride the mid/side matrix.
    // Channel 0 must recover the LEFT peak either way.
    "x_audio_mp3_mixed_ms" -> ((s, d) => {
      val k = (pmod(col("doc_id"), lit(30)) + 1).cast("double")
      val pcm = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150))
        .withColumn("left", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
        .withColumn("right", transform(sequence(lit(0), lit(2303)),
          n => round(lit(8000.0 / math.sqrt(3.0)) *
            sin(lit(2.0 * math.Pi) * k * n.cast("double") / lit(256.0)))
            .cast("int")))
      val enc2 = operators.Multimodal.encodeMp3Stereo(pcm, "doc_id",
        "left", "right", 44100, intensityBand = 4, blockMode = "mixed",
        msIntensity = true)
      operators.Multimodal.audioSpectrum(enc2, "id", "payload", fftSize = 256)
        .select(col("id"), col("sample_rate").cast("int").as("sample_rate"),
          col("peak_bin"), col("n_samples"))
        .orderBy("id")
    }),

    // THIRD-PARTY interop: decode a real MPEG-2 (LSF) Layer III stream
    // this repo's encoder did NOT write — 45 frames at 22.05 kHz with a
    // live bit reservoir, vendored from gsutil's public test data (see
    // resources/graft/thirdparty/README.md). The stream encodes digital
    // silence, so the decode is exactly reproducible: 45·576 granule
    // samples minus the fixed LeadingSkip = 24768 = 43 frames of 576,
    // every frame RMS exactly 0.0. A decoder that misparses the side
    // info, reservoir, or LSF scalefactors produces either nonzero rms
    // or a different frame count — both hash-visible to the oracle.
    "x_audio_mp3_interop" -> ((s, d) => {
      val in = getClass.getResourceAsStream("/graft/thirdparty/lsf_stream.mp3")
      require(in != null, "missing vendored interop fixture lsf_stream.mp3")
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toByteArray
        } finally in.close()
      val docs = spread(Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 40))
        .withColumn("payload", lit(bytes))
      operators.Multimodal.audioActivity(docs, "doc_id", "payload",
          frameSize = 576, threshold = 1.0)
        .orderBy("id", "frame_idx")
    }),

    // REAL image encode→decode roundtrip, oracle-exact: constant-value
    // truecolor PNGs synthesized from doc_id (w = 8 + id%9, h = 8 + id%7,
    // gray v = id*7 % 256), written by encodePng and read back through
    // the javax.imageio decode path. PNG is lossless and the raster
    // carries r=g=b=v, so the integer Rec.601 luma of every pixel is
    // exactly v and DuckDB recomputes width/height/mean_luma from id
    // arithmetic — the image half of the media pipeline is gated with
    // zero stub in the loop, the x_multimodal_flac convention.
    "x_image_decode" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 200)
        .withColumn("w", (pmod(col("doc_id"), lit(9)) + 8).cast("int"))
        .withColumn("h", (pmod(col("doc_id"), lit(7)) + 8).cast("int"))
        .withColumn("pixels", array_repeat(
          pmod(col("doc_id") * 7, lit(256)).cast("int"),
          (col("w") * col("h")).cast("int")))
      val png = operators.Multimodal.encodePng(docs, "doc_id", "pixels", "w")
      operators.Multimodal.decodeImages(png, "id", "payload")
        .select(col("id"), col("width"), col("height"),
          round(col("mean_luma"), 6).as("mean_luma"))
        .orderBy("id")
    }),

    // Image NEAR-dup end-to-end on REAL decoded pixels: 40 base patterns
    // (16×16, aHash-cell-aligned 2×2 blocks, bright/dark from bit c of
    // splitmix64(group) — pairwise Hamming ≥ 18, popcounts 18..40, both
    // verified offline and frozen by these constants), 8 docs per
    // pattern. Per-doc pixel noise (0..7 around 0/255) changes every
    // payload byte but no aHash bit — perceptually-identical, not
    // byte-identical; docs with (id div 40) % 4 == 3 additionally invert
    // cells 0-1, landing 2 Hamming bits away. encodePng → imageHashes →
    // banded Hamming join must recover exactly the within-group pairs
    // with hamming 0 (same flip state) or 2 (mixed) — structure DuckDB
    // recomputes from id arithmetic alone, so the whole perceptual-dedup
    // path (codec, hash, multi-index banding, verify) is hash-gated.
    "x_image_dedup" -> ((s, d) => {
      def mix(x: Long): Long = {
        var z = x + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val pats = typedLit((0 until 40).map { g =>
        val h = mix(g.toLong)
        (0 until 64).map(c => ((h >>> c) & 1L).toInt)
      })
      val grp = (pmod(col("doc_id"), lit(40)) + 1).cast("int")
      val flip = expr("doc_id DIV 40") % 4 === 3
      val docs = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 320)
        .withColumn("pixels", transform(sequence(lit(0), lit(255)), px => {
          val cell = shiftright(px, 5) * 8 +
            shiftright(px.bitwiseAND(lit(15)), 1)
          val base = element_at(element_at(pats, grp), (cell + 1).cast("int"))
          val bit = when(flip && cell < 2, lit(1) - base).otherwise(base)
          val noise = pmod(col("doc_id") * 7 + cell, lit(8))
          when(bit === 1, lit(255) - noise).otherwise(noise).cast("int")
        }))
        .withColumn("w", lit(16))
      val png = operators.Multimodal.encodePng(docs, "doc_id", "pixels", "w")
      val hashes = operators.Multimodal.imageHashes(png, "id", "payload")
      operators.Multimodal.nearDuplicateImages(hashes, "id", "ahash", 3)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // Exact connected components in O(log n) rounds (alternating
    // large-star/small-star): planted 50-long chains — diameter 49,
    // which min-label propagation would need 49 rounds to traverse —
    // collapse to their min id in a handful of star rounds. The scale
    // path for duplicate-cluster labeling on chain-shaped graphs.
    "x_connected_components" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val edges = docs.filter(pmod(col("doc_id"), lit(50)) =!= 49)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      operators.Dedup.connectedComponentsStar(edges, docs)
        .orderBy("id")
    }),

    // Vision preprocessing, oracle-exact: bilinear resize of a CONSTANT
    // raster is the constant (integer-exact through the lossless PNG
    // roundtrip), so encode → resize → decode gates the whole rescale
    // path from id arithmetic.
    "x_image_resize" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150)
        .withColumn("pixels", array_repeat(
          pmod(col("doc_id") * 11, lit(256)).cast("int"), 256))
        .withColumn("w", lit(16))
      val png = operators.Multimodal.encodePng(docs, "doc_id", "pixels", "w")
      val small = operators.Multimodal.resizeImages(png, "id", "payload", 8, 8)
      operators.Multimodal.decodeImages(small, "id", "payload")
        .select(col("id"), col("width"), col("height"),
          round(col("mean_luma"), 6).as("mean_luma"))
        .orderBy("id")
    }),

    // ViT-style patchification, oracle-exact: a deterministic gradient
    // raster rides the lossless PNG path, so every 4×4 patch's exact
    // integer-sum mean is recomputable in SQL.
    "x_image_patches" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 150)
        .withColumn("pixels", transform(sequence(lit(0), lit(255)),
          px => pmod(col("doc_id") * 3 + px, lit(256)).cast("int")))
        .withColumn("w", lit(16))
      val png = operators.Multimodal.encodePng(docs, "doc_id", "pixels", "w")
      operators.Multimodal.imagePatches(png, "id", "payload", patch = 4)
        .orderBy("id", "patch_idx")
    }),

    // Video NEAR-dup end-to-end on REAL frames: 30 clip groups × 3
    // frames, each frame a distinct splitmix pattern (90 patterns,
    // pairwise Hamming ≥ 17 verified offline) with per-doc pixel noise
    // that survives neither byte-compare nor JPEG bit-identity — clips
    // in a group are perceptually identical, nothing else is. Anchor-
    // frame banding generates candidates; the all-frames verify must
    // recover exactly the within-group pairs at max_hamming 0.
    "x_video_dedup" -> ((s, d) => {
      def mix(x: Long): Long = {
        var z = x + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val pats = typedLit((0 until 90).map { p =>
        val h = mix(p.toLong)
        (0 until 64).map(c => ((h >>> c) & 1L).toInt)
      })
      val base = pmod(col("doc_id"), lit(30)) * 3
      val docs = Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < 240)
        .withColumn("frames", transform(sequence(lit(0), lit(2)), f =>
          transform(sequence(lit(0), lit(255)), px => {
            val cell = shiftright(px, 5) * 8 +
              shiftright(px.bitwiseAND(lit(15)), 1)
            val bit = element_at(element_at(pats,
              (base + f + 1).cast("int")), (cell + 1).cast("int"))
            val noise = pmod(col("doc_id") * 7 + cell + f * 13, lit(8))
            when(bit === 1, lit(255) - noise).otherwise(noise).cast("int")
          })))
        .withColumn("w", lit(16))
      val avi = operators.Multimodal.encodeAviMjpeg(
        docs, "doc_id", "frames", "w", fps = 5)
      val hashes = operators.Multimodal.videoFrameHashes(avi, "id", "payload")
      operators.Multimodal.nearDuplicateVideos(hashes, "id", "frame_idx",
          "ahash", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Fuzzy record linkage: blocked Jaro–Winkler over part names. The
    // native JaroWinkler expression is pinned bit-exact to DuckDB's
    // jaro_winkler_similarity (20k random pairs, four alphabets — see
    // TextExpressionsSpec), so the oracle recomputes the SAME blocking
    // (prefix/suffix keys), the SAME candidate join, and the SAME scores;
    // filter on the raw double BEFORE the 6dp display round on both sides.
    "x_fuzzy_linkage" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_partkey") <= 400)
        .select(col("p_partkey").as("id"), col("p_name").as("nm"))
      operators.Dedup.fuzzyLinkage(p, "id", "nm", 0.92, blockLen = 8)
        .select(col("id_a"), col("id_b"),
          round(col("similarity"), 6).as("similarity"))
        .orderBy("id_a", "id_b")
    }),

    // Multimodal: stubbed decode over mapPartitions batches. The stub
    // derives features from the payload md5, so the DuckDB oracle can
    // recompute every row in SQL (md5_number_lower + unsigned math) —
    // the mapPartitions plumbing is hash-gated end-to-end. allowStub:
    // this gate EXISTS to pin the stub plumbing; production media rows
    // (x_audio_*, x_image_*, x_video_*) use the real decoders, and the
    // default-off stub throws so nothing trains on fakes silently.
    "x_multimodal_features" -> ((s, d) => {
      val withBin = operators.Multimodal.withBinaryPayload(
        Tables.documents(s, d), "text", "payload")
      operators.Multimodal.sampleFrameIndexes(
        operators.Multimodal.extractFeatures(withBin, "doc_id", "payload",
          allowStub = true),
        every = 2)
        .withColumn("sampled_frames", col("sampled_frames").cast("string"))
        .orderBy("id")
    }),

    // Benchmark decontamination: docs from source 'src0' act as the eval
    // corpus; every other doc is flagged if it shares a word 3-gram with
    // it. Benchmark shingle set is broadcast — the training side is
    // probed map-side (no shuffle at the join).
    "x_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Corpus.decontaminate(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", 3)
        .orderBy("doc_id")
    }),

    // Contamination fraction (the reporting sibling of the binary
    // flag): share of each training doc's distinct trigrams found in
    // the src0 benchmark suite + severity bucket — "trim the quote"
    // vs "drop the doc" triage. Denominator is a per-row projection;
    // numerator reuses the probe-first broadcast.
    "x_contamination_frac" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      operators.Corpus.contaminationFraction(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", 3)
        .orderBy("doc_id")
    }),

    // Embedding-space decontamination (the semantic sibling: catches
    // paraphrased benchmark leakage n-gram overlap misses): vectors
    // with vec_id % 20 == 0 act as the eval suite; a training vector
    // is contaminated at rounded cosine ≥ 0.9 to ANY of them. Eval
    // side broadcast, map-side codegen cosine, per-row max is one
    // combinable hash agg — the training corpus shuffles one row per
    // doc, never the cross product.
    "x_decontaminate_embed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      operators.Corpus.decontaminateEmbeddings(
        e.filter(pmod(col("vec_id"), lit(20)) =!= 0),
        e.filter(pmod(col("vec_id"), lit(20)) === 0),
        "vec_id", "embedding", threshold = 0.9)
        .orderBy("vec_id")
    }),

    // Sequence packing: fixed 512-token bins in doc_id order via the
    // two-phase global cumulative sum (no single-partition window).
    "x_pack" -> ((s, d) =>
      operators.Corpus.packSequences(Tables.documents(s, d), "doc_id", "text", 512L)
        .orderBy("doc_id")),

    // Packed bins materialized as training sequences (id-ordered concat,
    // per-bin doc/token accounting).
    "x_pack_text" -> ((s, d) =>
      operators.Corpus.binTexts(Tables.documents(s, d), "doc_id", "text", 512L)
        .orderBy("bin_id")),

    // Source balancing: every source capped at 10 docs, hash-ordered
    // deterministic prefix — per-source counts prove the cap, kept ids
    // prove the exact prefix choice.
    "x_balance" -> ((s, d) =>
      operators.Corpus.capPerStratum(Tables.documents(s, d), "doc_id", "source", 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
        .orderBy("source")),

    // Deterministic 20% corpus sample: md5-hash keep-set reproducible in
    // any engine (auditable sampling); per-source counts show the
    // stratification is uniform.
    "x_sample" -> ((s, d) =>
      operators.Corpus.deterministicSample(Tables.documents(s, d), "doc_id", 200)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
        .orderBy("source")),

    // Deterministic 15% token masking (the MLM/span-corruption preview):
    // per-(doc, position) md5-56 buckets decide the mask — the corrupted
    // corpus is bit-identical in any engine (auditable pretraining
    // corruption). Pure indexed-transform projection, no explode.
    "x_mask_tokens" -> ((s, d) =>
      operators.Corpus.maskTokens(Tables.documents(s, d), "doc_id",
        "text", permille = 150)
        .orderBy("doc_id")),

    // multi_match (ES): one analyzed query over (text ×1, lang ×3) —
    // best_fields takes the max boosted field score (dis_max
    // semantics), most_fields sums the evidence. Integer tf × exact
    // boosts: engine-exact doubles, no rounding.
    "q_multi_match" -> ((s, d) =>
      DocQueries.multiMatch(
        Tables.documents(s, d).select("doc_id", "text", "lang"),
        Seq(("text", 1.0), ("lang", 3.0)), "merge window de",
        "best_fields", 20)
        .select("doc_id", "score")),
    "q_multi_match_most" -> ((s, d) =>
      DocQueries.multiMatch(
        Tables.documents(s, d).select("doc_id", "text", "lang"),
        Seq(("text", 1.0), ("lang", 3.0)), "merge window de",
        "most_fields", 20)
        .select("doc_id", "score")),

    // combined_fields (ES): title (synthetic first-5-tokens field, ×2)
    // + body (×1) scored as ONE combined field — weighted tf/dl sums
    // feed a single BM25, so idf saturation is SHARED across fields
    // (the term-centric alternative to multi_match's field-centric
    // max/sum). Integer weights keep combined tf/dl exact integers;
    // stats are one broadcast row, cut is TakeOrderedAndProject.
    "q_combined_fields" -> ((s, d) => {
      val toks = filter(split(lower(col("text")), " "), x => x =!= lit(""))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          array_join(slice(toks, 1, 5), " ").as("title"))
      DocQueries.combinedFields(docs, "doc_id",
        Seq(("title", 2.0), ("text", 1.0)), "merge window scan", 20)
    }),

    // sparse_vector query (ES / SPLADE-ELSER serving shape): query =
    // term→weight map, doc = sparse impact vector, score = dot product.
    // Postings-based: the exploded token stream prunes to the query's
    // terms BEFORE any shuffle, df/N/weights ride broadcasts, the cut
    // is TakeOrderedAndProject. Contributions round 6dp and sum as
    // exact decimals.
    "q_sparse_vector" -> ((s, d) =>
      DocQueries.sparseVectorQuery(Tables.documents(s, d),
        "doc_id", "text",
        Seq(("merge", 1.5), ("window", 1.0), ("scan", 0.7),
          ("data", 0.3)), 20)),

    // nested query + inner_hits (ES): every conjunct must hold on the
    // SAME nested doc — an order whose big line and discounted line are
    // DIFFERENT lines matches the flattened object mapping but not
    // this. Parents are orders, nested docs their lineitems
    // (collect_list struct — one keyed shuffle to build the nested
    // view); the query itself is a pure array-filter projection, no
    // block-join. inner_hits surface as the sorted matching line
    // numbers. Predicate fields stay raw doubles: a filter compares,
    // never sums, so the double is engine-exact.
    "q_nested" -> ((s, d) => {
      val nested = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_linenumber").as("ln"),
          col("l_quantity").as("qty"), col("l_discount").as("disc")))
          .as("items"))
      DocQueries.nestedQuery(nested, "items",
          x => x.getField("qty") >= 45 && x.getField("disc") >= 0.08)
        .select(col("l_orderkey").as("o_orderkey"),
          size(col("inner_hits")).cast("long").as("n_hits"),
          array_join(transform(array_sort(col("inner_hits")),
            x => x.getField("ln").cast("string")), ",").as("hit_lines"))
        .orderBy("o_orderkey")
    }),

    // terms lookup (ES): the membership values come from ONE stored
    // document (GET → path), not the query body — "docs in the same
    // language as doc 123". The lookup fetch is an id-pruned one-row
    // broadcast, the filter a left-semi join; no driver round-trip.
    "q_terms_lookup" -> ((s, d) =>
      DocQueries.termsLookup(Tables.documents(s, d)
          .select("doc_id", "lang"), "doc_id", 123L, "lang", "lang")
        .select("doc_id", "lang").orderBy("doc_id")),

    // function_score random_score (ES): seeded deterministic [0,1)
    // score per (seed, doc) over the match recall set — reproducible
    // result shuffling / A-B bucketing, the md5-56 sampling-hash
    // convention reduced mod 10^6 (integer-exact before one shared
    // division), never an RNG.
    "q_random_score" -> ((s, d) =>
      DocQueries.randomScoreQuery(Tables.documents(s, d)
          .select("doc_id", "text"), "doc_id", "text",
        "merge window", 7, 20)),

    // DSIR importance resampling (Xie et al. 2023): rank raw docs by
    // how target-like their hashed unigram+bigram features are —
    // Σ c_b·(ln p_target(b) − ln p_raw(b)) over 256 md5-56 bins, one
    // explode pass feeding both distributions, ratios a 256-row
    // broadcast, per-doc sums exact decimal. Target domain: src0.
    "x_dsir" -> ((s, d) =>
      operators.Corpus.dsirWeights(Tables.documents(s, d), "doc_id",
        "text", col("source") === "src0", 256)
        .orderBy(col("weight").desc, col("doc_id")).limit(50)),

    // DoReMi-style mixture reweighting: per-source eval feedback
    // (here: a length-proxy loss) exponentiates into the next round's
    // sampling weights, normalized through an exact decimal sum.
    "x_mix_reweight" -> ((s, d) => {
      val per = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("_n"), sum(col("n_chars")).as("_sc"))
      val tot = per.agg(sum(col("_n")).as("_tot"))
      val base = per.crossJoin(broadcast(tot))
        .select(col("source"),
          (col("_n").cast("double") / col("_tot")).as("weight"),
          (col("_sc").cast("double") / col("_n") / 1000.0).as("loss"))
      operators.Corpus.reweightMixture(base, "source", "weight", "loss",
          eta = 0.5)
        .select(col("source"), round(col("weight"), 6).as("weight"),
          round(col("loss"), 6).as("loss"), col("new_weight"))
        .orderBy("source")
    }),

    // Blocklist screening: one Aho-Corasick pass per doc over a
    // substring pattern list (the content-filter step; O(text) per doc
    // regardless of blocklist size). Patterns include a multi-word
    // substring and an absent term; oracle re-derives each match with
    // per-pattern contains() in the same order.
    "x_blocklist" -> ((s, d) =>
      operators.TextAnalysis.blocklistScreen(Tables.documents(s, d),
        "doc_id", "text", Seq("merge", "window scan", "qqqabsent", "stream"))
        .orderBy("doc_id")),

    // Unicode canonicalization: planted DECOMPOSED accents (e +
    // U+0301), uppercase Greek/Latin-1, and tab/space runs prefixed to
    // each doc — the engine must produce the same composed, simple-
    // case-folded, space-collapsed string DuckDB's
    // nfc_normalize/lower/regexp pipeline does, byte for byte.
    "x_text_normalize" -> ((s, d) => {
      val raw = concat(lit("  Caf"), lit("é"), lit(" \t ÜBER "),
        lit("ΣΙΓΜΑ  "),
        upper(coalesce(col("text"), lit(""))))
      operators.TextAnalysis.normalizeText(
          Tables.documents(s, d).select(col("doc_id"), raw.as("text")),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // T5-style span corruption: stride-4 segments fire per md5-56
    // bucket, fired segments mask 1-3 tokens behind one ordered
    // sentinel; targets carry sentinel+span pairs plus the closing
    // sentinel. CorpusSpec pins the round-trip property (substituting
    // targets back into masked_text reproduces the original tokens).
    "x_mask_spans" -> ((s, d) =>
      operators.Corpus.maskSpans(Tables.documents(s, d), "doc_id",
        "text", permille = 300, stride = 4, maxSpan = 3)
        .orderBy("doc_id")),

    // Overlapping token-window chunking: 50-token windows advancing by 40
    // (10-token overlap) — the RAG/context-window prep step. Pure per-row
    // generate+project, no shuffle.
    "x_chunk" -> ((s, d) =>
      operators.Corpus.chunk(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 50, overlap = 10)
        .orderBy("doc_id", "chunk_id")),

    // Corpus version diff: "before" = docs < 450, "after" = docs ≥ 50
    // with the first 100 of those rewritten — every id classified
    // added/removed/changed/unchanged off (id, hash) projections only.
    "x_corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val before = docs.filter(col("doc_id") < 450)
      val after = docs.filter(col("doc_id") >= 50)
        .withColumn("text",
          when(col("doc_id") < 150, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      operators.Corpus.diff(before, after, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Deterministic train/val/test split: 10% test, 10% val by md5-56
    // bucket — per-document assignment gated row-for-row (the stability
    // property: an id's split never depends on the rest of the corpus).
    "x_split" -> ((s, d) =>
      operators.Corpus.hashSplit(Tables.documents(s, d),
        "doc_id", valPermille = 100, testPermille = 100)
        .select("doc_id", "split")
        .orderBy("doc_id")),

    // Leakage-safe split: bucket by content fingerprint, not id, so
    // token-set-identical near-copies can never straddle train/test.
    // Gated row-for-row (doc_id, fingerprint, split) — the oracle
    // recomputes the fingerprint and its md5-56 bucket independently.
    "x_split_leakage" -> ((s, d) =>
      operators.Corpus.leakageSafeSplit(Tables.documents(s, d), "text",
        valPermille = 100, testPermille = 100)
        .select("doc_id", "fingerprint", "split")
        .orderBy("doc_id")),

    // Weighted sampling without replacement (Efraimidis–Spirakis): 100
    // docs drawn ∝ n_chars — kept ids and 9dp priorities row-for-row.
    "x_weighted_sample" -> ((s, d) =>
      operators.Corpus.weightedSample(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        "doc_id", col("n_chars"), k = 100)
        .select("doc_id", "n_chars", "priority")
        .orderBy("priority", "doc_id")),

    // Exact-count stratified sampling: per-source quotas (src0 → 5,
    // src1 → 12, rest → 8) keep the k hash-smallest docs per source —
    // kept doc ids gated row-for-row, proving count-exactness AND the
    // engine-reproducible rank order.
    "x_quota_sample" -> ((s, d) =>
      operators.Corpus.quotaSample(Tables.documents(s, d), "doc_id", "source",
        Map("src0" -> 5, "src1" -> 12), defaultQuota = 8)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Mixture sampling: per-source keep rates (src0 full, src1 half,
    // src2 quarter, everything else 10%) — per-source kept counts + id
    // sums prove the exact engine-reproducible kept-set.
    "x_mix" -> ((s, d) =>
      operators.Corpus.mixtureSample(Tables.documents(s, d), "doc_id", "source",
        Map("src0" -> 1000, "src1" -> 500, "src2" -> 250), defaultPermille = 100)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
        .orderBy("source")),

    // Token-budget cap per source: each source keeps its hash-ordered
    // prefix until 600 tokens are spent (first over-budget doc included) —
    // the budget-based twin of x_balance.
    "x_token_budget" -> ((s, d) =>
      operators.Corpus.capTokensPerStratum(Tables.documents(s, d),
        "doc_id", "source", "text", tokenBudget = 600L)
        .select("doc_id", "source", "n_tokens", "tokens_before")
        .orderBy("doc_id")),

    // Corpus-wide frequent-trigram mining (boilerplate detection): top 20
    // word 3-grams by total count with containing-doc counts. Hot keys are
    // bounded by map-side partials; the top-k is TakeOrderedAndProject.
    "x_boilerplate" -> ((s, d) =>
      operators.TextAnalysis.topNgrams(Tables.documents(s, d),
        "doc_id", "text", n = 3, k = 20)),

    // Exact KNN join: 5 query vectors (broadcast) × corpus, ranked by the
    // bounded TopKByScore aggregate — O(k) state map-side, no window over
    // the scored corpus. Row-for-row against the oracle's rank window.
    "x_knn_join" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      operators.Similarity.knnJoin(e, q, "vec_id", "embedding",
        "query_id", "qv", k = 5)
        .orderBy("query_id", "rk")
    }),

    // Binary quantization serving: 1-bit-per-dim packed signatures,
    // Hamming-distance shortlist (xor+popcount over ONE long per
    // vector), exact-cosine rescore of the shortlist — the BQ/rescore
    // pattern of modern vector stores. Both cuts TakeOrderedAndProject.
    "x_sim_binary" -> ((s, d) =>
      operators.Similarity.binaryTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", dim = 64, queryId = 0L,
        rerank = 20, k = 10)
        .orderBy(col("cosine").desc, col("vec_id"))),

    // Matryoshka truncated-prefix serving: 16-of-64-dim shortlist (1/4
    // the scan bandwidth), exact full-dim rescore of the 100-candidate
    // pool. These synthetic embeddings are NOT MRL-trained, so the
    // pool-holds convention does not apply — the oracle instead REPLAYS
    // the deterministic shortlist cut (6dp-rounded prefix cosine, id
    // tie-break) and rescores it, gating the operator's actual
    // contract end-to-end.
    "x_sim_mrl" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      operators.Similarity.matryoshkaTopK(
          e.select("vec_id", "embedding"), "vec_id", "embedding",
          qv, dims = 16, k = 10, rescoreK = 100)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    }),

    // MMR diversified rerank: top-20 cosine candidates for the vec_id=0
    // query, then 5 greedy maximal-marginal-relevance picks at λ=0.75
    // (λ chosen with an exact binary representation so 1−λ is the same
    // double in both engines). The oracle REPLAYS the greedy loop as 5
    // unrolled SQL stages over the same 6dp-rounded cosines — a wrong
    // penalty max, tie-break, or rounding order anywhere diverges the
    // selection, not just a score digit.
    "x_sim_mmr" -> ((s, d) => {
      val e = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("_qv")).limit(1)
      val cand = e.crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(functions.VectorExpressions.cosineFast(
            col("embedding"), col("_qv")), 6).as("rel"),
          col("embedding"))
        // nanvl: a zero vector's NaN cosine must rank LAST, never first
        // (desc NaN ordering — the x_sim_topk convention)
        .orderBy(nanvl(col("rel"), lit(Double.NegativeInfinity)).desc,
          col("vec_id"))
        .limit(20)
        .withColumn("query_id", lit(0L))
      operators.Similarity.mmrRerank(cand, "query_id", "vec_id", "rel",
          "embedding", k = 5, lambda = 0.75)
        .select("rk", "cand_id", "mmr_score")
        .orderBy("rk")
    }),

    // Sparse random projection (Achlioptas JL): 64 -> 16 dims via the
    // seed-derived sign matrix, unrolled into codegen'd add/subtract
    // chains at plan time — the pre-ANN dimensionality-reduction step.
    // The oracle REBUILDS the identical matrix from the seed (shared
    // md5-56 convention) and mirrors the summation order term by term.
    // Components flatten to (vec_id, dim, value) rows for the compare
    // (the driver's hasher takes scalars, not arrays).
    "x_embed_project" -> ((s, d) =>
      operators.Similarity.randomProjection(Tables.embeddings(s, d),
        "vec_id", "embedding", inDim = 64, outDim = 16, seed = 7)
        .select(col("vec_id"),
          posexplode(col("projected")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")),

    // L2 normalization: per-row pre/post norms (unit after, up to 6dp) and
    // a checksum component — the ingest canonicalization gate. Norms run
    // through the native vector_dot loop (same left-to-right double sum as
    // the HOF norm2, ~50× cheaper per row); the normalized vector itself
    // is the l2Normalize operator output.
    "x_embed_norm" -> ((s, d) => {
      val e = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
      def norm(c: Column): Column =
        sqrt(functions.VectorExpressions.dotFast(c, c))
      val nv = functions.VectorFunctions.l2Normalize(col("embedding"))
      val nb = norm(col("embedding"))
      e.select(col("vec_id"),
          round(nb, 6).as("norm_before"),
          round(norm(nv), 6).as("norm_after"),
          // c0 = e[0]/‖e‖ directly — bit-identical to element_at(nv, 1)
          // (same IEEE division) without a second interpreted-HOF
          // evaluation of the transform
          round(when(nb === 0.0, element_at(col("embedding"), 1).cast("double"))
            .otherwise(element_at(col("embedding"), 1).cast("double") / nb), 6)
            .as("c0"))
        .orderBy("vec_id")
    }),

    // Windowed dedup: one survivor (+ duplicate count) per (user, hour) —
    // the batch twin of streaming dropDuplicatesWithinWatermark; one hash
    // agg keyed by (window, user), no window function.
    "x_dedup_windowed" -> ((s, d) =>
      operators.Dedup.firstPerWindow(Tables.events(s, d), "user_id", "ts",
        "event_id", "1 hour")
        .orderBy("user_id", "window_us")),

    // Bloom-pruned semi-join: purchases by users who ever errored. The
    // distributed-built sketch prunes probe rows map-side BEFORE the join
    // shuffle; the exact semi-join over survivors keeps the result
    // identical to the oracle's plain semi-join (no false negatives).
    "x_bloom_prune" -> ((s, d) => {
      val ev = Tables.events(s, d)
      operators.BloomJoin.semiJoinPruned(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id"),
        ev.filter(col("event_type") === "error").select("user_id"),
        "user_id", "user_id", expectedKeys = 100000L)
        .select("event_id", "user_id")
        .orderBy("event_id")
    }),

    // Sketch-based distinct counts gated against exact: the HLL++
    // estimate (rsd 2%) must land within 5% of the exact count —
    // deterministic given the data, same gate style as the ANN recall
    // rows. At 100 TB the approx pass is one map-side-combinable agg over
    // fixed-size sketches where the exact pass needs a full shuffle of
    // the distinct keys.
    "x_sketch_distinct" -> ((s, d) =>
      Tables.events(s, d).agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), 0.02).as("_au"),
        countDistinct(col("event_type")).as("n_types"),
        approx_count_distinct(col("event_type"), 0.02).as("_at"))
        .select(col("n_users"),
          (abs(col("_au") - col("n_users")) <= col("n_users") * 0.05)
            .as("users_ok"),
          col("n_types"),
          (abs(col("_at") - col("n_types")) <= greatest(col("n_types") * 0.05, lit(1.0)))
            .as("types_ok"))),

    // Sketch-based quantiles gated against exact: approx_percentile is a
    // fixed-size mergeable QuantileSummaries sketch (map-side combine, one
    // stats row to the driver) — the scale path that replaces agg_stats'
    // sort-heavy exact percentiles at 100 TB. Rank accuracy 10000 → the
    // estimates must land within 1% of the exact interpolated values.
    // BENCH NOTE: ~80% of this query's wall time is the GATE, not the
    // operator — the exact `percentile` trio (full per-group sort) exists
    // only to bound the sketch within ±1%. The operator under test is the
    // mergeable `percentile_approx` sketch alone (fixed-size partials,
    // map-side combinable — the 100 TB path).
    // One sketch and one exact buffer for all three quantiles (array
    // percentages) — the scalar-per-quantile form built 3 independent
    // sketches and 3 full exact-percentile buffers, tripling the
    // dominant cost for identical gate semantics (5.8 s → ~2 s at sf0.1).
    "agg_quantile_sketch" -> ((s, d) => {
      val ps = array(lit(0.5), lit(0.9), lit(0.99))
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        percentile_approx(col("l_extendedprice"), ps, lit(10000)).as("_a"),
        percentile(col("l_extendedprice"), ps).as("_e"))
        .select(col("n_rows"),
          (abs(element_at(col("_a"), 1) - element_at(col("_e"), 1))
            <= element_at(col("_e"), 1) * 0.01).as("p50_ok"),
          (abs(element_at(col("_a"), 2) - element_at(col("_e"), 2))
            <= element_at(col("_e"), 2) * 0.01).as("p90_ok"),
          (abs(element_at(col("_a"), 3) - element_at(col("_e"), 3))
            <= element_at(col("_e"), 3) * 0.01).as("p99_ok"))
    }),

    // Salted SHUFFLE join: a skewed probe side spreads each key over 8
    // reducers, the build side replicates once per salt — the hot-key
    // remedy when the build side is too large to broadcast. The gate
    // proves the salt is INVISIBLE: per-user aggregates ≡ a plain join.
    "x_skew_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), dec(col("value")).as("v"))
      val dim = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("user_events"))
      operators.Skew.saltedJoin(ev, dim, Seq("user_id"), salts = 8,
          spreadCols = Seq("event_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), max("user_events").as("user_events"),
          sum(col("v")).cast("double").as("sum_value"))
        .orderBy("user_id")
    }),

    // Two-phase salted aggregation gated against the plain GROUP BY: the
    // skew-mitigation path must be bit-identical to the direct plan.
    // Decimal sums make the result independent of partial-merge order
    // (double addition is not associative across salt buckets).
    "x_skew_agg" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("v", col("value").cast("decimal(18,6)"))
      operators.Skew.saltedAgg(ev, Seq("event_type"),
        Seq(operators.Skew.AggSpec("v", "sum"),
          operators.Skew.AggSpec("v", "count"),
          operators.Skew.AggSpec("v", "min"),
          operators.Skew.AggSpec("v", "max")),
        salts = 8, spreadCols = Seq("event_id"))
        .select(col("event_type"),
          col("sum_v").cast("double").as("sum_value"),
          col("count_v").as("n"),
          col("min_v").cast("double").as("min_value"),
          col("max_v").cast("double").as("max_value"))
        .orderBy("event_type")
    }),

    // Adaptive quality floor: keep docs at or above the corpus's exact
    // P25 token count — threshold selection as part of the plan (single
    // broadcast percentile row), not a magic constant. The curation
    // pattern for "drop the shortest quartile of every source dump".
    "x_quality_floor" -> ((s, d) => {
      val q = Tables.documents(s, d).select(col("doc_id"),
        functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val thr = q.agg(
        percentile(col("n_tokens").cast("double"), lit(0.25)).as("p25"))
      q.crossJoin(broadcast(thr))
        .filter(col("n_tokens").cast("double") >= col("p25"))
        .select(col("doc_id"), col("n_tokens"), round(col("p25"), 6).as("p25"))
        .orderBy("doc_id")
    }),

    // Token-length histogram (20-token buckets): the corpus shape report
    // a mixing/curation run reads first. One map-side projection + one
    // bucket-keyed aggregate.
    "x_len_hist" -> ((s, d) =>
      Tables.documents(s, d)
        .select(functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n"))
        .groupBy((col("n") / 20).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"), min("n").as("min_tokens"),
          max("n").as("max_tokens"), sum("n").as("sum_tokens"))
        .orderBy("bucket")),

    // Type-token ratio: vocabulary richness per doc (cheap spam signal).
    "x_text_ttr" -> ((s, d) =>
      operators.TextAnalysis.typeTokenRatio(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Per-doc token entropy in nats (information density). Contributions
    // round-9 then decimal-summed — order-independent across engines.
    "x_text_entropy" -> ((s, d) =>
      operators.TextAnalysis.tokenEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Ordered funnel view → click → purchase: per-stage completion
    // counts + user-id checksums (ordering matters — a purchase before
    // the user's first post-view click does not count).
    "x_funnel" -> ((s, d) =>
      operators.Funnel.funnelCounts(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"))),

    // Memorization-risk audit: fraction of each doc's 3-gram shingles
    // appearing in ≥1 other document (the post-dedup verbatim-repeat
    // signal; same shingle convention as the n-gram dedup family).
    "x_memorization" -> ((s, d) =>
      operators.TextAnalysis.memorizationRisk(
        Tables.documents(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id")),

    // Distribution shift: per-source KL divergence from the corpus
    // unigram mixture — the which-source-drifted report.
    "x_source_kl" -> ((s, d) =>
      operators.TextAnalysis.sourceDivergence(
        Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    // Corpus cross-entropy (perplexity proxy): per-doc mean −ln of each
    // token's corpus unigram probability — the model-free quality signal
    // (OOD/gibberish text scores high). 9dp-decimal contribution sum
    // makes the score merge-order-independent (the x_text_entropy trick).
    "x_unigram_ce" -> ((s, d) =>
      operators.TextAnalysis.unigramCrossEntropy(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Heavy hitters via the Misra-Gries sketch: O(k) aggregate state no
    // matter the vocabulary. With k ≥ distinct terms the sketch is
    // provably exact, so the gate pins it against plain GROUP BY counts;
    // the sub-vocabulary approximation bounds are spec-gated.
    "x_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(
        explode(functions.TextFunctions.tokens(lower(col("text")))).as("term"))
      toks.agg(functions.SketchAggregates.misraGries(col("term"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("term"), col("e.count").as("n"))
        .orderBy(col("n").desc, col("term"))
    }),

    // Padding-waste report: token waste per bucketing policy
    // (global-max / pow2 / mult-of-64) — the numbers that pick the
    // batch-inference bucketing. One scan, one moments row, policy
    // rows explode from it.
    "x_pad_waste" -> ((s, d) =>
      operators.Corpus.paddingWaste(Tables.documents(s, d), "text")),

    // Zipf power-law fit (data-card corpus health): least-squares
    // ln freq ~ ln rank over the vocabulary frame; moments sum
    // 9dp-rounded decimals, closed-form slope/intercept/R² rounds 6dp.
    "x_zipf" -> ((s, d) =>
      operators.TextAnalysis.zipfFit(Tables.documents(s, d), "text")),

    // Count-min sketch point queries (depth 4 × width 16 — narrow so
    // the 31-token vocabulary actually collides): est = min over rows
    // of the hashed cell, never an undercount; an absent term's
    // estimate is pure collision mass. The grid builds from a
    // vocabulary-space aggregate (items never explode ×depth) and both
    // probe joins are grid-sized. md5-56 buckets, oracle-rebuildable.
    "x_sketch_countmin" -> ((s, d) => {
      val probeTerms = Seq("join", "hash", "scan", "filter", "zzz_absent")
      val toks = Tables.documents(s, d).select(
        explode(functions.TextFunctions.tokens(lower(col("text"))))
          .as("term"))
      val cells = operators.CountMin.sketch(toks, "term", 4, 16)
      val truth = toks.filter(col("term").isin(probeTerms: _*))
        .groupBy("term").agg(count(lit(1)).as("_tc"))
      operators.CountMin.estimate(cells, probeTerms, 4, 16)
        .join(truth, Seq("term"), "left")
        .select(col("term"), col("est"),
          coalesce(col("_tc"), lit(0L)).as("true_count"),
          (col("est") - coalesce(col("_tc"), lit(0L))).as("overcount"))
        .orderBy("term")
    }),

    // Interpolated bigram cross-entropy (λ=0.8 bigram MLE backed off to
    // unigram): the sequence-aware quality signal — catches
    // common-words-in-wrong-order text that unigram CE scores as fluent.
    "x_bigram_ce" -> ((s, d) =>
      operators.TextAnalysis.bigramCrossEntropy(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Bounded-window funnel: each transition must land within 3 days of
    // the previous stage ("click within 3 days of the view") — the
    // product-analytics shape real funnels use. One extra predicate in
    // each stage join; identical scale shape to x_funnel.
    "x_funnel_window" -> ((s, d) =>
      operators.Funnel.funnelCounts(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase"),
        maxGap = Some(lit(259200000000L)))), // 3 days in microseconds

    // Gap-based sessionization: every event tagged with its user's
    // session index (12h inactivity gap). One user-partitioned window
    // pass; state is events-per-user-sized.
    // Cross-source contamination report: shared content fingerprints +
    // Jaccard per source pair (distinct-first: a fingerprint joins as
    // ≤ sources rows no matter how many docs carry it).
    "x_source_overlap" -> ((s, d) =>
      operators.Corpus.sourceOverlap(
        Tables.documents(s, d).select(col("source"),
          functions.TextFunctions.fingerprint(col("text")).as("fingerprint")),
        "source", "fingerprint")
        .orderBy("source_a", "source_b")),

    // Mergeable distinct sketches — the 100 TB rollup pattern: one HLL
    // sketch per source (map-side aggregated), UNIONED into a corpus
    // estimate without touching rows again. Gate: merged estimate within
    // 5% of the exact distinct (computed here, gate overhead).
    "x_sketch_union" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merged = docs.groupBy("source")
        .agg(hll_sketch_agg(col("doc_id")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      merged.crossJoin(docs.agg(count_distinct(col("doc_id")).as("n")))
        .select(col("n"),
          (abs(col("est") - col("n")) <= col("n") * 0.05).as("est_ok"))
    }),

    // Global quality percentile WITHOUT a corpus-wide window: two-phase
    // range-partitioned prefix rank (withGlobalCumSum) — the percentile
    // normalization a naive Window.orderBy(score) would serialize
    // through one task at corpus scale. Total order (n_chars, doc_id).
    "x_quality_rank" -> ((s, d) =>
      operators.Corpus.globalPercentRank(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        struct(col("n_chars"), col("doc_id")), "pr")
        .select(col("doc_id"), col("n_chars"), round(col("pr"), 6).as("pr"))
        .orderBy("doc_id")),

    // Preference-pair construction (reward-model / DPO curation): per
    // source, the r-th best doc by score pairs with the r-th worst —
    // widest-margin-first; 25-doc groups yield 12 pairs, the median doc
    // pairs with nothing. Score = n_chars here so the oracle replays
    // the mirrored rankings exactly.
    "x_preference_pairs" -> ((s, d) =>
      operators.Corpus.preferencePairs(
        Tables.documents(s, d).select("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars", maxPairs = 50)
        .orderBy("source", "pair_rank")),

    // PCA rotation of the embedding corpus (data-derived counterpart of
    // x_embed_project): one covariance pass (dim² partials, corpus-size
    // independent), driver-side Jacobi eigensolve, projection as a pure
    // scan. Gated on the rotation INVARIANT: full-rank unwhitened PCA
    // preserves pairwise L2 distances, so each pair row carries the
    // input-space distance (bit-matched arithmetic: ascending-index
    // left-to-right sum in both engines) plus a Spark-side preservation
    // check with an EXPLICIT 1e-6 tolerance — no cross-engine float
    // compare ever touches the eigensolver's output.
    "x_embed_pca" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val rot = operators.Similarity.pcaRotate(
        emb, "vec_id", "embedding", dim = 64, k = 64)
      val pa = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      val pb = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
        .select((col("vec_id") - 100).as("id_a"),
          col("vec_id").as("id_b"), col("embedding").as("eb"))
      val ra = rot.filter(col("id") < 100)
        .select(col("id").as("id_a"), col("projected").as("ra"))
      val rb = rot.filter(col("id") >= 100 && col("id") < 200)
        .select((col("id") - 100).as("id_a"), col("projected").as("rb"))
      pa.join(pb, "id_a").join(ra, "id_a").join(rb, "id_a")
        .select(col("id_a"), col("id_b"),
          round(sqrt(graft.functions.VectorExpressions.l2sqFast(
            col("ea"), col("eb"))), 6).as("dist"),
          (abs(sqrt(graft.functions.VectorExpressions.l2sqFast(
              col("ra"), col("rb"))) -
            sqrt(graft.functions.VectorExpressions.l2sqFast(
              col("ea"), col("eb")))) < 1e-6).as("preserved"))
        .orderBy("id_a")
    }),

    // Domain-distribution mining: hosts of every URL mention (synthetic
    // URLs appended doc-deterministically, the x_text_pii convention —
    // the corpus carries none), the report feeding per-domain caps and
    // blocklist joins.
    "x_text_domains" -> ((s, d) =>
      operators.TextAnalysis.domainCounts(
        Tables.documents(s, d).withColumn("text",
          concat(col("text"), lit(" see https://site"),
            pmod(col("doc_id"), lit(7)), lit(".example.com/p/"),
            col("doc_id"), lit(" and https://common.org/x"))),
        "doc_id", "text")
        .orderBy("domain")),

    // Epoch-weighted mixture: src0 upsampled 2.5× (every doc twice + the
    // md5-56 half a third time), src1 1×, src2 0.5×, everything else
    // dropped — the training-mix materialization step, copy index kept.
    "x_mix_epochs" -> ((s, d) =>
      operators.Corpus.mixtureEpochs(
        Tables.documents(s, d).select("doc_id", "source"),
        "doc_id", "source",
        Map("src0" -> 2500, "src1" -> 1000, "src2" -> 500), 0)
        .orderBy("doc_id", "epoch")),

    "x_sessionize" -> ((s, d) =>
      operators.Sessions.sessionize(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us"),
        "user_id", "ts_us", lit(43200000000L)) // 12 hours in micros
        .orderBy("user_id", "ts_us")),

    // The SKEW-RESILIENT sessionize (two-phase spread — the hot-user
    // fallback measured flat on the skew probe axis), oracle-gated to
    // the SAME result as the window form at sf scale.
    "x_sessionize_spread" -> ((s, d) =>
      operators.Sessions.sessionizeSpread(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us"),
        "user_id", "ts_us", 43200000000L) // 12 hours in micros
        .orderBy("user_id", "ts_us")),

    // Trailing-7-day activity count per event (RANGE frame over epoch
    // micros — the engagement feature shape).
    "x_rolling_active" -> ((s, d) =>
      operators.Sessions.rollingCounts(
        Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
          .select("event_id", "user_id", "ts_us"),
        "user_id", "ts_us", 604800000000L) // 7 days in micros
        .orderBy("user_id", "ts_us")),

    // Runtime field over semi-structured props (the ES runtime-mapping
    // shape): a typed JSON extraction projected at query time and
    // aggregated like any stored column — one codegen'd projection, no
    // schema migration.
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n"), min("k").as("min_k"),
          max("k").as("max_k"), sum("k").as("sum_k"))
        .orderBy("event_type")),

    // JSON-payload key profile: per-key presence/cardinality/range over
    // the events props column — the schema-drift report for
    // semi-structured payloads (values compared as strings). The
    // operator's distinct count is HLL++ (fixed-size state); the gate
    // checks it within ±5% of an exact count computed HERE — gate
    // overhead, not operator cost (the x_profile precedent).
    "x_json_profile" -> ((s, d) => {
      val kv = Tables.events(s, d).select(
        explode(from_json(col("props"), MapType(StringType, StringType)))
          .as(Seq("key", "value")))
      val exact = kv.groupBy("key").agg(count_distinct(col("value")).as("_e"))
      operators.Profile.jsonKeyProfile(Tables.events(s, d), "props")
        .join(exact, "key")
        .select(col("key"), col("n_present"), col("min_value"),
          col("max_value"),
          (abs(col("approx_values") - col("_e")) <= col("_e") * 0.05)
            .as("values_ok"))
        .orderBy("key")
    }),

    // Weekly cohort retention: users bucketed by first-active week,
    // counted per (cohort, weeks-since) offset. Pure hash aggregates.
    "x_retention" -> ((s, d) =>
      operators.Funnel.retention(
        Tables.events(s, d)
          .withColumn("wk", expr("unix_micros(ts) DIV 604800000000")),
        "user_id", col("wk"))
        .orderBy("cohort", "offset")),

    // JSONL source scan: documents round-tripped through newline-
    // delimited JSON with two planted poison lines — the explicit-schema
    // reader parses one text scan, corrupt lines route to the DLQ leg
    // (source-level poison-pill contract), good rows must equal the
    // table exactly.
    "s_jsonl_scan" -> ((s, d) => {
      val dir = tempDir("graft-jsonl")
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      Tables.documents(s, d).select(cols.map(col): _*)
        .write.mode("overwrite").json(s"$dir/data")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/data/zz-poison.json"),
        "{broken json\n\n[1, 2, 3]\n")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      val (good, _) = sources.JsonlSource.read(s, s"$dir/data", schema)
      good.orderBy("doc_id")
    }),

    // BPE merge TRAINING: 8 merges learned from the corpus vocabulary,
    // emitted in rank order. nMerges is a plan LITERAL, so the
    // data-dependent argmax loop unrolls into 8 chained CTE stages in
    // the oracle (see [[bpeTrainOracle]] — the inPolygon plan-time-
    // unroll trick). Also pinned in TextAnalysisSpec (hand-computed
    // merges, tie-break, early stop, train→apply round trip).
    // BPE APPLY off a plan-literal merge table — the serving twin of
    // x_bpe_train (training learns the table offline; encoding applies
    // it per row). The BpeTokens expression runs the standard greedy
    // lowest-rank-first fixpoint per word; with a collision-free table
    // (no merge output ever equals an earlier merge's part, so earlier
    // pairs can never re-form) that loop is CONFLUENT with one merge
    // pass per rank in order — which is exactly 8 chained `replace`
    // stages over the chr(31)-delimited symbol string in the oracle,
    // word boundaries held apart by chr(30).
    "x_bpe_apply" -> ((s, d) => {
      val toks = functions.TextExpressions.bpeTokens(
        lower(col("text")), bpeApplyMerges)
      Tables.documents(s, d).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          array_join(toks, " ").as("tok_str"))
        .orderBy("doc_id")
    }),

    // Tokenizer fertility: tokens-per-char by language under the fixed
    // BPE table — the "how expensive is this slice to train on" metric
    // (a high-fertility language burns budget per character). Exact
    // integer sums; one ratio division.
    "x_bpe_fertility" -> ((s, d) => {
      val toks = functions.TextExpressions.bpeTokens(
        lower(col("text")), bpeApplyMerges)
      Tables.documents(s, d)
        .select(col("lang"), size(toks).cast("long").as("_nt"),
          length(col("text")).cast("long").as("_nc"))
        .groupBy("lang")
        .agg(sum("_nt").as("n_tokens"), sum("_nc").as("n_chars"),
          round(sum("_nt").cast("double") / sum("_nc").cast("double"), 6)
            .as("tokens_per_char"))
        .orderBy("lang")
    }),

    // batchSize 4 runs the batched trainer (top-K disjoint merges per
    // job) against the oracle's STRICTLY SEQUENTIAL DuckDB CTE chain —
    // the hash match IS the batched ≡ sequential equivalence pin, on
    // the real corpus at both driver scale factors
    "x_bpe_train" -> ((s, d) => {
      import s.implicits._
      operators.TextAnalysis.learnBpeMerges(
          Tables.documents(s, d).select("text"), "text", nMerges = 8,
          batchSize = 4)
        .zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "a", "b")
        .orderBy("rank")
    }),

    // URL canonicalization + dedup (crawl hygiene): case/www/fragment/
    // tracking-param variants of the same page collapse to ONE key —
    // pure codegen'd regexp steps (no UDF), then a hash-agg group with
    // min-id keeper. The 10 duplicate arrivals per canonical URL here
    // are the synthetic re-crawl.
    "x_url_canon" -> ((s, d) => {
      val urls = Tables.documents(s, d).select("doc_id")
        .withColumn("url", concat(lit("HTTPS://WWW.Site"),
          pmod(col("doc_id"), lit(10)).cast("string"),
          lit(".Example.com/Path"),
          pmod(col("doc_id"), lit(5)).cast("string"),
          lit("/?utm_source=feed&id="),
          pmod(col("doc_id"), lit(25)).cast("string"),
          lit("&utm_campaign=x#frag")))
      urls
        .withColumn("canonical",
          functions.UrlFunctions.canonicalizeUrl(col("url")))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keeper"))
        .orderBy("canonical")
    }),

    // Z-order clustering (Delta OPTIMIZE ZORDER shape): rewrite the
    // layout sorted by the Morton interleave of two dimensions, then
    // serve a conjunctive 2-D range off it — row-group min/max stats
    // become tight 2-D tiles (pruning pinned in ZorderSpec); this gate
    // proves the re-layout loses nothing (≡ the raw-table filter).
    "x_zorder" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "n_chars")
        .withColumn("x", (col("doc_id") * 37 % 1000).cast("int"))
      val dir = tempDir("graft-zorder")
      operators.Zorder.cluster(docs, "x", "n_chars", dir, bits = 12)
      s.read.parquet(dir)
        .filter(col("x") >= 100 && col("x") < 300 &&
          col("n_chars") >= 500 && col("n_chars") < 1000)
        .orderBy("doc_id")
        .select("doc_id", "n_chars", "x")
    }),

    // Declarative data-quality audit (the admission gate a corpus slice
    // passes before joining the mix): every scan rule folds into ONE
    // aggregate pass — rule count changes expression width, not pass
    // count; uniqueness is count − countDistinct(struct), no self-join;
    // the FK rule is one left-anti.
    "x_quality_rules" -> ((s, d) => {
      import operators.QualityRules._
      audit(Tables.lineitem(s, d), Seq(
          NotNull("orderkey_not_null", "l_orderkey"),
          InRange("quantity_1_50", "l_quantity", 1.0, 50.0),
          InRange("discount_0_01", "l_discount", 0.0, 0.1),
          Check("price_positive", col("l_extendedprice") > 0),
          Unique("pk_order_line", Seq("l_orderkey", "l_linenumber")),
          ForeignKey("fk_orders", Seq("l_orderkey"),
            Tables.orders(s, d), Seq("o_orderkey"))))
        .orderBy("rule")
    }),

    // Spike detection: hourly event counts per type, z-scored against
    // the trailing 24 buckets (min 12 history, σ from integer sums —
    // aggregate first, window over the tiny (type, hour) relation).
    "x_spike" -> ((s, d) =>
      operators.Sessions.spikeScores(Tables.events(s, d), "event_type",
          "ts", bucketMicros = 3600000000L)
        .orderBy("event_type", "bucket")),

    // Per-doc top-3 TF-IDF terms (keyword extraction / domain tagging).
    "x_tfidf" -> ((s, d) =>
      operators.TextAnalysis.tfidfTopTerms(Tables.documents(s, d),
        "doc_id", "text", k = 3)
        .orderBy("doc_id", "rk")),

    // Vector aggregate as a first-class query: per-label embedding
    // centroid via the VectorSum TypedImperativeAggregate (fixed-size
    // partial per group, map-side combinable — IVF training's re-center
    // step, gated directly). Exploded to (label, dim, c) for the oracle;
    // round(6) absorbs partial-sum ordering ULPs.
    // null vectors are excluded BEFORE the aggregate so the divisor
    // counts exactly the vectors VectorSum accumulated (fixed-dim
    // embedding columns; dim-ragged input is out of contract)
    "x_embed_centroid" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(col("embedding").isNotNull)
        .groupBy("label")
        .agg(graft.functions.VectorAggregates.vectorSum(col("embedding")).as("_s"),
          count(lit(1)).as("_n"))
        .select(col("label"), col("_n"), posexplode(col("_s")).as(Seq("_d0", "_v")))
        .select(col("label"), (col("_d0") + 1).cast("int").as("dim"),
          round(col("_v") / col("_n"), 6).as("c"))
        .orderBy("label", "dim")),

    // Composite training-data curation pipeline: quality-filter → exact
    // dedup (keep lowest doc_id per distinct text) → language ID — the
    // north-star operators composed, still one declarative plan.
    "x_curation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val q = operators.TextAnalysis.quality(docs, "doc_id", "text")
      val kept = docs.join(
        q.filter(col("n_tokens") >= 30 && col("stopword_ratio") < 0.5)
          .select("doc_id"), "doc_id")
      val deduped = operators.Dedup.dropExactDuplicates(kept, "doc_id", Seq("text"))
      operators.TextAnalysis.languageId(deduped, "doc_id", "text")
        .join(q.select("doc_id", "n_tokens"), "doc_id")
        .select("doc_id", "pred_lang", "n_tokens")
        .orderBy("doc_id")
    }),

    // As-of (point-in-time) join: each purchase joined to the user's most
    // recent prior click. Composed sort-merge form (one shuffle+sort);
    // DuckDB's native ASOF JOIN is the oracle.
    "x_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("value").as("purchase_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_ts"),
          col("value").as("click_value"))
      operators.AsOf.join(purchases, clicks, Seq("user_id"), "ts_us", "click_ts")
        .orderBy("event_id")
    }),

    // As-of with a lookback bound (pandas merge_asof tolerance): the
    // carried click only attaches within 1 hour — a stale click must
    // not decorate today's purchase. Same single shuffle+sort; the
    // bound is a post-window projection.
    "x_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("value").as("purchase_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_ts"),
          col("value").as("click_value"))
      operators.AsOf.joinWithTolerance(purchases, clicks, Seq("user_id"),
          "ts_us", "click_ts", lit(3600000000L))
        .orderBy("event_id")
    }),

    // Temporal enrichment: every view event decorated with the SCD2
    // dimension VERSION valid at its event time — the warehouse
    // "facts × dimension history" join. Because validity intervals
    // partition each key's timeline, the as-of join (one shuffle+sort)
    // IS the interval join: the latest valid_from ≤ ts is provably
    // inside its interval; no range/bin machinery needed.
    "x_temporal_enrich" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val dim = Changelog.scd2(
          ev.filter(col("event_type") =!= "view")
            .select(col("user_id"), col("ts_us"), col("event_id")),
          "user_id", Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("ts_us").as("vfrom"), col("version"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      operators.AsOf.join(views, dim, Seq("user_id"), "ts_us", "vfrom")
        .select("user_id", "ts_us", "event_id", "version")
        .orderBy("event_id")
    }),

    // Binned range join: purchase↔click pairs within 10 minutes per user,
    // as an equi-join on time bins (not a nested-loop non-equi join).
    "x_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("pts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("cts"))
      operators.RangeJoin.within(p, c, Seq("user_id"), "pts", "cts", 600000000L)
        .select("purchase_id", "click_id")
        .orderBy("purchase_id", "click_id")
    }),

  )
}
