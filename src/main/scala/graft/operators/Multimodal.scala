package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * IMAGE decode is REAL ([[Multimodal.decodeImages]] — PNG/JPEG/GIF/BMP
  * through the JDK's own `javax.imageio` codecs, headless, no external
  * library) and so is container/stream sniffing: image headers
  * ([[MediaCodec.sniffImageMeta]]), MP4 boxes
  * ([[MediaCodec.sniffVideoMeta]]), Matroska/WebM EBML
  * ([[MediaCodec.sniffEbmlMeta]]), and MP3/ADTS-AAC frame chains
  * ([[MediaCodec.sniffCompressedAudioMeta]] — sample rate, frame
  * count, duration with no codec). PCM AUDIO decode is real too
  * ([[Multimodal.decodeAudioFeatures]] — WAV/AIFF/AU through
  * `javax.sound.sampled`, plus LOSSLESS FLAC with constant/verbatim
  * subframes through the CRC-verifying [[FlacCodec]], with
  * [[Multimodal.encodeFlac]] as the archival write side; and one REAL
  * LOSSY codec — G.711 µ-law/A-law companded telephony audio, encoded
  * by [[Multimodal.encodeG711]] per the ITU spec and decoded by the
  * JDK's own ULAW/ALAW converter; and — r12 — MP3 Layer III mono,
  * encoder AND decoder own-written from ISO 11172-3/13818-3 in
  * [[graft.operators.Mp3Codec]], wired through [[Multimodal.encodeMp3]]
  * and every decode entry point). VIDEO frame decode is REAL for
  * MJPEG-in-AVI ([[MediaCodec.decodeVideoFrames]] — RIFF chunk walk +
  * the JDK JPEG codec per `00dc` frame, [[Multimodal.encodeAviMjpeg]]
  * as the write side). Only AAC audio SAMPLE decode and inter-frame
  * video codecs (H.26x/VPx/AV1) stay STUBBED behind
  * [[MediaCodec.decodeStub]], a deterministic fake keyed on the
  * payload bytes — the JDK ships no codecs for those. Everything
  * Spark-side is real and load-bearing either way: the schema contract,
  * the `mapPartitions` batch shape (the Scala analog of a Pandas-batch
  * UDF: one iterator per partition, amortized per-batch setup),
  * partition sizing, and the metadata projection.
  */
object Multimodal {

  /** Output feature schema of the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  object MediaCodec {
    private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

    /** Little-endian unsigned read of md5 bytes 8..15 — numerically equal
      * to DuckDB's `md5_number_lower(text)`, which is what lets the
      * correctness oracle reproduce the stub's features in pure SQL.
      */
    def md5Lower(payload: Array[Byte]): Long = {
      val d = md5.get().digest(payload)
      var l = 0L
      var i = 15
      while (i >= 8) { l = (l << 8) | (d(i) & 0xffL); i -= 1 }
      l
    }

    /** REAL container sniffing — format + pixel dimensions parsed from
      * the header bytes (PNG IHDR, first JPEG SOF frame walking the
      * marker segments, GIF logical screen descriptor). Needs no codec
      * library, so unlike the pixel decode this path is NOT stubbed.
      * Unknown magic, truncated buffers, and malformed marker chains
      * all return None — a poison payload must never fail the task.
      */
    def sniffImageMeta(p: Array[Byte]): Option[(String, Int, Int)] = {
      def be16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
      def be32(i: Int): Int =
        ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
          ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      if (p.length >= 24 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
          p(2) == 'N' && p(3) == 'G' && p(12) == 'I' && p(13) == 'H' &&
          p(14) == 'D' && p(15) == 'R')
        Some(("png", be32(16), be32(20)))
      else if (p.length >= 4 && (p(0) & 0xff) == 0xff &&
          (p(1) & 0xff) == 0xd8) {
        // walk marker segments to the first start-of-frame (C0–CF minus
        // the non-frame C4/C8/CC): height at +5, width at +7
        var i = 2
        while (i + 9 < p.length) {
          if ((p(i) & 0xff) != 0xff) return None
          val m = p(i + 1) & 0xff
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
            return Some(("jpeg", be16(i + 7), be16(i + 5)))
          val len = be16(i + 2)
          if (len < 2) return None
          i += 2 + len
        }
        None
      } else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' &&
          p(2) == 'F' && p(3) == '8')
        Some(("gif", le16(6), le16(8)))
      else None
    }

    /** REAL MP4/QuickTime container sniffing — the box (atom) walk:
      * top-level boxes to `moov`, inside it to `mvhd`, where version-0
      * and version-1 layouts carry `(timescale, duration)` at fixed
      * offsets — duration in SECONDS without decoding a single video
      * frame (the triage every video-corpus intake runs: length
      * filters, codec-agnostic). Truncated buffers, absent boxes,
      * 64-bit largesize boxes, and zero timescales all return None.
      */
    def sniffVideoMeta(p: Array[Byte]): Option[(String, Double)] = {
      def be32(i: Int): Long =
        ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
          ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      def typ(i: Int): String =
        new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // (start, end) box walk returning the payload offset of `name`
      def findBox(from: Int, until: Int, name: String): Option[(Int, Int)] = {
        var i = from
        while (i + 8 <= until) {
          val size = be32(i)
          if (size == 1 || size < 8) return None // largesize/corrupt
          val end = i + size.toInt
          if (end > until || end <= i) return None
          if (typ(i + 4) == name) return Some((i + 8, end))
          i = end
        }
        None
      }
      try {
        if (p.length < 12 || typ(4) != "ftyp") None
        else findBox(0, p.length, "moov").flatMap { case (ms, me) =>
          findBox(ms, me, "mvhd").flatMap { case (hs, he) =>
            val version = p(hs) & 0xff
            val (ts, dur) =
              if (version == 0 && he - hs >= 20)
                (be32(hs + 12), be32(hs + 16))
              else if (version == 1 && he - hs >= 32)
                (be32(hs + 20), be64(hs + 24))
              else return None
            if (ts <= 0) None
            else Some(("mp4", dur.toDouble / ts))
          }
        }
      } catch { case _: Exception => None }
    }

    /** REAL Matroska/WebM (EBML) container sniffing — public-spec
      * header parse, no codec library: reads the EBML DocType
      * (`matroska` → "mkv", `webm` → "webm"), then walks
      * Segment → Info for TimestampScale (nanoseconds per tick,
      * default 1,000,000) and Duration (float32/float64 in ticks) →
      * duration in SECONDS, and Segment → Tracks → TrackEntry →
      * TrackType for the track kinds (1 = video, 2 = audio) — the
      * codec-agnostic triage for the web's other video container.
      * VINT element IDs keep their marker bit (the class-ID
      * convention); sizes strip it; an all-ones size VINT is the
      * spec's "unknown size" (live-muxed Segments) and extends to the
      * enclosing bound. Garbage, truncation, absent required elements,
      * or a non-positive scale all return None. Shrinks
      * [[decodeStub]]'s blast radius: mkv/webm container METADATA is
      * real, only frame decode stays stubbed (the JDK ships no
      * codecs).
      */
    def sniffEbmlMeta(p: Array[Byte])
        : Option[(String, Double, Boolean, Boolean)] =
      try {
        // (value, width); IDs keep the marker bit, sizes strip it
        def vint(i: Int, keepMarker: Boolean): Option[(Long, Int)] = {
          if (i >= p.length) None
          else {
            val b0 = p(i) & 0xff
            if (b0 == 0) None
            else {
              val w = Integer.numberOfLeadingZeros(b0) - 23
              if (i + w > p.length) None
              else {
                var v = if (keepMarker) b0.toLong
                  else (b0 & (0xff >>> w)).toLong
                var j = 1
                while (j < w) { v = (v << 8) | (p(i + j) & 0xff); j += 1 }
                Some((v, w))
              }
            }
          }
        }
        def uint(from: Int, len: Int): Long = {
          var v = 0L; var j = 0
          while (j < len) { v = (v << 8) | (p(from + j) & 0xff); j += 1 }
          v
        }
        def fl(from: Int, len: Int): Option[Double] = len match {
          case 4 => Some(
            java.lang.Float.intBitsToFloat(uint(from, 4).toInt).toDouble)
          case 8 => Some(java.lang.Double.longBitsToDouble(uint(from, 8)))
          case _ => None
        }
        // (id, payloadStart, payloadEnd) for each child of [from,until)
        def kids(from: Int, until: Int): List[(Long, Int, Int)] = {
          val out = List.newBuilder[(Long, Int, Int)]
          var i = from
          var ok = true
          while (ok && i < until) {
            (for {
              (eid, iw) <- vint(i, keepMarker = true)
              (sz, sw) <- vint(i + iw, keepMarker = false)
            } yield {
              val unknownSize = sz == (1L << (7 * sw)) - 1
              val ps = i + iw + sw
              // bound the end in LONG: a hostile declared size ≥ 2^31
              // (or one whose low 32 bits are small) would truncate in
              // Int and could land back inside [from, until), misparsing
              // corrupt input into wrong metadata instead of None
              val pe = if (unknownSize) until.toLong else ps.toLong + sz
              (eid, ps, pe)
            }) match {
              case Some((eid, ps, pe)) if pe <= until && pe > ps =>
                out += ((eid, ps, pe.toInt)); i = pe.toInt
              case _ => ok = false
            }
          }
          out.result()
        }
        def find(from: Int, until: Int, id: Long): Option[(Int, Int)] =
          kids(from, until).find(_._1 == id).map(k => (k._2, k._3))
        for {
          (hs, he) <- find(0, p.length, 0x1A45DFA3L) // EBML header
          (dts, dte) <- find(hs, he, 0x4282L) // DocType
          fmt <- new String(p, dts, dte - dts,
            java.nio.charset.StandardCharsets.US_ASCII) match {
            case "matroska" => Some("mkv")
            case "webm" => Some("webm")
            case _ => None
          }
          (ss, se) <- find(he, p.length, 0x18538067L) // Segment
          (is, ie) <- find(ss, se, 0x1549A966L) // Info
          scale = find(is, ie, 0x2AD7B1L) // TimestampScale
            .map { case (s, e) => uint(s, e - s) }.getOrElse(1000000L)
          if scale > 0
          (ds, de) <- find(is, ie, 0x4489L) // Duration
          dur <- fl(ds, de - ds)
          if dur >= 0
        } yield {
          val trackTypes = find(ss, se, 0x1654AE6BL).toList // Tracks
            .flatMap { case (ts, te) => kids(ts, te) }
            .collect { case (0xAEL, es, ee) => // TrackEntry
              find(es, ee, 0x83L).map { case (s, e) => uint(s, e - s) }
            }.flatten
          (fmt, dur * scale / 1e9,
            trackTypes.contains(1L), trackTypes.contains(2L))
        }
      } catch { case _: Exception => None }

    /** REAL MP3 / ADTS-AAC frame-header sniffing — public-spec byte
      * parsing, no codec: identifies the stream, reads sample rate and
      * (MP3) bitrate from the first frame header, then WALKS the frame
      * chain counting frames — duration = frames × samples-per-frame /
      * rate (1152 for MPEG-1 Layer III, 1024 for AAC), exact for the
      * common CBR case and codec-free either way. Returns
      * `(format, sample_rate, n_frames, duration_s)`. Together with
      * [[decodeAudio]] (PCM) this reduces the decode stub to
      * compressed SAMPLE decode only — stream METADATA is real for
      * mp3/aac too. The walk stops at the first invalid or truncated
      * frame and returns the frames counted SO FAR (a truncated tail
      * yields the partial count); None only when not even one complete
      * frame parses — garbage bytes, reserved bitrate/rate indices, or
      * a first frame cut short.
      */
    def sniffCompressedAudioMeta(p: Array[Byte])
        : Option[(String, Int, Long, Double)] =
      try {
        if (p.length < 4) return None
        def u(i: Int) = p(i) & 0xff
        if (u(0) == 0xff && (u(1) & 0xfe) == 0xfa) {
          // MPEG-1 Layer III (0xFA/0xFB: sync + version 11 + layer 01)
          val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320, 0) // kbps, MPEG-1 Layer III
          val rates = Array(44100, 48000, 32000, 0)
          val br = bitrates(u(2) >> 4)
          val sr = rates((u(2) >> 2) & 0x3)
          if (br == 0 || sr == 0) return None
          var i = 0
          var n = 0L
          var ok = true
          while (ok && i + 4 <= p.length) {
            if (u(i) != 0xff || (u(i + 1) & 0xfe) != 0xfa) ok = false
            else {
              val fbr = bitrates(u(i + 2) >> 4)
              val fsr = rates((u(i + 2) >> 2) & 0x3)
              val pad = (u(i + 2) >> 1) & 0x1
              if (fbr == 0 || fsr == 0) ok = false
              else {
                val len = 144 * fbr * 1000 / fsr + pad
                if (i + len > p.length) ok = false
                else { n += 1; i = i + len }
              }
            }
          }
          if (n == 0) None
          else Some(("mp3", sr, n, n * 1152.0 / sr))
        } else if (u(0) == 0xff && (u(1) & 0xf6) == 0xf0) {
          // ADTS AAC (sync 0xFFF + layer 00)
          val rates = Array(96000, 88200, 64000, 48000, 44100, 32000,
            24000, 22050, 16000, 12000, 11025, 8000, 7350, 0, 0, 0)
          val sr = rates((u(2) >> 2) & 0xf)
          if (sr == 0) return None
          var i = 0
          var n = 0L
          var ok = true
          while (ok && i + 7 <= p.length) {
            if (u(i) != 0xff || (u(i + 1) & 0xf6) != 0xf0) ok = false
            else {
              val len = ((u(i + 3) & 0x3) << 11) | (u(i + 4) << 3) |
                (u(i + 5) >> 5)
              if (len < 7 || i + len > p.length) ok = false
              else { n += 1; i = i + len }
            }
          }
          if (n == 0) None
          else Some(("aac", sr, n, n * 1024.0 / sr))
        } else None
      } catch { case _: Exception => None }

    /** REAL FLAC / Ogg container sniffing — public-spec header parsing,
      * no codec, completing the codec-free metadata family
      * ([[sniffEbmlMeta]], [[sniffCompressedAudioMeta]]):
      *
      *   - FLAC: the mandatory first STREAMINFO metadata block packs
      *     sample rate (20 bits), channels−1 (3), bits-per-sample−1 (5)
      *     and total samples (36) into one 64-bit big-endian field at
      *     byte 10 — duration = totalSamples / rate exactly.
      *   - Ogg: page walk (27-byte header + segment table; CRCs are NOT
      *     validated — this is a sniffer, not a verifier). The first
      *     page's body identifies the codec: `OpusHead` (channels,
      *     pre-skip; Opus output is always 48 kHz) or `\x01vorbis`
      *     (channels, rate). Duration comes from the LAST page's
      *     granule position of the same serial: Opus
      *     `(granule − preSkip) / 48000`, Vorbis `granule / rate`.
      *     The walk stops at the first malformed page and uses the
      *     last valid granule so far (the truncated-tail convention).
      *
      * Returns `(format, sample_rate, channels, total_samples,
      * duration_s)`; None when the magic doesn't match or the first
      * header block is malformed.
      */
    def sniffContainerAudioMeta(p: Array[Byte])
        : Option[(String, Int, Int, Long, Double)] =
      try {
        def u(i: Int) = p(i) & 0xff
        def be(from: Int, n: Int): Long =
          (from until from + n).foldLeft(0L)((a, i) => (a << 8) | u(i))
        def le(from: Int, n: Int): Long =
          (from + n - 1 to from by -1).foldLeft(0L)((a, i) => (a << 8) | u(i))
        def ascii(from: Int, n: Int): String =
          if (from + n <= p.length)
            new String(p, from, n, java.nio.charset.StandardCharsets.US_ASCII)
          else ""
        if (ascii(0, 4) == "fLaC") {
          // first metadata block MUST be STREAMINFO (type 0), 34 bytes
          if (p.length < 4 + 4 + 34 || (u(4) & 0x7f) != 0) return None
          if (be(5, 3) < 34) return None
          val b = 8 // STREAMINFO payload start
          val packed = be(b + 10, 8)
          val rate = (packed >>> 44).toInt
          val channels = ((packed >> 41) & 0x7).toInt + 1
          val total = packed & ((1L << 36) - 1)
          if (rate == 0) None // 0 is invalid per spec
          else Some(("flac", rate, channels, total, total.toDouble / rate))
        } else if (ascii(0, 4) == "OggS") {
          // (bodyStart, bodyLen, granule, serial) for the page at i
          def page(i: Int): Option[(Int, Int, Long, Long)] = {
            if (i + 27 > p.length || ascii(i, 4) != "OggS" || u(i + 4) != 0)
              return None
            val nsegs = u(i + 26)
            val bs = i + 27 + nsegs
            if (bs > p.length) return None
            val bodyLen = (0 until nsegs).map(k => u(i + 27 + k)).sum
            if (bs + bodyLen > p.length) return None
            Some((bs, bodyLen, le(i + 6, 8), le(i + 14, 4)))
          }
          for {
            (bs, blen, _, serial) <- page(0)
            (fmt, rate, channels, preSkip) <-
              if (blen >= 19 && ascii(bs, 8) == "OpusHead")
                Some(("opus", 48000, u(bs + 9), le(bs + 10, 2)))
              else if (blen >= 30 && u(bs) == 1 && ascii(bs + 1, 6) == "vorbis")
                Some(("vorbis", le(bs + 12, 4).toInt, u(bs + 11), 0L))
              else None
            if rate > 0
          } yield {
            var i = 0
            var granule = 0L
            var next = page(0)
            while (next.isDefined) {
              val (nbs, nblen, g, ser) = next.get
              if (ser == serial && g >= 0) granule = g
              i = nbs + nblen
              next = page(i)
            }
            val total = math.max(0L, granule - preSkip)
            (fmt, rate, channels, total, total.toDouble / rate)
          }
        } else None
      } catch { case _: Exception => None }

    /** Deterministic stand-in for the remaining codecs with no pure-JVM
      * decoder here — AAC audio samples (its spec codebooks are not
      * reproducible from scratch offline; MP3 is REAL now via
      * [[graft.operators.Mp3Codec]]) and inter-frame video
      * (H.26x/VPx/AV1): derives fake dimensions from the payload's
      * md5 (unsigned arithmetic, so the SQL oracle's UBIGINT math
      * matches bit-for-bit). The signature (bytes in, features out, once
      * per record inside a partition batch) is the real contract.
      *
      * FAILS LOUDLY unless explicitly opted in: a pipeline must never
      * silently train on fake features. `allowStub = true` is for
      * plumbing tests and schema/batch-shape verification only.
      */
    def decodeStub(payload: Array[Byte],
        allowStub: Boolean = false): (Int, Int, Int, Long) = {
      if (!allowStub) throw new UnsupportedOperationException(
        "decodeStub: no pure-JVM decoder for AAC audio samples or " +
          "inter-frame video (H.26x/VPx/AV1); the returned features " +
          "would be deterministic FAKES. Route media through the real " +
          "decoders (MP3/FLAC/PCM/G.711/ADPCM/PNG/JPEG/MJPEG) or pass " +
          "allowStub = true ONLY to exercise the plumbing — never " +
          "train on stubbed features.")
      val l = md5Lower(payload)
      val w = 16 + java.lang.Long.remainderUnsigned(l, 64).toInt
      val ht = 16 + java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(l, 256), 64).toInt
      val fr = 1 + java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(l, 65536), 8).toInt
      val checksum = java.lang.Long.remainderUnsigned(l, 1000000007L)
      (w, ht, fr, checksum)
    }

    /** REAL PCM audio decode — WAV/AIFF/AU via the JDK's
      * `javax.sound.sampled`, plus lossless FLAC (constant/verbatim
      * subframes, CRC-verified) via [[graft.operators.FlacCodec]]: sample
      * rate, channel count, frame count, and the RMS amplitude of the
      * 16-bit PCM signal (integer square sums, one final sqrt —
      * deterministic). MP3 routes through [[graft.operators.Mp3Codec]]
      * (real lossy decode); AAC stays stubbed — no JDK codec and its
      * spec codebooks are not reconstructible offline.
      */
    def decodeAudio(payload: Array[Byte])
        : Option[(Float, Int, Long, Double)] = {
      if (graft.operators.Mp3Codec.looksLikeMp3(payload))
        return (try graft.operators.Mp3Codec.decode(payload)
          catch { case scala.util.control.NonFatal(_) => None })
          .map { d =>
            // stereo output is interleaved; the codec-delay skip is per
            // channel, frame count = interleaved length / channels
            val s = d.samples.drop(
              graft.operators.Mp3Codec.LeadingSkip * d.channels)
            var sumSq = 0.0
            var i = 0
            while (i < s.length) { sumSq += s(i) * s(i); i += 1 }
            val rms = if (s.isEmpty) 0.0 else math.sqrt(sumSq / s.length)
            (d.sampleRate.toFloat, d.channels,
              (s.length / d.channels).toLong, rms)
          }
      if (payload.length >= 4 && payload(0) == 'f' && payload(1) == 'L' &&
          payload(2) == 'a' && payload(3) == 'C')
        return graft.operators.FlacCodec.decode(payload).map { d =>
          var sumSq = 0.0
          var i = 0
          while (i < d.samples.length) {
            val s = d.samples(i).toDouble
            sumSq += s * s
            i += 1
          }
          val rms = if (d.samples.isEmpty) 0.0
                    else math.sqrt(sumSq / d.samples.length)
          (d.sampleRate.toFloat, d.channels, d.totalSamples, rms)
        }
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          var i = 0
          var sumSq = 0L
          val be = fmt.isBigEndian
          while (i + 1 < bytes.length) {
            val s =
              if (be) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            sumSq += s.toLong * s.toLong
            i += 2
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
          Some((fmt.getSampleRate, fmt.getChannels,
            in.getFrameLength, rms))
        }
      } catch { case _: Exception => None }
    }

    /** Raw decoded samples for DSP: FLAC through [[FlacCodec]] (channel
      * 0 of the decoded block) or 16-bit PCM WAV/AIFF/AU through
      * `javax.sound.sampled` (first channel of interleaved frames).
      * None for anything undecodable.
      */
    def decodeSamples(payload: Array[Byte]): Option[(Float, Array[Double])] = {
      // MP3 (MPEG-1/2 Layer III, mono or stereo) through our own codec;
      // the fixed
      // LeadingSkip drops the filterbank+MDCT warmup (gapless-delay
      // convention), so callers see steady-state samples. Poison-pill
      // convention of this layer: ANY codec failure (corrupt stream,
      // truncated main data, a stream selecting an unshipped Huffman
      // table) null-routes like every other media format — the loud
      // per-cause errors live at the Mp3Codec level for direct callers.
      if (graft.operators.Mp3Codec.looksLikeMp3(payload))
        return (try graft.operators.Mp3Codec.decode(payload)
          catch { case scala.util.control.NonFatal(_) => None })
          .map { d =>
            // first channel of interleaved frames, the FLAC/WAV
            // convention of this layer; skip is per channel
            val s = d.samples.drop(
              graft.operators.Mp3Codec.LeadingSkip * d.channels)
            val out =
              if (d.channels == 1) s
              else {
                val n = s.length / d.channels
                Array.tabulate(n)(i => s(i * d.channels))
              }
            (d.sampleRate.toFloat, out)
          }
      if (payload.length >= 4 && payload(0) == 'f' && payload(1) == 'L' &&
          payload(2) == 'a' && payload(3) == 'C')
        return graft.operators.FlacCodec.decode(payload).map { d =>
          val ch = d.channels
          val n = d.samples.length / math.max(ch, 1)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) { out(i) = d.samples(i * ch).toDouble; i += 1 }
          (d.sampleRate.toFloat, out)
        }
      // IMA ADPCM WAV (tag 0x11): the JDK has no codec — ours decodes
      val ima = try decodeWavIma(payload)
        catch { case _: Exception => None }
      if (ima.isDefined) return ima
      try {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        var in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        var fmt = in.getFormat
        // COMPRESSED companded audio (G.711 µ-law/A-law WAV): route
        // through the JDK's own codec to 16-bit linear PCM — a REAL
        // lossy-codec decode path, no stub
        if (fmt.getEncoding == AudioFormat.Encoding.ULAW ||
            fmt.getEncoding == AudioFormat.Encoding.ALAW) {
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            fmt.getChannels * 2, fmt.getSampleRate, false)
          in = AudioSystem.getAudioInputStream(target, in)
          fmt = in.getFormat
        }
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val ch = math.max(fmt.getChannels, 1)
          val n = bytes.length / 2 / ch
          val out = new Array[Double](n)
          val be = fmt.isBigEndian
          var i = 0
          while (i < n) {
            val off = i * 2 * ch
            val s =
              if (be) ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort
              else ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            out(i) = s.toDouble
            i += 1
          }
          Some((fmt.getSampleRate, out))
        }
      } catch { case _: Exception => None }
    }

    /** G.711 µ-law encode of one 16-bit sample (ITU-T G.711 segmented
      * companding: bias 0x84, 3-bit exponent, 4-bit mantissa, inverted
      * on the wire) — the write side of the JDK ULAW decode path above.
      */
    def muLawEncode(sample: Int): Byte = {
      var s = math.max(-32768, math.min(32767, sample))
      val sign = if (s < 0) { s = -s; 0x80 } else 0
      if (s > 32635) s = 32635
      s += 0x84
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
      val mantissa = (s >> (exp + 3)) & 0x0f
      (~(sign | (exp << 4) | mantissa)).toByte
    }

    /** Wrap µ-law bytes as a RIFF/WAVE stream (format tag 7, 8-bit,
      * mono; 18-byte fmt chunk + fact chunk, the non-PCM WAV layout).
      */
    def wrapWavMuLaw(codes: Array[Byte], sampleRate: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
      def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
      tag("RIFF"); le32(4 + 8 + 18 + 8 + 4 + 8 + codes.length); tag("WAVE")
      tag("fmt "); le32(18)
      le16(7) /* WAVE_FORMAT_MULAW */; le16(1)
      le32(sampleRate); le32(sampleRate) /* byte rate: 1 byte/sample */
      le16(1) /* block align */; le16(8) /* bits */; le16(0) /* cbSize */
      tag("fact"); le32(4); le32(codes.length)
      tag("data"); le32(codes.length); bos.write(codes)
      bos.toByteArray
    }

    /** Iterative radix-2 FFT (in-place, bit-reversal permutation) — the
      * one DSP primitive spectral featurization needs, pure JVM.
      * `re`/`im` length must be a power of two.
      */
    def fft(re: Array[Double], im: Array[Double]): Unit = {
      val n = re.length
      require(n == im.length && (n & (n - 1)) == 0,
        s"fft needs power-of-two equal-length arrays, got $n/${im.length}")
      var i = 1
      var j = 0
      while (i < n) {
        var bit = n >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (i < j) {
          val tr = re(i); re(i) = re(j); re(j) = tr
          val ti = im(i); im(i) = im(j); im(j) = ti
        }
        i += 1
      }
      var len = 2
      while (len <= n) {
        val ang = -2.0 * math.Pi / len
        val wr = math.cos(ang)
        val wi = math.sin(ang)
        var base = 0
        while (base < n) {
          var cr = 1.0
          var ci = 0.0
          var k = 0
          while (k < len / 2) {
            val ur = re(base + k); val ui = im(base + k)
            val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
            val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
            re(base + k) = ur + vr; im(base + k) = ui + vi
            re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
            val ncr = cr * wr - ci * wi
            ci = cr * wi + ci * wr
            cr = ncr
            k += 1
          }
          base += len
        }
        len <<= 1
      }
    }

    /** Spectral peak of a decoded audio payload: FFT over the first
      * `fftSize` samples (zero-padded), peak = argmax |X[b]| over the
      * positive-frequency bins 1..fftSize/2-1 (DC excluded). Returns
      * `(sampleRate, peakBin, nSamples)`.
      */
    def spectralPeak(payload: Array[Byte], fftSize: Int)
        : Option[(Float, Int, Long)] =
      decodeSamples(payload).map { case (rate, samples) =>
        val re = new Array[Double](fftSize)
        val im = new Array[Double](fftSize)
        val n = math.min(samples.length, fftSize)
        System.arraycopy(samples, 0, re, 0, n)
        fft(re, im)
        var best = 1
        var bestMag = -1.0
        var b = 1
        while (b < fftSize / 2) {
          val mag = re(b) * re(b) + im(b) * im(b)
          if (mag > bestMag) { bestMag = mag; best = b }
          b += 1
        }
        (rate, best, samples.length.toLong)
      }

    /** IMA ADPCM step-size table (the public-domain DVI/IMA spec). */
    private val imaStep: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
      37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
      544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
      1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
      4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
      12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
      29794, 32767)
    private val imaIndexAdj: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** IMA/DVI ADPCM (4 bits/sample, predictive) encode of one mono
      * block: WAV tag-0x11 block layout — 4-byte header (initial
      * predictor int16 LE + step index + reserved) then two nibbles per
      * byte, low nibble first, for samples 1..n−1.
      */
    def imaAdpcmEncodeBlock(samples: Array[Int]): Array[Byte] = {
      require(samples.nonEmpty, "imaAdpcmEncodeBlock needs samples")
      val n = samples.length
      val out = new Array[Byte](4 + (n - 1 + 1) / 2)
      var pred = math.max(-32768, math.min(32767, samples(0)))
      var index = 0
      out(0) = (pred & 0xff).toByte
      out(1) = ((pred >> 8) & 0xff).toByte
      out(2) = index.toByte
      out(3) = 0
      var i = 1
      while (i < n) {
        val s = math.max(-32768, math.min(32767, samples(i)))
        val step = imaStep(index)
        var diff = s - pred
        val sign = if (diff < 0) { diff = -diff; 8 } else 0
        var code = 0
        if (diff >= step) { code |= 4; diff -= step }
        if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) code |= 1
        var dq = step >> 3
        if ((code & 4) != 0) dq += step
        if ((code & 2) != 0) dq += step >> 1
        if ((code & 1) != 0) dq += step >> 2
        pred = if (sign != 0) pred - dq else pred + dq
        pred = math.max(-32768, math.min(32767, pred))
        index = math.max(0, math.min(88, index + imaIndexAdj(code)))
        val nib = sign | code
        val pos = 4 + (i - 1) / 2
        if (((i - 1) & 1) == 0) out(pos) = nib.toByte
        else out(pos) = (out(pos) | (nib << 4)).toByte
        i += 1
      }
      out
    }

    /** Decode one IMA ADPCM mono block (the exact mirror of
      * [[imaAdpcmEncodeBlock]]): `n` total samples including the header
      * sample.
      */
    def imaAdpcmDecodeBlock(block: Array[Byte], from: Int, n: Int)
        : Array[Double] = {
      val out = new Array[Double](n)
      var pred = ((block(from + 1) << 8) | (block(from) & 0xff)).toShort.toInt
      var index = math.max(0, math.min(88, block(from + 2) & 0xff))
      out(0) = pred.toDouble
      var i = 1
      while (i < n) {
        val b = block(from + 4 + (i - 1) / 2) & 0xff
        val nib = if (((i - 1) & 1) == 0) b & 0x0f else (b >> 4) & 0x0f
        val step = imaStep(index)
        val code = nib & 7
        var dq = step >> 3
        if ((code & 4) != 0) dq += step
        if ((code & 2) != 0) dq += step >> 1
        if ((code & 1) != 0) dq += step >> 2
        pred = if ((nib & 8) != 0) pred - dq else pred + dq
        pred = math.max(-32768, math.min(32767, pred))
        index = math.max(0, math.min(88, index + imaIndexAdj(code)))
        out(i) = pred.toDouble
        i += 1
      }
      out
    }

    /** Wrap one IMA ADPCM block as a RIFF/WAVE stream (format tag
      * 0x11, mono, 4 bits/sample; 20-byte fmt chunk whose cbSize=2
      * extension carries samples-per-block, plus a fact chunk).
      */
    def wrapWavIma(block: Array[Byte], nSamples: Int,
        sampleRate: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
      def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def tag(s: String): Unit = bos.write(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val blockAlign = block.length
      tag("RIFF"); le32(4 + 8 + 20 + 8 + 4 + 8 + block.length); tag("WAVE")
      tag("fmt "); le32(20)
      le16(0x11) /* WAVE_FORMAT_IMA_ADPCM */; le16(1)
      le32(sampleRate)
      le32(sampleRate * blockAlign / math.max(nSamples, 1)) /* avg bytes/s */
      le16(blockAlign); le16(4) /* bits per sample */
      le16(2) /* cbSize */; le16(nSamples) /* samples per block */
      tag("fact"); le32(4); le32(nSamples)
      tag("data"); le32(block.length); bos.write(block)
      bos.toByteArray
    }

    /** Parse a tag-0x11 WAV written by [[wrapWavIma]]-compatible
      * encoders and decode its IMA blocks; None when the payload is not
      * an IMA WAV (the PCM/µ-law paths handle everything else).
      */
    def decodeWavIma(p: Array[Byte]): Option[(Float, Array[Double])] = {
      def le32(i: Int): Int =
        (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
          ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
      def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      def ascii(i: Int): String =
        new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // chunk sizes are UNSIGNED on the wire: a signed read of e.g.
      // 0xFFFFFFF8 (-8) would stop `off` advancing and hang the executor
      // in an infinite loop (mirrors decodeVideoFrames' hostile-size bail)
      def le32u(i: Int): Long =
        (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
          ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
      if (p.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        return None
      var off = 12L
      var fmtTag = -1; var rate = 0; var blockAlign = 0; var spb = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= p.length) {
        val id = ascii(off.toInt); val size = le32u(off.toInt + 4)
        if (off + 8 + size > p.length) return None // truncated/hostile size
        if (id == "fmt " && size >= 16) {
          fmtTag = le16(off.toInt + 8)
          rate = le32(off.toInt + 12)
          blockAlign = le16(off.toInt + 20)
          if (size >= 20) spb = le16(off.toInt + 26)
        } else if (id == "data") { dataOff = off.toInt + 8; dataLen = size.toInt }
        off += 8 + size + (size & 1L)
      }
      if (fmtTag != 0x11 || dataOff < 0 || blockAlign < 5 || spb < 1)
        return None
      if (dataOff + dataLen > p.length) return None
      val blocks = dataLen / blockAlign
      val out = Array.newBuilder[Double]
      var b = 0
      while (b < blocks) {
        val have = math.min(spb, (blockAlign - 4) * 2 + 1)
        out ++= imaAdpcmDecodeBlock(p, dataOff + b * blockAlign, have)
        b += 1
      }
      Some((rate.toFloat, out.result()))
    }

    /** REAL video frame decode for MJPEG-in-AVI: walk the RIFF chunk
      * tree to the `movi` LIST, pull each `00dc`/`00db` frame chunk,
      * and decode it with the JDK's own JPEG codec — per-frame
      * `(width, height, meanLuma)` with no stub anywhere. None for
      * anything that is not a RIFF/AVI stream; an undecodable frame
      * inside a valid container is skipped (poison-pill granularity is
      * the frame, not the file).
      */
    def decodeVideoFrames(p: Array[Byte]): Option[Seq[(Int, Int, Double)]] = {
      def le32(i: Int): Long =
        (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
          ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
      def ascii(i: Int): String =
        new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (p.length < 12 || ascii(0) != "RIFF" || ascii(8) != "AVI ")
        return None
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      def walk(from: Long, until: Long, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= until) {
          val id = ascii(off.toInt)
          val size = le32(off.toInt + 4)
          val body = off + 8
          if (body + size > until) return // hostile size: stop, keep frames
          if (id == "LIST" && size >= 4) {
            val sub = ascii(body.toInt)
            // a 'rec ' grouping LIST inside movi still holds frame chunks
            walk(body + 4, body + size,
              inMovi = sub == "movi" || (inMovi && sub == "rec "))
          } else if (inMovi && (id.endsWith("dc") || id.endsWith("db"))) {
            val buf = java.util.Arrays.copyOfRange(p, body.toInt,
              (body + size).toInt)
            decodeImage(buf).foreach { case (w, h, luma, _) =>
              frames += ((w, h, luma))
            }
          }
          off = body + size + (size & 1L) // chunks pad to even
        }
      }
      walk(12L, math.min(12L + le32(4) - 4L, p.length.toLong), inMovi = false)
      Some(frames.toSeq)
    }

    /** Minimal spec-layout MJPEG AVI writer: full `hdrl` (avih + vids
      * strh/strf with MJPG fourcc) so external tools can read it, one
      * `00dc` chunk per JPEG frame. All frames must share dimensions.
      */
    def wrapAviMjpeg(jpegs: Seq[Array[Byte]], width: Int, height: Int,
        fps: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Unit = { var i = 0
        while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
      def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def tag(s: String): Unit = bos.write(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val maxBuf = jpegs.map(_.length).maxOption.getOrElse(0)
      val moviBody = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
      val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
      tag("RIFF"); le32(riffBody.toLong); tag("AVI ")
      tag("LIST"); le32(hdrlBody.toLong); tag("hdrl")
      tag("avih"); le32(56)
      le32(1000000L / fps); le32(maxBuf.toLong * fps); le32(0); le32(0)
      le32(jpegs.length.toLong); le32(0); le32(1); le32(maxBuf.toLong)
      le32(width.toLong); le32(height.toLong); le32(0); le32(0); le32(0); le32(0)
      tag("LIST"); le32(4 + (8 + 56) + (8 + 40)); tag("strl")
      tag("strh"); le32(56)
      tag("vids"); tag("MJPG"); le32(0); le16(0); le16(0); le32(0)
      le32(1); le32(fps.toLong); le32(0); le32(jpegs.length.toLong)
      le32(maxBuf.toLong); le32(0xffffffffL /*quality: default*/); le32(0)
      le16(0); le16(0); le16(width); le16(height)
      tag("strf"); le32(40)
      le32(40); le32(width.toLong); le32(height.toLong); le16(1); le16(24)
      tag("MJPG"); le32(width.toLong * height * 3); le32(0); le32(0)
      le32(0); le32(0)
      tag("LIST"); le32(moviBody.toLong); tag("movi")
      jpegs.foreach { j =>
        tag("00dc"); le32(j.length.toLong); bos.write(j)
        if ((j.length & 1) == 1) bos.write(0)
      }
      bos.toByteArray
    }

    /** HTK-convention mel filterbank energies over the first `fftSize`
      * samples: `nMel` triangular filters evenly spaced on the mel
      * scale (`2595·log10(1+f/700)`) between 0 and rate/2, applied to
      * the FFT power spectrum. The front half of MFCC extraction.
      */
    def melEnergies(samples: Array[Double], rate: Double, fftSize: Int,
        nMel: Int): Array[Double] = {
      val re = new Array[Double](fftSize)
      val im = new Array[Double](fftSize)
      System.arraycopy(samples, 0, re, 0, math.min(samples.length, fftSize))
      fft(re, im)
      def mel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
      val lo = mel(0.0)
      val hi = mel(rate / 2.0)
      val pts = Array.tabulate(nMel + 2)(i => lo + (hi - lo) * i / (nMel + 1))
      val out = new Array[Double](nMel)
      var b = 1
      while (b <= fftSize / 2) {
        val fm = mel(rate * b / fftSize)
        val power = re(b) * re(b) + im(b) * im(b)
        var m = 1
        while (m <= nMel) {
          val (l, c, r) = (pts(m - 1), pts(m), pts(m + 1))
          if (fm > l && fm < r) {
            val w = if (fm <= c) (fm - l) / (c - l) else (r - fm) / (r - c)
            out(m - 1) += w * power
          }
          m += 1
        }
        b += 1
      }
      out
    }

    /** DCT-II of the log mel energies → the first `nCoef` cepstral
      * coefficients (the MFCC back half; orthonormal scaling).
      */
    def mfccFromMel(melE: Array[Double], nCoef: Int): Array[Double] = {
      val n = melE.length
      val logE = melE.map(e => math.log(e + 1e-10))
      Array.tabulate(nCoef) { c =>
        var s = 0.0
        var m = 0
        while (m < n) {
          s += logE(m) * math.cos(math.Pi * c * (m + 0.5) / n)
          m += 1
        }
        s * math.sqrt(2.0 / n) * (if (c == 0) math.sqrt(0.5) else 1.0)
      }
    }

    /** JDK-codec pixel decode (see [[Multimodal.decodeImages]]): None
      * for anything ImageIO cannot parse.
      */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double, Long)] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          if (w <= 0 || h <= 0) None
          else {
            val crc = new java.util.zip.CRC32()
            var lumaSum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                lumaSum += (299 * r + 587 * g + 114 * b) / 1000
                crc.update(r); crc.update(g); crc.update(b)
                x += 1
              }
              y += 1
            }
            Some((w, h, lumaSum.toDouble / (w.toLong * h),
              crc.getValue))
          }
        }
      } catch { case _: Exception => None }

    /** 64-bit average-hash (aHash) perceptual fingerprint: the image's
      * luma is block-averaged onto an 8×8 grid (integer cell sums over
      * exact `[i·w/8, (i+1)·w/8)` ranges — no resampling library, fully
      * deterministic), each cell compares against the grid mean, and
      * the 64 comparisons pack into a long. Visually identical pixels
      * hash identically across CONTAINERS (PNG vs BMP of the same
      * raster); small edits flip few bits — Hamming distance is the
      * near-dup metric.
      */
    def aHash(payload: Array[Byte]): Option[Long] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null || img.getWidth < 8 || img.getHeight < 8) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val cellSum = Array.ofDim[Long](64)
          val cellN = Array.ofDim[Long](64)
          var y = 0
          while (y < h) {
            val cy = (y.toLong * 8 / h).toInt
            var x = 0
            while (x < w) {
              val cx = (x.toLong * 8 / w).toInt
              val rgb = img.getRGB(x, y)
              val luma = (299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              val c = cy * 8 + cx
              cellSum(c) += luma
              cellN(c) += 1
              x += 1
            }
            y += 1
          }
          val means = (0 until 64).map(i =>
            if (cellN(i) == 0) 0L else cellSum(i) / cellN(i))
          val grand = means.sum / 64
          var bits = 0L
          var i = 0
          while (i < 64) {
            if (means(i) > grand) bits |= (1L << i)
            i += 1
          }
          Some(bits)
        }
      } catch { case _: Exception => None }
  }

  /** Attach a binary payload column (here synthesized from a string
    * column — the testdata ships no real media; the binary column type and
    * everything downstream is the real pipeline).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, col(srcCol).cast(BinaryType))

  /** Cheap metadata that needs no decode: byte size + base64 head. */
  def payloadMetadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).as("n_bytes"),
      substring(base64(col(binCol)), 1, 16).as("b64_head"))

  /** Container metadata over partition batches — the same mapPartitions
    * shape as [[extractFeatures]] but through the REAL
    * [[MediaCodec.sniffImageMeta]] header parser: `(id, format, width,
    * height)`, nulls for unrecognized/truncated payloads.
    */
  def imageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.sniffImageMeta) match {
          case Some((f, w, h)) => Row(r.get(idIdx), f, w, h)
          case None => Row(r.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /** Decode / feature-extract over partition batches: the heavy-UDF shape.
    * One task per partition, records streamed through the (stubbed) codec;
    * output rows carry id + features. At scale, repartition upstream so a
    * partition's payload bytes fit executor memory.
    *
    * `allowStub` is the loud-failure gate on [[MediaCodec.decodeStub]]:
    * without it this operator THROWS rather than emit deterministic fake
    * features a pipeline might silently train on. The real decode paths
    * (FLAC/PCM/G.711/ADPCM via [[decodeAudioFeatures]], PNG/JPEG via
    * [[decodeImages]], MJPEG-AVI via [[videoFrames]]) need no opt-in.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
      allowStub: Boolean = false): DataFrame = {
    val outSchema = StructType(
      StructField("id", df.schema(idCol).dataType, nullable = false) +:
        featureSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f, cs) =
          MediaCodec.decodeStub(r.getAs[Array[Byte]](binIdx), allowStub)
        Row(r.get(idIdx), w, h, f, cs)
      }
    }(enc)
  }

  /** Frame sampling plumbing: every k-th frame index up to n_frames —
    * array column, no decode needed for the index math.
    */
  def sampleFrameIndexes(features: DataFrame, every: Int): DataFrame =
    features.withColumn("sampled_frames",
      sequence(lit(0), col("n_frames") - 1, lit(every)))

  /** Video container metadata over partition batches — `(id, format,
    * duration_s)` through the REAL [[MediaCodec.sniffVideoMeta]] box
    * walk; nulls for non-MP4/truncated payloads.
    */
  def videoMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.sniffVideoMeta) match {
          case Some((f, dur)) => Row(r.get(idIdx), f, dur)
          case None => Row(r.get(idIdx), null, null)
        }
      }
    }(enc)
  }

  /** Matroska/WebM container metadata over partition batches — `(id,
    * format, duration_s, has_video, has_audio)` through the REAL
    * [[MediaCodec.sniffEbmlMeta]] EBML walk; nulls for
    * non-EBML/truncated payloads. Same batch shape as [[videoMeta]]:
    * one pass per partition, no shuffle, binary column never leaves
    * the executor.
    */
  def ebmlMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true),
      StructField("has_video", BooleanType, nullable = true),
      StructField("has_audio", BooleanType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.sniffEbmlMeta) match {
          case Some((f, dur, hv, ha)) => Row(r.get(idIdx), f, dur, hv, ha)
          case None => Row(r.get(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** Compressed-audio stream metadata over partition batches — `(id,
    * format, sample_rate, n_frames, duration_s)` through the REAL
    * [[MediaCodec.sniffCompressedAudioMeta]] MP3/ADTS frame walk;
    * nulls for non-MP3/AAC payloads. Same batch shape as [[videoMeta]].
    */
  def compressedAudioMeta(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.sniffCompressedAudioMeta) match {
          case Some((f, sr, n, dur)) => Row(r.get(idIdx), f, sr, n, dur)
          case None => Row(r.get(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** FLAC / Ogg (Opus, Vorbis) container sniffing over partition
    * batches — `(id, format, sample_rate, channels, total_samples,
    * duration_s)` via [[MediaCodec.sniffContainerAudioMeta]]; nulls
    * for null/non-container payloads. Same mapPartitions shape as
    * [[compressedAudioMeta]].
    */
  def containerAudioMeta(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("total_samples", LongType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.sniffContainerAudioMeta) match {
          case Some((f, sr, ch, ts, dur)) =>
            Row(r.get(idIdx), f, sr, ch, ts, dur)
          case None => Row(r.get(idIdx), null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL audio decode over partition batches — `(id, sample_rate,
    * channels, n_frames, rms)` for WAV/AIFF/AU payloads through the
    * JDK's own PCM parser ([[MediaCodec.decodeAudio]]); nulls for
    * compressed/unknown formats (MP3 is REAL via
    * [[graft.operators.Mp3Codec]]; AAC stays stubbed — no JDK codec).
    */
  def decodeAudioFeatures(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("sample_rate", FloatType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.decodeAudio) match {
          case Some((sr, ch, nf, rms)) => Row(r.get(idIdx), sr, ch, nf, rms)
          case None => Row(r.get(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** Spectral featurization over REAL decoded samples: per payload, a
    * radix-2 FFT over the first `fftSize` samples and the dominant
    * positive-frequency bin — the first step of any audio featurization
    * (pitch/tone class, bandwidth filtering, music/speech heuristics)
    * and fully real for the lossless paths (FLAC via [[FlacCodec]],
    * 16-bit PCM WAV/AIFF/AU via `javax.sound.sampled`): decode → FFT →
    * argmax, no stub anywhere in the loop. Same mapPartitions batch
    * shape as every decode operator here; undecodable payloads yield
    * null fields. Returns `(id, sample_rate, peak_bin, n_samples)`;
    * peak frequency in Hz is `peak_bin * sample_rate / fftSize`.
    */
  def audioSpectrum(df: DataFrame, idCol: String, binCol: String,
      fftSize: Int = 256): DataFrame = {
    require(fftSize >= 4 && (fftSize & (fftSize - 1)) == 0,
      s"fftSize must be a power of two >= 4, got $fftSize")
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("sample_rate", FloatType, nullable = true),
      StructField("peak_bin", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.spectralPeak(_, fftSize)) match {
          case Some((sr, pk, n)) => Row(r.get(idIdx), sr, pk, n)
          case None => Row(r.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /** Energy-based voice-activity detection over REAL decoded samples —
    * the speech-corpus curation primitive (silence trimming, speech/
    * noise ratio screening): fixed-size frames, per-frame RMS
    * (ascending-index integer-exact sum of squares → one sqrt — the
    * bit-for-bit SQL-replayable arithmetic of the FLAC gate), active =
    * RMS ≥ threshold on the 6dp-rounded value so engines agree at the
    * boundary. A trailing partial frame is dropped (VAD framing
    * convention). Returns one row per frame:
    * `(id, frame_idx, n, rms, active)`; undecodable payloads yield zero
    * rows.
    */
  def audioActivity(df: DataFrame, idCol: String, binCol: String,
      frameSize: Int, threshold: Double): DataFrame = {
    require(frameSize >= 1, s"frameSize must be positive, got $frameSize")
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("active", BooleanType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = Option(r.get(binIdx))
          .map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.decodeSamples).map(_._2)
          .getOrElse(Array.empty[Double])
        val nFrames = samples.length / frameSize
        (0 until nFrames).map { f =>
          var sumSq = 0.0
          var i = f * frameSize
          val end = i + frameSize
          while (i < end) { sumSq += samples(i) * samples(i); i += 1 }
          val rms = BigDecimal(math.sqrt(sumSq / frameSize))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(r.get(idIdx), f, frameSize, rms, rms >= threshold)
        }
      }
    }(enc)
  }

  /** MFCC extraction over REAL decoded samples — the canonical speech
    * feature (decode → FFT power → mel filterbank → log → DCT-II), all
    * formulaic and pure-JVM, in the standard mapPartitions batch shape.
    * Returns `(id, dominant_band, n_coef, mfcc)` where `dominant_band`
    * is the 1-based mel filter with the most energy (the SQL-checkable
    * invariant: a bin-centered tone's energy lands in the filter the
    * public mel formula names) and `mfcc` carries the first `nCoef`
    * cepstra rounded to 6dp. Undecodable payloads yield null fields.
    */
  def audioMfcc(df: DataFrame, idCol: String, binCol: String,
      fftSize: Int = 256, nMel: Int = 26, nCoef: Int = 13): DataFrame = {
    require(fftSize >= 4 && (fftSize & (fftSize - 1)) == 0,
      s"fftSize must be a power of two >= 4, got $fftSize")
    require(nMel >= 2 && nCoef >= 1 && nCoef <= nMel,
      s"need 2 <= nCoef <= nMel, got nMel=$nMel nCoef=$nCoef")
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("dominant_band", IntegerType, nullable = true),
      StructField("n_coef", IntegerType, nullable = true),
      StructField("mfcc", ArrayType(DoubleType, containsNull = false),
        nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.decodeSamples) match {
          case Some((rate, samples)) =>
            val melE = MediaCodec.melEnergies(samples, rate, fftSize, nMel)
            var best = 0
            var m = 1
            while (m < nMel) { if (melE(m) > melE(best)) best = m; m += 1 }
            val cep = MediaCodec.mfccFromMel(melE, nCoef).map(v =>
              BigDecimal(v).setScale(6,
                BigDecimal.RoundingMode.HALF_UP).toDouble)
            Row(r.get(idIdx), best + 1, nCoef, cep.toSeq)
          case None => Row(r.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /** Utterance segmentation over VAD frames — the ASR-corpus cut step:
    * consecutive ACTIVE frames (the [[audioActivity]] output) group into
    * utterances via gaps-and-islands (`frame − rank-among-active` is
    * constant within an island; one keyed window, no iteration).
    * Returns `(id, utt_idx, start_frame, end_frame, n_frames)` with
    * utterances numbered by start frame.
    */
  def utteranceSegments(frames: DataFrame, idCol: String,
      frameCol: String, activeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byId = Window.partitionBy(col(idCol))
    val active = frames.filter(col(activeCol))
      .withColumn("_grp", col(frameCol) -
        row_number().over(byId.orderBy(col(frameCol))))
    active.groupBy(col(idCol), col("_grp"))
      .agg(min(col(frameCol)).as("start_frame"),
        max(col(frameCol)).as("end_frame"),
        count(lit(1)).cast("int").as("n_frames"))
      .withColumn("utt_idx", (row_number().over(
        byId.orderBy(col("start_frame"))) - 1).cast("int"))
      .select(col(idCol), col("utt_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"))
  }

  /** Archival FLAC encode over partition batches: 16-bit PCM sample
    * arrays (`array<int>` = mono; `array<array<int>>` = one inner array
    * per channel) → a valid single-frame FLAC stream
    * ([[graft.operators.FlacCodec.encode]]: CONSTANT subframe for a
    * uniform channel, VERBATIM otherwise, CRC-8/CRC-16 written). Null
    * or empty sample arrays yield a null payload. Returns
    * `(id, payload)`. Same mapPartitions batch shape as every decode
    * operator here — one JVM call per record, no UDF.
    */
  def encodeFlac(df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int, fixedOrder: Option[Int] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val sIdx = df.schema.fieldIndex(samplesCol)
    val nested = df.schema(samplesCol).dataType match {
      case ArrayType(ArrayType(IntegerType, _), _) => true
      case ArrayType(IntegerType, _) => false
      case t => throw new IllegalArgumentException(
        s"encodeFlac expects array<int> or array<array<int>>, got ${t.simpleString}")
    }
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(sIdx)) null
          else {
            val chans: Array[Array[Int]] =
              if (nested) r.getSeq[scala.collection.Seq[Int]](sIdx)
                .map(_.toArray).toArray
              else Array(r.getSeq[Int](sIdx).toArray)
            if (chans.isEmpty || chans.exists(_.isEmpty)) null
            else fixedOrder match {
              case Some(ord) => graft.operators.FlacCodec.encodeFixed(
                sampleRate, chans, math.min(ord, chans(0).length - 1))
              case None => graft.operators.FlacCodec.encode(sampleRate, chans)
            }
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** Archival PNG encode over partition batches: a grayscale raster as
    * `array<int>` (row-major, values clamped to [0, 255], `width`
    * columns per row) → a lossless truecolor PNG via the JDK's own
    * `javax.imageio` writer — the image twin of [[encodeFlac]], and the
    * write side of [[decodeImages]]. Pixels are written as RGB with
    * r=g=b=v on purpose: the JDK's `TYPE_BYTE_GRAY` path applies a
    * gray→sRGB color transform on read-back that would make the decoded
    * luma a nonlinear function of the stored value, while the RGB path
    * round-trips exactly (PNG is lossless), so `decode(encode(v))`
    * recovers v bit-for-bit — the property the oracle gates. Null,
    * empty, or non-multiple-of-width arrays — and non-positive widths —
    * yield a null payload (poison-pill contract). `widthCol` is a
    * per-row int so one call can emit mixed-dimension rasters. Returns
    * `(id, payload)`.
    */
  def encodePng(df: DataFrame, idCol: String, pixelsCol: String,
      widthCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(pixelsCol)
    val wIdx = df.schema.fieldIndex(widthCol)
    require(df.schema(widthCol).dataType == IntegerType,
      s"encodePng expects an int width column, got " +
        df.schema(widthCol).dataType.simpleString)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(pIdx) || r.isNullAt(wIdx)) null
          else {
            val px = r.getSeq[Int](pIdx)
            val width = r.getInt(wIdx)
            if (width <= 0 || px.isEmpty || px.length % width != 0) null
            else {
              val h = px.length / width
              val img = new java.awt.image.BufferedImage(
                width, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var i = 0
              while (i < px.length) {
                val v = math.max(0, math.min(255, px(i)))
                img.setRGB(i % width, i / width, (v << 16) | (v << 8) | v)
                i += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              bos.toByteArray
            }
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** G.711 µ-law telephony encode over partition batches: 16-bit PCM
    * sample arrays → µ-law WAV payloads (8 bits/sample, the ITU
    * companding codec — a REAL lossy encode whose decode side is the
    * JDK's own ULAW converter inside [[MediaCodec.decodeSamples]], so
    * encode AND decode of a compressed format run with zero stub).
    * Null/empty sample arrays yield a null payload. Returns
    * `(id, payload)`.
    */
  def encodeG711(df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val sIdx = df.schema.fieldIndex(samplesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(sIdx)) null
          else {
            val xs = r.getSeq[Int](sIdx)
            if (xs.isEmpty) null
            else {
              val codes = new Array[Byte](xs.length)
              var i = 0
              while (i < xs.length) {
                codes(i) = MediaCodec.muLawEncode(xs(i)); i += 1
              }
              MediaCodec.wrapWavMuLaw(codes, sampleRate)
            }
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** MPEG-1 Layer III (MP3) encode over partition batches — the lossy
    * perceptual-transform sibling of [[encodeG711]], through our own
    * [[graft.operators.Mp3Codec]] (structure-exact bitstream,
    * psychoacoustics-free quantizer; see the codec scaladoc for the
    * two documented table deviations). One mono stream per row from an
    * `array<int>` 16-bit-range sample column; null/empty sample lists
    * yield a null payload. Returns `(id, payload)`.
    */
  def encodeMp3(df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int, blockMode: String = "long"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val sIdx = df.schema.fieldIndex(samplesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(sIdx)) null
          else {
            val xs = r.getSeq[Int](sIdx)
            if (xs.isEmpty) null
            else graft.operators.Mp3Codec.encode(xs.toArray, sampleRate,
              0, blockMode)
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** Stereo MP3 encode — two `array<int>` sample columns (left, right)
    * per row, coded as plain LR stereo, mid/side joint stereo (see
    * [[graft.operators.Mp3Codec.encodeStereo]]), or — when
    * `intensityBand >= 0` — intensity joint stereo with that long
    * scalefactor band as the bound (see
    * [[graft.operators.Mp3Codec.encodeStereoIntensity]]; overrides
    * `msStereo`). Null/empty/mismatched channels yield a null payload.
    * Returns `(id, payload)`.
    */
  def encodeMp3Stereo(df: DataFrame, idCol: String, leftCol: String,
      rightCol: String, sampleRate: Int,
      msStereo: Boolean = false, intensityBand: Int = -1,
      msIntensity: Boolean = false, blockMode: String = "long"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val lIdx = df.schema.fieldIndex(leftCol)
    val rIdx = df.schema.fieldIndex(rightCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(lIdx) || r.isNullAt(rIdx)) null
          else {
            val l = r.getSeq[Int](lIdx)
            val rt = r.getSeq[Int](rIdx)
            if (l.isEmpty || l.length != rt.length) null
            else if (intensityBand >= 0)
              graft.operators.Mp3Codec.encodeStereoIntensity(l.toArray,
                rt.toArray, sampleRate, 0, intensityBand, blockMode,
                msBelow = msIntensity)
            else graft.operators.Mp3Codec.encodeStereo(l.toArray,
              rt.toArray, sampleRate, 0, blockMode, msStereo)
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** MJPEG-in-AVI video encode over partition batches: per row, an
    * array of grayscale frame rasters (`array<array<int>>`, row-major,
    * all `width` columns wide) → JPEG per frame (the JDK's own codec,
    * r=g=b=v) → a spec-layout AVI. The write side of [[videoFrames]].
    * Null/empty frame lists, malformed rasters, or a non-positive width
    * yield a null payload. Returns `(id, payload)`.
    */
  def encodeAviMjpeg(df: DataFrame, idCol: String, framesCol: String,
      widthCol: String, fps: Int = 25): DataFrame = {
    require(fps >= 1, s"fps must be positive, got $fps")
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val fIdx = df.schema.fieldIndex(framesCol)
    val wIdx = df.schema.fieldIndex(widthCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(fIdx) || r.isNullAt(wIdx)) null
          else {
            val frames = r.getSeq[scala.collection.Seq[Int]](fIdx)
            val width = r.getInt(wIdx)
            if (width <= 0 || frames.isEmpty ||
                frames.exists(f => f == null || f.isEmpty ||
                  f.length % width != 0)) null
            else {
              val h = frames.head.length / width
              if (frames.exists(_.length != width * h)) null
              else {
                val jpegs = frames.map { px =>
                  val img = new java.awt.image.BufferedImage(
                    width, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  var i = 0
                  while (i < px.length) {
                    val v = math.max(0, math.min(255, px(i)))
                    img.setRGB(i % width, i / width,
                      (v << 16) | (v << 8) | v)
                    i += 1
                  }
                  val jb = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "jpg", jb)
                  jb.toByteArray
                }
                MediaCodec.wrapAviMjpeg(jpegs.toSeq, width, h, fps)
              }
            }
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** Per-frame perceptual fingerprints of MJPEG-in-AVI payloads: each
    * `00dc` chunk is a standalone JPEG, so [[MediaCodec.aHash]] applies
    * to the frame bytes directly — `(id, frame_idx, ahash)` rows, null
    * hash for an undecodable frame. The input to
    * [[nearDuplicateVideos]].
    */
  def videoFrameHashes(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
        val frames = p.map { bytes =>
          // reuse the RIFF walk but keep the raw chunk bytes
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          def le32(i: Int): Long =
            (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
              ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
          def ascii(i: Int): String = new String(bytes, i, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          if (bytes.length >= 12 && ascii(0) == "RIFF" &&
              ascii(8) == "AVI ") {
            def walk(from: Long, until: Long, inMovi: Boolean): Unit = {
              var off = from
              while (off + 8 <= until) {
                val id = ascii(off.toInt)
                val size = le32(off.toInt + 4)
                val body = off + 8
                if (body + size > until) return
                if (id == "LIST" && size >= 4) {
                  val sub = ascii(body.toInt)
                  // 'rec ' grouping LISTs inside movi still hold frames
                  walk(body + 4, body + size,
                    sub == "movi" || (inMovi && sub == "rec "))
                } else if (inMovi && (id.endsWith("dc") || id.endsWith("db")))
                  out += java.util.Arrays.copyOfRange(bytes, body.toInt,
                    (body + size).toInt)
                off = body + size + (size & 1L)
              }
            }
            walk(12L, math.min(12L + le32(4) - 4L, bytes.length.toLong),
              inMovi = false)
          }
          out.toSeq
        }.getOrElse(Seq.empty)
        frames.zipWithIndex.map { case (fb, i) =>
          MediaCodec.aHash(fb) match {
            case Some(h) => Row(r.get(idIdx), i, h)
            case None => Row(r.get(idIdx), i, null)
          }
        }
      }
    }(enc)
  }

  /** Video NEAR-dup pairs: candidates meet through the banded Hamming
    * join of their ANCHOR frame (frame 0 — the [[nearDuplicateImages]]
    * multi-index recall guarantee applies to it), then verify over ALL
    * frames: pairs survive only when both clips have the same frame
    * count and every aligned frame pair sits within `maxHamming`.
    * Returns `(id_a, id_b, n_frames, max_hamming)` — never an all-pairs
    * clip comparison, and the per-frame verify joins only the bounded
    * candidate set.
    */
  def nearDuplicateVideos(frameHashes: DataFrame, idCol: String,
      frameCol: String, hashCol: String, maxHamming: Int): DataFrame = {
    // r17: the frame-hash table is referenced SIX times below (anchor
    // band self-join ×2, per-frame verify ×2, frame-count legs ×2) and
    // its lineage is the opaque encode→container-walk→aHash chain —
    // without a cut, every reference re-runs the codecs (guide §1.2).
    // localCheckpoint (eager): one execution, blocks ContextCleaner-
    // managed (a persist here would leak in the CacheManager across a
    // long serving session); the table is a few long columns per frame,
    // orders of magnitude under the payloads. Trade: localCheckpoint
    // forfeits lineage recovery for this small table — an executor loss
    // fails the query instead of recomputing (documented, acceptable
    // for a derived frame-sized table).
    val h = frameHashes.filter(col(hashCol).isNotNull)
      .select(col(idCol).as("_id"), col(frameCol).as("_f"),
        col(hashCol).as("_h"))
      .localCheckpoint()
    val anchors = h.filter(col("_f") === 0)
      .select(col("_id").as("id"), col("_h").as("ahash"))
    // anchors is a cheap filter of the checkpoint above — no second cut
    val cand = nearDuplicateImagesImpl(anchors, "id", "ahash", maxHamming,
        cutLineage = false)
      .select(col("id_a"), col("id_b"))
    cand
      .join(h.as("a"), col("id_a") === col("a._id"))
      .join(h.as("b"),
        col("id_b") === col("b._id") && col("a._f") === col("b._f"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("int").as("_matched"),
        max(bit_count(col("a._h").bitwiseXOR(col("b._h"))))
          .cast("int").as("max_hamming"))
      .join(h.groupBy(col("_id")).agg(count(lit(1)).cast("int").as("_na"))
          .withColumnRenamed("_id", "id_a"), "id_a")
      .join(h.groupBy(col("_id")).agg(count(lit(1)).cast("int").as("_nb"))
          .withColumnRenamed("_id", "id_b"), "id_b")
      .filter(col("_matched") === col("_na") && col("_na") === col("_nb") &&
        col("max_hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("_na").as("n_frames"),
        col("max_hamming"))
  }

  /** REAL video frame decode: MJPEG-in-AVI payloads → one row per
    * decoded frame `(id, frame_idx, width, height, mean_luma)` through
    * [[MediaCodec.decodeVideoFrames]] (RIFF walk + the JDK JPEG codec —
    * no stub in the loop). Non-AVI payloads yield zero rows; a corrupt
    * frame inside a valid container is skipped.
    */
  def videoFrames(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.decodeVideoFrames).getOrElse(Seq.empty)
          .zipWithIndex.map { case ((w, h, luma), i) =>
            Row(r.get(idIdx), i, w, h, luma)
          }
      }
    }(enc)
  }

  /** IMA/DVI ADPCM encode over partition batches: 16-bit PCM sample
    * arrays → 4-bit predictive-coded WAV (tag 0x11) payloads — the
    * third REAL lossy leg next to G.711 ([[encodeG711]]) and MJPEG
    * ([[encodeAviMjpeg]]); the decode side is
    * [[MediaCodec.decodeWavIma]], our own spec decoder (the JDK ships
    * none). Null/empty sample arrays yield a null payload. Returns
    * `(id, payload)`.
    */
  def encodeAdpcm(df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val sIdx = df.schema.fieldIndex(samplesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(sIdx)) null
          else {
            val xs = r.getSeq[Int](sIdx)
            if (xs.isEmpty) null
            else {
              val block = MediaCodec.imaAdpcmEncodeBlock(xs.toArray)
              MediaCodec.wrapWavIma(block, xs.length, sampleRate)
            }
          }
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** Image resize over partition batches — the ubiquitous vision
    * preprocessing step: decode (any JDK-readable container), bilinear
    * rescale to `outW`×`outH` on a TYPE_INT_RGB canvas, re-encode as
    * lossless PNG. Composes with [[decodeImages]]/[[imagePatches]]
    * downstream. Undecodable payloads yield a null payload. Returns
    * `(id, payload)`.
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, s"bad target $outW x $outH")
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = Option(r.get(binIdx))
          .map(_.asInstanceOf[Array[Byte]]).flatMap { bytes =>
            try {
              val src = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              if (src == null) None
              else {
                val dst = new java.awt.image.BufferedImage(
                  outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, outW, outH, null)
                g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", bos)
                Some(bos.toByteArray)
              }
            } catch { case _: Exception => None }
          }.orNull
        Row(r.get(idIdx), payload)
      }
    }(enc)
  }

  /** ViT-style patch grid over REAL decoded pixels: the image splits
    * into `patch`×`patch` cells (dimensions must divide exactly — a
    * ragged grid is a config error, not data) and each patch reports
    * its exact integer-sum mean luma, 6dp-rounded — the patch-embedding
    * precursor every vision-transformer pipeline runs. One row per
    * patch: `(id, patch_idx, patch_row, patch_col, mean_luma)`,
    * `patch_idx` row-major. Undecodable payloads yield zero rows.
    */
  def imagePatches(df: DataFrame, idCol: String, binCol: String,
      patch: Int): DataFrame = {
    require(patch >= 1, s"patch must be positive, got $patch")
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("patch_idx", IntegerType, nullable = false),
      StructField("patch_row", IntegerType, nullable = false),
      StructField("patch_col", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val img = Option(r.get(binIdx))
          .map(_.asInstanceOf[Array[Byte]]).flatMap { bytes =>
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          }
        img match {
          case Some(im) if im.getWidth % patch == 0 &&
              im.getHeight % patch == 0 =>
            val (pw, ph) = (im.getWidth / patch, im.getHeight / patch)
            for (pr <- 0 until ph; pc <- 0 until pw) yield {
              var sum = 0L
              var y = pr * patch
              while (y < (pr + 1) * patch) {
                var x = pc * patch
                while (x < (pc + 1) * patch) {
                  val rgb = im.getRGB(x, y)
                  sum += (299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                  x += 1
                }
                y += 1
              }
              val mean = BigDecimal(sum.toDouble / (patch * patch))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Row(r.get(idIdx), pr * pw + pc, pr, pc, mean)
            }
          case _ => Seq.empty[Row]
        }
      }
    }(enc)
  }

  /** Perceptual fingerprints over partition batches: `(id, ahash)` with
    * null for undecodable payloads — the input to [[nearDuplicateImages]].
    */
  def imageHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Option(r.get(binIdx)).map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.aHash) match {
          case Some(hh) => Row(r.get(idIdx), hh)
          case None => Row(r.get(idIdx), null)
        }
      }
    }(enc)
  }

  /** Image NEAR-dup candidate pairs by perceptual-hash Hamming distance —
    * the multimodal twin of SimHash text dedup, with the same banded
    * scale shape: the 64-bit hash splits into `maxHamming + 1` bands
    * (multi-index hashing — by pigeonhole two hashes within the budget
    * MUST agree exactly on some band, so recall is exact at any
    * allowed budget), pairs join on (band index, band value), and the
    * bounded candidate set verifies with `bit_count(xor)`. Never an
    * all-pairs comparison. Wider budgets mean narrower bands and
    * therefore larger candidate sets — the standard recall/cost dial;
    * ≥ 4-bit bands (`maxHamming ≤ 15`) keep candidates bounded on
    * non-degenerate corpora.
    */
  def nearDuplicateImages(hashes: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int): DataFrame =
    nearDuplicateImagesImpl(hashes, idCol, hashCol, maxHamming,
      cutLineage = true)

  /** [[nearDuplicateImages]] body with the lineage cut optional — r18
    * (advisor): [[nearDuplicateVideos]] already localCheckpoints its
    * frame-hash table and passes a cheap filter of that checkpoint in as
    * `hashes`; checkpointing AGAIN was a redundant eager materialization
    * job plus duplicate block storage per call, so the video path calls
    * this with `cutLineage = false`.
    */
  private def nearDuplicateImagesImpl(hashes: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int, cutLineage: Boolean): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (band width >= 4 bits), " +
        s"got $maxHamming")
    val bands = maxHamming + 1
    val width = 64 / bands
    // r17: the banded self-join references the hash table twice, and its
    // lineage is usually an image encode+decode+hash chain — cut it with
    // an eager localCheckpoint so the codecs run once (same rationale
    // and trade as nearDuplicateVideos)
    val h0 = hashes.filter(col(hashCol).isNotNull)
      .select(col(idCol).as("_id"), col(hashCol).as("_h"))
    val h = if (cutLineage) h0.localCheckpoint() else h0
    val banded = h.select(col("_id"), col("_h"),
      explode(array((0 until bands).map { b =>
        val w = if (b == bands - 1) 64 - b * width else width
        val mask = if (w >= 64) -1L else (1L << w) - 1
        struct(lit(b).as("b"),
          shiftright(col("_h"), b * width).bitwiseAND(lit(mask)).as("v"))
      }: _*)).as("_band"))
      .select(col("_id"), col("_h"), col("_band.b").as("_b"),
        col("_band.v").as("_v"))
    banded.as("l").join(banded.as("r"),
        col("l._b") === col("r._b") && col("l._v") === col("r._v") &&
          col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"),
        bit_count(col("l._h").bitwiseXOR(col("r._h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** REAL pixel decode for the formats the JDK ships codecs for —
    * PNG/JPEG/GIF/BMP via `javax.imageio`, no external library, works
    * headless — so the image half of the decode path is NOT a stub:
    * dimensions, mean luma (integer Rec.601 per pixel, exact integer
    * sum ÷ n — deterministic), and a CRC32 over the RGB raster (the
    * exact-dup fingerprint at pixel level, robust to container-level
    * re-encodes of identical pixels... within one format). Audio/video
    * decode remains stubbed: the JDK has no codecs for them.
    *
    * Same mapPartitions batch shape as [[extractFeatures]]; an
    * undecodable or truncated payload yields null fields, never a task
    * failure (the poison-pill contract).
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_luma", DoubleType, nullable = true),
      StructField("pixel_crc", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded = Option(r.get(binIdx))
          .map(_.asInstanceOf[Array[Byte]])
          .flatMap(MediaCodec.decodeImage)
        decoded match {
          case Some((w, h, luma, crc)) => Row(r.get(idIdx), w, h, luma, crc)
          case None => Row(r.get(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }
}
