package graft.operators

import scala.collection.mutable.ArrayBuffer

/** MPEG Audio Layer III (MP3) — own-written codec from the public
  * ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2 LSF) specifications,
  * the lossy-audio sibling of [[FlacCodec]]. Mono and stereo: all four
  * channel modes decode — LR, dual-channel, joint stereo with mid/side
  * AND MPEG-1 intensity — long blocks (is_ratio = tan(is_pos·π/12)
  * over the right channel's zero_part, illegal position 7 falling back
  * to MS when both joint modes are on), short blocks (the same formula
  * per window, positions in the short scalefactor slots) and MIXED
  * blocks (long positions below the seam, per-window short positions
  * above); LSF intensity fails loudly, its io-scaling position
  * semantics are not shipped —
  * and [[encodeStereo]]/[[encodeStereoIntensity]] write LR, MS or
  * intensity streams. The full
  * bitstream STRUCTURE is implemented exactly: frame sync + header
  * fields for MPEG-1 and MPEG-2 LSF, side info (17/9-byte mono,
  * 32/17-byte stereo layouts), the bit reservoir (`main_data_begin`
  * back-pointers across frames), scalefactor layouts (MPEG-1 slen
  * pairs + per-channel scfsi; LSF slen
  * decomposition), Huffman-coded big_values/count1/rzero region
  * partitioning with sign bits and linbits escapes, the 4/3-power
  * requantizer with global_gain / scalefac_scale / preflag semantics,
  * alias-reduction butterflies (the spec's eight ci coefficients),
  * 36-point IMDCT with the long/start/stop block-type windows,
  * frequency inversion, and the 32-band cosine-modulated synthesis
  * filterbank. MPEG-1 short blocks (block_type 2) decode and encode
  * fully — short scalefactor-band tables, the frequency-line reorder,
  * subblock_gain, 3×12-point IMDCT tiling, and an encoder transient
  * detector emitting the spec's long→start→short→stop window sequence.
  * MIXED blocks (mixed_block_flag: the two lowest subbands
  * long-transformed under normal windows with long bands 0-7 in MPEG-1
  * / 0-5 in LSF — both long-table families reach line 36 there — the
  * rest short with bands 3-12, seam-only alias reduction) decode and
  * encode fully too, as do LSF short granules (the 13818-3 block-type-2
  * slen partitions, each row sum-forced by its band count: short
  * 9+9+9+9 / 9+9+12+6 / 18+18 over 36 sfb-major values, mixed 6+9+9+9 /
  * 6+9+12+6 / 15+18 over 33; LSF preflag is implied by
  * scalefac_compress >= 500, never transmitted). MPEG-1 intensity on
  * MIXED granules decodes and encodes too — the two shipped halves
  * composed: long-band positions below the seam (bands ib..7 in the
  * right channel's long slots), per-window short positions above
  * (bands 3-12, band 12 inheriting slot 11), with the long half's
  * zero_part reachable only once the whole short half is silent
  * (transmission order puts every short line above every long line) —
  * including mode_extension 3, where a short-window MS fallback
  * forces the entire long half onto mid/side for exactly that
  * reason. LSF intensity stereo (13818-3
  * io-scaling positions) FAILS LOUDLY: its position layout is not
  * shipped, and decoding without it would be silently garbled — the
  * same loud-or-correct stance as the Huffman subset below.
  *
  * Three spec DATA SETS are not reconstructible in this offline
  * container and are handled explicitly rather than faked:
  *
  *   - LSF intensity-stereo positions (13818-3): the intensity variant
  *     re-partitions scalefac_compress into its own slen ranges AND
  *     scales by io^f(is_pos) with io ∈ {2^-1/4, 2^-1/8} selected by a
  *     compress bit — three interlocking constants with NO structural
  *     cross-check (nothing sums to a band count, nothing is
  *     Kraft-verifiable), and an encoder round trip would only prove
  *     self-consistency, not conformance: a wrong io exponent decodes
  *     third-party LSF intensity streams to silently wrong channel
  *     levels. RE-CHECKED 2026-08-16 (round 14): no authoritative copy
  *     of the 13818-3 intensity ranges exists in this offline
  *     container (checked /opt/spark/jars, the coursier cache, the
  *     reference repo, the retrieved-snippets corpus) — the loud fail
  *     stands, the COVERAGE.md Kafka-jar convention.
  *   - Huffman code tables (11172-3 Table B.7): tables 0-3, 5, 6 and
  *     both count1 quadruple tables are included (quad table B is
  *     defined algorithmically — 4-bit one's complement; the rest are
  *     small enough to state with confidence and every one is verified
  *     prefix-free and Kraft-complete at class load). Tables 7-31 are
  *     NOT included: decoding a stream that selects one fails loudly
  *     with the table id (adding a table is data-only — the linbits
  *     escape path and paired-region machinery are already in place).
  *     [[encode]] restricts itself to the verified subset.
  *     RE-CHECKED 2026-08-16 (round 14 — jar sweep found only
  *     bzip2/deflate/zstd Huffman code, no ISO B.7 source): the
  *     remaining tables span 6×6 to
  *     16×16 codeword/length pairs (up to 256 entries each, plus the
  *     per-table linbits widths); the class-load Kraft/prefix checks
  *     would catch a malformed LENGTH profile but cannot catch a
  *     permuted symbol→code assignment, which would decode third-party
  *     streams to silently wrong spectra — strictly worse than the loud
  *     fail. No authoritative copy of the B.7 constants exists in this
  *     offline container (checked: /opt/spark/jars, the reference repo,
  *     the retrieved-snippets corpus), so the blockage stands, the
  *     COVERAGE.md Kafka-jar convention. RE-CHECKED 2026-08-16 (round
  *     15): a fresh filesystem-wide sweep (every *huff* source file on
  *     disk, the gsutil/SDK trees, PAPERS.md/SNIPPETS.md greps for
  *     table data) surfaced only HTTP/2 HPACK Huffman constants —
  *     still no ISO B.7 source; blocked. An encoder round-trip can
  *     self-verify internal consistency per table but not spec
  *     conformance; these tables stay out until real constants are
  *     available. RE-CHECKED 2026-08-16 (round 16): swept again for
  *     ISO 11172 documents, mpg123/minimp3/libmad/LAME sources (any of
  *     which embed B.7), and *huffman*table* files — only HPACK
  *     constants on the box, no MPEG audio decoder source anywhere;
  *     still blocked.
  *   - The 512-tap filterbank prototype (Table B.3 / Annex B): replaced
  *     by an own-designed near-perfect-reconstruction pseudo-QMF
  *     prototype (Kaiser-windowed lowpass, crossover solved numerically
  *     at class load to the power-complementary point, synthesis gain
  *     self-calibrated) under the spec's exact modulation structure.
  *     Encode→decode round-trips through the matched pair are clean;
  *     decoding a third-party stream reconstructs with a slightly
  *     mismatched window (tonal content intact, alias cancellation
  *     approximate).
  *
  * Golden interop evidence available offline: the container ships one
  * real third-party MP3 (gsutil test data — MPEG-2 LSF, 22.05 kHz,
  * mono, 45 silent frames with a live bit reservoir); [[decode]] walks
  * it to exact silence, exercising the LSF header/side-info/reservoir
  * paths against bytes this codec did not write (MultimodalSpec).
  *
  * Everything is deterministic; no randomness, no JDK codec use.
  */
object Mp3Codec {

  final case class Decoded(sampleRate: Int, samples: Array[Double],
      channels: Int = 1)

  /** Leading samples an integration layer should drop: one full MPEG-1
    * frame, past the analysis+synthesis filterbank warmup (~529
    * samples) and the first MDCT overlap — the codec-delay convention
    * real toolchains carry as gapless metadata.
    */
  val LeadingSkip: Int = 1152

  // ------------------------------------------------------------------
  // Bit I/O
  // ------------------------------------------------------------------

  private final class BitReader(val buf: Array[Byte]) {
    var pos: Int = 0 // bit position
    def bitsLeft: Int = buf.length * 8 - pos
    private def overrun(): Nothing = throw new IllegalArgumentException(
      "Mp3Codec: bit reader overrun (corrupt or truncated stream)")
    def get(n: Int): Int = {
      if (pos + n > buf.length * 8) overrun()
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((buf(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def get1(): Int = {
      if (pos >= buf.length * 8) overrun()
      val v = (buf(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
  }

  private final class BitWriter {
    private val bytes = ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) { bytes += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def bitLength: Int = bytes.length * 8 + nb
    def padToByte(): Unit = if (nb > 0) put(0, 8 - nb)
    def result(): Array[Byte] = { padToByte(); bytes.toArray }
  }

  // ------------------------------------------------------------------
  // Huffman tables (ISO 11172-3 Table B.7 — verified subset)
  // ------------------------------------------------------------------

  /** One big-values table: `xlen × ylen` entries indexed `x*ylen + y`,
    * parallel (hlen, hcod) arrays; `linbits` escape bits for x==15 /
    * y==15 (0 for every table in the shipped subset).
    */
  private final case class HuffTable(xlen: Int, ylen: Int, linbits: Int,
      lens: Array[Int], codes: Array[Int]) {
    // decode map keyed (len << 24 | code) — codes are <= 19 bits
    val decodeMap: Map[Int, Int] = {
      val m = Map.newBuilder[Int, Int]
      var i = 0
      while (i < lens.length) {
        m += ((lens(i) << 24 | codes(i)) -> i)
        i += 1
      }
      m.result()
    }
    val maxLen: Int = if (lens.isEmpty) 0 else lens.max
    // self-checks: prefix-free and Kraft-complete (every ISO big-values
    // table is a complete Huffman code) — a mis-stated table fails the
    // build, never decodes garbage
    require(lens.length == xlen * ylen, "table size mismatch")
    require(math.abs(lens.map(l => math.pow(2.0, -l)).sum - 1.0) < 1e-12,
      s"Huffman table not Kraft-complete")
    for (i <- lens.indices; j <- lens.indices if i != j)
      require(!(lens(j) >= lens(i) &&
          (codes(j) >> (lens(j) - lens(i))) == codes(i)),
        s"Huffman table not prefix-free at $i/$j")
  }

  private val t1 = HuffTable(2, 2, 0,
    Array(1, 3, 2, 3), Array(1, 1, 1, 0))
  private val t2 = HuffTable(3, 3, 0,
    Array(1, 3, 6, 3, 3, 5, 5, 5, 6), Array(1, 2, 1, 3, 1, 1, 3, 2, 0))
  private val t3 = HuffTable(3, 3, 0,
    Array(2, 2, 6, 3, 2, 5, 5, 5, 6), Array(3, 2, 1, 1, 1, 1, 3, 2, 0))
  private val t5 = HuffTable(4, 4, 0,
    Array(1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
    Array(1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0))
  private val t6 = HuffTable(4, 4, 0,
    Array(3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7),
    Array(7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0))

  /** table id → implemented table; id 0 codes the all-zero region (no
    * bits). Ids 4 and 14 are spec-reserved (never valid); the rest of
    * B.7 (7-13, 15-31) is structurally supported but its constants are
    * not shipped — see the class scaladoc.
    */
  private val bigTables: Map[Int, HuffTable] =
    Map(1 -> t1, 2 -> t2, 3 -> t3, 5 -> t5, 6 -> t6)

  /** count1 quad table A (B.7 table 32). */
  private val quadA = HuffTable(4, 4, 0, // 16 quads, reuse the holder
    Array(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6),
    Array(1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1))

  /** count1 quad table B (B.7 table 33): 4-bit one's complement of the
    * (v,w,x,y) bits — algorithmically defined by the spec.
    */
  private val quadB = HuffTable(4, 4, 0,
    Array.fill(16)(4), Array.tabulate(16)(i => ~i & 0xF))

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var code = 0
    var len = 0
    while (len <= t.maxLen) {
      code = (code << 1) | r.get1()
      len += 1
      t.decodeMap.get(len << 24 | code) match {
        case Some(sym) => return sym
        case None => ()
      }
    }
    throw new IllegalArgumentException(
      "Mp3Codec: invalid Huffman codeword (corrupt stream or " +
        "mis-selected table)")
  }

  // ------------------------------------------------------------------
  // Static layout tables
  // ------------------------------------------------------------------

  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Long-block scalefactor band boundaries (23 entries, 0..576) per
    * sample rate — ISO Table B.8 / 13818-3 equivalents. Used for the
    * big-values region split and the scalefactor loop.
    */
  private val SfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
      110, 134, 162, 196, 238, 288, 342, 418, 576),
    48000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
      106, 128, 156, 190, 230, 276, 330, 384, 576),
    32000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102,
      126, 156, 194, 240, 296, 364, 448, 550, 576),
    22050 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116,
      140, 168, 200, 238, 284, 336, 396, 464, 522, 576),
    24000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114,
      136, 162, 194, 232, 278, 332, 394, 464, 540, 576),
    16000 -> Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116,
      140, 168, 200, 238, 284, 336, 396, 464, 522, 576))
  for ((sr, t) <- SfbLong) {
    require(t.length == 23 && t.head == 0 && t.last == 576 &&
      t.zip(t.tail).forall { case (a, b) => a < b },
      s"long sfb table for $sr is not a monotone 22-band 0..576 partition")
  }

  /** Short-block scalefactor band boundaries (14 entries, 0..192 PER
    * WINDOW — 13 bands, scalefactors for 0..11) per sample rate — the
    * Table B.8 short columns, same family as [[SfbLong]]. Validated at
    * class load (monotone, 0-start, 192-end) the way the Huffman subset
    * is Kraft-checked.
    */
  private val SfbShort: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000 -> Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000 -> Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    22050 -> Array(0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000 -> Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000 -> Array(0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192))
  for ((sr, t) <- SfbShort) {
    require(t.length == 14 && t.head == 0 && t.last == 192 &&
      t.zip(t.tail).forall { case (a, b) => a < b },
      s"short sfb table for $sr is not a monotone 0..192 partition")
  }

  /** MPEG-1 scalefactor bit counts indexed by scalefac_compress. */
  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** Preemphasis table (long bands 0..21). */
  private val Pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** Alias-reduction coefficients (the spec's eight ci values). */
  private val Ci =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val Cs = Ci.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private val Ca = Ci.zip(Cs).map { case (c, s) => c * s }

  // ------------------------------------------------------------------
  // Hybrid filterbank: IMDCT windows + 32-band pseudo-QMF
  // ------------------------------------------------------------------

  /** Block-type windows (36-point long/start/stop, 12-point short),
    * from the spec's closed forms.
    */
  private val WinLong: Array[Double] =
    Array.tabulate(36)(i => math.sin(math.Pi / 36 * (i + 0.5)))
  private val WinShort: Array[Double] =
    Array.tabulate(12)(i => math.sin(math.Pi / 12 * (i + 0.5)))
  private val WinStart: Array[Double] = Array.tabulate(36) { i =>
    if (i < 18) math.sin(math.Pi / 36 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi / 12 * (i - 18 + 0.5))
    else 0.0
  }
  private val WinStop: Array[Double] = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi / 12 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else math.sin(math.Pi / 36 * (i + 0.5))
  }

  private def windowFor(blockType: Int): Array[Double] = blockType match {
    case 0 => WinLong
    case 1 => WinStart
    case 3 => WinStop
    case _ => WinLong
  }

  // IMDCT basis: cos(pi/72 * (2i+19) * (2k+1)), i<36, k<18
  private val Imdct36: Array[Array[Double]] = Array.tabulate(36, 18) {
    (i, k) => math.cos(math.Pi / 72.0 * (2 * i + 19) * (2 * k + 1))
  }
  private val Imdct12: Array[Array[Double]] = Array.tabulate(12, 6) {
    (i, k) => math.cos(math.Pi / 24.0 * (2 * i + 7) * (2 * k + 1))
  }
  // TDAC round-trip scale for the forward/inverse pair below, solved in
  // closed form: sum_k cos-basis products over a sine-windowed
  // overlap-add reconstruct x * (N/4) — so the inverse carries 4/N.
  private val MdctScale36 = 4.0 / 36.0
  private val MdctScale12 = 4.0 / 12.0

  /** 512-tap pseudo-QMF prototype: Kaiser-windowed sinc whose cutoff is
    * solved (bisection on the directly-evaluated frequency response) so
    * |H| at the band crossover pi/64 is exactly 1/sqrt(2) — the
    * power-complementary point a near-perfect-reconstruction
    * cosine-modulated bank needs. Deterministic; built once.
    */
  private val Prototype: Array[Double] = {
    def i0(x: Double): Double = {
      var sum = 1.0
      var term = 1.0
      var k = 1
      while (k <= 25) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k))
        sum += term
        k += 1
      }
      sum
    }
    val beta = 9.0
    val n = 512
    val mid = (n - 1) / 2.0
    def proto(fc: Double): Array[Double] = {
      val h = Array.tabulate(n) { m =>
        val t = m - mid
        val sinc = if (t == 0.0) 2.0 * fc
                   else math.sin(2.0 * math.Pi * fc * t) / (math.Pi * t)
        val r = 2.0 * m / (n - 1) - 1.0
        sinc * i0(beta * math.sqrt(math.max(0.0, 1.0 - r * r))) / i0(beta)
      }
      val s = h.sum // normalize DC gain to 1
      h.map(_ / s)
    }
    def magAt(h: Array[Double], f: Double): Double = {
      var re = 0.0
      var im = 0.0
      var m = 0
      while (m < n) {
        re += h(m) * math.cos(2.0 * math.Pi * f * m)
        im -= h(m) * math.sin(2.0 * math.Pi * f * m)
        m += 1
      }
      math.sqrt(re * re + im * im)
    }
    val crossover = 1.0 / 128.0 // pi/64 in cycles/sample
    var lo = crossover * 0.5
    var hi = crossover * 2.0
    var fc = crossover
    var it = 0
    while (it < 60) {
      fc = (lo + hi) / 2
      if (magAt(proto(fc), crossover) < math.sqrt(0.5)) lo = fc else hi = fc
      it += 1
    }
    proto(fc)
  }

  // Filterbank in the spec's FACTORED form — exactly the flat
  // modulated-FIR pair (analysis a(k)(m) = h[m]·cos(pi/32 (k+0.5)(m-16)),
  // synthesis g(k)(m) = h[m]·cos(pi/32 (k+0.5)(m+16))·gain), rewritten
  // using cos periodicity: the phase advances by (2k+1)·pi every 64
  // taps, so the 512-tap modulation is a 64-phase windowed FOLD times a
  // 64×32 cosine matrix (the spec's Y/V lattice) — 6× fewer multiplies
  // per 32-sample slot (64·32 + 512 vs 512·32), bit-identical algebra.
  // `SynthGain` self-calibrates to unity round-trip by pushing a DC
  // signal through the pair once at class load.
  private val ProtoSigned: Array[Double] =
    Array.tabulate(512)(m =>
      Prototype(m) * (if ((m >> 6) % 2 == 1) -1.0 else 1.0))
  private val AnaMod: Array[Array[Double]] = Array.tabulate(32, 64) {
    (k, j) => math.cos(math.Pi / 32.0 * (k + 0.5) * (j - 16))
  }
  private val SynthMod: Array[Array[Double]] = Array.tabulate(64, 32) {
    (i, k) => math.cos(math.Pi / 32.0 * (k + 0.5) * (i + 16))
  }

  /** One analysis slot: 512-sample history (newest at index 0) → 32
    * subband samples, via the 64-phase fold + 32×64 modulation.
    */
  private def analysisStep(x: Array[Double], s: Array[Double]): Unit = {
    val y = new Array[Double](64)
    var m = 0
    while (m < 512) { y(m & 63) += x(m) * ProtoSigned(m); m += 1 }
    var k = 0
    while (k < 32) {
      var a = 0.0
      var j = 0
      while (j < 64) { a += AnaMod(k)(j) * y(j); j += 1 }
      s(k) = a
      k += 1
    }
  }

  /** One synthesis slot: 32 subband samples accumulated into the
    * 512-tap overlap buffer, via the 64×32 modulation + windowed
    * spread (gain pre-applied to the V phases).
    */
  private def synthesisStep(s: Array[Double], acc: Array[Double],
      gain: Double): Unit = {
    val v = new Array[Double](64)
    var i = 0
    while (i < 64) {
      var a = 0.0
      var k = 0
      while (k < 32) { a += SynthMod(i)(k) * s(k); k += 1 }
      v(i) = a * gain
      i += 1
    }
    var m = 0
    while (m < 512) { acc(m) += ProtoSigned(m) * v(m & 63); m += 1 }
  }

  private val SynthGain: Double = {
    // steady-state DC gain of the uncalibrated pair
    val steps = 40
    val x = new Array[Double](512)
    val acc = new Array[Double](512 + 32)
    val s = new Array[Double](32)
    var out = 0.0
    var t = 0
    while (t < steps) {
      System.arraycopy(x, 0, x, 32, 512 - 32)
      var j = 0
      while (j < 32) { x(j) = 1.0; j += 1 }
      analysisStep(x, s)
      synthesisStep(s, acc, 1.0)
      if (t == steps - 1) out = acc(16)
      System.arraycopy(acc, 32, acc, 0, 512)
      java.util.Arrays.fill(acc, 512, 512 + 32, 0.0)
      t += 1
    }
    1.0 / out
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final case class Header(version: Int, bitrate: Int, sr: Int,
      pad: Int, crc: Boolean, frameBytes: Int, granules: Int,
      mode: Int, modeExt: Int) {
    def channels: Int = if (mode == 3) 1 else 2
  }

  /** Parse the 4-byte header at `off`; None if not a valid Layer III
    * frame header this codec can place (mono, stereo, dual-channel or
    * joint stereo — the joint modes' extension bits are validated at
    * decode time, loudly).
    */
  private def parseHeader(b: Array[Byte], off: Int): Option[Header] = {
    if (off + 4 > b.length) return None
    if ((b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xE0) != 0xE0) return None
    val ver = (b(off + 1) >> 3) & 3   // 3=MPEG1 2=MPEG2 0=MPEG2.5
    val layer = (b(off + 1) >> 1) & 3 // 1 = Layer III
    if (layer != 1 || ver == 1) return None
    val crc = (b(off + 1) & 1) == 0
    val bri = (b(off + 2) >> 4) & 15
    val sri = (b(off + 2) >> 2) & 3
    val pad = (b(off + 2) >> 1) & 1
    val mode = (b(off + 3) >> 6) & 3
    val modeExt = (b(off + 3) >> 4) & 3
    if (bri == 0 || bri == 15 || sri == 3) return None
    val (br, sr, granules) = ver match {
      case 3 => (BitrateV1L3(bri) * 1000, SrV1(sri), 2)
      case 2 => (BitrateV2L3(bri) * 1000, SrV2(sri), 1)
      case _ => (BitrateV2L3(bri) * 1000, SrV25(sri), 1)
    }
    val slots = if (ver == 3) 144 * br / sr else 72 * br / sr
    Some(Header(ver, br, sr, pad, crc, slots + pad, granules, mode, modeExt))
  }

  private final case class GranuleInfo(part23: Int, bigValues: Int,
      globalGain: Int, sfCompress: Int, windowSwitching: Boolean,
      blockType: Int, mixed: Boolean, tableSelect: Array[Int],
      subblockGain: Array[Int], region0: Int, region1: Int,
      preflag: Int, sfScale: Int, count1Table: Int)

  private def readGranuleInfo(r: BitReader, v1: Boolean): GranuleInfo = {
    val part23 = r.get(12)
    val bigValues = r.get(9)
    val gg = r.get(8)
    val sfc = r.get(if (v1) 4 else 9)
    val wsf = r.get1() == 1
    var blockType = 0
    var mixed = false
    val ts = new Array[Int](3)
    val sbg = new Array[Int](3)
    var r0 = 0
    var r1 = 0
    if (wsf) {
      blockType = r.get(2)
      mixed = r.get1() == 1
      ts(0) = r.get(5); ts(1) = r.get(5)
      sbg(0) = r.get(3); sbg(1) = r.get(3); sbg(2) = r.get(3)
      // spec-implied regions under window switching
      r0 = if (blockType == 2 && !mixed) 8 else 7
      r1 = 20 - r0
    } else {
      ts(0) = r.get(5); ts(1) = r.get(5); ts(2) = r.get(5)
      r0 = r.get(4); r1 = r.get(3)
    }
    // LSF does not transmit preflag — 13818-3 implies it whenever
    // scalefac_compress lands in the top slen range (>= 500)
    val preflag = if (v1) r.get1() else if (sfc >= 500) 1 else 0
    val sfScale = r.get1()
    val c1t = r.get1()
    GranuleInfo(part23, bigValues, gg, sfc, wsf, blockType, mixed, ts,
      sbg, r0, r1, preflag, sfScale, c1t)
  }

  /** Decode an entire (possibly ID3-prefixed) Layer III stream to PCM
    * doubles — mono, stereo, dual-channel, or joint stereo with
    * mid/side (stereo output is L/R INTERLEAVED; [[Decoded.channels]]
    * says which). Returns None when no valid frame is found; throws on
    * structurally valid frames that select an unshipped Huffman table
    * or intensity stereo (loud, never silent garbage).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    var off = id3Skip(bytes)
    var sampleRate = 0
    var nCh = 0
    val chOut = Array.fill(2)(ArrayBuffer[Double]())
    val reservoir = ArrayBuffer[Byte]()
    // persistent filterbank state, per channel
    val overlap = Array.ofDim[Double](2, 32, 18)
    val synthAcc = Array.ofDim[Double](2, 512 + 32)
    var frames = 0
    def result(): Option[Decoded] =
      if (frames == 0 || sampleRate == 0) None
      else if (nCh == 1) Some(Decoded(sampleRate, chOut(0).toArray, 1))
      else {
        val n = math.min(chOut(0).length, chOut(1).length)
        val inter = new Array[Double](n * 2)
        var i = 0
        while (i < n) {
          inter(2 * i) = chOut(0)(i)
          inter(2 * i + 1) = chOut(1)(i)
          i += 1
        }
        Some(Decoded(sampleRate, inter, 2))
      }
    while (off < bytes.length - 4) {
      parseHeader(bytes, off) match {
        case None => off += 1
        case Some(h) =>
          if (sampleRate == 0) { sampleRate = h.sr; nCh = h.channels }
          if (h.sr != sampleRate || h.channels != nCh) return result()
          if (off + h.frameBytes > bytes.length) return result()
          val intensity = h.mode == 1 && (h.modeExt & 1) == 1
          // MPEG-1 long-block intensity decodes (is_ratio =
          // tan(is_pos·π/12), ISO 11172-3 2.4.3.4.9.3). LSF intensity
          // uses a DIFFERENT position semantic (13818-3's io^((p+1)/2)
          // pairing, whose illegal-position and band-pairing rules are
          // not shipped) — loud, the unshipped-table convention.
          if (intensity && h.version != 3)
            throw new UnsupportedOperationException(
              "Mp3Codec: MPEG-2 LSF intensity stereo is not " +
                "implemented — its position semantics (13818-3 " +
                "io-scaling) are not shipped in this offline build; " +
                "MPEG-1 intensity, LR, dual-channel and mid/side " +
                "joint stereo decode.")
          val ms = h.mode == 1 && (h.modeExt & 2) != 0
          val v1 = h.version == 3
          val ch = h.channels
          val sideBytes =
            if (v1) { if (ch == 1) 17 else 32 }
            else { if (ch == 1) 9 else 17 }
          val crcBytes = if (h.crc) 2 else 0
          val side = new BitReader(bytes.slice(off + 4 + crcBytes,
            off + 4 + crcBytes + sideBytes))
          val mdb = side.get(if (v1) 9 else 8)
          side.get(if (v1) { if (ch == 1) 5 else 3 }
            else { if (ch == 1) 1 else 2 }): Unit // private bits
          // scfsi: 4 bits per channel (MPEG-1 only), channel-major
          val scfsi =
            if (v1) Array.fill(ch, 4)(side.get1())
            else Array.ofDim[Int](ch, 0)
          // granule infos in spec order: granule-major, channel inner
          val gis = Array.fill(h.granules, ch)(readGranuleInfo(side, v1))
          // bit reservoir: this frame's main data follows the side info
          val frameMain = bytes.slice(off + 4 + crcBytes + sideBytes,
            off + h.frameBytes)
          if (mdb > reservoir.length) {
            // back-pointer outruns what we have buffered (stream start):
            // skip decode, still feed the reservoir
            reservoir ++= frameMain
          } else {
            val main = (reservoir.takeRight(mdb) ++ frameMain).toArray
            val r = new BitReader(main)
            val prevSf = Array.ofDim[Int](ch, 22) // scfsi carry gr 0 -> 1
            var g = 0
            while (g < h.granules) {
              val xrs = Array.ofDim[Array[Double]](ch)
              val sfs = Array.ofDim[Scalefactors](ch)
              var c = 0
              while (c < ch) {
                val gi = gis(g)(c)
                val start = r.pos
                // a part2_3_length pointing past the available main data
                // is a corrupt/truncated stream — fail before the bit
                // reader walks off the buffer
                require(start + gi.part23 <= main.length * 8,
                  s"Mp3Codec: granule main data truncated (needs " +
                    s"${gi.part23} bits at $start of ${main.length * 8})")
                val sf = readScalefactors(r, gi, v1, g, scfsi(c), prevSf(c))
                sfs(c) = sf
                val is = huffmanSpectrum(r, gi, h.sr, start)
                // skip any ancillary/stuffing up to part2_3_length
                r.pos = start + gi.part23
                xrs(c) =
                  if (gi.windowSwitching && gi.blockType == 2)
                    if (gi.mixed) requantizeMixed(is, gi, sf, h.sr)
                    else requantizeShort(is, gi, sf.short, h.sr)
                  else requantize(is, gi, sf.long, h.sr)
                c += 1
              }
              // stereo processing in the xr domain, after both channels
              // requantize and before the hybrid filterbank.
              // Intensity (mode_extension bit 0): active from the first
              // long-band boundary ABOVE the right channel's last
              // nonzero line (the spec's zero_part). Per band the right
              // channel's scalefactor slot is the position is_pos:
              // 7 is the illegal marker (band falls back to MS when
              // mode_extension selects both, else stays as decoded);
              // 0-6 split the left channel's lines by
              // is_ratio = tan(is_pos·π/12) — l = xr·r/(1+r),
              // r = xr·1/(1+r), with is_pos 6 the pure-left limit
              // (tan π/2 → l = xr, r = 0). Band 21 carries no
              // scalefactor slot and inherits band 20's position.
              // Mid/side (bit 1) covers the lines below the bound.
              val isq = 1.0 / math.sqrt(2.0)
              def msLines(from: Int, until: Int): Unit = {
                var i = from
                while (i < until) {
                  val m = xrs(0)(i); val s = xrs(1)(i)
                  xrs(0)(i) = (m + s) * isq
                  xrs(1)(i) = (m - s) * isq
                  i += 1
                }
              }
              def posFactors(pos: Int): (Double, Double) =
                if (pos == 6) (1.0, 0.0)
                else {
                  val ratio = math.tan(pos * math.Pi / 12.0)
                  (ratio / (1.0 + ratio), 1.0 / (1.0 + ratio))
                }
              // long-band intensity over lines [0, lineLimit) and bands
              // [bound, bandLimit): bound inferred from the right
              // channel's zero_part, positions in the long slots (top
              // band inherits slot 20), pos-7 bands ride MS when both
              // joint modes are on. Shared by pure-long granules
              // (bandLimit 22, all 576 lines) and the long HALF of
              // mixed granules (bandLimit 8, lines below the seam).
              def intensityLongRegion(bandLimit: Int, lineLimit: Int): Unit = {
                val sfbL = SfbLong(h.sr)
                var lastNon = -1
                var i = 0
                while (i < lineLimit) {
                  if (xrs(1)(i) != 0.0) lastNon = i
                  i += 1
                }
                var b0 = 0
                while (b0 < bandLimit && sfbL(b0) <= lastNon) b0 += 1
                if (lastNon == -1) b0 = 0
                if (ms) msLines(0, sfbL(b0))
                var b = b0
                while (b < bandLimit) {
                  val pos = sfs(1).long(math.min(b, 20))
                  if (pos <= 6) {
                    val (fL, fR) = posFactors(pos)
                    var j = sfbL(b)
                    while (j < sfbL(b + 1)) {
                      val v = xrs(0)(j)
                      xrs(0)(j) = v * fL
                      xrs(1)(j) = v * fR
                      j += 1
                    }
                  } else if (ms) msLines(sfbL(b), sfbL(b + 1))
                  b += 1
                }
              }
              // intensity splits the LEFT channel's lines in the
              // RIGHT channel's band domain — the two must share a
              // window layout or the reordered indices don't line up
              val shortG = Array.tabulate(math.min(ch, 2))(cc =>
                gis(g)(cc).windowSwitching && gis(g)(cc).blockType == 2)
              if (intensity && ch == 2 &&
                  (shortG(0) != shortG(1) ||
                    (shortG(1) && gis(g)(0).mixed != gis(g)(1).mixed)))
                throw new UnsupportedOperationException(
                  "Mp3Codec: intensity stereo with mismatched " +
                    "long/short/mixed window layouts across channels " +
                    "is not implemented in this offline build.")
              if (intensity && ch == 2 && shortG(1) && gis(g)(1).mixed) {
                // mixed-granule intensity: per-window short processing
                // above the seam; long processing below, active only
                // when the right channel's whole short half is zero
                // (transmission order puts every short line ABOVE every
                // long line, so the zero_part can only reach the long
                // half once the short half is silent)
                val sfbS = SfbShort(h.sr)
                def idx(fl: Int, w: Int) = (fl / 6) * 18 + w * 6 + fl % 6
                def msWin(w: Int, from: Int, until: Int): Unit = {
                  var f2 = from
                  while (f2 < until) {
                    val i2 = idx(f2, w)
                    val m = xrs(0)(i2); val s = xrs(1)(i2)
                    xrs(0)(i2) = (m + s) * isq
                    xrs(1)(i2) = (m - s) * isq
                    f2 += 1
                  }
                }
                var anyShort = false
                var w = 0
                while (w < 3) {
                  var lastFl = -1
                  var fl = 12 // the short half starts at band 3
                  while (fl < 192) {
                    if (xrs(1)(idx(fl, w)) != 0.0) lastFl = fl
                    fl += 1
                  }
                  if (lastFl >= 0) anyShort = true
                  var b0 = 3
                  while (b0 < 13 && sfbS(b0) <= lastFl) b0 += 1
                  if (lastFl == -1) b0 = 3
                  if (ms) msWin(w, 12, sfbS(b0))
                  var b = b0
                  while (b < 13) {
                    val pos = sfs(1).short(w)(math.min(b, 11))
                    if (pos <= 6) {
                      val (fL, fR) = posFactors(pos)
                      var f2 = sfbS(b)
                      while (f2 < sfbS(b + 1)) {
                        val i2 = idx(f2, w)
                        val v = xrs(0)(i2)
                        xrs(0)(i2) = v * fL
                        xrs(1)(i2) = v * fR
                        f2 += 1
                      }
                    } else if (ms) msWin(w, sfbS(b), sfbS(b + 1))
                    b += 1
                  }
                  w += 1
                }
                if (!anyShort) intensityLongRegion(8, 36)
                else if (ms) msLines(0, 36)
              } else if (intensity && ch == 2 && shortG(1)) {
                // short-granule intensity: the zero_part, the bound and
                // the positions are all PER WINDOW — is_pos lives in
                // the right channel's short scalefactor slots; band 12
                // carries no slot and inherits band 11. Reordered
                // domain: per-window line fl of window w sits at
                // (fl/6)*18 + w*6 + fl%6.
                val sfbS = SfbShort(h.sr)
                def idx(fl: Int, w: Int) = (fl / 6) * 18 + w * 6 + fl % 6
                var w = 0
                while (w < 3) {
                  var lastFl = -1
                  var fl = 0
                  while (fl < 192) {
                    if (xrs(1)(idx(fl, w)) != 0.0) lastFl = fl
                    fl += 1
                  }
                  var b0 = 0
                  while (b0 < 13 && sfbS(b0) <= lastFl) b0 += 1
                  if (lastFl == -1) b0 = 0
                  def msWin(from: Int, until: Int): Unit = {
                    var f2 = from
                    while (f2 < until) {
                      val i2 = idx(f2, w)
                      val m = xrs(0)(i2); val s = xrs(1)(i2)
                      xrs(0)(i2) = (m + s) * isq
                      xrs(1)(i2) = (m - s) * isq
                      f2 += 1
                    }
                  }
                  if (ms) msWin(0, sfbS(b0))
                  var b = b0
                  while (b < 13) {
                    val pos = sfs(1).short(w)(math.min(b, 11))
                    if (pos <= 6) {
                      val (fL, fR) = posFactors(pos)
                      var f2 = sfbS(b)
                      while (f2 < sfbS(b + 1)) {
                        val i2 = idx(f2, w)
                        val v = xrs(0)(i2)
                        xrs(0)(i2) = v * fL
                        xrs(1)(i2) = v * fR
                        f2 += 1
                      }
                    } else if (ms) msWin(sfbS(b), sfbS(b + 1))
                    b += 1
                  }
                  w += 1
                }
              } else if (intensity && ch == 2) {
                intensityLongRegion(SfbLong(h.sr).length - 1, 576)
              } else if (ms && ch == 2) msLines(0, 576)
              c = 0
              while (c < ch) {
                val gi = gis(g)(c)
                // alias reduction spans long-transformed subband
                // boundaries: all 31 for long types, only the 0/1
                // boundary for mixed (its two long subbands), none for
                // pure short
                if (gi.blockType != 2) aliasReduce(xrs(c))
                else if (gi.mixed) aliasReduce(xrs(c), 2)
                synthGranule(xrs(c), gi, overlap(c), synthAcc(c), chOut(c))
                c += 1
              }
              g += 1
            }
            reservoir ++= frameMain
          }
          if (reservoir.length > 2048)
            reservoir.remove(0, reservoir.length - 2048)
          frames += 1
          off += h.frameBytes
      }
    }
    result()
  }


  private def id3Skip(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      10 + size
    } else 0

  /** Decoded scalefactors: `long` is the 22-slot long-band array (band
    * 21 carries none); `short` is windows × 13 short bands (band 12
    * carries none) — only populated for short granules.
    */
  private final case class Scalefactors(long: Array[Int],
      short: Array[Array[Int]])

  /** Scalefactors for one granule. Long blocks: MPEG-1 slen1/slen2 with
    * the four scfsi groups, or the LSF 13818-3 slen decomposition.
    * MPEG-1 short blocks: 12 (band, window) values sfb-major — slen1
    * for bands 0-5, slen2 for 6-11 (scfsi never applies to short
    * granules; the encoder transmits all groups).
    */
  private def readScalefactors(r: BitReader, gi: GranuleInfo, v1: Boolean,
      granule: Int, scfsi: Array[Int], prev: Array[Int]): Scalefactors = {
    val sf = new Array[Int](22)
    if (gi.windowSwitching && gi.blockType == 2 && v1) {
      val s1 = Slen1(gi.sfCompress)
      val s2 = Slen2(gi.sfCompress)
      val short = Array.ofDim[Int](3, 13)
      if (gi.mixed) {
        // mixed layout: long bands 0-7 (slen1 — every MPEG-1 long table
        // has sfb(8) = 36, the two long subbands), then short bands
        // 3-5 (slen1) and 6-11 (slen2), sfb-major — 17 slen1 + 18 slen2
        var b = 0
        while (b < 8) {
          sf(b) = if (s1 == 0) 0 else r.get(s1)
          b += 1
        }
        b = 3
        while (b < 12) {
          val slen = if (b < 6) s1 else s2
          var w = 0
          while (w < 3) {
            short(w)(b) = if (slen == 0) 0 else r.get(slen)
            w += 1
          }
          b += 1
        }
        return Scalefactors(sf, short)
      }
      var b = 0
      while (b < 12) {
        val slen = if (b < 6) s1 else s2
        var w = 0
        while (w < 3) {
          short(w)(b) = if (slen == 0) 0 else r.get(slen)
          w += 1
        }
        b += 1
      }
      return Scalefactors(sf, short)
    }
    if (v1) {
      val s1 = Slen1(gi.sfCompress)
      val s2 = Slen2(gi.sfCompress)
      val groups = Array((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
      var gIdx = 0
      while (gIdx < 4) {
        val (from, to, slen) = groups(gIdx)
        val reuse = granule == 1 && scfsi(gIdx) == 1
        var b = from
        while (b < to) {
          sf(b) = if (reuse) prev(b) else if (slen == 0) 0 else r.get(slen)
          b += 1
        }
        gIdx += 1
      }
      System.arraycopy(sf, 0, prev, 0, 21)
    } else {
      // 13818-3 slen decomposition. The group PARTITIONS depend on the
      // block layout — long 21 values, short 36 (12 bands × 3 windows,
      // sfb-major), mixed 33 (6 long + short bands 3-11) — each row
      // sum-forced by its band count, the same family as the long row
      // the LSF long path has always used.
      val slens = lsfSlen(gi.sfCompress)
      val short2 = gi.windowSwitching && gi.blockType == 2
      val nsfb =
        if (short2 && gi.mixed) {
          if (gi.sfCompress < 400) Array(6, 9, 9, 9)
          else if (gi.sfCompress < 500) Array(6, 9, 12, 6)
          else Array(15, 18, 0, 0)
        } else if (short2) {
          if (gi.sfCompress < 400) Array(9, 9, 9, 9)
          else if (gi.sfCompress < 500) Array(9, 9, 12, 6)
          else Array(18, 18, 0, 0)
        } else {
          if (gi.sfCompress < 400) Array(6, 5, 5, 5)
          else if (gi.sfCompress < 500) Array(6, 5, 7, 3)
          else Array(11, 10, 0, 0)
        }
      if (short2) {
        val short = Array.ofDim[Int](3, 13)
        val longCnt = if (gi.mixed) 6 else 0
        var v = 0
        var gIdx = 0
        while (gIdx < 4) {
          var i = 0
          while (i < nsfb(gIdx)) {
            val value = if (slens(gIdx) == 0) 0 else r.get(slens(gIdx))
            if (v < longCnt) sf(v) = value
            else {
              val sv = v - longCnt
              val b = (if (gi.mixed) 3 else 0) + sv / 3
              short(sv % 3)(b) = value
            }
            v += 1
            i += 1
          }
          gIdx += 1
        }
        return Scalefactors(sf, short)
      }
      var b = 0
      var gIdx = 0
      while (gIdx < 4) {
        var i = 0
        while (i < nsfb(gIdx) && b < 21) {
          sf(b) = if (slens(gIdx) == 0) 0 else r.get(slens(gIdx))
          b += 1
          i += 1
        }
        gIdx += 1
      }
    }
    Scalefactors(sf, Array.empty)
  }

  private def lsfSlen(sfc: Int): Array[Int] =
    if (sfc < 400)
      Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3)
    else if (sfc < 500) {
      val c = sfc - 400
      Array((c >> 2) / 5, (c >> 2) % 5, c & 3, 0)
    } else {
      val c = sfc - 500
      Array(c / 3, c % 3, 0, 0)
    }

  /** Huffman-decode the 576 integer spectrum lines: big_values pairs
    * over the three table-selected regions, then count1 quadruples
    * until part2_3_length runs out, then rzero.
    */
  private def huffmanSpectrum(r: BitReader, gi: GranuleInfo, sr: Int,
      granuleStart: Int): Array[Int] = {
    val is = new Array[Int](576)
    val sfb = SfbLong(sr)
    val bigLines = math.min(gi.bigValues * 2, 576)
    val (r0End, r1End) =
      if (gi.windowSwitching) {
        // spec-implied regions: short non-mixed splits at line 36
        // (3 windows x short sfb 3 = 3 x 12); long switching types
        // (start/stop, and the mixed long half) split at long sfb 8
        if (gi.blockType == 2 && !gi.mixed) (36, 576)
        else (sfb(8), 576)
      }
      else (sfb(math.min(gi.region0 + 1, 22)),
        sfb(math.min(gi.region0 + 1 + gi.region1 + 1, 22)))
    var i = 0
    while (i < bigLines) {
      val tid =
        if (i < r0End) gi.tableSelect(0)
        else if (i < r1End) gi.tableSelect(1)
        else gi.tableSelect(2)
      if (tid == 0) { is(i) = 0; is(i + 1) = 0 }
      else {
        val t = bigTables.getOrElse(tid, throw new UnsupportedOperationException(
          s"Mp3Codec: Huffman table $tid selected by the stream is not in " +
            "the shipped subset (0-3, 5, 6) — its ISO 11172-3 Table B.7 " +
            "constants are not available in this offline build. The " +
            "escape/linbits machinery is present; adding the table is " +
            "data-only."))
        val sym = huffDecode(r, t)
        var x = sym / t.ylen
        var y = sym % t.ylen
        if (x == 15 && t.linbits > 0) x += r.get(t.linbits)
        if (x > 0 && r.get1() == 1) x = -x
        if (y == 15 && t.linbits > 0) y += r.get(t.linbits)
        if (y > 0 && r.get1() == 1) y = -y
        is(i) = x
        is(i + 1) = y
      }
      i += 2
    }
    // count1: quads while bits remain within part2_3_length
    val limit = granuleStart + gi.part23
    val quad = if (gi.count1Table == 1) quadB else quadA
    while (r.pos < limit && i + 4 <= 576) {
      val sym = huffDecode(r, quad)
      var j = 0
      while (j < 4) {
        var v = (sym >> (3 - j)) & 1
        if (v == 1 && r.get1() == 1) v = -1
        is(i + j) = v
        j += 1
      }
      if (r.pos > limit) { // straddling quad: spec-dropped
        var z = 0
        while (z < 4) { is(i + z) = 0; z += 1 }
      }
      i += 4
    }
    is
  }

  private def requantize(is: Array[Int], gi: GranuleInfo,
      sf: Array[Int], sr: Int): Array[Double] = {
    val xr = new Array[Double](576)
    val gain = math.pow(2.0, (gi.globalGain - 210) / 4.0)
    val mult = 0.5 * (1 + gi.sfScale)
    // per long band factor (short granules take requantizeShort)
    var band = 0
    val sfb = SfbLong(sr)
    var i = 0
    while (i < 576) {
      if (band < 21 && i >= sfb(band + 1)) band += 1
      val v = is(i)
      if (v != 0) {
        val factor = math.pow(2.0,
          -mult * (sf(math.min(band, 21)) + gi.preflag * Pretab(math.min(band, 21))))
        val mag = math.pow(math.abs(v).toDouble, 4.0 / 3.0) * gain * factor
        xr(i) = if (v < 0) -mag else mag
      }
      i += 1
    }
    xr
  }

  /** Short-block requantizer + the spec's frequency-line REORDER in one
    * pass. Bitstream order is (short band, window, line-in-band); the
    * hybrid filterbank consumes window-major lines within each subband —
    * `xr(sb*18 + window*6 + k)` feeding the three 6-point IMDCTs — so
    * each decoded line at per-window frequency `fl` of window `w` lands
    * at `(fl/6)*18 + w*6 + fl%6`. Gain per (band, window):
    * `2^((global_gain - 210 - 8*subblock_gain(w))/4)` times the
    * scalefactor step `2^(-mult*sf(w)(band))`; short bands carry no
    * preemphasis.
    */
  private def requantizeShort(is: Array[Int], gi: GranuleInfo,
      sfShort: Array[Array[Int]], sr: Int): Array[Double] = {
    val xr = new Array[Double](576)
    requantizeShortRegion(is, gi, sfShort, sr, 0, 0, xr)
    xr
  }

  /** The short-coded region's requantize + frequency-line REORDER —
    * shared by pure-short granules (bands 0-12 from bitstream line 0)
    * and the short half of mixed granules (bands 3-12 from line 36).
    * Bitstream order is (band, window, line-in-band); the hybrid
    * filterbank consumes window-major lines within each subband, so the
    * line at per-window frequency `fl` of window `w` lands at
    * `(fl/6)*18 + w*6 + fl%6`. Gain per (band, window):
    * `2^((global_gain - 210 - 8*subblock_gain(w))/4)` times the
    * scalefactor step; short bands carry no preemphasis and band 12 no
    * scalefactor.
    */
  private def requantizeShortRegion(is: Array[Int], gi: GranuleInfo,
      sfShort: Array[Array[Int]], sr: Int, startBand: Int, srcStart: Int,
      xr: Array[Double]): Unit = {
    val mult = 0.5 * (1 + gi.sfScale)
    val sfb = SfbShort(sr)
    val winGain = Array.tabulate(3)(w =>
      math.pow(2.0, (gi.globalGain - 210 - 8 * gi.subblockGain(w)) / 4.0))
    var src = srcStart
    var b = startBand
    while (b < 13) {
      var w = 0
      while (w < 3) {
        val factor = winGain(w) * math.pow(2.0,
          -mult * (if (b < 12) sfShort(w)(b) else 0))
        var fl = sfb(b)
        while (fl < sfb(b + 1)) {
          val v = if (src < 576) is(src) else 0
          if (v != 0) {
            val mag = math.pow(math.abs(v).toDouble, 4.0 / 3.0) * factor
            xr((fl / 6) * 18 + w * 6 + fl % 6) = if (v < 0) -mag else mag
          }
          src += 1
          fl += 1
        }
        w += 1
      }
      b += 1
    }
  }

  /** Mixed-block requantizer: lines 0-35 (the two long subbands) take
    * the long rules over long bands — 0-7 in MPEG-1 (sfb(8) = 36) or
    * 0-5 in LSF (sfb(6) = 36) — scalefactor + preflag preemphasis,
    * plain global_gain; lines 36+ take the short rules (per-(band,
    * window) gain with subblock_gain, the frequency-line reorder) over
    * short bands 3-12, whose per-window lines start at sfbS(3) = 12 so
    * every reordered target index is >= 36 — the two halves never
    * collide.
    */
  private def requantizeMixed(is: Array[Int], gi: GranuleInfo,
      sf: Scalefactors, sr: Int): Array[Double] = {
    val xr = new Array[Double](576)
    val mult = 0.5 * (1 + gi.sfScale)
    val gain = math.pow(2.0, (gi.globalGain - 210) / 4.0)
    val sfbL = SfbLong(sr)
    val nLong = if (SrV1.contains(sr)) 8 else 6
    var band = 0
    var i = 0
    while (i < 36) {
      if (band < nLong - 1 && i >= sfbL(band + 1)) band += 1
      val v = is(i)
      if (v != 0) {
        val factor = math.pow(2.0,
          -mult * (sf.long(band) + gi.preflag * Pretab(band)))
        val mag = math.pow(math.abs(v).toDouble, 4.0 / 3.0) * gain * factor
        xr(i) = if (v < 0) -mag else mag
      }
      i += 1
    }
    requantizeShortRegion(is, gi, sf.short, sr, 3, 36, xr)
    xr
  }

  private def aliasReduce(xr: Array[Double], sbLimit: Int = 32): Unit = {
    var sb = 1
    while (sb < sbLimit) {
      var i = 0
      while (i < 8) {
        val a = xr(18 * sb - 1 - i)
        val b = xr(18 * sb + i)
        xr(18 * sb - 1 - i) = a * Cs(i) - b * Ca(i)
        xr(18 * sb + i) = b * Cs(i) + a * Ca(i)
        i += 1
      }
      sb += 1
    }
  }

  /** IMDCT (+ window + overlap-add + frequency inversion) per subband,
    * then 18 polyphase synthesis steps emitting 576 PCM samples.
    */
  private def synthGranule(xr: Array[Double], gi: GranuleInfo,
      overlap: Array[Array[Double]], synthAcc: Array[Double],
      out: ArrayBuffer[Double]): Unit = {
    val ss = Array.ofDim[Double](18, 32) // [slot][subband]
    val w = windowFor(gi.blockType)
    var sb = 0
    while (sb < 32) {
      val rawOut = new Array[Double](36)
      // mixed blocks: the two lowest subbands take the 36-point long
      // transform under the NORMAL (type 0) window; the rest short
      if (gi.blockType == 2 && gi.mixed && sb < 2) {
        var i = 0
        while (i < 36) {
          var s = 0.0
          var k = 0
          while (k < 18) {
            s += xr(sb * 18 + k) * Imdct36(i)(k)
            k += 1
          }
          rawOut(i) = s * MdctScale36 * WinLong(i)
          i += 1
        }
      } else if (gi.blockType == 2) {
        // three short IMDCTs laid into the 36-slot frame (6..30): the
        // windows tile at 6-sample offsets so adjacent windows TDAC
        // within the granule and the outer halves TDAC with the
        // neighboring granules' stored overlap
        var win = 0
        while (win < 3) {
          var i = 0
          while (i < 12) {
            var s = 0.0
            var k = 0
            while (k < 6) {
              s += xr(sb * 18 + win * 6 + k) * Imdct12(i)(k)
              k += 1
            }
            rawOut(6 + win * 6 + i) += s * MdctScale12 * WinShort(i)
            i += 1
          }
          win += 1
        }
      } else {
        var i = 0
        while (i < 36) {
          var s = 0.0
          var k = 0
          while (k < 18) {
            s += xr(sb * 18 + k) * Imdct36(i)(k)
            k += 1
          }
          rawOut(i) = s * MdctScale36 * w(i)
          i += 1
        }
      }
      // overlap-add: first 18 add the stored tail, last 18 stored
      var i = 0
      while (i < 18) {
        var v = rawOut(i) + overlap(sb)(i)
        // frequency inversion: odd subbands negate odd time slots
        if ((sb & 1) == 1 && (i & 1) == 1) v = -v
        ss(i)(sb) = v
        overlap(sb)(i) = rawOut(18 + i)
        i += 1
      }
      sb += 1
    }
    // polyphase synthesis, 18 slots x 32 samples
    var slot = 0
    while (slot < 18) {
      synthesisStep(ss(slot), synthAcc, SynthGain)
      var j = 0
      // int16-scale doubles, the FlacCodec/PCM decoder convention
      while (j < 32) { out += synthAcc(j) * 32768.0; j += 1 }
      System.arraycopy(synthAcc, 32, synthAcc, 0, 512)
      java.util.Arrays.fill(synthAcc, 512, 512 + 32, 0.0)
      slot += 1
    }
  }

  // ------------------------------------------------------------------
  // Encoder (mono, MPEG-1, long blocks, verified-table subset)
  // ------------------------------------------------------------------

  /** Encode mono PCM (int samples, nominally 16-bit range) as Layer
    * III — MPEG-1 at `sampleRate` ∈ {44100, 48000, 32000} (two-granule
    * 1152-sample frames) or MPEG-2 LSF at {22050, 24000, 16000}
    * (one-granule 576-sample frames, 9-byte side info, scalefac_compress
    * 399 → the LSF slen decomposition) — at `bitrateKbps` (any Layer III
    * rate of the chosen version; 0 picks the version default, 320 for
    * MPEG-1 / 96 for LSF), per-band scalefactors, `main_data_begin = 0`
    * (no reservoir use — legal, each frame self-contained).
    *
    * `blockMode` (both versions): "long" keeps every granule
    * block_type 0; "short" forces every granule to short blocks (three
    * 12-point MDCTs per subband, per-(band, window) scalefactors) — the
    * deterministic round-trip prover; "mixed" forces short blocks WITH
    * mixed_block_flag (the two lowest subbands long-transformed, long
    * bands 0-7 MPEG-1 / 0-5 LSF + short 3-12); "auto" runs a transient
    * detector (granule PCM peak jumping
    * past 4× its predecessor) and emits the spec's window sequence:
    * long → START(1) → SHORT(2) → STOP(3) → long, bridging lone long
    * granules between shorts.
    *
    * Quantization is psychoacoustics-free: per granule the 4/3-power
    * quantizer's global_gain starts at the finest step that keeps every
    * line inside the verified Huffman subset's |ix| <= 3 alphabet and
    * coarsens by rate-loop until the granule fits the frame — at low
    * bitrates on dense spectra the loop zeroes the quietest lines first
    * (they fall below the step), the textbook rate-distortion behavior.
    * When global_gain reaches its 8-bit ceiling and the granule STILL
    * does not fit (dense loud spectra at the lowest rates — the
    * scalefactor boost re-amplifies capped bands no matter how coarse
    * the step), the loop zeroes whole scalefactor bands quietest-first
    * until the bit budget is met, so every legal rate/bitrate
    * combination encodes instead of overflowing. Input pads to a
    * frame-sample multiple.
    */
  def encode(samples: Array[Int], sampleRate: Int,
      bitrateKbps: Int = 0, blockMode: String = "long"): Array[Byte] =
    encodeFrames(Array(samples), sampleRate, bitrateKbps, blockMode,
      mode = 3, modeExt = 0)

  /** Stereo encode — the two-channel twin of [[encode]] (same rates,
    * bitrates and block modes; the same frame slot count now splits
    * across both channels). `msStereo = false` codes L and R
    * independently as mode 0 (stereo); `msStereo = true` codes
    * mid/side joint stereo (mode 1, mode_extension 2): the channels
    * are PCM-matrixed `m = (l+r)/√2`, `s = (l−r)/√2` — the analysis
    * chain is linear, so this equals the spec's xr-domain matrix that
    * [[decode]] inverts. Decoded output is L/R interleaved.
    */
  def encodeStereo(left: Array[Int], right: Array[Int], sampleRate: Int,
      bitrateKbps: Int = 0, blockMode: String = "long",
      msStereo: Boolean = false): Array[Byte] = {
    require(left.length == right.length,
      s"stereo channels must match: ${left.length} vs ${right.length}")
    if (msStereo) {
      val isq = 1.0 / math.sqrt(2.0)
      val m = Array.tabulate(left.length)(i =>
        math.round((left(i) + right(i)) * isq).toInt)
      val s = Array.tabulate(left.length)(i =>
        math.round((left(i) - right(i)) * isq).toInt)
      encodeFrames(Array(m, s), sampleRate, bitrateKbps, blockMode,
        mode = 1, modeExt = 2)
    } else
      encodeFrames(Array(left, right), sampleRate, bitrateKbps, blockMode,
        mode = 0, modeExt = 0)
  }

  /** Intensity joint stereo encode (mode 1, mode_extension 1 —
    * MPEG-1): bands below `intensityBand` (a long
    * scalefactor-band index, 1-20 — the top band carries no slot and
    * inherits its predecessor's position) code L and R independently; bands at
    * and above it carry the coherent sum L+R in the left channel with a
    * per-band direction is_pos ∈ 0-6 in the right channel's scalefactor
    * slots — [[decode]] splits them back by
    * is_ratio = tan(is_pos·π/12). Lossy by design: per band only one
    * direction survives, so exact round trips need per-band-constant
    * in-phase L/R ratios (ideally at tan(k·π/12) angles); arbitrary
    * signals keep the summed magnitude and the quantized direction —
    * the bit-saving trade intensity stereo exists for.
    *
    * `msBelow = true` codes mode_extension 3: mid/side joint stereo
    * below the intensity region, intensity above. The intensity region
    * must be a suffix of the spectrum (the decoder infers it from the
    * right channel's zero_part), so anti-phase bands — whose coherent
    * sum would cancel — raise the effective bound: they and everything
    * under them ride the mid/side matrix, marked with the illegal
    * position 7.
    */
  def encodeStereoIntensity(left: Array[Int], right: Array[Int],
      sampleRate: Int, bitrateKbps: Int = 0,
      intensityBand: Int = 8, blockMode: String = "long",
      msBelow: Boolean = false): Array[Byte] = {
    require(left.length == right.length,
      s"stereo channels must match: ${left.length} vs ${right.length}")
    require(Set("long", "short", "auto", "mixed").contains(blockMode),
      s"blockMode must be long/short/auto/mixed, got $blockMode; with " +
        "\"short\" — or on the short granules an \"auto\" transient " +
        "picks — the bound is read as a SHORT band index (long bounds " +
        "above 11 clamp to 11) and the positions are per (band, " +
        "window); with \"mixed\" the bound is a LONG band 1-7 below " +
        "the seam and the whole short half (bands 3-12, per window) " +
        "is in the region — under msBelow any short MS fallback " +
        "forces the entire long half onto mid/side (the decoder can " +
        "only reach a long bound once the right short half is silent)")
    encodeFrames(Array(left, right), sampleRate, bitrateKbps, blockMode,
      mode = 1, modeExt = if (msBelow) 3 else 1,
      intensityBand = intensityBand)
  }

  // ---- encoder intensity transforms ---------------------------------
  //
  // Extracted from the frame loop as object-level methods for a JVM
  // reason, not only style: the frame loop is one enormous method, and
  // HotSpot refuses to JIT-compile methods past the 8K-bytecode
  // DontCompileHugeMethods limit — round 14's inline mode_extension-3
  // additions pushed it over and the WHOLE encode path (mono included)
  // fell back to the interpreter, doubling every MP3 bench row. Keep
  // new per-granule machinery out of the frame loop's own body.

  /** Orthonormal mid/side matrix gain, 1/sqrt(2). */
  private val Msq = 1.0 / math.sqrt(2.0)

  /** is_pos of an (energy-left, energy-right) pair: round(atan2·12/π)
    * clamped to 0-6, with a silent right meaning pure-left (6).
    */
  private def intensityPosOf(el: Double, er: Double): Int =
    if (er <= 0.0) 6
    else math.max(0, math.min(6, math.round(
      math.atan2(math.sqrt(el), math.sqrt(er)) * 12.0 / math.Pi).toInt))

  /** Long-block intensity transform: bands [ib, nBands) sum into the
    * left channel, right zeroed, positions returned (22 slots; band 21
    * inherits slot 20, so slot 20 carries the JOINT direction of 20+21).
    * Under mode_extension 3 the suffix rule raises the effective bound
    * past anti-phase bands (their sum would cancel; they ride pos-7
    * mid/side) and EVERYTHING below the effective bound is matrixed.
    * Mutates `xl`/`xrr` in place.
    */
  private def intensityTransformLong(xl: Array[Double], xrr: Array[Double],
      sfb: Array[Int], ib: Int, msIntensity: Boolean): Array[Int] = {
    val pos = new Array[Int](22)
    val nBands = sfb.length - 1 // 22 on every MPEG-1/LSF rate
    var effStart = ib
    if (msIntensity) {
      var b = ib
      while (b < nBands) {
        var cross = 0.0
        var i = sfb(b)
        while (i < sfb(b + 1)) { cross += xl(i) * xrr(i); i += 1 }
        if (cross < 0) effStart = b + 1
        b += 1
      }
      // the top band has no slot of its own (the decoder reads slot 20
      // for it) — if the suffix rule leaves ONLY that band, a position
      // cannot be transmitted, so matrix it too (no intensity region)
      if (effStart == 21) effStart = 22
      var i = 0
      while (i < sfb(effStart)) {
        val l = xl(i); val r = xrr(i)
        xl(i) = (l + r) * Msq; xrr(i) = (l - r) * Msq
        i += 1
      }
      var b2 = ib
      while (b2 < effStart) { pos(b2) = 7; b2 += 1 }
    }
    val elB = new Array[Double](22)
    val erB = new Array[Double](22)
    var b = effStart
    while (b < nBands) {
      var i = sfb(b)
      while (i < sfb(b + 1)) {
        elB(b) += xl(i) * xl(i); erB(b) += xrr(i) * xrr(i)
        xl(i) += xrr(i); xrr(i) = 0.0
        i += 1
      }
      b += 1
    }
    b = effStart
    while (b < nBands) {
      pos(b) =
        if (b >= 20) intensityPosOf(elB(20) + elB(21), erB(20) + erB(21))
        else intensityPosOf(elB(b), erB(b))
      b += 1
    }
    pos
  }

  /** Short-window intensity transform over bands [startBand, 13) per
    * window, positions per (window, band) with band 12 folded into
    * slot 11. `startBand` is both the bound and the band floor (the
    * clamped bound for pure short granules; 3 for the mixed short
    * half, whose whole range is in the region). Under mode_extension 3
    * the per-window suffix rule applies, with the MS matrix covering
    * window lines [msFrom, effStart) — msFrom 0 for pure short, 12 for
    * the mixed short half (its lines below 12 belong to the long
    * half). Returns (positions, any window took an MS fallback).
    * Mutates `xl`/`xrr` in place (reordered-domain indices).
    */
  private def intensityTransformShort(xl: Array[Double], xrr: Array[Double],
      sfbS: Array[Int], startBand: Int, msFrom: Int,
      msIntensity: Boolean): (Array[Array[Int]], Boolean) = {
    val pos = Array.ofDim[Int](3, 13)
    var hasMs = false
    var w = 0
    while (w < 3) {
      var effStart = startBand
      if (msIntensity) {
        var b = startBand
        while (b < 13) {
          var cross = 0.0
          var fl = sfbS(b)
          while (fl < sfbS(b + 1)) {
            val i = (fl / 6) * 18 + w * 6 + fl % 6
            cross += xl(i) * xrr(i)
            fl += 1
          }
          if (cross < 0) effStart = b + 1
          b += 1
        }
        // band 12 inherits slot 11 — a region of only band 12 cannot
        // carry its own position
        if (effStart == 12) effStart = 13
        var fl = msFrom
        while (fl < sfbS(effStart)) {
          val i = (fl / 6) * 18 + w * 6 + fl % 6
          val l = xl(i); val r = xrr(i)
          xl(i) = (l + r) * Msq; xrr(i) = (l - r) * Msq
          fl += 1
        }
        var b2 = startBand
        while (b2 < effStart) { pos(w)(b2) = 7; b2 += 1 }
        if (effStart > startBand) hasMs = true
      }
      val elB = new Array[Double](13)
      val erB = new Array[Double](13)
      var b = effStart
      while (b < 13) {
        var fl = sfbS(b)
        while (fl < sfbS(b + 1)) {
          val i = (fl / 6) * 18 + w * 6 + fl % 6
          elB(b) += xl(i) * xl(i); erB(b) += xrr(i) * xrr(i)
          xl(i) += xrr(i); xrr(i) = 0.0
          fl += 1
        }
        b += 1
      }
      b = effStart
      while (b < 13) {
        pos(w)(b) =
          if (b >= 11) // band 12 inherits slot 11 at decode
            intensityPosOf(elB(11) + elB(12), erB(11) + erB(12))
          else intensityPosOf(elB(b), erB(b))
        b += 1
      }
      w += 1
    }
    (pos, hasMs)
  }

  /** The LONG HALF of a mixed granule's intensity transform: bands
    * [ib, 8) over natural lines below the seam. When the short half
    * took ANY MS fallback (`shortHasMs`), the decoder can never reach
    * a long bound — transmission order puts every short line above
    * every long line — so the whole half is matrixed under pos-7
    * markers. Mutates `xl`/`xrr` in place.
    */
  private def intensityTransformMixedLong(xl: Array[Double],
      xrr: Array[Double], sfb: Array[Int], ib: Int,
      msIntensity: Boolean, shortHasMs: Boolean): Array[Int] = {
    val pos = new Array[Int](8)
    def matrixLong(until: Int): Unit = {
      var i = 0
      while (i < until) {
        val l = xl(i); val r = xrr(i)
        xl(i) = (l + r) * Msq; xrr(i) = (l - r) * Msq
        i += 1
      }
    }
    if (msIntensity && shortHasMs) {
      matrixLong(36)
      var b = ib
      while (b < 8) { pos(b) = 7; b += 1 }
    } else {
      var effStart = ib
      if (msIntensity) {
        var b = ib
        while (b < 8) {
          var cross = 0.0
          var i = sfb(b)
          while (i < sfb(b + 1)) { cross += xl(i) * xrr(i); i += 1 }
          if (cross < 0) effStart = b + 1
          b += 1
        }
        matrixLong(sfb(effStart))
        var b2 = ib
        while (b2 < effStart) { pos(b2) = 7; b2 += 1 }
      }
      var b = effStart
      while (b < 8) {
        var el = 0.0; var er = 0.0
        var i = sfb(b)
        while (i < sfb(b + 1)) {
          el += xl(i) * xl(i); er += xrr(i) * xrr(i)
          xl(i) += xrr(i); xrr(i) = 0.0
          i += 1
        }
        pos(b) = intensityPosOf(el, er)
        b += 1
      }
    }
    pos
  }

  private def encodeFrames(chans: Array[Array[Int]], sampleRate: Int,
      bitrateKbps: Int, blockMode: String, mode: Int,
      modeExt: Int, intensityBand: Int = -1): Array[Byte] = {
    val nch = chans.length
    require(intensityBand < 0 ||
      (nch == 2 && SrV1.contains(sampleRate) && intensityBand >= 1 &&
        intensityBand <= (blockMode match {
          case "short" => 11
          case "mixed" => 7
          case _ => 20
        })),
      "intensity coding needs two channels, an MPEG-1 rate, and a " +
        "bound band in 1-20 (long), 1-11 (short) or 1-7 (mixed — a " +
        "LONG band below the seam; the short half is always in the " +
        "region) — the top band carries no scalefactor slot of its " +
        "own (it inherits its predecessor's position), so it cannot " +
        s"start the region; got $blockMode band $intensityBand")
    val v1 = SrV1.contains(sampleRate)
    require(v1 || SrV2.contains(sampleRate),
      s"encode supports MPEG-1 rates ${SrV1.mkString("/")} and MPEG-2 " +
        s"LSF rates ${SrV2.mkString("/")}, got $sampleRate")
    require(Set("long", "short", "auto", "mixed").contains(blockMode),
      s"blockMode must be long/short/auto/mixed, got $blockMode")
    val mixedMode = blockMode == "mixed"
    // long bands under the mixed layout: MPEG-1 sfb(8) = 36 = two
    // subbands; every LSF long table reaches 36 at sfb(6)
    val nLongMixed = if (v1) 8 else 6
    val brTable = if (v1) BitrateV1L3 else BitrateV2L3
    val kbps = if (bitrateKbps != 0) bitrateKbps else if (v1) 320 else 96
    val bri = brTable.indexOf(kbps)
    require(bri > 0, s"bitrateKbps must be one of " +
      s"${brTable.drop(1).mkString("/")} at $sampleRate Hz, got $kbps")
    val sri = (if (v1) SrV1 else SrV2).indexOf(sampleRate)
    val slots = (if (v1) 144 else 72) * (brTable(bri) * 1000) / sampleRate
    val granules = if (v1) 2 else 1 // LSF frames carry ONE granule
    val frameSamples = granules * 576
    val sideBytes =
      if (v1) { if (nch == 1) 17 else 32 } else { if (nch == 1) 9 else 17 }
    val nFrames = math.max(1,
      (chans(0).length + frameSamples - 1) / frameSamples)
    val padded = chans.map(c =>
      java.util.Arrays.copyOf(c, nFrames * frameSamples))
    val sfb = SfbLong(sampleRate)
    val sfbS = SfbShort(sampleRate)
    // per-(granule, channel) main-data bit budget — fixed by the frame
    // geometry, so computable up front
    val budgetPerGranule = (slots - 4 - sideBytes) * 8 / (granules * nch)
    // at the floor bitrates (stereo especially) the budget can be
    // SMALLER than the scalefac_compress-15/399 part2 cost — fall back
    // to scalefac_compress 0 (slen 0 everywhere, zero scalefactor
    // bits, no per-band boost): every legal rate/bitrate/channel
    // combination then encodes, trading precision for fit
    val maxPart2 = blockMode match {
      case "long" => 74
      case "mixed" => if (v1) 122 else 114
      case _ => 126 // short, and the short granules auto may force
    }
    val zeroBoost = budgetPerGranule < maxPart2
    require(!zeroBoost || intensityBand < 0,
      "intensity coding needs scalefactor slots for its positions, " +
        s"but $nch-channel ${brTable(bri)} kbps at $sampleRate Hz " +
        s"leaves only $budgetPerGranule bits per granule — below the " +
        s"$maxPart2-bit scalefactor layout; use a higher bitrate")
    // LSF scalefac_compress 399 decomposes to slens (4,4,3,3) over the
    // (6,5,5,5) band groups — byte-for-byte the same 11x4 + 10x3
    // scalefactor layout the MPEG-1 side uses (scalefac_compress 15)
    val sfCompress =
      if (zeroBoost) 0 else if (v1) 15 else 399
    // quantizer headroom: the finest step that keeps the loudest line
    // inside the verified |ix| <= 3 alphabet
    val headroom = math.pow(3.49, 4.0 / 3.0)

    // shared short-region scalefactor boost + quantize — the encoder
    // mirror of requantizeShortRegion (whose scaladoc is the reorder
    // formula's ground truth): bands [startBand, 13) straight into
    // BITSTREAM order from `srcStart`, rate-loop cells via `cellAt`
    def quantizeShortRegion(xr: Array[Double], sfS: Array[Array[Int]],
        cellMax: Array[Double], zeroed: Array[Boolean], step: Double,
        ix: Array[Int], startBand: Int, srcStart: Int,
        cellAt: (Int, Int) => Int): Unit = {
      var b = startBand
      while (b < 12) {
        val cap = if (zeroBoost) 0 else if (b < 6) 15 else 7
        var w = 0
        while (w < 3) {
          val m = cellMax(cellAt(b, w))
          sfS(w)(b) =
            if (m <= 0 || zeroed(cellAt(b, w))) 0
            else math.max(0, math.min(cap, math.floor(
              math.log(step * headroom / m) / math.log(2.0)).toInt))
          w += 1
        }
        b += 1
      }
      var src = srcStart
      b = startBand
      while (b < 13) {
        var w = 0
        while (w < 3) {
          val dead = zeroed(cellAt(b, w))
          val boost = math.pow(2.0, if (b < 12) sfS(w)(b) else 0)
          var fl = sfbS(b)
          while (fl < sfbS(b + 1)) {
            val v = xr((fl / 6) * 18 + w * 6 + fl % 6)
            if (v != 0.0 && !dead) {
              val q = math.min(3, math.round(
                math.pow(math.abs(v) * boost / step, 0.75)).toInt)
              ix(src) = if (v < 0) -q else q
            }
            src += 1
            fl += 1
          }
          w += 1
        }
        b += 1
      }
    }

    // per-granule block types for the whole stream, SHARED across
    // channels (peak over both — per-channel switching is legal but a
    // shared sequence keeps the matrixed mid/side pair aligned); the
    // auto detector needs one-granule lookahead to place START windows
    val totalGranules = nFrames * granules
    val blockTypes: Array[Int] = blockMode match {
      case "short" | "mixed" => Array.fill(totalGranules)(2)
      case "long" => new Array[Int](totalGranules)
      case _ =>
        val peaks = Array.tabulate(totalGranules) { g =>
          var m = 0
          var c = 0
          while (c < nch) {
            var i = g * 576
            while (i < (g + 1) * 576) {
              val a = math.abs(padded(c)(i)); if (a > m) m = a; i += 1
            }
            c += 1
          }
          m
        }
        val bt = new Array[Int](totalGranules)
        var g = 1 // stream start has no reference level — never an attack
        while (g < totalGranules) {
          if (peaks(g) > 1000 && peaks(g) > 4L * peaks(g - 1)) bt(g) = 2
          g += 1
        }
        // bridge a lone long granule between shorts (no legal window
        // can both stop and start in one granule)
        g = 1
        while (g < totalGranules - 1) {
          if (bt(g) == 0 && bt(g - 1) == 2 && bt(g + 1) == 2) bt(g) = 2
          g += 1
        }
        g = 0
        while (g < totalGranules) {
          if (bt(g) == 0) {
            if (g + 1 < totalGranules && bt(g + 1) == 2) bt(g) = 1
            else if (g > 0 && bt(g - 1) == 2) bt(g) = 3
          }
          g += 1
        }
        bt
    }

    // analysis filterbank + MDCT overlap state, per channel
    val x = Array.ofDim[Double](nch, 512) // newest first
    val mdctPrev = Array.ofDim[Double](nch, 32, 18)
    val outBytes = ArrayBuffer[Byte]()

    var f = 0
    while (f < nFrames) {
      val granuleGain = Array.ofDim[Int](granules, nch)
      val granuleBits = Array.ofDim[BitWriter](granules, nch)
      val granuleMeta = Array.ofDim[(Int, Int)](granules, nch)
      val granuleSf = Array.ofDim[Array[Int]](granules, nch)
      val granuleSfS = Array.ofDim[Array[Array[Int]]](granules, nch)
      val granuleBt = new Array[Int](granules)
      var g = 0
      while (g < granules) {
        val bt = blockTypes(f * granules + g)
        granuleBt(g) = bt
        val granXr = Array.ofDim[Array[Double]](nch)
        val granIx = Array.ofDim[Array[Int]](nch)
        var c = 0
        while (c < nch) {
          // 18 analysis slots -> 18x32 subband samples
          val sbSamples = Array.ofDim[Double](32, 18)
          var slot = 0
          while (slot < 18) {
            System.arraycopy(x(c), 0, x(c), 32, 512 - 32)
            var j = 0
            while (j < 32) {
              // spec PCM convention: fractional full scale in [-1, 1) —
              // raw int16-scale input would push global_gain past its
              // 8-bit ceiling and saturate the quantizer
              x(c)(31 - j) = padded(c)(
                f * frameSamples + g * 576 + slot * 32 + j) / 32768.0
              j += 1
            }
            val sRow = new Array[Double](32)
            analysisStep(x(c), sRow)
            var k = 0
            while (k < 32) {
              // frequency inversion must match the decoder's
              sbSamples(k)(slot) =
                if ((k & 1) == 1 && (slot & 1) == 1) -sRow(k) else sRow(k)
              k += 1
            }
            slot += 1
          }
          // MDCT per subband, previous-granule overlap: long/start/stop
          // take the 36-point transform under their block window; short
          // takes three 12-point transforms tiled at offsets 6/12/18 —
          // the inverse tiling synthGranule reconstructs
          val xr = new Array[Double](576)
          var sb = 0
          while (sb < 32) {
            val buf = new Array[Double](36) // prev 18 ++ cur 18, unwindowed
            var i = 0
            while (i < 18) {
              buf(i) = mdctPrev(c)(sb)(i)
              buf(18 + i) = sbSamples(sb)(i)
              mdctPrev(c)(sb)(i) = sbSamples(sb)(i)
              i += 1
            }
            if (bt == 2 && !(mixedMode && sb < 2)) {
              var win = 0
              while (win < 3) {
                var k = 0
                while (k < 6) {
                  var s = 0.0
                  var i2 = 0
                  while (i2 < 12) {
                    s += buf(6 + win * 6 + i2) * WinShort(i2) * Imdct12(i2)(k)
                    i2 += 1
                  }
                  xr(sb * 18 + win * 6 + k) = s
                  k += 1
                }
                win += 1
              }
            } else {
              // mixed blocks transform the two lowest subbands with
              // the NORMAL long window regardless of block_type
              val w = if (bt == 2) windowFor(0) else windowFor(bt)
              var k = 0
              while (k < 18) {
                var s = 0.0
                var i2 = 0
                while (i2 < 36) {
                  s += buf(i2) * w(i2) * Imdct36(i2)(k); i2 += 1
                }
                xr(sb * 18 + k) = s
                k += 1
              }
            }
            sb += 1
          }
          // inverse alias reduction (transpose butterflies) so the
          // decoder's forward pass restores the spectrum — long block
          // types span all 31 boundaries, mixed only the 0/1 boundary
          // (its two long subbands); pure short skips them
          if (bt != 2 || mixedMode) {
            val sbLim = if (bt == 2) 2 else 32
            var sb2 = 1
            while (sb2 < sbLim) {
              var i = 0
              while (i < 8) {
                val a = xr(18 * sb2 - 1 - i)
                val b = xr(18 * sb2 + i)
                xr(18 * sb2 - 1 - i) = a * Cs(i) + b * Ca(i)
                xr(18 * sb2 + i) = b * Cs(i) - a * Ca(i)
                i += 1
              }
              sb2 += 1
            }
          }
          granXr(c) = xr
          c += 1
        }
        // intensity transform (mode_extension bit 0, long blocks): for
        // bands >= intensityBand the left channel carries the coherent
        // sum L+R and the right channel goes silent; the per-band
        // position is_pos = round(atan2(|L|, |R|)·12/π) clamped to 0-6
        // is written into the right channel's scalefactor slots after
        // its rate loop (the decoder reads them raw). Band 21 has no
        // slot — the decoder inherits band 20's position, so its
        // content rides band 20's ratio. In-phase channels assumed
        // (intensity coding's own premise); anti-phase content cancels
        // in the sum, as in any intensity encoder.
        // mode_extension 3: mid/side below the bound, intensity above;
        // anti-phase bands above the bound ride the pos-7 MS fallback
        val msIntensity = intensityBand >= 0 && modeExt == 3
        // intensity transforms live in object-level methods (see their
        // scaladoc — keeping them OUT of this already-huge method is
        // what keeps the frame loop under HotSpot's JIT size limit):
        // long blocks take the plain long transform; mixed granules
        // run the short half FIRST (any MS fallback there forces the
        // whole long half onto mid/side); pure short granules clamp an
        // auto-mode long bound to the short band range
        val isPosG: Array[Int] =
          if (intensityBand < 0 || bt == 2) null
          else intensityTransformLong(granXr(0), granXr(1), sfb,
            intensityBand, msIntensity)
        val smPair: (Array[Array[Int]], Boolean) =
          if (intensityBand < 0 || bt != 2 || !mixedMode) null
          else intensityTransformShort(granXr(0), granXr(1), sfbS,
            startBand = 3, msFrom = 12, msIntensity)
        val isPosSM: Array[Array[Int]] =
          if (smPair == null) null else smPair._1
        val isPosGM: Array[Int] =
          if (smPair == null) null
          else intensityTransformMixedLong(granXr(0), granXr(1), sfb,
            intensityBand, msIntensity, smPair._2)
        val isPosS: Array[Array[Int]] =
          if (intensityBand < 0 || bt != 2 || mixedMode) null
          else intensityTransformShort(granXr(0), granXr(1), sfbS,
            startBand = math.min(intensityBand, 11), msFrom = 0,
            msIntensity)._1
        c = 0
        while (c < nch) {
          val xr = granXr(c)
          // rate loop: global_gain sets the step for the LOUDEST band's
          // |ix| <= 3 fit; per-band scalefactors (scalefac_scale = 1)
          // boost quieter bands by up to 2^15 so their lines quantize
          // with fine effective steps — the spec's own precision lever,
          // no psychoacoustics. Coarsen gg until the granule fits; once
          // gg hits its ceiling, zero whole bands quietest-first (the
          // capped-band escape — without it a dense loud spectrum at the
          // lowest bitrates never shrinks and the frame overflows).
          val maxAbs = xr.map(math.abs).max
          // per-cell maxima: long cells are the long bands; short cells
          // are (band, window) — 13 x 3, flat index b*3+w; mixed cells
          // are long bands 0-7 then (band-3)*3+w+8 for short bands 3-12
          val nCells =
            if (bt == 2) { if (mixedMode) nLongMixed + 30 else 39 } else 22
          val cellMax = new Array[Double](nCells)
          if (bt == 2 && mixedMode) {
            var b = 0
            while (b < nLongMixed) {
              var m = 0.0
              var i2 = sfb(b)
              while (i2 < sfb(b + 1)) {
                val a = math.abs(xr(i2)); if (a > m) m = a
                i2 += 1
              }
              cellMax(b) = m
              b += 1
            }
            b = 3
            while (b < 13) {
              var w = 0
              while (w < 3) {
                var m = 0.0
                var fl = sfbS(b)
                while (fl < sfbS(b + 1)) {
                  val a = math.abs(xr((fl / 6) * 18 + w * 6 + fl % 6))
                  if (a > m) m = a
                  fl += 1
                }
                cellMax(nLongMixed + (b - 3) * 3 + w) = m
                w += 1
              }
              b += 1
            }
          } else if (bt == 2) {
            var b = 0
            while (b < 13) {
              var w = 0
              while (w < 3) {
                var m = 0.0
                var fl = sfbS(b)
                while (fl < sfbS(b + 1)) {
                  val a = math.abs(xr((fl / 6) * 18 + w * 6 + fl % 6))
                  if (a > m) m = a
                  fl += 1
                }
                cellMax(b * 3 + w) = m
                w += 1
              }
              b += 1
            }
          } else {
            var b = 0
            while (b < sfb.length - 1) { // 22 long bands, every rate
              var m = 0.0
              var i2 = sfb(b)
              while (i2 < sfb(b + 1)) {
                val a = math.abs(xr(i2)); if (a > m) m = a
                i2 += 1
              }
              cellMax(b) = m
              b += 1
            }
          }
          // quietest-first ladder over the audible cells
          val quietOrder: Array[Int] =
            cellMax.indices.filter(cellMax(_) > 0)
              .sortBy(cellMax(_)).toArray
          // sfc 15/399 layouts: short 18x4+18x3; mixed 17x4+18x3;
          // long 11x4+10x3; sfc 0 carries no scalefactor bits at all
          val part2 =
            if (zeroBoost) 0
            else if (bt == 2) {
              if (mixedMode) { if (v1) 122 else 114 } else 126
            } else 74
          val budget = budgetPerGranule
          var gg =
            if (maxAbs <= 0) 210
            else math.max(0, math.min(255,
              (210 + math.ceil(4.0 * math.log(maxAbs / headroom) /
                math.log(2.0))).toInt))
          var nZeroed = 0
          var done = false
          var bw: BitWriter = null
          var meta: (Int, Int) = null
          while (!done) {
            val step = math.pow(2.0, (gg - 210) / 4.0)
            val zeroed = new Array[Boolean](nCells)
            var z = 0
            while (z < nZeroed) { zeroed(quietOrder(z)) = true; z += 1 }
            val ix = new Array[Int](576)
            if (bt == 2 && mixedMode) {
              // mixed: long bands (0-7 MPEG-1 / 0-5 LSF) under the
              // 4-bit slen1 caps; the short half rides the shared
              // region quantizer below
              val sfB = new Array[Int](22)
              val sfS = Array.ofDim[Int](3, 13)
              var b = 0
              while (b < nLongMixed) {
                val m = cellMax(b)
                sfB(b) =
                  if (m <= 0 || zeroed(b) || zeroBoost) 0
                  else math.max(0, math.min(15, math.floor(
                    math.log(step * headroom / m) / math.log(2.0)).toInt))
                b += 1
              }
              // quantize: long lines 0-35 in place, then the short
              // half via the shared region quantizer from line 36
              var i3 = 0
              var band = 0
              while (i3 < 36) {
                if (band < nLongMixed - 1 && i3 >= sfb(band + 1)) band += 1
                val v = xr(i3)
                if (v != 0.0 && !zeroed(band)) {
                  val boost = math.pow(2.0, sfB(band))
                  val q = math.min(3, math.round(
                    math.pow(math.abs(v) * boost / step, 0.75)).toInt)
                  ix(i3) = if (v < 0) -q else q
                }
                i3 += 1
              }
              quantizeShortRegion(xr, sfS, cellMax, zeroed, step, ix,
                3, 36, (b2, w) => nLongMixed + (b2 - 3) * 3 + w)
              granuleSf(g)(c) = sfB
              granuleSfS(g)(c) = sfS
            } else if (bt == 2) {
              // per-(band, window) boost under the short slen caps
              // (4 bits bands 0-5, 3 bits 6-11; band 12 carries none)
              val sfS = Array.ofDim[Int](3, 13)
              quantizeShortRegion(xr, sfS, cellMax, zeroed, step, ix,
                0, 0, (b2, w) => b2 * 3 + w)
              granuleSfS(g)(c) = sfS
              granuleSf(g)(c) = null
            } else {
              // per-band boost: largest sf with bandMax * 2^sf inside
              // the alphabet (slen caps: 4 bits bands 0-10, 3 for 11-20)
              val sfB = new Array[Int](22)
              var b = 0
              while (b < 21) {
                val cap = if (zeroBoost) 0 else if (b < 11) 15 else 7
                val m = cellMax(b)
                sfB(b) =
                  if (m <= 0 || zeroed(b)) 0
                  else math.max(0, math.min(cap, math.floor(
                    math.log(step * headroom / m) / math.log(2.0)).toInt))
                b += 1
              }
              var i3 = 0
              var band = 0
              while (i3 < 576) {
                if (band < 21 && i3 >= sfb(band + 1)) band += 1
                val v = xr(i3)
                if (v != 0.0 && !zeroed(math.min(band, 21))) {
                  val boost = math.pow(2.0, sfB(math.min(band, 21)))
                  val q = math.min(3, math.round(
                    math.pow(math.abs(v) * boost / step, 0.75)).toInt)
                  ix(i3) = if (v < 0) -q else q
                }
                i3 += 1
              }
              granuleSf(g)(c) = sfB
              granuleSfS(g)(c) = null
            }
            val enc = encodeGranule(ix, sfb)
            granIx(c) = ix
            bw = enc._1
            meta = (enc._2, enc._3)
            if (part2 + bw.bitLength <= budget) done = true
            else if (gg < 251) gg += 4
            else if (nZeroed < quietOrder.length) nZeroed += 1
            else throw new IllegalStateException(
              s"Mp3Codec.encode: empty granule exceeds the $budget-bit " +
                "budget — unreachable for any legal rate/bitrate pair")
          }
          granuleGain(g)(c) = gg
          granuleBits(g)(c) = bw
          granuleMeta(g)(c) = meta
          c += 1
        }
        // intensity position fix-up: the decoder infers the intensity
        // bound as the first band boundary above the right channel's
        // last nonzero QUANTIZED line — the rate loop may have zeroed
        // right-channel content below intensityBand, widening the
        // decoder's intensity region. Every band from the inferred
        // bound up gets an explicit position: the computed is_pos at
        // and above intensityBand, the pure-left position 6 below it
        // (those bands decode to l = xr, r = 0 — exactly the normal
        // decode of a zeroed right channel).
        if (intensityBand >= 0 && granuleBt(g) == 2 && mixedMode) {
          val ix1 = granIx(1)
          // long half below the seam: natural lines 0-35, bound at the
          // first long band past the right channel's last nonzero line
          var lastNonL = -1
          var i = 0
          while (i < 36) { if (ix1(i) != 0) lastNonL = i; i += 1 }
          var b0 = 0
          while (b0 < 8 && sfb(b0) <= lastNonL) b0 += 1
          if (lastNonL == -1) b0 = 0
          val sfR = granuleSf(g)(1)
          var b = b0
          while (b < 8) {
            sfR(b) =
              if (b >= intensityBand) isPosGM(b)
              else if (msIntensity) 7
              else 6
            b += 1
          }
          // short half: bitstream order from src 36, bands 3-12
          val lastBand = Array.fill(3)(-1)
          var src = 36
          b = 3
          while (b < 13) {
            var w = 0
            while (w < 3) {
              var any = false
              var fl = sfbS(b)
              while (fl < sfbS(b + 1)) {
                if (ix1(src) != 0) any = true
                src += 1
                fl += 1
              }
              if (any) lastBand(w) = b
              w += 1
            }
            b += 1
          }
          val sfS1 = granuleSfS(g)(1)
          var w = 0
          while (w < 3) {
            var b2 = math.max(3, lastBand(w) + 1)
            while (b2 < 12) { sfS1(w)(b2) = isPosSM(w)(b2); b2 += 1 }
            w += 1
          }
        } else if (intensityBand >= 0 && granuleBt(g) == 2) {
          // per-window inferred bound: walk the right channel's
          // BITSTREAM-ordered quantized lines cell by cell
          val ix1 = granIx(1)
          val lastBand = Array.fill(3)(-1)
          var src = 0
          var b = 0
          while (b < 13) {
            var w = 0
            while (w < 3) {
              var any = false
              var fl = sfbS(b)
              while (fl < sfbS(b + 1)) {
                if (ix1(src) != 0) any = true
                src += 1
                fl += 1
              }
              if (any) lastBand(w) = b
              w += 1
            }
            b += 1
          }
          val sfS1 = granuleSfS(g)(1)
          val ibS = math.min(intensityBand, 11)
          var w = 0
          while (w < 3) {
            var b2 = lastBand(w) + 1
            while (b2 < 12) {
              sfS1(w)(b2) =
                if (b2 >= ibS) isPosS(w)(b2)
                else if (msIntensity) 7
                else 6
              b2 += 1
            }
            // bands the transform marked 7 (anti-phase, matrixed) keep
            // side content and sit below the decoder's inferred bound -
            // their slots are unread; nothing further to write
            w += 1
          }
        } else if (intensityBand >= 0) {
          val ix1 = granIx(1)
          var lastNon = -1
          var i = 0
          while (i < 576) { if (ix1(i) != 0) lastNon = i; i += 1 }
          var b0 = 0
          while (b0 < sfb.length - 1 && sfb(b0) <= lastNon) b0 += 1
          if (lastNon == -1) b0 = 0
          val sfR = granuleSf(g)(1)
          var b = b0
          while (b < 21) {
            sfR(b) =
              if (b >= intensityBand) isPosG(b)
              else if (msIntensity) 7
              else 6
            b += 1
          }
        }
        g += 1
      }
      // assemble the frame
      val frame = new BitWriter
      frame.put(0x7FF, 11)
      frame.put(if (v1) 3 else 2, 2) // MPEG-1 / MPEG-2 LSF
      frame.put(1, 2) // Layer III
      frame.put(1, 1) // no CRC
      frame.put(bri, 4)
      frame.put(sri, 2)
      frame.put(0, 1) // padding
      frame.put(0, 1) // private
      frame.put(mode, 2)
      frame.put(modeExt, 2)
      frame.put(0, 1); frame.put(0, 1); frame.put(0, 2) // (c)/orig/emph
      // scfsi (MPEG-1 only, per channel): when granule 1's scalefactors
      // equal granule 0's over a whole scfsi group, set the group's bit
      // and DON'T retransmit them — the spec's scalefactor-reuse
      // mechanism; the decoder's reuse path carries granule 0's values
      // across. Short granules never participate (the spec forbids
      // scfsi reuse into a short granule).
      val ScfsiGroups = Array((0, 6, 4), (6, 11, 4), (11, 16, 3), (16, 21, 3))
      val scfsi: Array[Array[Int]] =
        if (!v1) Array.fill(nch)(Array.empty[Int])
        else Array.tabulate(nch) { c =>
          if (granuleBt.exists(_ != 0)) Array(0, 0, 0, 0)
          else ScfsiGroups.map { case (from, to, _) =>
            if ((from until to).forall(b =>
              granuleSf(1)(c)(b) == granuleSf(0)(c)(b))) 1 else 0
          }
        }
      // part2 bits per (granule, channel): short granules carry
      // 18x4 + 18x3 = 126; long granules 74 minus reused scfsi groups
      def part2Bits(g: Int, c: Int): Int =
        if (zeroBoost) 0
        else if (granuleBt(g) == 2) {
          if (mixedMode) { if (v1) 122 else 114 } else 126
        }
        else ScfsiGroups.zipWithIndex.map {
          case ((from, to, slen), gi) =>
            if (v1 && g == 1 && scfsi(c)(gi) == 1) 0 else (to - from) * slen
        }.sum
      // side info
      frame.put(0, if (v1) 9 else 8) // main_data_begin
      frame.put(0, // private bits
        if (v1) { if (nch == 1) 5 else 3 } else { if (nch == 1) 1 else 2 })
      if (v1) scfsi.foreach(_.foreach(frame.put(_, 1)))
      var g2 = 0
      while (g2 < granules) {
        var c2 = 0
        while (c2 < nch) {
          frame.put(part2Bits(g2, c2) + granuleBits(g2)(c2).bitLength, 12)
          frame.put(granuleMeta(g2)(c2)._1, 9)          // big_values
          frame.put(granuleGain(g2)(c2), 8)
          frame.put(sfCompress, if (v1) 4 else 9)
          if (granuleBt(g2) != 0) {
            frame.put(1, 1) // window_switching
            frame.put(granuleBt(g2), 2) // block_type (1/2/3)
            frame.put(if (mixedMode && granuleBt(g2) == 2) 1 else 0, 1)
            frame.put(5, 5); frame.put(5, 5) // two region table selects
            frame.put(0, 3); frame.put(0, 3); frame.put(0, 3) // subblock_gain
          } else {
            frame.put(0, 1) // window_switching off
            frame.put(5, 5); frame.put(5, 5); frame.put(5, 5) // table 5 x3
            frame.put(7, 4) // region0_count
            frame.put(7, 3) // region1_count
          }
          if (v1) frame.put(0, 1) // preflag (not transmitted in LSF)
          frame.put(1, 1) // scalefac_scale = 1 (multiplier 1.0)
          frame.put(0, 1) // count1 table A
          c2 += 1
        }
        g2 += 1
      }
      // main data, granule-major channel-inner: per (granule, channel)
      // the scalefactors (part2), then the Huffman bits (part3). Short
      // granules write sfb-major 12 bands x 3 windows (the decoder's
      // read order); long granules write the four scfsi groups,
      // skipping reused ones on granule 1
      val side = frame
      var gb = 0
      while (gb < granules) {
        var cb = 0
        while (cb < nch) {
          if (zeroBoost) {
            // scalefac_compress 0: slen 0 everywhere — nothing to write
          } else if (granuleBt(gb) == 2 && mixedMode) {
            // mixed read order: long bands 0-7 (slen1), then short
            // bands 3-11 sfb-major (slen1 for 3-5, slen2 for 6-11)
            var b = 0
            while (b < nLongMixed) { side.put(granuleSf(gb)(cb)(b), 4); b += 1 }
            b = 3
            while (b < 12) {
              val slen = if (b < 6) 4 else 3
              var w = 0
              while (w < 3) {
                side.put(granuleSfS(gb)(cb)(w)(b), slen); w += 1
              }
              b += 1
            }
          } else if (granuleBt(gb) == 2) {
            var b = 0
            while (b < 12) {
              val slen = if (b < 6) 4 else 3
              var w = 0
              while (w < 3) {
                side.put(granuleSfS(gb)(cb)(w)(b), slen); w += 1
              }
              b += 1
            }
          } else {
            ScfsiGroups.zipWithIndex.foreach { case ((from, to, slen), gi) =>
              if (!(v1 && gb == 1 && scfsi(cb)(gi) == 1))
                (from until to).foreach(b =>
                  side.put(granuleSf(gb)(cb)(b), slen))
            }
          }
          val bits = granuleBits(gb)(cb)
          val used = bits.bitLength // BEFORE result() pads to a byte
          val arr = bits.result()
          var bi = 0
          while (bi < used) {
            side.put((arr(bi >> 3) >> (7 - (bi & 7))) & 1, 1)
            bi += 1
          }
          cb += 1
        }
        gb += 1
      }
      val body = side.result()
      require(body.length <= slots,
        s"Mp3Codec.encode: frame overflow (${body.length} > $slots)")
      outBytes ++= body
      var padI = body.length
      while (padI < slots) { outBytes += 0.toByte; padI += 1 }
      f += 1
    }
    outBytes.toArray
  }

  /** Huffman-encode one granule's 576 quantized lines: big_values pairs
    * with table 5 over all three regions (alphabet |v| <= 3), trailing
    * |v| <= 1 lines as count1 quads (table A), rzero after. Returns
    * (bits, bigValues, count1Quads).
    */
  private def encodeGranule(ix: Array[Int],
      sfb: Array[Int]): (BitWriter, Int, Int) = {
    var lastBig = -1
    var lastNon = -1
    var i = 0
    while (i < 576) {
      if (ix(i) != 0) { lastNon = i; if (math.abs(ix(i)) > 1) lastBig = i }
      i += 1
    }
    var bigLines = if (lastBig < 0) 0 else ((lastBig / 2) + 1) * 2
    // count1 quads must tile exactly to 576 (a straddling quad would
    // read past the spectrum): when a count1 region follows, align the
    // big-values boundary to a multiple of 4 — the two absorbed lines
    // are |v| <= 1 and every table in use covers them as pairs. With
    // bigLines % 4 == 0 and lastNon <= 575, quadEnd <= 576 exactly.
    if (lastNon >= bigLines && bigLines % 4 != 0) bigLines += 2
    val quadEnd = if (lastNon < bigLines) bigLines
                  else bigLines + ((lastNon - bigLines) / 4 + 1) * 4
    require(quadEnd <= 576, s"quad region overruns: $bigLines..$quadEnd")
    val bw = new BitWriter
    i = 0
    while (i < bigLines) {
      val xv = ix(i)
      val yv = ix(i + 1)
      val sym = math.abs(xv) * 4 + math.abs(yv)
      bw.put(t5.codes(sym), t5.lens(sym))
      if (xv != 0) bw.put(if (xv < 0) 1 else 0, 1)
      if (yv != 0) bw.put(if (yv < 0) 1 else 0, 1)
      i += 2
    }
    var quads = 0
    while (i < quadEnd) {
      val q = (0 until 4).map(j => ix(i + j))
      val sym = q.zipWithIndex.map { case (v, j) =>
        (if (v != 0) 1 else 0) << (3 - j)
      }.sum
      bw.put(quadA.codes(sym), quadA.lens(sym))
      q.foreach(v => if (v != 0) bw.put(if (v < 0) 1 else 0, 1))
      quads += 1
      i += 4
    }
    (bw, bigLines / 2, quads)
  }

  /** Verification hook: the hybrid filterbank round trip ALONE —
    * analysis pseudo-QMF → forward MDCT → (no quantization) → IMDCT →
    * synthesis — so specs can pin the near-perfect-reconstruction
    * property separately from the quantizer's deliberate coarseness.
    * Output is delayed by the filterbank+MDCT latency like [[decode]].
    */
  private[operators] def filterbankRoundTrip(
      samples: Array[Double]): Array[Double] = {
    val n = (samples.length / 1152) * 1152
    val x = new Array[Double](512)
    val mdctPrev = Array.ofDim[Double](32, 18)
    val overlap = Array.ofDim[Double](32, 18)
    val synthAcc = new Array[Double](512 + 32)
    val out = ArrayBuffer[Double]()
    var g = 0
    while (g < n / 576) {
      val sbSamples = Array.ofDim[Double](32, 18)
      var slot = 0
      while (slot < 18) {
        System.arraycopy(x, 0, x, 32, 512 - 32)
        var j = 0
        while (j < 32) {
          x(31 - j) = samples(g * 576 + slot * 32 + j)
          j += 1
        }
        val sRow = new Array[Double](32)
        analysisStep(x, sRow)
        var k = 0
        while (k < 32) {
          sbSamples(k)(slot) =
            if ((k & 1) == 1 && (slot & 1) == 1) -sRow(k) else sRow(k)
          k += 1
        }
        slot += 1
      }
      val xr = new Array[Double](576)
      var sb = 0
      while (sb < 32) {
        val buf = new Array[Double](36)
        var i = 0
        while (i < 18) {
          buf(i) = mdctPrev(sb)(i) * WinLong(i)
          buf(18 + i) = sbSamples(sb)(i) * WinLong(18 + i)
          mdctPrev(sb)(i) = sbSamples(sb)(i)
          i += 1
        }
        var k = 0
        while (k < 18) {
          var s = 0.0
          i = 0
          while (i < 36) { s += buf(i) * Imdct36(i)(k); i += 1 }
          xr(sb * 18 + k) = s
          k += 1
        }
        sb += 1
      }
      val gi = GranuleInfo(0, 0, 210, 0, windowSwitching = false, 0,
        mixed = false, Array(0, 0, 0), Array(0, 0, 0), 7, 7, 0, 0, 0)
      synthGranule(xr, gi, overlap, synthAcc, out)
      g += 1
    }
    out.toArray
  }

  /** Verification hook: per-(granule, channel) block types of a stream
    * in decode order (0 long / 1 start / 2 short / 3 stop;
    * non-switching granules report 0) — lets specs pin the encoder's
    * transient window sequence from the BITSTREAM, not from encoder
    * internals.
    */
  private[operators] def granuleBlockTypes(bytes: Array[Byte]): Seq[Int] = {
    var off = id3Skip(bytes)
    val out = ArrayBuffer[Int]()
    while (off < bytes.length - 4) {
      parseHeader(bytes, off) match {
        case None => off += 1
        case Some(h) =>
          if (off + h.frameBytes > bytes.length) return out.toSeq
          val v1 = h.version == 3
          val ch = h.channels
          val sideBytes =
            if (v1) { if (ch == 1) 17 else 32 }
            else { if (ch == 1) 9 else 17 }
          val crcBytes = if (h.crc) 2 else 0
          val side = new BitReader(bytes.slice(off + 4 + crcBytes,
            off + 4 + crcBytes + sideBytes))
          side.get(if (v1) 9 else 8): Unit
          side.get(if (v1) { if (ch == 1) 5 else 3 }
            else { if (ch == 1) 1 else 2 }): Unit
          if (v1) (0 until 4 * ch).foreach(_ => side.get1(): Unit)
          (0 until h.granules * ch).foreach { _ =>
            val gi = readGranuleInfo(side, v1)
            out += (if (gi.windowSwitching) gi.blockType else 0)
          }
          off += h.frameBytes
      }
    }
    out.toSeq
  }

  /** Cheap MP3 detector: optional ID3v2 prefix, then a valid mono
    * Layer III frame header within the first bytes.
    */
  def looksLikeMp3(b: Array[Byte]): Boolean = {
    val off = id3Skip(b)
    off < b.length - 4 && parseHeader(b, off).isDefined
  }
}
