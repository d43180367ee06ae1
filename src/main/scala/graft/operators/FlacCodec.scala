package graft.operators

/** Pure-JVM FLAC subset codec — the lossless leg of the multimodal
  * decode surface (reference has no multimodal surface; this is the
  * north-star pipeline's "real decode" path the round-9 review asked
  * for, shrinking `MediaCodec.decodeStub`'s blast radius to lossy
  * codecs only).
  *
  * Spec coverage (all public, xiph.org FLAC format spec):
  *   - STREAMINFO metadata block (the bit-packing
  *     `Multimodal.MediaCodec.sniffContainerAudioMeta` already parses).
  *   - Frames with fixed blocking strategy, independent channels,
  *     CONSTANT and VERBATIM subframes, 4–32 bit samples, frame-header
  *     CRC-8 (poly 0x07) and whole-frame CRC-16 (poly 0x8005) — both
  *     VERIFIED on decode; a corrupt byte fails loudly as None, never
  *     as silently wrong samples.
  *
  * Out of scope (returns None, falls back to the documented stub):
  *   FIXED/LPC subframes (Rice-coded residuals), stereo decorrelation
  *   (left/right/mid-side), wasted bits. CONSTANT + VERBATIM are
  *   complete, real decodes — bit-exact PCM out — and every FLAC
  *   encoder emits CONSTANT for silence; VERBATIM is the fallback
  *   every encoder keeps for incompressible blocks.
  *
  * The encoder exists as a real operator too (archival write of PCM
  * segments): it emits CONSTANT when a channel's block is uniform,
  * VERBATIM otherwise — a valid, spec-conformant (if uncompressed)
  * FLAC stream any decoder accepts. Decode is NOT gated only by
  * round-trip: FlacCodecSpec pins the emitted bytes against
  * independently hand-computed header fields and CRCs.
  */
object FlacCodec {

  /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    * header checksum.
    */
  private[operators] def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xff)
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    * whole-frame checksum.
    */
  private[operators] def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit writer (the FLAC convention). */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(value: Long, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        cur = (cur << 1) | ((value >>> b) & 1L).toInt
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        b -= 1
      }
    }
    def alignZero(): Unit = if (nBits > 0) write(0L, 8 - nBits)
    def bytes: Array[Byte] = { alignZero(); buf.toByteArray }
  }

  /** MSB-first bit reader; None past the end (truncated payload). */
  private final class BitReader(p: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    def atByte: Int = (pos / 8).toInt
    def aligned: Boolean = pos % 8 == 0
    def canRead(bits: Int): Boolean = pos + bits <= p.length.toLong * 8
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val byteIx = (pos / 8).toInt
        val bitIx = 7 - (pos % 8).toInt
        v = (v << 1) | ((p(byteIx) >> bitIx) & 1).toLong
        pos += 1
        i += 1
      }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def align(): Unit = if (pos % 8 != 0) pos += 8 - (pos % 8)
  }

  /** Encode per-channel 16-bit PCM blocks as one single-frame FLAC
    * stream: STREAMINFO + one fixed-blocking frame, CONSTANT subframe
    * for a uniform channel, VERBATIM otherwise. All channels must share
    * one length in [1, 65535]; values must fit 16-bit signed.
    */
  def encode(sampleRate: Int, channels: Array[Array[Int]]): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 8,
      s"1..8 channels, got ${channels.length}")
    val n = channels(0).length
    require(n >= 1 && n <= 65535, s"block length must be in [1, 65535], got $n")
    require(channels.forall(_.length == n), "channels must share one length")
    require(channels.forall(_.forall(v => v >= Short.MinValue && v <= Short.MaxValue)),
      "samples must fit 16-bit signed")
    require(sampleRate >= 1 && sampleRate < (1 << 20),
      s"sample rate must fit STREAMINFO's 20 bits, got $sampleRate")
    val bps = 16

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, marked last-metadata-block, length 34
    val si = new BitWriter
    si.write(n.toLong, 16)            // min block size
    si.write(n.toLong, 16)            // max block size
    si.write(0L, 24)                  // min frame size (unknown)
    si.write(0L, 24)                  // max frame size (unknown)
    si.write(sampleRate.toLong, 20)
    si.write((channels.length - 1).toLong, 3)
    si.write((bps - 1).toLong, 5)
    si.write(n.toLong, 36)            // total samples
    val siBytes = si.bytes ++ new Array[Byte](16) // md5 unset (all zero)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siBytes)

    // one frame: sync 0xFFF8 (fixed blocking), block size code 7
    // (16-bit value-1 at end), rate code 0 (from STREAMINFO), channel
    // assignment = channels-1 (independent), bps code 4 (16-bit)
    val fw = new BitWriter
    fw.write(0x3ffeL, 14)             // sync
    fw.write(0L, 1)                   // reserved
    fw.write(0L, 1)                   // fixed blocking
    fw.write(7L, 4)                   // block size code
    fw.write(0L, 4)                   // sample rate code
    fw.write((channels.length - 1).toLong, 4)
    fw.write(4L, 3)                   // bps code: 16-bit
    fw.write(0L, 1)                   // reserved
    fw.write(0L, 8)                   // frame number 0, UTF-8
    fw.write((n - 1).toLong, 16)      // block size - 1
    val headNoCrc = fw.bytes
    val h8 = crc8(headNoCrc, 0, headNoCrc.length)

    val bw = new BitWriter
    channels.foreach { ch =>
      val const = ch.forall(_ == ch(0))
      bw.write(0L, 1)                             // zero pad bit
      bw.write(if (const) 0L else 1L, 6)          // subframe type
      bw.write(0L, 1)                             // no wasted bits
      if (const) bw.write(ch(0).toLong & 0xffffL, bps)
      else ch.foreach(v => bw.write(v.toLong & 0xffffL, bps))
    }
    val frame = headNoCrc ++ Array(h8.toByte) ++ bw.bytes
    val c16 = crc16(frame, 0, frame.length)
    out.write(frame)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    out.toByteArray
  }

  /** Decoded stream: format fields plus the concatenated per-channel
    * samples of every frame (channel-major within a frame).
    */
  final case class Decoded(sampleRate: Int, channels: Int, bps: Int,
      totalSamples: Long, samples: Array[Long])

  /** Decode a FLAC stream whose frames use CONSTANT/VERBATIM subframes
    * with independent channels. None for anything else — including ANY
    * CRC mismatch (corruption must never yield plausible samples).
    */
  def decode(p: Array[Byte]): Option[Decoded] = {
    if (p.length < 42 || new String(p, 0, 4, "US-ASCII") != "fLaC") return None
    // metadata walk; first block must be STREAMINFO
    var i = 4
    var last = false
    var first = true
    var rate = 0; var nCh = 0; var bps = 0; var total = 0L
    while (!last) {
      if (i + 4 > p.length) return None
      val h = p(i) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      if (first) {
        if (typ != 0 || len != 34 || i + 4 + 34 > p.length) return None
        val r = new BitReader(p, i + 4)
        r.bits(16); r.bits(16); r.bits(24); r.bits(24)
        rate = r.bits(20).toInt
        nCh = r.bits(3).toInt + 1
        bps = r.bits(5).toInt + 1
        total = r.bits(36)
        first = false
      }
      i += 4 + len
      if (i > p.length) return None
    }
    if (rate == 0 || bps < 4) return None

    val acc = Array.newBuilder[Long]
    var decoded = 0L
    while (i < p.length) {
      val frameStart = i
      val r = new BitReader(p, i)
      if (!r.canRead(40)) return None
      if (r.bits(14) != 0x3ffe) return None
      r.bits(1) // reserved
      r.bits(1) // blocking strategy (value irrelevant to this subset)
      val bsCode = r.bits(4).toInt
      val srCode = r.bits(4).toInt
      val chanAssign = r.bits(4).toInt
      val bpsCode = r.bits(3).toInt
      r.bits(1)
      // UTF-8 coded frame/sample number: leading byte tells the width
      val lead = r.bits(8).toInt
      val extra =
        if ((lead & 0x80) == 0) 0
        else if ((lead & 0xe0) == 0xc0) 1
        else if ((lead & 0xf0) == 0xe0) 2
        else if ((lead & 0xf8) == 0xf0) 3
        else if ((lead & 0xfc) == 0xf8) 4
        else if ((lead & 0xfe) == 0xfc) 5
        else if (lead == 0xfe) 6
        else return None
      var e = 0
      while (e < extra) {
        if (!r.canRead(8) || (r.bits(8).toInt & 0xc0) != 0x80) return None
        e += 1
      }
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => if (!r.canRead(8)) return None else r.bits(8).toInt + 1
        case 7 => if (!r.canRead(16)) return None else r.bits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None // 0 reserved
      }
      srCode match { // only the forms carrying extra bytes matter here
        case 12 => if (!r.canRead(8)) return None else r.bits(8)
        case 13 | 14 => if (!r.canRead(16)) return None else r.bits(16)
        case 15 => return None // invalid
        case _ => ()
      }
      if (chanAssign >= 8) return None // stereo decorrelation: out of scope
      if (chanAssign + 1 != nCh) return None
      val frameBps = bpsCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      if (frameBps != bps) return None
      // header CRC-8 covers sync through the last header byte
      if (!r.aligned || !r.canRead(8)) return None
      val headEnd = r.atByte
      if (crc8(p, frameStart, headEnd) != r.bits(8).toInt) return None

      var ch = 0
      while (ch < nCh) {
        if (!r.canRead(8)) return None
        if (r.bits(1) != 0L) return None // pad bit must be 0
        val typ = r.bits(6).toInt
        if (r.bits(1) != 0L) return None // wasted bits: out of scope
        typ match {
          case 0 => // CONSTANT
            if (!r.canRead(frameBps)) return None
            val v = r.signedBits(frameBps)
            var k = 0
            while (k < blockSize) { acc += v; k += 1 }
          case 1 => // VERBATIM
            var k = 0
            while (k < blockSize) {
              if (!r.canRead(frameBps)) return None
              acc += r.signedBits(frameBps)
              k += 1
            }
          case _ => return None // FIXED/LPC: out of scope
        }
        ch += 1
      }
      r.align()
      if (!r.canRead(16)) return None
      val frameEnd = r.atByte
      if (crc16(p, frameStart, frameEnd) != r.bits(16).toInt) return None
      decoded += blockSize
      i = r.atByte
    }
    if (total != 0 && decoded != total) return None
    Some(Decoded(rate, nCh, bps, if (total != 0) total else decoded,
      acc.result()))
  }
}
