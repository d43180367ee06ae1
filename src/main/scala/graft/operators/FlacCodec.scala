package graft.operators

/** Pure-JVM FLAC codec — the lossless leg of the multimodal decode
  * surface (the reference has no multimodal surface; this is the
  * north-star pipeline's "real decode" path, shrinking
  * `MediaCodec.decodeStub`'s blast radius to lossy codecs only).
  *
  * DECODE is the complete frame layer of the public xiph.org spec:
  *   - STREAMINFO metadata block (the bit-packing
  *     `Multimodal.MediaCodec.sniffContainerAudioMeta` already parses).
  *   - Frames with fixed or variable blocking strategy; CONSTANT,
  *     VERBATIM, FIXED (orders 0–4) and LPC (orders 1–32) subframes;
  *     Rice/Rice2 residual partitions including escaped (raw) partitions;
  *     wasted bits; independent channels and all three stereo
  *     decorrelation modes (left/side, right/side, mid/side).
  *   - Frame-header CRC-8 (poly 0x07) and whole-frame CRC-16 (poly
  *     0x8005), both VERIFIED — a corrupt byte fails loudly as None,
  *     never as silently wrong samples.
  *
  * ENCODE is a real archival operator (PCM segments → valid FLAC):
  * CONSTANT for uniform channels, VERBATIM otherwise ([[encode]]), plus
  * FIXED-predictor Rice-coded frames with optional stereo decorrelation
  * ([[encodeFixed]]) — spec-conformant streams any decoder accepts, and
  * the round-trip half of the decoder's test matrix. Decode is NOT
  * gated only by round-trip: FlacCodecSpec pins bytes against
  * independently hand-computed header fields, CRCs, Rice bit patterns,
  * and the round-9 container sniffer.
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
  private[operators] final class BitWriter {
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
    /** Unary: `q` zero bits then a one bit. */
    def unary(q: Int): Unit = { write(0L, 0.max(q)); write(1L, 1) }
    def alignZero(): Unit = if (nBits > 0) write(0L, 8 - nBits)
    def bytes: Array[Byte] = { alignZero(); buf.toByteArray }
  }

  /** MSB-first bit reader; bounds-checked via [[canRead]]. */
  private final class BitReader(p: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    def atByte: Int = (pos / 8).toInt
    def aligned: Boolean = pos % 8 == 0
    def canRead(bits: Long): Boolean = pos + bits <= p.length.toLong * 8
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
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Unary-coded quotient: zeros until a one. None if bits run out. */
    def unary(): Option[Int] = {
      var q = 0
      while (true) {
        if (!canRead(1)) return None
        if (bits(1) == 1L) return Some(q)
        q += 1
      }
      None
    }
    def align(): Unit = if (pos % 8 != 0) pos += 8 - (pos % 8)
  }

  /** Zigzag fold used by Rice coding: n≥0 → 2n, n<0 → −2n−1. */
  private[operators] def zigzag(n: Long): Long =
    if (n >= 0) n << 1 else ((-n) << 1) - 1
  private[operators] def unzigzag(v: Long): Long =
    (v >>> 1) ^ -(v & 1L)

  /** FIXED-predictor residual of `x` at `i` for `order` (the standard
    * polynomial predictors, orders 0–4).
    */
  private def fixedResidual(x: Array[Long], i: Int, order: Int): Long =
    order match {
      case 0 => x(i)
      case 1 => x(i) - x(i - 1)
      case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
      case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
      case 4 => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
      case _ => throw new IllegalArgumentException(s"fixed order $order")
    }

  private def fixedRestore(x: Array[Long], i: Int, r: Long, order: Int): Long =
    order match {
      case 0 => r
      case 1 => r + x(i - 1)
      case 2 => r + 2 * x(i - 1) - x(i - 2)
      case 3 => r + 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
      case 4 => r + 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
      case _ => throw new IllegalArgumentException(s"fixed order $order")
    }

  // ------------------------------------------------------------------
  // Encode
  // ------------------------------------------------------------------

  /** Stereo decorrelation mode for [[encodeFixed]]. */
  sealed trait Stereo
  case object Independent extends Stereo
  case object LeftSide extends Stereo
  case object RightSide extends Stereo
  case object MidSide extends Stereo

  private def writeStreamHeader(out: java.io.ByteArrayOutputStream,
      sampleRate: Int, nCh: Int, bps: Int, n: Int): Unit = {
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    // STREAMINFO block sizes must sit in [16, 65535] (RFC 9639 §8.2);
    // the frame header still carries the true n, so for n < 16 we clamp
    // only the ADVERTISED min/max — decoders size buffers from these and
    // read the actual count per frame, so a larger advertisement is safe.
    val adv = math.max(n, 16)
    si.write(adv.toLong, 16); si.write(adv.toLong, 16)
    si.write(0L, 24); si.write(0L, 24)
    si.write(sampleRate.toLong, 20)
    si.write((nCh - 1).toLong, 3)
    si.write((bps - 1).toLong, 5)
    si.write(n.toLong, 36)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes ++ new Array[Byte](16))
  }

  private def frameHeader(nCh: Int, chanAssign: Int, n: Int): Array[Byte] = {
    val fw = new BitWriter
    fw.write(0x3ffeL, 14)             // sync
    fw.write(0L, 1)                   // reserved
    fw.write(0L, 1)                   // fixed blocking
    fw.write(7L, 4)                   // block size: 16-bit value-1 at end
    fw.write(0L, 4)                   // rate from STREAMINFO
    fw.write(chanAssign.toLong, 4)
    fw.write(4L, 3)                   // bps code: 16-bit
    fw.write(0L, 1)
    fw.write(0L, 8)                   // frame number 0, UTF-8
    fw.write((n - 1).toLong, 16)
    fw.bytes
  }

  private def validatePcm(sampleRate: Int, channels: Array[Array[Int]]): Int = {
    require(channels.nonEmpty && channels.length <= 8,
      s"1..8 channels, got ${channels.length}")
    val n = channels(0).length
    require(n >= 1 && n <= 65535, s"block length must be in [1, 65535], got $n")
    require(channels.forall(_.length == n), "channels must share one length")
    require(channels.forall(_.forall(v => v >= Short.MinValue && v <= Short.MaxValue)),
      "samples must fit 16-bit signed")
    require(sampleRate >= 1 && sampleRate < (1 << 20),
      s"sample rate must fit STREAMINFO's 20 bits, got $sampleRate")
    n
  }

  /** Encode per-channel 16-bit PCM blocks as one single-frame FLAC
    * stream: STREAMINFO + one fixed-blocking frame, CONSTANT subframe
    * for a uniform channel, VERBATIM otherwise (independent channels).
    * All channels must share one length in [1, 65535].
    */
  def encode(sampleRate: Int, channels: Array[Array[Int]]): Array[Byte] = {
    val n = validatePcm(sampleRate, channels)
    val bps = 16
    val out = new java.io.ByteArrayOutputStream()
    writeStreamHeader(out, sampleRate, channels.length, bps, n)
    val head = frameHeader(channels.length, channels.length - 1, n)
    val bw = new BitWriter
    channels.foreach { ch =>
      val const = ch.forall(_ == ch(0))
      bw.write(0L, 1)
      bw.write(if (const) 0L else 1L, 6)
      bw.write(0L, 1)
      if (const) bw.write(ch(0).toLong & 0xffffL, bps)
      else ch.foreach(v => bw.write(v.toLong & 0xffffL, bps))
    }
    finishFrame(out, head, bw)
    out.toByteArray
  }

  /** Encode with FIXED predictors and Rice-coded residual partitions —
    * the compressing path, and the decoder's round-trip test surface
    * for predictors, Rice parameters, partition orders, and stereo
    * decorrelation. `order` 0–4 (capped at blockSize−1), `po` partitions
    * = 2^po (blockSize must divide evenly and the first partition must
    * keep >0 samples after warm-up). Stereo modes require exactly 2
    * channels; the side channel carries bps+1 bits per the spec.
    */
  def encodeFixed(sampleRate: Int, channels: Array[Array[Int]],
      order: Int, po: Int = 0, stereo: Stereo = Independent): Array[Byte] = {
    val n = validatePcm(sampleRate, channels)
    require(order >= 0 && order <= 4, s"fixed order 0..4, got $order")
    require(po >= 0 && po <= 6, s"partition order 0..6, got $po")
    require(n % (1 << po) == 0,
      s"blockSize $n must divide into ${1 << po} partitions")
    require((n >> po) > order,
      s"first partition empty: blockSize $n, po $po, order $order")
    if (stereo != Independent)
      require(channels.length == 2, "stereo modes need exactly 2 channels")
    val bps = 16
    val ord = math.min(order, n - 1)

    // decorrelate: (chanAssign, per-subframe samples, per-subframe bps)
    val (assign, subs): (Int, Array[(Array[Long], Int)]) = stereo match {
      case Independent =>
        (channels.length - 1,
          channels.map(ch => (ch.map(_.toLong), bps)))
      case LeftSide =>
        val l = channels(0).map(_.toLong)
        val s = Array.tabulate(n)(i => channels(0)(i).toLong - channels(1)(i))
        (8, Array((l, bps), (s, bps + 1)))
      case RightSide =>
        val s = Array.tabulate(n)(i => channels(0)(i).toLong - channels(1)(i))
        val r = channels(1).map(_.toLong)
        (9, Array((s, bps + 1), (r, bps)))
      case MidSide =>
        val m = Array.tabulate(n)(i =>
          (channels(0)(i).toLong + channels(1)(i)) >> 1)
        val s = Array.tabulate(n)(i => channels(0)(i).toLong - channels(1)(i))
        (10, Array((m, bps), (s, bps + 1)))
    }

    val out = new java.io.ByteArrayOutputStream()
    writeStreamHeader(out, sampleRate, channels.length, bps, n)
    val head = frameHeader(channels.length, assign, n)
    val bw = new BitWriter
    subs.foreach { case (x, sbps) =>
      bw.write(0L, 1)
      bw.write((8 | ord).toLong, 6)   // FIXED subframe, order in low bits
      bw.write(0L, 1)                 // no wasted bits
      var i = 0
      while (i < ord) {               // warm-up, verbatim
        bw.write(x(i) & ((1L << sbps) - 1), sbps)
        i += 1
      }
      bw.write(0L, 2)                 // residual method 0: 4-bit Rice
      bw.write(po.toLong, 4)
      val pSize = n >> po
      var part = 0
      while (part < (1 << po)) {
        val from = if (part == 0) ord else part * pSize
        val until = (part + 1) * pSize
        // deterministic k: smallest k bounding the unary quotient ≤ 15
        var maxZig = 0L
        var j = from
        while (j < until) {
          val z = zigzag(fixedResidual(x, j, ord))
          if (z > maxZig) maxZig = z
          j += 1
        }
        var k = 0
        while (k < 14 && (maxZig >> k) > 15) k += 1
        bw.write(k.toLong, 4)
        j = from
        while (j < until) {
          val z = zigzag(fixedResidual(x, j, ord))
          bw.unary((z >>> k).toInt)
          if (k > 0) bw.write(z & ((1L << k) - 1), k)
          j += 1
        }
        part += 1
      }
    }
    finishFrame(out, head, bw)
    out.toByteArray
  }

  private def finishFrame(out: java.io.ByteArrayOutputStream,
      head: Array[Byte], body: BitWriter): Unit = {
    val h8 = crc8(head, 0, head.length)
    val frame = head ++ Array(h8.toByte) ++ body.bytes
    val c16 = crc16(frame, 0, frame.length)
    out.write(frame)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Decoded stream: format fields plus the concatenated per-channel
    * samples of every frame (channel-major within a frame).
    */
  final case class Decoded(sampleRate: Int, channels: Int, bps: Int,
      totalSamples: Long, samples: Array[Long])

  /** Rice/Rice2 residual partitions into `x(order until blockSize)`;
    * false on malformed/truncated input.
    */
  private def readResiduals(r: BitReader, blockSize: Int, order: Int,
      x: Array[Long]): Boolean = {
    if (!r.canRead(6)) return false
    val method = r.bits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.bits(4).toInt
    if (blockSize % (1 << po) != 0) return false
    val pSize = blockSize >> po
    if (pSize <= order && po == 0) return false
    var part = 0
    var i = order
    while (part < (1 << po)) {
      val count = if (part == 0) pSize - order else pSize
      if (count < 0) return false
      if (!r.canRead(pBits)) return false
      val k = r.bits(pBits).toInt
      if (k == escape) {
        if (!r.canRead(5)) return false
        val raw = r.bits(5).toInt
        var c = 0
        while (c < count) {
          if (raw == 0) x(i) = 0L
          else {
            if (!r.canRead(raw)) return false
            x(i) = r.signedBits(raw)
          }
          i += 1; c += 1
        }
      } else {
        var c = 0
        while (c < count) {
          val q = r.unary().getOrElse(return false)
          if (!r.canRead(k)) return false
          val rem = if (k > 0) r.bits(k) else 0L
          x(i) = unzigzag((q.toLong << k) | rem)
          i += 1; c += 1
        }
      }
      part += 1
    }
    true
  }

  /** One subframe into an Array of blockSize RESIDUAL-RESTORED samples
    * at effective bps `sbps`; None on anything malformed.
    */
  private def decodeSubframe(r: BitReader, blockSize: Int,
      sbps: Int): Option[Array[Long]] = {
    if (!r.canRead(8)) return None
    if (r.bits(1) != 0L) return None  // pad bit
    val typ = r.bits(6).toInt
    val wastedFlag = r.bits(1).toInt
    var wasted = 0
    if (wastedFlag == 1)
      wasted = r.unary().getOrElse(return None) + 1
    val eb = sbps - wasted
    if (eb <= 0 || eb > 33) return None
    val x = new Array[Long](blockSize)
    val ok: Boolean = typ match {
      case 0 => // CONSTANT
        if (!r.canRead(eb)) false
        else {
          val v = r.signedBits(eb)
          java.util.Arrays.fill(x, v); true
        }
      case 1 => // VERBATIM
        var i = 0
        var good = true
        while (good && i < blockSize) {
          if (!r.canRead(eb)) good = false
          else { x(i) = r.signedBits(eb); i += 1 }
        }
        good
      case t if (t & 0x38) == 0x08 && (t & 0x07) <= 4 => // FIXED
        val order = t & 0x07
        if (order > blockSize) false
        else {
          var i = 0
          var good = true
          while (good && i < order) {
            if (!r.canRead(eb)) good = false
            else { x(i) = r.signedBits(eb); i += 1 }
          }
          good && readResiduals(r, blockSize, order, x) && {
            var j = order
            while (j < blockSize) { x(j) = fixedRestore(x, j, x(j), order); j += 1 }
            true
          }
        }
      case t if (t & 0x20) != 0 => // LPC, order 1..32
        val order = (t & 0x1f) + 1
        if (order > blockSize) false
        else {
          var i = 0
          var good = true
          while (good && i < order) {
            if (!r.canRead(eb)) good = false
            else { x(i) = r.signedBits(eb); i += 1 }
          }
          if (!good || !r.canRead(9)) false
          else {
            val precM1 = r.bits(4).toInt
            if (precM1 == 15) false
            else {
              val prec = precM1 + 1
              val shift = r.signedBits(5).toInt
              if (shift < 0 || !r.canRead(order.toLong * prec)) false
              else {
                val coef = Array.fill(order)(r.signedBits(prec))
                readResiduals(r, blockSize, order, x) && {
                  var j = order
                  while (j < blockSize) {
                    var acc = 0L
                    var c = 0
                    while (c < order) { acc += coef(c) * x(j - 1 - c); c += 1 }
                    x(j) = x(j) + (acc >> shift)
                    j += 1
                  }
                  true
                }
              }
            }
          }
        }
      case _ => false
    }
    if (!ok) return None
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { x(i) <<= wasted; i += 1 }
    }
    Some(x)
  }

  /** Decode a FLAC stream. None for anything malformed — including ANY
    * CRC mismatch (corruption must never yield plausible samples).
    */
  def decode(p: Array[Byte]): Option[Decoded] = {
    if (p.length < 42 || new String(p, 0, 4, "US-ASCII") != "fLaC") return None
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
      r.bits(1) // blocking strategy
      val bsCode = r.bits(4).toInt
      val srCode = r.bits(4).toInt
      val chanAssign = r.bits(4).toInt
      val bpsCode = r.bits(3).toInt
      r.bits(1)
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
        case _ => return None
      }
      srCode match {
        case 12 => if (!r.canRead(8)) return None else r.bits(8)
        case 13 | 14 => if (!r.canRead(16)) return None else r.bits(16)
        case 15 => return None
        case _ => ()
      }
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
      val frameCh = if (chanAssign < 8) chanAssign + 1
                    else if (chanAssign <= 10) 2
                    else return None
      if (frameCh != nCh) return None
      if (!r.aligned || !r.canRead(8)) return None
      val headEnd = r.atByte
      if (crc8(p, frameStart, headEnd) != r.bits(8).toInt) return None

      // per-subframe effective bps: the side channel carries one extra
      val chBps: Array[Int] = chanAssign match {
        case a if a < 8 => Array.fill(nCh)(bps)
        case 8 => Array(bps, bps + 1)        // left/side
        case 9 => Array(bps + 1, bps)        // side/right
        case 10 => Array(bps, bps + 1)       // mid/side
        case _ => return None
      }
      val subs = new Array[Array[Long]](nCh)
      var ch = 0
      while (ch < nCh) {
        subs(ch) = decodeSubframe(r, blockSize, chBps(ch)).getOrElse(return None)
        ch += 1
      }
      r.align()
      if (!r.canRead(16)) return None
      val frameEnd = r.atByte
      if (crc16(p, frameStart, frameEnd) != r.bits(16).toInt) return None

      // undo stereo decorrelation
      val out: Array[Array[Long]] = chanAssign match {
        case a if a < 8 => subs
        case 8 => // ch0 = left, ch1 = side; right = left - side
          val right = Array.tabulate(blockSize)(j => subs(0)(j) - subs(1)(j))
          Array(subs(0), right)
        case 9 => // ch0 = side, ch1 = right; left = right + side
          val left = Array.tabulate(blockSize)(j => subs(1)(j) + subs(0)(j))
          Array(left, subs(1))
        case 10 => // ch0 = mid, ch1 = side
          val left = new Array[Long](blockSize)
          val right = new Array[Long](blockSize)
          var j = 0
          while (j < blockSize) {
            val side = subs(1)(j)
            val mid = (subs(0)(j) << 1) | (side & 1L)
            left(j) = (mid + side) >> 1
            right(j) = (mid - side) >> 1
            j += 1
          }
          Array(left, right)
        case _ => return None
      }
      out.foreach(c => acc ++= c)
      decoded += blockSize
      i = r.atByte
    }
    if (total != 0 && decoded != total) return None
    Some(Decoded(rate, nCh, bps, if (total != 0) total else decoded,
      acc.result()))
  }
}
