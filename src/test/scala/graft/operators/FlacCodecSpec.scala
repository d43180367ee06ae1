package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FlacCodecSpec extends SparkSpec {
  import spark.implicits._

  private def ramp(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 2000) - 1000)

  test("encode/decode round-trips constant and verbatim subframes bit-exact") {
    for {
      chans <- Seq(
        Array(Array.fill(192)(-123)),                  // mono constant
        Array(ramp(3, 5)),                             // mono verbatim, odd n
        Array(ramp(1, 64), Array.fill(64)(77)),        // stereo mixed types
        Array(ramp(9, 1)))                             // single sample
    } {
      val bytes = FlacCodec.encode(44100, chans)
      val d = FlacCodec.decode(bytes).get
      assert(d.sampleRate == 44100 && d.bps == 16)
      assert(d.channels == chans.length)
      assert(d.totalSamples == chans(0).length.toLong)
      // encoder writes channel-major within the frame
      assert(d.samples.toSeq == chans.flatMap(_.map(_.toLong)).toSeq)
    }
  }

  test("STREAMINFO layout matches the independent round-9 sniffer") {
    // sniffContainerAudioMeta was written against the public spec in a
    // prior round, independently of this codec — it must read the
    // encoder's rate/channels/total bit-packing verbatim
    val bytes = FlacCodec.encode(22050, Array(ramp(5, 300), ramp(6, 300)))
    val meta = Multimodal.MediaCodec.sniffContainerAudioMeta(bytes).get
    assert(meta == (("flac", 22050, 2, 300L, 300.0 / 22050)), meta)
  }

  test("STREAMINFO block sizes are clamped to the spec floor of 16") {
    // RFC 9639 §8.2: STREAMINFO min/max block size live in [16, 65535].
    // Short blocks still encode — only the ADVERTISED sizes clamp; the
    // frame header carries the true n and the decoder reads that.
    val bytes = FlacCodec.encode(8000, Array(ramp(2, 5)))
    def be16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    assert(be16(8) == 16 && be16(10) == 16,
      s"advertised min/max ${be16(8)}/${be16(10)}")
    val d = FlacCodec.decode(bytes).get
    assert(d.totalSamples == 5L && d.samples.length == 5)
    // at n >= 16 the true size is advertised unchanged
    val full = FlacCodec.encode(8000, Array(ramp(2, 192)))
    def be16f(i: Int): Int = ((full(i) & 0xff) << 8) | (full(i + 1) & 0xff)
    assert(be16f(8) == 192 && be16f(10) == 192)
  }

  test("CRC-8 and CRC-16 match table-driven reference implementations") {
    // independent table-driven twins of the codec's bitwise loops (the
    // standard generated-table form), over every frame byte span the
    // encoder emits
    val t8 = Array.tabulate(256) { b =>
      var c = b
      for (_ <- 0 until 8)
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
      c
    }
    def ref8(p: Array[Byte]): Int = p.foldLeft(0)((c, x) => t8(c ^ (x & 0xff)))
    val t16 = Array.tabulate(256) { b =>
      var c = b << 8
      for (_ <- 0 until 8)
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
      c
    }
    def ref16(p: Array[Byte]): Int =
      p.foldLeft(0)((c, x) => ((c << 8) & 0xffff) ^ t16((c >> 8) ^ (x & 0xff)))
    val data = "CRC check payload".getBytes("US-ASCII")
    assert(FlacCodec.crc8(data, 0, data.length) == ref8(data))
    assert(FlacCodec.crc16(data, 0, data.length) == ref16(data))
    // and the known CRC-16/BUYPASS check value for "123456789"
    val check = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc16(check, 0, check.length) == 0xFEE8)
  }

  test("any corrupted byte is rejected, never decoded to wrong samples") {
    val bytes = FlacCodec.encode(8000, Array(ramp(2, 32)))
    val good = FlacCodec.decode(bytes).get.samples.toSeq
    // flip one bit at every frame-region byte: decode must either fail
    // (CRC catches it) or still produce the original samples (a flip in
    // ignored padding) — never plausible-but-different PCM
    for (i <- 42 until bytes.length) {
      val mut = bytes.clone()
      mut(i) = (mut(i) ^ 0x10).toByte
      FlacCodec.decode(mut) match {
        case None => ()
        case Some(d) => assert(d.samples.toSeq == good,
          s"byte $i flip produced different samples undetected")
      }
    }
    // truncation fails, never throws
    for (cut <- Seq(3, 41, bytes.length - 1))
      assert(FlacCodec.decode(bytes.take(cut)).isEmpty)
  }

  test("FIXED predictors + Rice partitions round-trip at every order") {
    for {
      order <- 0 to 4
      po <- Seq(0, 2)
      n <- Seq(32, 192)
    } {
      val pcm = Array.tabulate(n)(i =>
        (math.sin(i * 0.3) * 5000).toInt + (i % 7) * 13 - order * 11)
      val bytes = FlacCodec.encodeFixed(8000, Array(pcm), order, po)
      val d = FlacCodec.decode(bytes).getOrElse(
        fail(s"decode failed: order=$order po=$po n=$n"))
      assert(d.samples.toSeq == pcm.map(_.toLong).toSeq,
        s"order=$order po=$po n=$n")
      // FIXED beats VERBATIM on this smooth signal — the point of it
      if (order == 2 && po == 0)
        assert(bytes.length < FlacCodec.encode(8000, Array(pcm)).length)
    }
  }

  test("stereo decorrelation round-trips: left/side, right/side, mid/side") {
    val n = 64
    val left = Array.tabulate(n)(i => (math.sin(i * 0.2) * 9000).toInt)
    // odd differences exercise mid/side's dropped-bit reconstruction
    val right = Array.tabulate(n)(i => left(i) - 2 * i - (i % 2) - 1)
    for (mode <- Seq(FlacCodec.LeftSide, FlacCodec.RightSide,
        FlacCodec.MidSide, FlacCodec.Independent)) {
      val bytes = FlacCodec.encodeFixed(44100, Array(left, right),
        order = 1, po = 0, stereo = mode)
      val d = FlacCodec.decode(bytes).getOrElse(fail(s"decode failed: $mode"))
      assert(d.channels == 2 && d.totalSamples == n)
      assert(d.samples.take(n).toSeq == left.map(_.toLong).toSeq, s"$mode left")
      assert(d.samples.drop(n).toSeq == right.map(_.toLong).toSeq, s"$mode right")
    }
  }

  test("zigzag and Rice bit layout match hand-derived vectors") {
    assert(Seq(0L, -1L, 1L, -2L, 2L).map(FlacCodec.zigzag) ==
      Seq(0L, 1L, 2L, 3L, 4L))
    for (v <- -100L to 100L)
      assert(FlacCodec.unzigzag(FlacCodec.zigzag(v)) == v)
    // rice(k=2) of value 3: zigzag 6 = q1 r2 -> unary "01" + "10"
    val bw = new FlacCodec.BitWriter
    bw.unary(1); bw.write(2L, 2)
    assert(bw.bytes.toSeq == Seq(0x60.toByte)) // 0110 + zero pad
  }

  test("escaped (raw) Rice partitions and wasted bits decode — hand-built frame") {
    // assembled bit-by-bit from the spec, NOT by our encoder: one
    // 4-sample FIXED order-0 subframe with an ESCAPED partition of raw
    // 6-bit residuals, samples pre-shifted by 1 wasted bit
    val samples = Seq(-10L, 14L, 6L, -2L) // even -> 1 wasted bit
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new FlacCodec.BitWriter
    si.write(4L, 16); si.write(4L, 16); si.write(0L, 24); si.write(0L, 24)
    si.write(8000L, 20); si.write(0L, 3); si.write(15L, 5); si.write(4L, 36)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes ++ new Array[Byte](16))
    val fh = new FlacCodec.BitWriter
    fh.write(0x3ffeL, 14); fh.write(0L, 2)   // sync, reserved, fixed
    fh.write(6L, 4)                          // block size: 8-bit - 1 at end
    fh.write(0L, 4); fh.write(0L, 4)         // rate from SI; 1 channel
    fh.write(4L, 3); fh.write(0L, 1)         // 16-bit bps
    fh.write(0L, 8)                          // frame number 0
    fh.write(3L, 8)                          // block size 4 - 1
    val head = fh.bytes
    val body = new FlacCodec.BitWriter
    body.write(0L, 1)                        // pad
    body.write(8L, 6)                        // FIXED order 0
    body.write(1L, 1)                        // wasted-bits flag
    body.write(1L, 1)                        // unary 0 -> wasted = 1
    // residuals: method 0, partition order 0, param 15 = ESCAPE, 6 raw bits
    body.write(0L, 2); body.write(0L, 4)
    body.write(15L, 4); body.write(6L, 5)
    samples.foreach(s => body.write((s / 2) & 0x3f, 6)) // pre-shift samples
    val frame = head ++ Array(FlacCodec.crc8(head, 0, head.length).toByte) ++
      body.bytes
    val c16 = FlacCodec.crc16(frame, 0, frame.length)
    out.write(frame); out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    val d = FlacCodec.decode(out.toByteArray).get
    assert(d.samples.toSeq == samples)
  }

  test("LPC subframe decodes — hand-built order-1 filter") {
    // LPC order 1, coefficient 1 at shift 0 == the order-1 fixed
    // predictor; residuals rice k=1. x = [5, 7, 6]: warmup 5, then
    // r1 = 7-5 = 2, r2 = 6-7 = -1
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new FlacCodec.BitWriter
    si.write(3L, 16); si.write(3L, 16); si.write(0L, 24); si.write(0L, 24)
    si.write(8000L, 20); si.write(0L, 3); si.write(15L, 5); si.write(3L, 36)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes ++ new Array[Byte](16))
    val fh = new FlacCodec.BitWriter
    fh.write(0x3ffeL, 14); fh.write(0L, 2)
    fh.write(6L, 4); fh.write(0L, 4); fh.write(0L, 4)
    fh.write(4L, 3); fh.write(0L, 1)
    fh.write(0L, 8); fh.write(2L, 8)         // block size 3 - 1
    val head = fh.bytes
    val body = new FlacCodec.BitWriter
    body.write(0L, 1)
    body.write(0x20L, 6)                     // LPC type 1xxxxx, xxxxx = order-1 = 0
    body.write(0L, 1)                        // no wasted bits
    body.write(5L, 16)                       // warmup: 5
    body.write(3L, 4)                        // precision 4 - 1 = 3
    body.write(0L, 5)                        // shift 0
    body.write(1L, 4)                        // coefficient c0 = 1
    body.write(0L, 2); body.write(0L, 4)     // rice, po 0
    body.write(1L, 4)                        // k = 1
    // r=2: zig 4 = q2 r0 -> "001" + "0"; r=-1: zig 1 = q0 r1 -> "1" + "1"
    body.unary(2); body.write(0L, 1)
    body.unary(0); body.write(1L, 1)
    val frame = head ++ Array(FlacCodec.crc8(head, 0, head.length).toByte) ++
      body.bytes
    val c16 = FlacCodec.crc16(frame, 0, frame.length)
    out.write(frame); out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    val d = FlacCodec.decode(out.toByteArray).get
    assert(d.samples.toSeq == Seq(5L, 7L, 6L))
  }

  test("corrupted FIXED/Rice frames are rejected byte-for-byte") {
    val pcm = Array.tabulate(48)(i => (math.sin(i * 0.4) * 3000).toInt)
    val bytes = FlacCodec.encodeFixed(8000, Array(pcm), order = 2, po = 1)
    val good = FlacCodec.decode(bytes).get.samples.toSeq
    for (i <- 42 until bytes.length) {
      val mut = bytes.clone()
      mut(i) = (mut(i) ^ 0x08).toByte
      FlacCodec.decode(mut) match {
        case None => ()
        case Some(d) => assert(d.samples.toSeq == good,
          s"byte $i flip produced different samples undetected")
      }
    }
  }

  test("decodeAudio routes FLAC payloads through the real decoder") {
    val const = FlacCodec.encode(16000, Array(Array.fill(100)(-400)))
    val (sr, ch, nf, rms) = Multimodal.MediaCodec.decodeAudio(const).get
    assert(sr == 16000f && ch == 1 && nf == 100L && rms == 400.0)
    // out-of-subset FLAC (here: a corrupt frame) falls to None, not junk
    val broken = const.clone(); broken(50) = (broken(50) ^ 0x01).toByte
    assert(Multimodal.MediaCodec.decodeAudio(broken).isEmpty ||
      Multimodal.MediaCodec.decodeAudio(broken).get._4 == 400.0)
  }

  test("encodeFlac operator feeds decodeAudioFeatures end-to-end") {
    val df = Seq(
      (1L, Array.fill(10)(250)),   // constant
      (2L, ramp(2, 8)),            // verbatim
      (3L, null.asInstanceOf[Array[Int]]))
      .toDF("doc_id", "samples")
    val out = Multimodal.decodeAudioFeatures(
        Multimodal.encodeFlac(df, "doc_id", "samples", 8000),
        "id", "payload")
      .orderBy("id")
      .as[(Long, Option[Float], Option[Int], Option[Long], Option[Double])]
      .collect().toSeq
    assert(out(0) == ((1L, Some(8000f), Some(1), Some(10L), Some(250.0))))
    val expRms = math.sqrt(ramp(2, 8).map(v => v.toDouble * v).sum / 8.0)
    assert(out(1)._4 == Some(8L) && math.abs(out(1)._5.get - expRms) < 1e-9)
    assert(out(2) == ((3L, None, None, None, None)))
  }
}
