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
