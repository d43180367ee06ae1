package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp3Codec]] — layer-III structure, matched-pair round trip, and the
  * one piece of third-party interop evidence available offline (the
  * gsutil test MP3: MPEG-2 LSF mono, 45 silent frames with a live bit
  * reservoir). No Spark needed: the codec is plain JVM code.
  */
class Mp3CodecSpec extends AnyFunSuite {

  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    for (i <- 1 until n) {
      var bit = n >> 1
      while (j >= bit) { j -= bit; bit >>= 1 }
      j += bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      var i = 0
      while (i < n) {
        var k = 0
        while (k < len / 2) {
          val wr = math.cos(ang * k); val wi = math.sin(ang * k)
          val vr = re(i + k + len / 2) * wr - im(i + k + len / 2) * wi
          val vi = re(i + k + len / 2) * wi + im(i + k + len / 2) * wr
          re(i + k + len / 2) = re(i + k) - vr
          im(i + k + len / 2) = im(i + k) - vi
          re(i + k) += vr
          im(i + k) += vi
          k += 1
        }
        i += len
      }
      len <<= 1
    }
  }

  private def peakBin(s: Array[Double], n: Int): Int = {
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    System.arraycopy(s, 0, re, 0, math.min(s.length, n))
    fft(re, im)
    (1 until n / 2).maxBy(b => re(b) * re(b) + im(b) * im(b))
  }

  private def tone(k: Int, n: Int, amp: Double = 8000.0): Array[Int] =
    Array.tabulate(n)(i =>
      math.round(amp * math.sin(2 * math.Pi * k * i / 256.0)).toInt)

  test("bin-centered tones survive encode -> decode -> FFT") {
    for (k <- Seq(3, 9, 17, 30)) {
      val pcm = tone(k, 2304)
      val bytes = Mp3Codec.encode(pcm, 44100)
      val dec = Mp3Codec.decode(bytes).get
      assert(dec.sampleRate == 44100)
      assert(dec.samples.length == 2304)
      val s = dec.samples.drop(Mp3Codec.LeadingSkip)
      assert(s.length == 2304 - Mp3Codec.LeadingSkip)
      assert(peakBin(s, 256) == k, s"tone bin $k")
    }
  }

  test("round-trip SNR: steady-state reconstruction tracks the input") {
    val pcm = tone(7, 4608)
    val dec = Mp3Codec.decode(Mp3Codec.encode(pcm, 44100)).get
    // align by best correlation over the plausible delay range, then
    // measure SNR over one steady-state frame
    val d = (0 until 1728).maxBy { d =>
      var c = 0.0
      var i = 1152
      while (i < 2304) { c += dec.samples(d + i) * pcm(i); i += 1 }
      c
    }
    var err = 0.0
    var sig = 0.0
    var i = 1152
    while (i < 2304) {
      val e = dec.samples(d + i) - pcm(i)
      err += e * e
      sig += pcm(i).toDouble * pcm(i)
      i += 1
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 10.0, s"round-trip SNR $snr dB (delay $d)")
  }

  test("real third-party MP3 (MPEG-2 LSF, bit reservoir) decodes to silence") {
    val path = java.nio.file.Paths.get(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(path))
    val gold = java.nio.file.Files.readAllBytes(path)
    assert(Mp3Codec.looksLikeMp3(gold))
    val dec = Mp3Codec.decode(gold).get
    assert(dec.sampleRate == 22050)
    // 45 LSF frames x 576 samples, all silent: every granule carries
    // part2_3_length = 0, so requantize sees no lines and the
    // filterbank must emit exact zeros
    assert(dec.samples.length == 45 * 576)
    assert(dec.samples.forall(_ == 0.0))
  }

  test("truncated and poisoned payloads fail safe, never garbage") {
    val pcm = tone(5, 1152)
    val bytes = Mp3Codec.encode(pcm, 44100)
    // truncation mid-frame: the partial frame is dropped, not decoded
    val cut = Mp3Codec.decode(bytes.take(bytes.length / 2))
    assert(cut.forall(_.samples.length % 1152 == 0))
    // arbitrary junk: no sync -> None
    assert(Mp3Codec.decode(Array.fill[Byte](64)(0x55)).isEmpty)
    assert(!Mp3Codec.looksLikeMp3("not audio".getBytes))
    // flipping a table_select to an unshipped table id fails LOUDLY
    // (side info starts at byte 6 for our no-CRC mono frames; byte 10+
    // carries granule 0's table_select bits) — find a byte whose flip
    // trips the unsupported-table guard
    val loud = (6 until 18).exists { i =>
      val mut = bytes.clone()
      mut(i) = (mut(i) ^ 0x6C).toByte
      try { Mp3Codec.decode(mut); false }
      catch {
        case e: UnsupportedOperationException =>
          e.getMessage.contains("not in the shipped subset")
        case _: Exception => false
      }
    }
    assert(loud, "no mutation tripped the unsupported-table guard")
  }

  test("MPEG-2 LSF encode: low-rate frames round-trip with live scalefactors") {
    // 22.05 kHz, 576-sample frames, scalefac_compress = 399 — the LSF
    // slen decomposition path with NONZERO per-band scalefactors (the
    // third-party golden only exercises it at all-zero): tones keep
    // their FFT peak, lengths follow the 1-granule frame layout
    for (k <- Seq(4, 13, 27)) {
      val pcm = tone(k, 2304) // four LSF frames
      val bytes = Mp3Codec.encode(pcm, 22050, bitrateKbps = 96)
      val dec = Mp3Codec.decode(bytes).get
      assert(dec.sampleRate == 22050 && dec.samples.length == 2304)
      assert(peakBin(dec.samples.drop(Mp3Codec.LeadingSkip), 256) == k,
        s"LSF tone $k")
    }
    // the other two LSF rates ride the same path
    for (sr <- Seq(24000, 16000)) {
      val dec = Mp3Codec.decode(
        Mp3Codec.encode(tone(7, 1152), sr, bitrateKbps = 64)).get
      assert(dec.sampleRate == sr && dec.samples.length == 1152)
    }
  }

  test("rate loop: dense spectra fit low bitrates; tones survive 64 kbps") {
    // white-ish noise = dense spectrum: at 64 kbps the rate loop MUST
    // coarsen global_gain until the granule fits ~750 bits — the frames
    // still assemble and decode (rate-distortion, not overflow)
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(2304)(rnd.nextInt(16000) - 8000)
    val nb = Mp3Codec.encode(noise, 44100, bitrateKbps = 64)
    assert(nb.length == 2 * (144 * 64000 / 44100))
    val nd = Mp3Codec.decode(nb).get
    assert(nd.samples.length == 2304)
    // a tone's sparse spectrum fits 64 kbps with room: the FFT gate
    // holds at a fifth of the default bitrate
    for (k <- Seq(5, 21)) {
      val bytes = Mp3Codec.encode(tone(k, 2304), 44100, bitrateKbps = 64)
      val s = Mp3Codec.decode(bytes).get.samples.drop(Mp3Codec.LeadingSkip)
      assert(peakBin(s, 256) == k, s"64kbps tone $k")
    }
    intercept[IllegalArgumentException] {
      Mp3Codec.encode(tone(3, 1152), 44100, bitrateKbps = 999)
    }
  }

  test("scfsi: steady signals reuse granule-0 scalefactors across the frame") {
    val frameBytes = 144 * 320000 / 44100 // 320 kbps @ 44.1 kHz, pad 0
    def sideBits(b: Array[Byte], frame: Int, from: Int, n: Int): Int = {
      var v = 0
      for (i <- from until from + n)
        v = (v << 1) |
          ((b(frame * frameBytes + 4 + (i >> 3)) >> (7 - (i & 7))) & 1)
      v
    }
    // a steady tone reuses scalefactor groups between granules — the
    // reuse is PARTIAL by honest construction (each granule picks its
    // own global_gain, so a quarter-step gg drift can shift a band's
    // scalefactor bucket) but must be non-trivial, and the DECODER's
    // reuse path must carry granule 0's values for the set groups (a
    // desync would garble the whole granule, so the passing FFT gate is
    // the correctness proof). Frame 0's first granule is the filterbank
    // warmup, so the claim is on frame 1.
    val steady = Mp3Codec.encode(tone(7, 2304), 44100)
    val scfsi = sideBits(steady, 1, 14, 4)
    assert(scfsi != 0, "steady frame reused no scalefactor group")
    // reused groups shrink granule 1's part2: its part2_3 must sit
    // below granule 0's by at least the smallest group's bits
    val p0 = sideBits(steady, 1, 18, 12)
    val p1 = sideBits(steady, 1, 77, 12)
    assert(p0 > p1, s"granule 1 did not shrink ($p0 vs $p1)")
    val s = Mp3Codec.decode(steady).get.samples.drop(Mp3Codec.LeadingSkip)
    assert(peakBin(s, 256) == 7)
    // a signal whose band energies move between granules must NOT claim
    // full reuse — and still round-trips cleanly
    val varying = Array.tabulate(2304) { i =>
      val k = if ((i / 576) % 2 == 0) 3 else 24
      math.round(8000.0 * math.sin(2 * math.Pi * k * i / 256.0)).toInt
    }
    val vb = Mp3Codec.encode(varying, 44100)
    assert(sideBits(vb, 1, 14, 4) != 15, "varying signal claimed full reuse")
    assert(Mp3Codec.decode(vb).get.samples.length == 2304)
  }

  test("bin-centered tones survive SHORT-block encode -> decode -> FFT") {
    // the forced-short round trip: every granule block_type 2 — short
    // sfb tables, per-(band, window) scalefactors, the frequency-line
    // reorder, and the 3x12-point IMDCT tiling all in the loop
    for (k <- Seq(1, 3, 9, 17, 30)) {
      val pcm = tone(k, 2304)
      val bytes = Mp3Codec.encode(pcm, 44100, 0, "short")
      assert(Mp3Codec.granuleBlockTypes(bytes).forall(_ == 2))
      val dec = Mp3Codec.decode(bytes).get
      assert(dec.sampleRate == 44100 && dec.samples.length == 2304)
      val s = dec.samples.drop(Mp3Codec.LeadingSkip)
      assert(peakBin(s, 256) == k, s"short-block tone bin $k")
    }
  }

  test("auto mode emits the spec window sequence around a transient") {
    // silence, then a loud attack: the detector must bracket the short
    // granules with START (1) before and STOP (3) after, pinned from
    // the BITSTREAM side info, and the stream must decode
    val pcm = Array.fill(1152)(0) ++ tone(5, 1152) ++
      tone(5, 1152, amp = 7900.0)
    val bytes = Mp3Codec.encode(pcm, 44100, 0, "auto")
    val types = Mp3Codec.granuleBlockTypes(bytes)
    assert(types.length == 6, types.mkString(","))
    assert(types.contains(2), s"no short granule in ${types.mkString(",")}")
    val firstShort = types.indexOf(2)
    assert(firstShort > 0 && types(firstShort - 1) == 1,
      s"short not preceded by START in ${types.mkString(",")}")
    val lastShort = types.lastIndexOf(2)
    assert(lastShort == types.length - 1 || types(lastShort + 1) == 3 ||
      types(lastShort + 1) == 2,
      s"short not followed by STOP in ${types.mkString(",")}")
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.samples.length == pcm.length)
    // steady-state tail still carries the tone through the mixed
    // window sequence
    assert(peakBin(dec.samples.drop(2304), 256) == 5)
    // a steady signal never triggers the detector
    assert(Mp3Codec.granuleBlockTypes(
      Mp3Codec.encode(tone(9, 2304), 44100, 0, "auto")).forall(_ == 0))
  }

  test("rate-loop band ladder: dense loud spectra encode at the floor rates") {
    // dense LOUD spectrum at LSF 8 kbps: ~110 Huffman bits/granule of
    // budget, global_gain alone cannot shrink scalefactor-boosted bands
    // — pre-ladder this threw 'frame overflow' on a legal config; now
    // the quietest bands zero out until the granule fits
    val noisy = Array.tabulate(2304) { i =>
      (math.sin(i * 0.71) * 14000 + math.sin(i * 1.13) * 9000 +
        math.sin(i * 2.31) * 6000).toInt
    }
    for ((sr, br) <- Seq((22050, 8), (16000, 8), (24000, 8), (48000, 32))) {
      val bytes = Mp3Codec.encode(noisy, sr, br)
      val dec = Mp3Codec.decode(bytes)
      assert(dec.nonEmpty && dec.get.sampleRate == sr, s"$sr @ $br kbps")
      assert(dec.get.samples.forall(v => !v.isNaN && math.abs(v) < 131072))
    }
    // forced-short at a low MPEG-1 rate exercises the short ladder too
    val sb = Mp3Codec.encode(noisy, 44100, 32, "short")
    assert(Mp3Codec.decode(sb).get.samples.length == 2304)
  }

  test("LSF short blocks decode: hand-rolled silent frame is exact zeros") {
    // hand-rolled MPEG-2 LSF frame: 22.05 kHz, 64 kbps, mono, one
    // granule with window_switching=1 / block_type=2, sfc 0 and
    // part2_3 = 0 — the 13818-3 short slen partitions read zero bits
    // and the empty spectrum must synthesize to exact silence
    val bits = new StringBuilder
    def put(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bits.append((v >> i) & 1))
    put(0x7FF, 11); put(2, 2); put(1, 2); put(1, 1) // sync, v2, L3, no crc
    put(8, 4); put(0, 2); put(0, 1); put(0, 1)      // 64 kbps, 22050, pad, priv
    put(3, 2); put(0, 2); put(0, 1); put(0, 1); put(0, 2) // mono + flags
    put(0, 8); put(0, 1)                            // mdb, private
    put(0, 12); put(0, 9); put(210, 8); put(0, 9)   // part2_3, bv, gg, sfc
    put(1, 1); put(2, 2); put(0, 1)                 // wsf, SHORT, not mixed
    put(0, 5); put(0, 5)                            // table_select x2
    put(0, 3); put(0, 3); put(0, 3)                 // subblock_gain x3
    put(0, 1); put(0, 1)                            // sfs, count1 table
    val frameLen = 72 * 64000 / 22050
    val bytes = new Array[Byte](frameLen)
    bits.toString.grouped(8).zipWithIndex.foreach { case (b, i) =>
      bytes(i) = Integer.parseInt(b.padTo(8, '0'), 2).toByte
    }
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.sampleRate == 22050 && dec.channels == 1)
    assert(dec.samples.length == 576)
    assert(dec.samples.forall(_ == 0.0), "silent LSF short frame")
  }

  test("LSF short and mixed blocks round-trip with live scalefactors") {
    for (mode <- Seq("short", "mixed"); k <- Seq(5, 17, 28)) {
      val pcm = tone(k, 2304)
      val bytes = Mp3Codec.encode(pcm, 22050, blockMode = mode)
      assert(Mp3Codec.granuleBlockTypes(bytes).forall(_ == 2))
      val dec = Mp3Codec.decode(bytes).get
      assert(dec.sampleRate == 22050 && dec.channels == 1)
      val steady = dec.samples.drop(Mp3Codec.LeadingSkip)
      assert(peakBin(steady, 256) == k, s"LSF $mode tone $k")
    }
  }

  test("property: random tone mixes round-trip sane at every config") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val cfgGen = for {
      sr <- Gen.oneOf(44100, 48000, 32000, 22050, 24000, 16000)
      nTones <- Gen.choose(1, 3)
      tones <- Gen.listOfN(nTones, Gen.zip(
        Gen.choose(1, 40), Gen.choose(500, 6000)))
      frames <- Gen.choose(1, 3)
      mode <- Gen.oneOf("long", "short", "auto", "mixed")
      chanMode <- Gen.oneOf("mono", "lr", "ms", "intensity")
      msb <- Gen.oneOf(true, false)
    } yield (sr, tones, frames, mode, chanMode, msb)
    val prop = Prop.forAll(cfgGen) {
      case (sr, tones, frames, mode, chanMode, msb) =>
      val v1 = Seq(44100, 48000, 32000).contains(sr)
      val frameLen = if (v1) 1152 else 576
      val n = frames * frameLen
      val pcm = Array.tabulate(n)(i => tones.map { case (k, a) =>
        a * math.sin(2 * math.Pi * k * i / 256.0)
      }.sum.round.toInt)
      // intensity coding is MPEG-1 only — fold non-v1 draws onto
      // supported configs rather than discarding them (every MPEG-1
      // block mode incl. mixed takes intensity since r14)
      val blockMode =
        if (chanMode == "intensity") { if (v1) mode else "long" }
        else mode
      val enc = chanMode match {
        case "mono" => Mp3Codec.encode(pcm, sr, 0, blockMode)
        case "lr" =>
          Mp3Codec.encodeStereo(pcm, pcm.map(v => -v / 2), sr, 0, blockMode)
        case "intensity" =>
          if (!v1) Mp3Codec.encodeStereo(pcm, pcm.map(_ / 3), sr, 0,
            blockMode, msStereo = true) // LSF intensity is loud-fail
          else Mp3Codec.encodeStereoIntensity(pcm, pcm.map(_ / 3), sr, 0,
            intensityBand =
              if (blockMode == "short") 6
              else if (blockMode == "mixed") 4
              else 8,
            blockMode = blockMode, msBelow = msb)
        case _ => Mp3Codec.encodeStereo(pcm, pcm.map(_ / 3), sr, 0,
          blockMode, msStereo = true)
      }
      val dec = Mp3Codec.decode(enc).get
      val nch = if (chanMode == "mono") 1 else 2
      // contracts: exact length, right rate and channel count, finite
      // bounded samples, channel 0 positively correlated with the
      // input at SOME plausible lag
      val lenOk = dec.samples.length == n * nch && dec.sampleRate == sr &&
        dec.channels == nch
      val boundOk = dec.samples.forall(v =>
        !v.isNaN && !v.isInfinite && math.abs(v) < 32768 * 4)
      val ch0 =
        if (nch == 1) dec.samples
        else Array.tabulate(n)(i => dec.samples(2 * i))
      val corrOk = n < 1280 || {
        val win = math.min(512, n - 1153)
        (0 until 1153).exists { d =>
          var c = 0.0
          var i = 0
          while (i < win) { c += ch0(d + i) * pcm(i); i += 1 }
          c > 0
        }
      }
      lenOk && boundOk && corrOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }

  test("fuzz: hostile bytes never hang, never escape the codec's own errors") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val valid = Mp3Codec.encode(tone(5, 2304), 44100)
    // single- and triple-byte mutations of a REAL stream, plus pure noise
    val mutGen: Gen[Array[Byte]] = for {
      kind <- Gen.choose(0, 2)
      bytes <- kind match {
        case 0 => Gen.listOfN(3, Gen.zip(
            Gen.choose(0, valid.length - 1), Gen.choose(1, 255)))
          .map { flips =>
            val m = valid.clone()
            flips.foreach { case (i, x) => m(i) = (m(i) ^ x).toByte }
            m
          }
        case 1 => Gen.choose(8, 600).flatMap(n =>
          Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
        case _ => Gen.choose(0, valid.length - 1).map(valid.take)
      }
    } yield bytes
    val prop = Prop.forAll(mutGen) { b =>
      // codec level: a decode either resolves, or fails with one of the
      // codec's OWN deliberate errors — never an uncontrolled index /
      // arithmetic escape, never a hang
      val codecOk =
        try { Mp3Codec.decode(b); true }
        catch {
          case _: IllegalArgumentException => true
          case _: UnsupportedOperationException => true
          case _: Throwable => false
        }
      // media layer: every failure null-routes (the poison-pill
      // convention shared by all formats)
      val layerOk =
        try { Multimodal.MediaCodec.decodeSamples(b); true }
        catch { case _: Throwable => false }
      codecOk && layerOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(result.passed, result.status.toString)
  }

  test("encoder rejects unsupported rates loudly") {
    intercept[IllegalArgumentException] {
      Mp3Codec.encode(tone(3, 1152), 8000)
    }
  }

  private def deinterleave(s: Array[Double], ch: Int): Array[Array[Double]] =
    Array.tabulate(ch)(c => Array.tabulate(s.length / ch)(i => s(i * ch + c)))

  test("LR stereo round trip: independent tones per channel survive") {
    val l = tone(5, 2304)
    val r = tone(11, 2304)
    val bytes = Mp3Codec.encodeStereo(l, r, 44100)
    assert(((bytes(3) >> 6) & 3) == 0, "mode must be stereo (0)")
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2 && dec.sampleRate == 44100)
    assert(dec.samples.length == 2 * 2304)
    val chans = deinterleave(
      dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 5, "left tone")
    assert(peakBin(chans(1), 256) == 11, "right tone")
  }

  test("mid/side joint stereo round trip and bitstream mode bits") {
    val l = tone(7, 2304)
    // right = left + a quiet difference tone: the MS-favorable shape
    val r = Array.tabulate(2304)(i =>
      l(i) + math.round(1500.0 * math.sin(2 * math.Pi * 13 * i / 256.0)).toInt)
    val bytes = Mp3Codec.encodeStereo(l, r, 44100, msStereo = true)
    assert(((bytes(3) >> 6) & 3) == 1, "mode must be joint stereo (1)")
    assert(((bytes(3) >> 4) & 3) == 2, "mode_extension must be MS (2)")
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2)
    val chans = deinterleave(
      dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 7, "left dominant tone")
    // the right channel carries tone 7 plus the 13 diff — its peak
    // stays the shared dominant tone, and L-R isolates the difference
    val diff = Array.tabulate(256)(i => chans(1)(i) - chans(0)(i))
    assert(peakBin(diff, 256) == 13, "mid/side difference tone")
  }

  test("stereo short blocks and LSF stereo round-trip") {
    val l = tone(5, 2304)
    val r = tone(9, 2304)
    val sb = Mp3Codec.encodeStereo(l, r, 44100, blockMode = "short")
    assert(Mp3Codec.granuleBlockTypes(sb).forall(_ == 2))
    val dec = Mp3Codec.decode(sb).get
    assert(dec.channels == 2)
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 5 && peakBin(chans(1), 256) == 9)
    // LSF stereo: 17-byte side info, one granule per frame
    val lsf = Mp3Codec.encodeStereo(tone(5, 2304), tone(9, 2304), 22050)
    val decL = Mp3Codec.decode(lsf).get
    assert(decL.channels == 2 && decL.sampleRate == 22050)
    val chansL = deinterleave(decL.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chansL(0), 256) == 5 && peakBin(chansL(1), 256) == 9)
  }

  test("bin-centered tones survive MIXED-block encode -> decode -> FFT") {
    // tones both sides of the long/short seam at line 36 (tone 16):
    // k<16 live in the two long subbands (long bands 0-7), k>=16 in
    // the short-coded region (short bands 3-12, reordered)
    for (k <- Seq(3, 9, 15, 16, 21, 30)) {
      val pcm = tone(k, 2304)
      val bytes = Mp3Codec.encode(pcm, 44100, blockMode = "mixed")
      // side info pins block_type 2 WITH mixed_block_flag
      assert(Mp3Codec.granuleBlockTypes(bytes).forall(_ == 2))
      val dec = Mp3Codec.decode(bytes).get
      assert(dec.sampleRate == 44100 && dec.channels == 1)
      val steady = dec.samples.drop(Mp3Codec.LeadingSkip)
      assert(peakBin(steady, 256) == k, s"mixed-block tone $k")
    }
  }

  test("mixed-block stereo round trip") {
    val l = tone(5, 2304)   // long half of the mixed layout
    val r = tone(22, 2304)  // short half
    val bytes = Mp3Codec.encodeStereo(l, r, 44100, blockMode = "mixed")
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2)
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 5, "left long-half tone")
    assert(peakBin(chans(1), 256) == 22, "right short-half tone")
  }

  test("intensity stereo round trip: positions and bound recovered") {
    // below the bound (band 8 starts at line 36 ≈ tone 16): a left-only
    // tone coded normally; in the intensity region: a shared tone at an
    // EXACT position angle — L/R = tan(4·π/12) = √3, so is_pos
    // quantizes losslessly and decode returns both amplitudes exactly
    val lo = tone(5, 2304)
    val hiL = tone(20, 2304, 6000.0)
    val hiR = tone(20, 2304, 6000.0 / math.sqrt(3.0))
    val l = Array.tabulate(2304)(i => lo(i) + hiL(i))
    val r = Array.tabulate(2304)(i => hiR(i))
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100)
    assert(((bytes(3) >> 6) & 3) == 1, "mode must be joint stereo (1)")
    assert(((bytes(3) >> 4) & 3) == 1, "mode_extension must be intensity (1)")
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2 && dec.sampleRate == 44100)
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 5, "left low tone dominates channel 0")
    assert(peakBin(chans(1), 256) == 20, "right carries only the split tone")
    // the direction survives: per-channel amplitude of the intensity
    // tone keeps the √3 ratio (Goertzel-style projection at bin 20)
    def amp(s: Array[Double], k: Int): Double = {
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < 1024) {
        val a = 2 * math.Pi * k * i / 256.0
        re += s(i) * math.cos(a); im += s(i) * math.sin(a)
        i += 1
      }
      math.hypot(re, im)
    }
    val ratio = amp(chans(0), 20) / amp(chans(1), 20)
    assert(math.abs(ratio - math.sqrt(3.0)) < 0.2,
      s"intensity ratio √3 expected, got $ratio")
  }

  test("intensity: pure-left region and right-anchored bound decode exact") {
    // right channel is silent above its low anchor tone — the decoder's
    // inferred bound falls below the nominal band; the fix-up positions
    // (6 = pure left) must keep the left-only middle tone on channel 0
    val t9 = tone(9, 2304)
    val t20 = tone(20, 2304, 4000.0)
    val l = Array.tabulate(2304)(i => t9(i) + t20(i))
    val r = tone(3, 2304, 3000.0)
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100, intensityBand = 12)
    val dec = Mp3Codec.decode(bytes).get
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 9, "left tones stay left")
    assert(peakBin(chans(1), 256) == 3, "right anchor stays right")
  }

  test("SHORT-block intensity round trip: per-window positions recovered") {
    // tone 5 (per-window short band ~2-3) anchors both channels below
    // the bound; tone 22 (per-window line 33, short band 6) rides the
    // intensity region at the exact position-5 ratio tan(75°) ≈ 3.73 —
    // per-window splits must recover both channels with their own
    // dominant peaks (left: loud intensity tone; right: its anchor)
    val t5l = tone(5, 2304, 4000.0)
    val t22l = tone(22, 2304, 9000.0)
    val t22r = tone(22, 2304, 9000.0 / math.tan(5 * math.Pi / 12))
    val t5r = tone(5, 2304, 3000.0)
    val l = Array.tabulate(2304)(i => t5l(i) + t22l(i))
    val r = Array.tabulate(2304)(i => t5r(i) + t22r(i))
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100,
      intensityBand = 6, blockMode = "short")
    assert(((bytes(3) >> 4) & 3) == 1, "mode_extension must be intensity")
    assert(Mp3Codec.granuleBlockTypes(bytes).forall(_ == 2))
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2)
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 22, "left intensity tone dominates")
    assert(peakBin(chans(1), 256) == 5, "right anchor survives")
  }

  test("MS+intensity (mode_extension 3): matrix below, positions above") {
    // below the bound: a shared tone (MS-friendly); above: an
    // ANTI-PHASE tone (band 9) that a sum would cancel — it must raise
    // the effective bound and ride the pos-7 mid/side fallback — and an
    // in-phase pair ABOVE it (band ~11) at the exact position-4 angle,
    // which stays in the (suffix) intensity region
    val shared = tone(5, 2304, 5000.0)
    val hiL = tone(27, 2304, 6000.0)
    val hiR = tone(27, 2304, 6000.0 / math.sqrt(3.0))
    val anti = tone(20, 2304, 4000.0)
    val l = Array.tabulate(2304)(i => shared(i) + hiL(i) + anti(i))
    val r = Array.tabulate(2304)(i => shared(i) + hiR(i) - anti(i))
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100,
      intensityBand = 8, msBelow = true)
    assert(((bytes(3) >> 4) & 3) == 3, "mode_extension must be MS+intensity")
    val dec = Mp3Codec.decode(bytes).get
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    def amp(s: Array[Double], k: Int): (Double, Double) = {
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < 1024) {
        val a = 2 * math.Pi * k * i / 256.0
        re += s(i) * math.cos(a); im += s(i) * math.sin(a)
        i += 1
      }
      (re, im)
    }
    def mag(ri: (Double, Double)) = math.hypot(ri._1, ri._2)
    // the shared MS tone and the intensity pair both survive per channel
    assert(mag(amp(chans(0), 5)) > 1000 * 512,
      "shared tone survives the matrix")
    val ratio27 = mag(amp(chans(0), 27)) / mag(amp(chans(1), 27))
    assert(math.abs(ratio27 - math.sqrt(3.0)) < 0.25,
      s"intensity ratio sqrt(3) expected, got $ratio27")
    // the anti-phase tone survives IN ANTI-PHASE (a sum would cancel
    // it): cross-spectrum at bin 20 must be strongly negative
    val (lr, li) = amp(chans(0), 20)
    val (rr2, ri2) = amp(chans(1), 20)
    val cross = lr * rr2 + li * ri2
    assert(cross < 0, s"anti-phase tone must stay anti-phase, cross=$cross")
    assert(mag(amp(chans(0), 20)) > 0.3 * 4000 * 512,
      "anti-phase tone magnitude survives")
  }

  test("intensity + auto blocks: transient window sequence decodes sane") {
    // quiet lead-in, then a loud attack at granule 3 — auto must emit
    // the long->START->SHORT->STOP sequence while intensity coding
    // rides BOTH the long-band and the per-window position layouts
    val n = 4 * 1152
    val l = Array.tabulate(n) { i =>
      val a = if (i >= 3 * 1152 && i < 3 * 1152 + 576) 9000.0 else 1500.0
      (a * math.sin(2 * math.Pi * 20 * i / 256.0)).round.toInt
    }
    val r = l.map(v => (v / math.sqrt(3.0)).round.toInt)
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100,
      intensityBand = 8, blockMode = "auto")
    val bts = Mp3Codec.granuleBlockTypes(bytes)
    assert(bts.contains(2), s"transient must force short blocks: ${bts.toList}")
    assert(bts.contains(1) && bts.contains(3), s"start/stop: ${bts.toList}")
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 20, "tone survives the window ride")
    assert(dec.samples.forall(v => !v.isNaN && math.abs(v) < 131072))
  }

  test("floor-bitrate stereo: scalefac_compress-0 fallback fits every combo") {
    // at the lowest rates the per-granule budget is SMALLER than the
    // sfc-15/399 scalefactor layout (e.g. LSF stereo 8 kbps: 60 bits
    // vs 74) — the encoder must fall back to sfc 0 and still assemble
    // legal frames instead of overflowing
    for ((sr, kbps, mode) <- Seq((22050, 8, "long"), (16000, 8, "long"),
        (48000, 32, "short"), (44100, 32, "short"))) {
      val l = tone(7, if (sr > 30000) 2304 else 1152, 6000.0)
      val r = tone(13, l.length, 6000.0)
      val bytes = Mp3Codec.encodeStereo(l, r, sr, bitrateKbps = kbps,
        blockMode = mode)
      val dec = Mp3Codec.decode(bytes).get
      assert(dec.sampleRate == sr && dec.channels == 2)
      assert(dec.samples.forall(v => !v.isNaN && math.abs(v) < 131072),
        s"$sr/$kbps/$mode sane")
    }
    // a genuine zeroBoost config (48 kHz 32 kbps short stereo: 120-bit
    // granule budget < the 126-bit short layout) still carries tones
    val l = tone(7, 2304)
    val r = tone(13, 2304)
    val bytes = Mp3Codec.encodeStereo(l, r, 48000, bitrateKbps = 32,
      blockMode = "short")
    val chans = deinterleave(
      Mp3Codec.decode(bytes).get.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 7 && peakBin(chans(1), 256) == 13,
      "tones survive the no-boost floor")
    // intensity NEEDS scalefactor slots for its positions — loud
    val e = intercept[IllegalArgumentException](
      Mp3Codec.encodeStereoIntensity(l, r, 48000, bitrateKbps = 32,
        blockMode = "short"))
    assert(e.getMessage.contains("scalefactor slots"))
  }

  test("LSF intensity fails loudly, never silently garbled") {
    // MPEG-2 LSF intensity: a different (unshipped) position semantic
    val lsf = Mp3Codec.encodeStereo(tone(5, 2304), tone(9, 2304), 22050)
    val pLsf = lsf.clone()
    pLsf(3) = (pLsf(3) | 0x50).toByte // joint stereo + intensity ext
    val e1 = intercept[UnsupportedOperationException](Mp3Codec.decode(pLsf))
    assert(e1.getMessage.contains("LSF intensity"))
    assert(Multimodal.MediaCodec.decodeSamples(pLsf).isEmpty)
  }

  test("MIXED MS+intensity: short anti-phase forces the long half onto mid/side") {
    // mode_extension 3 on mixed granules. Short half: an ANTI-PHASE
    // tone at bin 20 (short band 3) — the suffix rule must push its
    // band (and everything under it in its windows) onto the pos-7
    // mid/side fallback, which in turn forces the ENTIRE long half
    // onto mid/side (the decoder can only reach a long bound once the
    // right short half is silent) — and an in-phase pair at bin 44
    // (short band 6, well above) at the position-4 angle, which stays
    // in the suffix intensity region. Long half: a shared tone at
    // bin 5 must survive the matrix on both channels.
    val shared = tone(5, 2304, 5000.0)
    val hiL = tone(44, 2304, 6000.0)
    val hiR = tone(44, 2304, 6000.0 / math.sqrt(3.0))
    val anti = tone(20, 2304, 4000.0)
    val l = Array.tabulate(2304)(i => shared(i) + hiL(i) + anti(i))
    val r = Array.tabulate(2304)(i => shared(i) + hiR(i) - anti(i))
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100,
      intensityBand = 2, blockMode = "mixed", msBelow = true)
    assert(((bytes(3) >> 4) & 3) == 3, "mode_extension must be MS+intensity")
    assert(Mp3Codec.granuleBlockTypes(bytes).forall(_ == 2))
    val dec = Mp3Codec.decode(bytes).get
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    def amp(s: Array[Double], k: Int): (Double, Double) = {
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < 1024) {
        val a = 2 * math.Pi * k * i / 256.0
        re += s(i) * math.cos(a); im += s(i) * math.sin(a)
        i += 1
      }
      (re, im)
    }
    def mag(ri: (Double, Double)) = math.hypot(ri._1, ri._2)
    // the long-half shared tone survives the forced mid/side matrix
    assert(mag(amp(chans(0), 5)) > 1000 * 512,
      "long-half shared tone survives the matrix")
    // the in-phase pair above the fallback keeps its intensity angle
    val ratio44 = mag(amp(chans(0), 44)) / mag(amp(chans(1), 44))
    assert(math.abs(ratio44 - math.sqrt(3.0)) < 0.3,
      s"intensity ratio sqrt(3) expected, got $ratio44")
    // the anti-phase short tone survives IN ANTI-PHASE
    val (lr, li) = amp(chans(0), 20)
    val (rr2, ri2) = amp(chans(1), 20)
    assert(lr * rr2 + li * ri2 < 0,
      "anti-phase tone must stay anti-phase through the MS fallback")
    assert(mag(amp(chans(0), 20)) > 0.3 * 4000 * 512,
      "anti-phase tone magnitude survives")
  }

  test("MIXED-block intensity round trip: long half below the seam, windows above") {
    // three tones spanning the mixed layout: k=1 (long band 1, BELOW
    // the bound — right anchor codes independently), k=5 (long bands
    // 5-6, in the long intensity half at the exact position-4 ratio
    // tan(60°) = √3) and k=20 (short band 3 per window, position-5
    // ratio tan(75°)). The decoder must split both intensity tones
    // back by their positions and keep the anchor on the right.
    val l = Array.tabulate(2304) { i =>
      tone(5, 2304, 6000.0)(i) + tone(20, 2304, 9000.0)(i)
    }
    val r = Array.tabulate(2304) { i =>
      tone(1, 2304, 3000.0)(i) +
        tone(5, 2304, 6000.0 / math.sqrt(3.0))(i) +
        tone(20, 2304, 9000.0 / math.tan(5 * math.Pi / 12))(i)
    }
    val bytes = Mp3Codec.encodeStereoIntensity(l, r, 44100,
      intensityBand = 2, blockMode = "mixed")
    assert(((bytes(3) >> 6) & 3) == 1, "mode must be joint stereo (1)")
    assert(((bytes(3) >> 4) & 3) == 1, "mode_extension must be intensity")
    assert(Mp3Codec.granuleBlockTypes(bytes).forall(_ == 2))
    val dec = Mp3Codec.decode(bytes).get
    assert(dec.channels == 2 && dec.sampleRate == 44100)
    val chans = deinterleave(dec.samples.drop(2 * Mp3Codec.LeadingSkip), 2)
    assert(peakBin(chans(0), 256) == 20, "left short-half tone dominates")
    // right: split k=5 at 6000/√3 ≈ 3464 outweighs the 3000 anchor
    assert(peakBin(chans(1), 256) == 5, "right peak is the split long tone")
    def amp(s: Array[Double], k: Int): Double = {
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < 1024) {
        val a = 2 * math.Pi * k * i / 256.0
        re += s(i) * math.cos(a); im += s(i) * math.sin(a)
        i += 1
      }
      math.hypot(re, im)
    }
    // the long-half position survives: the k=5 channel ratio is √3
    val ratioL = amp(chans(0), 5) / amp(chans(1), 5)
    assert(math.abs(ratioL - math.sqrt(3.0)) < 0.25,
      s"long-half intensity ratio √3 expected, got $ratioL")
    // the short-half position survives: k=20 ratio is tan(75°)
    val ratioS = amp(chans(0), 20) / amp(chans(1), 20)
    assert(math.abs(ratioS - math.tan(5 * math.Pi / 12)) < 0.6,
      s"short-half intensity ratio tan75° expected, got $ratioS")
    // the right anchor below the bound stays right-only
    assert(amp(chans(1), 1) > 4 * amp(chans(0), 1),
      "below-bound anchor must stay on the right channel")
  }
}
