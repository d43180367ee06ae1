package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: bytes + base64 metadata without decode") {
    val withBin = Multimodal.withBinaryPayload(
      Seq((1L, "héllo")).toDF("id", "txt"), "txt", "payload")
    val meta = Multimodal.payloadMetadata(withBin, "id", "payload").head()
    assert(meta.getInt(1) == 6) // é is 2 UTF-8 bytes
    assert(meta.getString(2) == "aMOpbGxv")
  }

  test("sniffImageMeta parses real PNG/JPEG/GIF headers byte-for-byte") {
    import Multimodal.MediaCodec.sniffImageMeta
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR, 640×480
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 0x0d, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 2, 0, 0, 0)
    assert(sniffImageMeta(png).contains(("png", 640, 480)))
    // JPEG: APP0 (JFIF) then SOF0, 320×200 (height first in the frame)
    val jpeg = b(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc0, 0x00, 0x11, 8, 0x00, 0xc8, 0x01, 0x40, 3)
    assert(sniffImageMeta(jpeg).contains(("jpeg", 320, 200)))
    // progressive JPEG uses SOF2 — same frame layout
    val prog = jpeg.updated(21, 0xc2.toByte)
    assert(sniffImageMeta(prog).contains(("jpeg", 320, 200)))
    // GIF89a logical screen 12×34 (little-endian)
    val gif = b('G', 'I', 'F', '8', '9', 'a', 12, 0, 34, 0, 0, 0)
    assert(sniffImageMeta(gif).contains(("gif", 12, 34)))
    // unknown magic, truncated buffers, and a broken marker chain are
    // None, never an exception
    assert(sniffImageMeta("plain text".getBytes).isEmpty)
    assert(sniffImageMeta(png.take(20)).isEmpty)
    assert(sniffImageMeta(b(0xff, 0xd8, 0x00, 0x01)).isEmpty)
    assert(sniffImageMeta(b(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00)).isEmpty)
    assert(sniffImageMeta(Array.emptyByteArray).isEmpty)
  }

  test("imageMeta maps partitions through the sniffer with null passthrough") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val gif = b('G', 'I', 'F', '8', '9', 'a', 7, 0, 9, 0, 0, 0)
    val rows = Seq((1L, gif), (2L, "nope".getBytes),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val got = Multimodal.imageMeta(rows, "doc_id", "payload")
      .as[(Long, Option[String], Option[Int], Option[Int])]
      .collect().toSet
    assert(got == Set(
      (1L, Some("gif"), Some(7), Some(9)),
      (2L, None, None, None),
      (3L, None, None, None)))
  }

  test("stubbed decode is deterministic and batch-shaped") {
    val docs = Tables.documents(spark, sf).limit(20)
    val withBin = Multimodal.withBinaryPayload(docs, "text", "payload")
    val f1 = Multimodal.extractFeatures(withBin, "doc_id", "payload",
        allowStub = true)
      .orderBy("id").collect().toSeq
    val f2 = Multimodal.extractFeatures(withBin, "doc_id", "payload",
        allowStub = true)
      .orderBy("id").collect().toSeq
    assert(f1 == f2) // same payload bytes → same fake features
    assert(f1.forall(r => r.getInt(1) >= 16 && r.getInt(3) >= 1))
    // default-off: the stub THROWS rather than emit trainable fakes
    val e = intercept[Exception] {
      Multimodal.extractFeatures(withBin, "doc_id", "payload").collect()
    }
    assert(e.toString.contains("FAKES") ||
      Option(e.getCause).exists(_.toString.contains("FAKES")), e)
  }

  test("stub hash matches DuckDB md5_number_lower (oracle parity)") {
    // duckdb: SELECT md5_number_lower('abc') → 8250560606382298838
    assert(Multimodal.MediaCodec.md5Lower("abc".getBytes("UTF-8")) ==
      8250560606382298838L)
    // unsigned-math feature derivation stays in the documented ranges
    val (w, h, f, cs) = Multimodal.MediaCodec.decodeStub(
      "abc".getBytes("UTF-8"), allowStub = true)
    assert(w >= 16 && w < 80 && h >= 16 && h < 80 && f >= 1 && f <= 8 && cs >= 0)
  }

  test("frame sampling yields every k-th index within n_frames") {
    val docs = Tables.documents(spark, sf).limit(5)
    val features = Multimodal.extractFeatures(
      Multimodal.withBinaryPayload(docs, "text", "payload"), "doc_id",
      "payload", allowStub = true)
    val sampled = Multimodal.sampleFrameIndexes(features, every = 2)
      .select("n_frames", "sampled_frames")
      .as[(Int, Seq[Long])].collect()
    sampled.foreach { case (n, frames) =>
      assert(frames == (0 until n by 2).map(_.toLong))
    }
  }

  test("utteranceSegments: gaps-and-islands over VAD frames") {
    val frames = Seq(
      // id 1: actives {0,1,2, 5, 7} -> islands (0-2), (5-5), (7-7)
      (1L, 0, true), (1L, 1, true), (1L, 2, true), (1L, 3, false),
      (1L, 4, false), (1L, 5, true), (1L, 6, false), (1L, 7, true),
      // id 2: silence only -> no utterances
      (2L, 0, false), (2L, 1, false)
    ).toDF("id", "frame_idx", "active")
    val out = Multimodal.utteranceSegments(frames, "id", "frame_idx",
        "active")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0, 0, 2, 3), (1L, 1, 5, 5, 1), (1L, 2, 7, 7, 1)))
  }

  test("videoFrameHashes + nearDuplicateVideos: clip-level near-dup") {
    // clips A, B: same 2-frame pattern, different pixel noise -> dup;
    // clip C: same anchor frame as A but different second frame -> the
    // anchor-band candidate must DIE in the all-frames verify;
    // clip D: same frames as A but only ONE frame -> count mismatch
    def frame(bright: Int => Boolean, noise: Int): Seq[Int] =
      (0 until 256).map { px =>
        val cell = (px / 32) * 8 + (px % 16) / 2
        if (bright(cell)) 255 - ((cell + noise) % 8)
        else (cell + noise) % 8
      }
    val p1 = (c: Int) => c % 3 == 0
    val p2 = (c: Int) => c % 5 < 2
    val p3 = (c: Int) => c % 7 < 3
    val clips = Seq(
      (1L, Seq(frame(p1, 0), frame(p2, 0)), 16),
      (2L, Seq(frame(p1, 3), frame(p2, 5)), 16),
      (3L, Seq(frame(p1, 1), frame(p3, 0)), 16),
      (4L, Seq(frame(p1, 2)), 16)
    ).toDF("id", "frames", "w")
    val avi = Multimodal.encodeAviMjpeg(clips, "id", "frames", "w", fps = 5)
    val hashes = Multimodal.videoFrameHashes(avi, "id", "payload")
    assert(hashes.count() == 7) // 2+2+2+1 frames
    val pairs = Multimodal.nearDuplicateVideos(hashes, "id", "frame_idx",
        "ahash", 3)
      .as[(Long, Long, Int, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 2, 0)), s"got $pairs")
  }

  test("resizeImages + imagePatches: vision preprocessing on real pixels") {
    // 4×4 image with known quadrant values -> 2×2 patches hit them exactly
    val quads = Seq((1L, Seq(
      10, 10, 200, 200,
      10, 10, 200, 200,
      60, 60, 130, 130,
      60, 60, 130, 130), 4)).toDF("id", "pixels", "w")
    val png = Multimodal.encodePng(quads, "id", "pixels", "w")
    val patches = Multimodal.imagePatches(png, "id", "payload", 2)
      .as[(Long, Int, Int, Int, Double)].collect().sortBy(_._2)
    assert(patches.map(p => (p._2, p._3, p._4, p._5)).toSeq == Seq(
      (0, 0, 0, 10.0), (1, 0, 1, 200.0), (2, 1, 0, 60.0), (3, 1, 1, 130.0)))
    // non-dividing patch size -> zero rows (config error, not data)
    assert(Multimodal.imagePatches(png, "id", "payload", 3).count() == 0)
    // resize: constant image stays exactly constant at any target size
    val const = Multimodal.encodePng(
      Seq((2L, Seq.fill(256)(77), 16)).toDF("id", "pixels", "w"),
      "id", "pixels", "w")
    val resized = Multimodal.decodeImages(
      Multimodal.resizeImages(const, "id", "payload", 5, 3), "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long])]
      .head()
    assert(resized == ((2L, Some(5), Some(3), Some(77.0), resized._5)))
    // poison: garbage payload -> null resize payload
    assert(Multimodal.resizeImages(
      Seq((3L, Array[Byte](1, 2))).toDF("id", "payload"),
      "id", "payload", 4, 4)
      .filter(col("payload").isNotNull).count() == 0)
  }

  test("decodeImages: REAL JDK codec decode of generated PNG/JPEG bytes") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // solid mid-gray 8×4: every pixel luma exactly 128
    val gray = png(8, 4)((_, _) => 0x808080)
    // black/white checkerboard 4×4: mean luma (8·0 + 8·255)/16 = 127.5
    val checker = png(4, 4)((x, y) =>
      if ((x + y) % 2 == 0) 0x000000 else 0xffffff)
    val rows = Seq((1L, gray), (2L, checker), (3L, Array[Byte](1, 2, 3)),
      (4L, null)).toDF("id", "payload")
    val out = Multimodal.decodeImages(rows, "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, Some(8), Some(4), Some(128.0), out(1L)._5)))
    assert(out(1L)._5.nonEmpty)
    assert(out(2L)._2 == Some(4) && out(2L)._4 == Some(127.5))
    // PNG roundtrip is lossless → the pixel CRC is reproducible
    assert(Multimodal.decodeImages(rows, "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r._5).toMap == out.map(kv => kv._1 -> kv._2._5))
    // garbage and null payloads yield null fields, not task failure
    assert(out(3L) == ((3L, None, None, None, None)))
    assert(out(4L) == ((4L, None, None, None, None)))
    // JPEG decodes through the same path (lossy → only dims asserted)
    val jout = new java.io.ByteArrayOutputStream()
    ImageIO.write(new BufferedImage(6, 3, BufferedImage.TYPE_INT_RGB),
      "jpg", jout)
    val j = Multimodal.decodeImages(
      Seq((9L, jout.toByteArray)).toDF("id", "payload"), "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long])]
      .head()
    assert(j._2 == Some(6) && j._3 == Some(3))
  }

  test("aHash near-dup: container-invariant, small-edit tolerant, banded") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def img(w: Int, h: Int, fmt: String)(pixel: (Int, Int) => Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, pixel(x, y))
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(im, fmt, out)
      out.toByteArray
    }
    // a 16×16 half-dark half-bright pattern
    def base(x: Int, y: Int): Int = if (x < 8) 0x202020 else 0xe0e0e0
    val png = img(16, 16, "png")(base)
    val bmp = img(16, 16, "bmp")(base) // same pixels, other container
    // one corner cell flipped — a small edit
    val edited = img(16, 16, "png")((x, y) =>
      if (x < 2 && y < 2) 0xe0e0e0 else base(x, y))
    // visually different (inverted)
    val other = img(16, 16, "png")((x, y) => if (x < 8) 0xe0e0e0 else 0x202020)
    val hashes = Multimodal.imageHashes(
      Seq((1L, png), (2L, bmp), (3L, edited), (4L, other),
        (5L, Array[Byte](9, 9))).toDF("id", "payload"), "id", "payload")
    val hs = hashes.as[(Long, Option[Long])].collect().toMap
    assert(hs(1L) == hs(2L), "same pixels must hash identically across containers")
    assert(hs(5L).isEmpty)
    val pairs = Multimodal.nearDuplicateImages(hashes, "id", "ahash",
        maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs((1L, 2L)), "exact pixel dup pair missing")
    assert(pairs((1L, 3L)) && pairs((2L, 3L)), "small edit should pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"inverted image must not pair: $pairs")
    // wider budgets (narrower bands, multi-index hashing) keep exact
    // recall: the small-edit pair still surfaces at maxHamming = 9
    val wide = Multimodal.nearDuplicateImages(hashes, "id", "ahash", 9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wide((1L, 2L)) && wide((1L, 3L)),
      s"wide-budget pairs missing: $wide")
    intercept[IllegalArgumentException] {
      Multimodal.nearDuplicateImages(hashes, "id", "ahash", 16)
    }
  }

  test("sniffVideoMeta: mp4 box walk reads duration without decoding") {
    import java.nio.ByteBuffer
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(name.getBytes("US-ASCII")); b.put(payload); b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0))
    // mvhd v0: version+flags, creation, modification, timescale=1000,
    // duration=2500 → 2.5 s
    val mvhd0 = ByteBuffer.allocate(20)
      .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(2500).array()
    val mp4 = ftyp ++ box("moov", box("mvhd", mvhd0))
    assert(Multimodal.MediaCodec.sniffVideoMeta(mp4) ==
      Some(("mp4", 2.5)))
    // v1 layout: 64-bit duration at the deeper offsets
    val mvhd1 = ByteBuffer.allocate(32)
      .putInt(0x01000000).putLong(0L).putLong(0L)
      .putInt(600).putLong(1800L).array()
    val mp4v1 = ftyp ++ box("moov", box("mvhd", mvhd1))
    assert(Multimodal.MediaCodec.sniffVideoMeta(mp4v1) ==
      Some(("mp4", 3.0)))
    // garbage / truncated / non-mp4 stay None
    assert(Multimodal.MediaCodec.sniffVideoMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.MediaCodec.sniffVideoMeta(ftyp).isEmpty) // no moov
    assert(Multimodal.MediaCodec.sniffVideoMeta(
      ftyp ++ box("moov", Array.empty[Byte])).isEmpty) // no mvhd
    // the DataFrame wrapper maps partitions with null passthrough
    assert(Multimodal.videoMeta(
      Seq((1L, mp4), (2L, Array[Byte](7))).toDF("id", "payload"),
      "id", "payload").as[(Long, Option[String], Option[Double])]
      .collect().toSet ==
      Set((1L, Some("mp4"), Some(2.5)), (2L, None, None)))
  }

  test("sniffEbmlMeta: mkv/webm EBML walk reads duration and track types") {
    // hand-built EBML: 1-byte size VINTs (0x80|n), class IDs verbatim
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127)
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    val ebmlId = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)
    val docTypeId = Array(0x42, 0x82).map(_.toByte)
    val segmentId = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
    val infoId = Array(0x15, 0x49, 0xA9, 0x66).map(_.toByte)
    val scaleId = Array(0x2A, 0xD7, 0xB1).map(_.toByte)
    val durId = Array(0x44, 0x89).map(_.toByte)
    val tracksId = Array(0x16, 0x54, 0xAE, 0x6B).map(_.toByte)
    val entryId = Array(0xAE).map(_.toByte)
    val typeId = Array(0x83).map(_.toByte)
    def f64(v: Double): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putDouble(v).array()
    def mk(docType: String, scaleNs: Long, durTicks: Double,
        types: Seq[Int]): Array[Byte] = {
      val header = el(ebmlId, el(docTypeId, docType.getBytes("US-ASCII")))
      val info = el(infoId,
        el(scaleId, java.nio.ByteBuffer.allocate(8).putLong(scaleNs)
          .array().drop(4)) ++ el(durId, f64(durTicks)))
      val tracks = el(tracksId,
        types.flatMap(t => el(entryId, el(typeId, Array(t.toByte)))).toArray)
      header ++ el(segmentId, info ++ tracks)
    }
    import Multimodal.MediaCodec.sniffEbmlMeta
    // 1e9 ns ticks: duration ticks ARE seconds
    assert(sniffEbmlMeta(mk("matroska", 1000000000L, 42.0, Seq(1, 2))) ==
      Some(("mkv", 42.0, true, true)))
    assert(sniffEbmlMeta(mk("webm", 1000000000L, 3.5, Seq(1))) ==
      Some(("webm", 3.5, true, false)))
    // default-scale ticks (1 ms): 2500 ticks -> 2.5 s without a scale el
    val noScale = el(ebmlId, el(docTypeId, "webm".getBytes("US-ASCII"))) ++
      el(segmentId, el(infoId, el(durId, f64(2500.0))))
    assert(sniffEbmlMeta(noScale) == Some(("webm", 2.5, false, false)))
    // unknown-size Segment (all-ones VINT) extends to the buffer end
    val body = el(infoId,
      el(scaleId, Array(0x3B, 0x9A, 0xCA, 0x00).map(_.toByte)) ++
        el(durId, f64(7.0)))
    val unk = el(ebmlId, el(docTypeId, "matroska".getBytes("US-ASCII"))) ++
      segmentId ++ Array(0xFF.toByte) ++ body
    assert(sniffEbmlMeta(unk) == Some(("mkv", 7.0, false, false)))
    // garbage / truncated / wrong doctype / no duration stay None
    assert(sniffEbmlMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(sniffEbmlMeta(mk("matroska", 1000000000L, 5.0, Seq(1))
      .dropRight(6)).isEmpty)
    assert(sniffEbmlMeta(mk("avi", 1000000000L, 5.0, Seq(1))).isEmpty)
    assert(sniffEbmlMeta(el(ebmlId,
      el(docTypeId, "webm".getBytes("US-ASCII"))) ++
      el(segmentId, el(infoId, Array.empty[Byte]))).isEmpty)
    // hostile declared size ≥ 2^31 whose LOW 32 BITS are small: an Int
    // bound check would truncate (2^32 + payloadLen → payloadLen) and
    // misparse the corrupt segment as valid; the Long check rejects it
    val body8 = el(infoId,
      el(scaleId, Array(0x3B, 0x9A, 0xCA, 0x00).map(_.toByte)) ++
        el(durId, f64(7.0)))
    val hostileSz = (1L << 32) + body8.length
    val hostileVint = Array(0x01.toByte) ++
      (6 to 0 by -1).map(i => ((hostileSz >> (8 * i)) & 0xff).toByte)
    val hostile = el(ebmlId, el(docTypeId, "matroska".getBytes("US-ASCII"))) ++
      segmentId ++ hostileVint ++ body8
    assert(sniffEbmlMeta(hostile).isEmpty)
    // the DataFrame wrapper maps partitions with null passthrough
    assert(Multimodal.ebmlMeta(
      Seq((1L, mk("webm", 1000000000L, 9.0, Seq(2))),
        (2L, Array[Byte](7))).toDF("id", "payload"),
      "id", "payload")
      .as[(Long, Option[String], Option[Double], Option[Boolean], Option[Boolean])]
      .collect().toSet ==
      Set((1L, Some("webm"), Some(9.0), Some(false), Some(true)),
        (2L, None, None, None, None)))
  }

  test("sniffCompressedAudioMeta: MP3/ADTS frame walk without a codec") {
    import Multimodal.MediaCodec.sniffCompressedAudioMeta
    // MPEG-1 Layer III, 128 kbps @ 44100, no padding → 417-byte frames
    val mp3Frame = Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
      Array.fill[Byte](413)(0x11)
    def mp3(n: Int) = Array.fill(n)(mp3Frame).flatten
    assert(sniffCompressedAudioMeta(mp3(3)) ==
      Some(("mp3", 44100, 3L, 3 * 1152.0 / 44100)))
    // trailing garbage ends the walk; counted frames stand
    assert(sniffCompressedAudioMeta(mp3(2) ++ Array[Byte](1, 2, 3)) ==
      Some(("mp3", 44100, 2L, 2 * 1152.0 / 44100)))
    // a truncated final frame is not counted
    assert(sniffCompressedAudioMeta(mp3(2).dropRight(10)) ==
      Some(("mp3", 44100, 1L, 1152.0 / 44100)))
    // ADTS AAC LC @ 44100, 107-byte frames (length encoded in header)
    val aacFrame = Array(0xFF, 0xF1, 0x50, 0x80, 0x0D, 0x7F, 0xFC)
      .map(_.toByte) ++ Array.fill[Byte](100)(0x22)
    def aac(n: Int) = Array.fill(n)(aacFrame).flatten
    assert(sniffCompressedAudioMeta(aac(4)) ==
      Some(("aac", 44100, 4L, 4 * 1024.0 / 44100)))
    // negatives: garbage, reserved bitrate index, reserved rate index
    assert(sniffCompressedAudioMeta("hello".getBytes).isEmpty)
    assert(sniffCompressedAudioMeta(
      Array(0xFF, 0xFB, 0xF0, 0x00).map(_.toByte)).isEmpty)
    assert(sniffCompressedAudioMeta(
      Array(0xFF, 0xFB, 0x9C, 0x00).map(_.toByte)).isEmpty)
    // DataFrame wrapper with null passthrough
    assert(Multimodal.compressedAudioMeta(
      Seq((1L, aac(2)), (2L, Array[Byte](9))).toDF("id", "payload"),
      "id", "payload")
      .as[(Long, Option[String], Option[Int], Option[Long], Option[Double])]
      .collect().toSet ==
      Set((1L, Some("aac"), Some(44100), Some(2L),
        Some(2 * 1024.0 / 44100)), (2L, None, None, None, None)))
  }

  test("sniffContainerAudioMeta: FLAC STREAMINFO and Ogg Opus/Vorbis pages") {
    import Multimodal.MediaCodec.sniffContainerAudioMeta

    def flac(rate: Int, channels: Int, total: Long): Array[Byte] = {
      val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
        (15L << 36) | total // bps-1 = 15 (16-bit)
      "fLaC".getBytes("US-ASCII") ++
        Array[Byte](0x80.toByte, 0, 0, 34) ++ // last-block flag, STREAMINFO, len 34
        Array[Byte](0x10, 0, 0x10, 0) ++ Array.fill[Byte](6)(0) ++ // block/frame sizes
        (7 to 0 by -1).map(i => ((packed >> (8 * i)) & 0xff).toByte).toArray ++
        Array.fill[Byte](16)(0) // md5
    }
    assert(sniffContainerAudioMeta(flac(44100, 2, 44100L * 3)) ==
      Some(("flac", 44100, 2, 132300L, 3.0)))
    assert(sniffContainerAudioMeta(flac(0, 2, 100)).isEmpty) // rate 0 invalid

    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def oggPage(tpe: Int, granule: Long, serial: Long, seq: Long,
        body: Array[Byte]): Array[Byte] = {
      require(body.length < 255)
      "OggS".getBytes("US-ASCII") ++ Array(0.toByte, tpe.toByte) ++
        le(granule, 8) ++ le(serial, 4) ++ le(seq, 4) ++ le(0, 4) ++
        Array(1.toByte, body.length.toByte) ++ body
    }
    val opusHead = "OpusHead".getBytes("US-ASCII") ++
      Array(1.toByte, 2.toByte) ++ le(312, 2) ++ le(48000, 4) ++
      le(0, 2) ++ Array(0.toByte)
    val opus = oggPage(2, 0, 7, 0, opusHead) ++
      oggPage(0, 312 + 9600, 7, 1, Array[Byte](0x55)) ++
      oggPage(4, 312 + 19200, 7, 2, Array[Byte](0x66))
    assert(sniffContainerAudioMeta(opus) ==
      Some(("opus", 48000, 2, 19200L, 0.4)))
    // truncated tail: the last full page's granule wins
    assert(sniffContainerAudioMeta(opus.dropRight(3)) ==
      Some(("opus", 48000, 2, 9600L, 0.2)))
    // a -1 granule ("no packet ends here") is skipped, not used
    val opusMinus1 = oggPage(2, 0, 7, 0, opusHead) ++
      oggPage(0, 312 + 4800, 7, 1, Array[Byte](0x55)) ++
      oggPage(4, -1L, 7, 2, Array[Byte](0x66))
    assert(sniffContainerAudioMeta(opusMinus1) ==
      Some(("opus", 48000, 2, 4800L, 0.1)))

    val vorbisId = Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      le(0, 4) ++ Array(2.toByte) ++ le(22050, 4) ++
      le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ Array(0xB8.toByte, 1.toByte)
    val vorbis = oggPage(2, 0, 9, 0, vorbisId) ++
      oggPage(4, 22050, 9, 1, Array[Byte](0x11))
    assert(sniffContainerAudioMeta(vorbis) ==
      Some(("vorbis", 22050, 2, 22050L, 1.0)))

    // garbage / truncated header / foreign codec all None
    assert(sniffContainerAudioMeta("nope".getBytes("US-ASCII")).isEmpty)
    assert(sniffContainerAudioMeta(flac(44100, 2, 100).take(20)).isEmpty)
    assert(sniffContainerAudioMeta(
      oggPage(2, 0, 7, 0, "Speex   ".getBytes("US-ASCII"))).isEmpty)

    // DataFrame wrapper: null passthrough + schema
    assert(Multimodal.containerAudioMeta(
      Seq((1L, flac(8000, 1, 8000L)), (2L, Array[Byte](7))).toDF("id", "payload"),
      "id", "payload")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Long], Option[Double])]
      .collect().toSet ==
      Set((1L, Some("flac"), Some(8000), Some(1), Some(8000L), Some(1.0)),
        (2L, None, None, None, None, None)))
  }

  test("decodeAudioFeatures: REAL WAV PCM parse with exact RMS") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short], rate: Float = 8000f): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // constant ±1000 square wave → RMS exactly 1000
    val square = wav(Array.tabulate(64)(i =>
      if (i % 2 == 0) 1000.toShort else (-1000).toShort))
    val silent = wav(Array.fill(32)(0.toShort))
    val out = Multimodal.decodeAudioFeatures(
      Seq((1L, square), (2L, silent), (3L, Array[Byte](1, 2)))
        .toDF("id", "payload"), "id", "payload")
      .as[(Long, Option[Float], Option[Int], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, Some(8000f), Some(1), Some(64L), Some(1000.0))))
    assert(out(2L)._5 == Some(0.0))
    assert(out(3L) == ((3L, None, None, None, None)))
  }

  test("fft + audioSpectrum: known tones land on their exact bins") {
    import Multimodal.MediaCodec.fft
    // impulse -> flat unit spectrum
    val re = new Array[Double](8); val im = new Array[Double](8)
    re(0) = 1.0
    fft(re, im)
    (0 until 8).foreach { b =>
      assert(math.abs(re(b) - 1.0) < 1e-12 && math.abs(im(b)) < 1e-12)
    }
    // pure cosine at bin 3 of 16: X[3] = X[13] = N/2, everything else ~0
    val cr = Array.tabulate(16)(n => math.cos(2 * math.Pi * 3 * n / 16))
    val ci = new Array[Double](16)
    fft(cr, ci)
    assert(math.abs(cr(3) - 8.0) < 1e-9 && math.abs(cr(13) - 8.0) < 1e-9)
    assert(math.abs(cr(5)) < 1e-9 && math.abs(ci(5)) < 1e-9)
    // end-to-end over the FLAC decode path: tone at bin 7 of 256
    val pcm = Seq((1L, (0 until 256).map(n =>
      math.round(1000 * math.sin(2 * math.Pi * 7 * n / 256)).toInt)))
      .toDF("id", "samples")
    val enc = Multimodal.encodeFlac(pcm, "id", "samples", 8000)
    val out = Multimodal.audioSpectrum(enc, "id", "payload", 256)
      .as[(Long, Option[Float], Option[Int], Option[Long])].head()
    assert(out == ((1L, Some(8000f), Some(7), Some(256L))))
    // undecodable payload -> nulls, not failure
    val bad = Multimodal.audioSpectrum(
      Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "payload"), "id", "payload")
      .as[(Long, Option[Float], Option[Int], Option[Long])].head()
    assert(bad == ((2L, None, None, None)))
  }

  test("G.711 µ-law: real compressed roundtrip through the JDK codec") {
    import Multimodal.MediaCodec.{muLawEncode, wrapWavMuLaw, decodeSamples}
    // golden µ-law codes (ITU G.711 table values)
    assert(muLawEncode(0) == 0xff.toByte)       // +0 -> 0xFF
    assert(muLawEncode(-1) == 0x7f.toByte)      // smallest negative
    assert(muLawEncode(32767) == 0x80.toByte)   // +max -> 0x80
    assert(muLawEncode(-32768) == 0x00.toByte)  // -max -> 0x00
    // roundtrip: decoded sample within the segment's quantization step
    val xs = Array(-20000, -1234, -5, 0, 7, 99, 1500, 20000, 32000)
    val wav = wrapWavMuLaw(xs.map(muLawEncode), 8000)
    val Some((rate, decoded)) = decodeSamples(wav)
    assert(rate == 8000f && decoded.length == xs.length)
    xs.zip(decoded).foreach { case (orig, dec) =>
      // µ-law segment width grows with magnitude: error < max(|x|/16, 36)
      val tol = math.max(math.abs(orig) / 16.0, 36.0)
      assert(math.abs(dec - orig) <= tol, s"mu-law $orig -> $dec")
    }
    // end-to-end spectral gate shape: tone at bin 9 survives companding
    val pcm = Seq((1L, (0 until 256).map(n =>
      math.round(8000 * math.sin(2 * math.Pi * 9 * n / 256)).toInt)))
      .toDF("id", "samples")
    val out = Multimodal.audioSpectrum(
      Multimodal.encodeG711(pcm, "id", "samples", 8000), "id", "payload", 256)
      .as[(Long, Option[Float], Option[Int], Option[Long])].head()
    assert(out == ((1L, Some(8000f), Some(9), Some(256L))))
  }

  test("videoFrames: REAL MJPEG-in-AVI frame decode through the JDK codec") {
    // three 16×8 constant-gray frames; JPEG quantizes the DC but a
    // uniform image decodes within a few luma steps of the original
    val frames = Seq(40, 120, 220).map(v => (0 until 128).map(_ => v))
    val df = Seq((1L, frames, 16)).toDF("id", "frames", "w")
    val avi = Multimodal.encodeAviMjpeg(df, "id", "frames", "w", fps = 5)
    val out = Multimodal.videoFrames(avi, "id", "payload")
      .as[(Long, Int, Int, Int, Double)].collect().sortBy(_._2)
    assert(out.length == 3)
    out.zip(Seq(40, 120, 220)).foreach { case ((_, idx, w, h, luma), v) =>
      assert(w == 16 && h == 8, s"frame $idx dims $w x $h")
      assert(math.abs(luma - v) <= 4.0, s"frame $idx luma $luma vs $v")
    }
    // garbage payload -> zero rows; malformed frame list -> null payload
    assert(Multimodal.videoFrames(
      Seq((2L, Array[Byte](9, 9, 9))).toDF("id", "payload"),
      "id", "payload").count() == 0)
    val bad = Seq((3L, Seq(Seq(1, 2, 3)), 2)).toDF("id", "frames", "w")
    assert(Multimodal.encodeAviMjpeg(bad, "id", "frames", "w")
      .filter(col("payload").isNotNull).count() == 0)
  }

  test("IMA ADPCM: 4-bit predictive roundtrip, own decoder, every gate tone") {
    import Multimodal.MediaCodec._
    // block roundtrip: decoded within the adaptive quantizer's error
    val xs = (0 until 200).map(n =>
      (6000 * math.sin(2 * math.Pi * 5 * n / 200)).toInt).toArray
    val wav = wrapWavIma(imaAdpcmEncodeBlock(xs), xs.length, 8000)
    val Some((rate, dec)) = decodeSamples(wav)
    assert(rate == 8000f && dec.length == xs.length)
    // after the ~11-sample adaptation ramp the tracker stays within a
    // few step sizes of the signal
    val tail = xs.drop(30).zip(dec.drop(30))
    val maxErr = tail.map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 1500, s"ADPCM tracking error $maxErr")
    // the x_audio_adpcm gate contract: every planted tone k = 1..30
    // keeps its FFT peak through the codec
    (1 to 30).foreach { k =>
      val tone = (0 until 256).map(n =>
        math.round(8000 * math.sin(2 * math.Pi * k * n / 256)).toInt).toArray
      val w = wrapWavIma(imaAdpcmEncodeBlock(tone), 256, 8000)
      val pk = spectralPeak(w, 256)
      assert(pk.exists(_._2 == k), s"tone $k: peak ${pk.map(_._2)}")
    }
    // non-IMA payloads fall through to the other decoders untouched
    assert(decodeWavIma("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("MP3: own Layer III codec wired through every audio entry point") {
    import Multimodal.MediaCodec._
    // the x_audio_mp3 gate contract: every planted tone k = 1..30 keeps
    // its FFT peak through the full lossy loop (encode -> frame/side
    // info/Huffman parse -> requantize -> IMDCT -> synthesis)
    (1 to 30).foreach { k =>
      val tone = (0 until 2304).map(n =>
        math.round(8000 * math.sin(2 * math.Pi * k * n / 256)).toInt).toArray
      val bytes = Mp3Codec.encode(tone, 44100)
      val pk = spectralPeak(bytes, 256)
      assert(pk.contains((44100f, k, 1152L)), s"tone $k: got $pk")
    }
    val tone7 = (0 until 2304).map(n =>
      math.round(8000 * math.sin(2 * math.Pi * 7 * n / 256)).toInt).toArray
    val bytes = Mp3Codec.encode(tone7, 44100)
    // decodeAudio: mono, post-skip length, live RMS
    val Some((rate, ch, n, rms)) = decodeAudio(bytes)
    assert(rate == 44100f && ch == 1 && n == 1152L && rms > 1000)
    // the codec-free sniffer walks our frames like any other MP3
    val Some((fmt, sr, frames, dur)) = sniffCompressedAudioMeta(bytes)
    assert(fmt == "mp3" && sr == 44100 && frames == 2)
    assert(math.abs(dur - 2 * 1152.0 / 44100) < 1e-9)
    // truncation drops the partial frame; junk stays undecodable
    assert(decodeSamples(bytes.take(bytes.length / 2))
      .forall(_._2.length % 1152 == 0))
    assert(decodeSamples(Array.fill[Byte](64)(0x55)).isEmpty)
    // the real third-party file (LSF + bit reservoir, vendored — see
    // resources/graft/thirdparty/README.md) decodes to exact silence;
    // the same bytes are driver-gated as x_audio_mp3_interop
    val goldIn = getClass.getResourceAsStream("/graft/thirdparty/lsf_stream.mp3")
    assert(goldIn != null, "vendored interop fixture missing")
    val gold =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var nr = goldIn.read(chunk)
        while (nr > 0) { buf.write(chunk, 0, nr); nr = goldIn.read(chunk) }
        buf.toByteArray
      } finally goldIn.close()
    val Some((gr, gs)) = decodeSamples(gold)
    assert(gr == 22050f && gs.length == 45 * 576 - Mp3Codec.LeadingSkip)
    assert(gs.forall(_ == 0.0))
  }

  test("decodeWavIma: hostile negative chunk size returns None, no hang") {
    import Multimodal.MediaCodec.decodeWavIma
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    // a signed read of 0xFFFFFFF8 is -8, which stops the chunk walk's
    // offset advancing — this payload used to hang the executor forever
    val hostile = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0xFFFFFFF8) ++ Array.fill(16)(0.toByte)
    assert(decodeWavIma(hostile).isEmpty)
    // a chunk whose size overruns the payload is rejected too
    val truncated = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32(1 << 20) ++ Array.fill(8)(0.toByte)
    assert(decodeWavIma(truncated).isEmpty)
  }

  test("video walks decode frames inside a 'rec ' grouping LIST") {
    import Multimodal.MediaCodec.decodeVideoFrames
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 8) img.setRGB(x, y, 0x787878)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    val pad = if (jpeg.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    val dc = "00dc".getBytes ++ le32(jpeg.length) ++ jpeg ++ pad
    // interleaved AVIs group frame chunks in LIST('rec ') inside movi
    val rec = "LIST".getBytes ++ le32(4 + dc.length) ++ "rec ".getBytes ++ dc
    val movi =
      "LIST".getBytes ++ le32(4 + rec.length) ++ "movi".getBytes ++ rec
    val body = "AVI ".getBytes ++ movi
    val avi = "RIFF".getBytes ++ le32(body.length) ++ body
    val Some(frames) = decodeVideoFrames(avi)
    assert(frames.length == 1 && frames.head._1 == 16 && frames.head._2 == 8)
    // the hash-walk twin sees the rec-wrapped frame too
    val hashed = Multimodal.videoFrameHashes(
      Seq((1L, avi)).toDF("id", "payload"), "id", "payload")
    assert(hashed.filter(col("ahash").isNotNull).count() == 1)
  }

  test("audioActivity: frame RMS VAD over the lossless path") {
    // 150 samples, frames of 64 -> 2 frames + dropped 22-sample tail;
    // frame 0 loud (constant 500), frame 1 near-silent (constant 3)
    val pcm = Seq((1L,
      (0 until 150).map(n => if (n < 64) 500 else 3))).toDF("id", "samples")
    val enc = Multimodal.encodeFlac(pcm, "id", "samples", 8000)
    val out = Multimodal.audioActivity(enc, "id", "payload", 64, 100.0)
      .as[(Long, Int, Int, Double, Boolean)].collect().sortBy(_._2)
    assert(out.length == 2)
    assert(out(0) == ((1L, 0, 64, 500.0, true)))
    assert(out(1) == ((1L, 1, 64, 3.0, false)))
    // boundary: rounded rms exactly at threshold counts as active
    val atEdge = Seq((2L, (0 until 64).map(_ => 100))).toDF("id", "samples")
    val edge = Multimodal.audioActivity(
      Multimodal.encodeFlac(atEdge, "id", "samples", 8000),
      "id", "payload", 64, 100.0)
      .as[(Long, Int, Int, Double, Boolean)].head()
    assert(edge._4 == 100.0 && edge._5)
    // undecodable payloads yield zero rows, not failure
    assert(Multimodal.audioActivity(
      Seq((3L, Array[Byte](1, 2))).toDF("id", "payload"),
      "id", "payload", 64, 100.0).count() == 0)
  }

  test("audioMfcc: mel filterbank + DCT-II cepstra over real decode") {
    import Multimodal.MediaCodec.{melEnergies, mfccFromMel}
    // a bin-7 tone at 8 kHz / 256-FFT = 218.75 Hz lands in mel filter 2
    // (of 10); tiny leakage elsewhere
    val tone = (0 until 256).map(n =>
      math.round(1000 * math.sin(2 * math.Pi * 7 * n / 256)).toDouble).toArray
    val e = melEnergies(tone, 8000, 256, 10)
    assert(e.indexOf(e.max) == 1, s"energies ${e.toSeq}")
    // the ADJACENT filter shares the tone (overlapping triangles); all
    // non-adjacent bands carry only rounding-noise leakage
    assert(e(1) > e(0), "argmax filter beats its overlap neighbor")
    val farLeak = e.drop(2).sum
    assert(e(1) > 1e6 * farLeak, s"non-adjacent leakage $farLeak")
    // DCT-II: uniform log energies -> c0 carries everything, c1.. ~ 0
    val flat = mfccFromMel(Array.fill(10)(math.E - 1e-10), 4)
    assert(math.abs(flat(0) - math.sqrt(2.0 / 10) * math.sqrt(0.5) * 10) < 1e-9)
    (1 until 4).foreach(c => assert(math.abs(flat(c)) < 1e-9))
    // operator end-to-end through FLAC; undecodable -> nulls
    val pcm = Seq((1L, (0 until 256).map(n =>
      math.round(1000 * math.sin(2 * math.Pi * 7 * n / 256)).toInt)))
      .toDF("id", "samples")
    val out = Multimodal.audioMfcc(
      Multimodal.encodeFlac(pcm, "id", "samples", 8000),
      "id", "payload", 256, 10, 10)
      .as[(Long, Option[Int], Option[Int], Option[Seq[Double]])].head()
    assert(out._2 == Some(2) && out._3 == Some(10) &&
      out._4.exists(_.length == 10))
    val bad = Multimodal.audioMfcc(
      Seq((2L, Array[Byte](1))).toDF("id", "payload"), "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Seq[Double]])].head()
    assert(bad._2.isEmpty && bad._4.isEmpty)
  }

  test("encodePng: lossless write side — decode recovers exact gray values") {
    val rows = Seq(
      (1L, Seq(0, 64, 128, 255, 7, 250), 3),            // 3×2 raster
      (2L, Seq(200, 200, 200, 200), 2),                 // 2×2 constant
      (3L, Seq(1, 2, 3), 2),                            // len % width != 0
      (4L, null.asInstanceOf[Seq[Int]], 2),             // null pixels
      (5L, Seq(1, 2), 0)                                // bad width
    ).toDF("id", "pixels", "w")
    val png = Multimodal.encodePng(rows, "id", "pixels", "w")
    val out = Multimodal.decodeImages(png, "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // dims and EXACT mean luma round-trip (r=g=b=v → luma == v)
    assert(out(1L)._2 == Some(3) && out(1L)._3 == Some(2))
    assert(out(1L)._4 == Some((0 + 64 + 128 + 255 + 7 + 250) / 6.0))
    assert(out(2L)._4 == Some(200.0))
    // malformed inputs → null payload → null decode fields, no failure
    assert(out(3L) == ((3L, None, None, None, None)))
    assert(out(4L) == ((4L, None, None, None, None)))
    assert(out(5L) == ((5L, None, None, None, None)))
    // values outside [0,255] clamp rather than wrap
    val clamped = Multimodal.decodeImages(
      Multimodal.encodePng(Seq((9L, Seq(-5, 300), 2)).toDF("id", "pixels", "w"),
        "id", "pixels", "w"), "id", "payload")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long])]
      .head()
    assert(clamped._4 == Some(127.5))
  }
}
