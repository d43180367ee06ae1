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

  test("stubbed decode is deterministic and batch-shaped") {
    val docs = Tables.documents(spark, sf).limit(20)
    val withBin = Multimodal.withBinaryPayload(docs, "text", "payload")
    val f1 = Multimodal.extractFeatures(withBin, "doc_id", "payload")
      .orderBy("id").collect().toSeq
    val f2 = Multimodal.extractFeatures(withBin, "doc_id", "payload")
      .orderBy("id").collect().toSeq
    assert(f1 == f2) // same payload bytes → same fake features
    assert(f1.forall(r => r.getInt(1) >= 16 && r.getInt(3) >= 1))
  }

  test("stub hash matches DuckDB md5_number_lower (oracle parity)") {
    // duckdb: SELECT md5_number_lower('abc') → 8250560606382298838
    assert(Multimodal.MediaCodec.md5Lower("abc".getBytes("UTF-8")) ==
      8250560606382298838L)
    // unsigned-math feature derivation stays in the documented ranges
    val (w, h, f, cs) = Multimodal.MediaCodec.decodeStub("abc".getBytes("UTF-8"))
    assert(w >= 16 && w < 80 && h >= 16 && h < 80 && f >= 1 && f <= 8 && cs >= 0)
  }

  test("frame sampling yields every k-th index within n_frames") {
    val docs = Tables.documents(spark, sf).limit(5)
    val features = Multimodal.extractFeatures(
      Multimodal.withBinaryPayload(docs, "text", "payload"), "doc_id", "payload")
    val sampled = Multimodal.sampleFrameIndexes(features, every = 2)
      .select("n_frames", "sampled_frames")
      .as[(Int, Seq[Long])].collect()
    sampled.foreach { case (n, frames) =>
      assert(frames == (0 until n by 2).map(_.toLong))
    }
  }
}
