package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The object-store-safety contract of the shared commit protocol: a
  * numeric delta directory WITHOUT the [[DeltaLog.CommitMarker]] sentinel
  * is exactly what a reader sees mid-copy on S3A (where "rename" is a
  * non-atomic copy+delete) or after a writer crash between the rename and
  * the seal — every store's read path must skip it, and no writer may
  * reuse its sequence number.
  */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Plant an UNSEALED numeric commit dir (torn copy / crashed writer):
    * a directory with plausible content but no marker.
    */
  private def plantTorn(root: String, seq: Int): Unit = {
    val f = DeltaLog.fs(spark, root)
    f.mkdirs(new Path(s"$root/$seq/docs"))
    val out = f.create(new Path(s"$root/$seq/docs/part-00000.parquet"), true)
    out.write(Array[Byte](0x50, 0x41, 0x52, 0x31)) // truncated parquet
    out.close()
  }

  private def docs = Seq(
    (1L, "alpha beta gamma delta shared tokens one"),
    (2L, "alpha beta gamma delta shared tokens two"),
    (3L, "unrelated text about physical query plans"))
    .toDF("doc_id", "text")

  test("commit seals with the marker LAST; listSeqs admits only sealed dirs") {
    val root = tmpDir("dlog") + "/commits"
    val f = DeltaLog.fs(spark, root)
    val seq = DeltaLog.commit(spark, root, DeltaLog.nextSeq(spark, root),
      "payload", fenceDomain = root) { tmp =>
        f.mkdirs(new Path(s"$tmp/payload"))
        f.create(new Path(s"$tmp/payload/data"), true).close()
      }
    assert(seq == 1)
    assert(f.exists(new Path(s"$root/1/${DeltaLog.CommitMarker}")))
    assert(DeltaLog.listSeqs(spark, root) == Seq(1))
    // a torn dir is invisible to readers but blocks its seq for writers
    plantTorn(root, 7)
    assert(DeltaLog.listSeqs(spark, root) == Seq(1))
    assert(DeltaLog.nextSeq(spark, root) == 8)
  }

  test("versioned base: torn installs invisible, legacy fallback, GC") {
    val dir = tmpDir("dlog-base")
    val f = DeltaLog.fs(spark, dir)
    def mkData(path: String, tag: String): Unit = {
      f.mkdirs(new Path(path))
      f.create(new Path(s"$path/$tag"), true).close()
    }
    // legacy bare layout resolves as generation 0
    mkData(s"$dir/cells", "legacy")
    assert(DeltaLog.currentBase(spark, dir, "cells") == s"$dir/cells")
    // a TORN install (data, no marker — the mid-copy / crashed-compact
    // state) must not shadow the live base
    mkData(s"$dir/cells-v1", "torn")
    assert(DeltaLog.currentBase(spark, dir, "cells") == s"$dir/cells")
    // a sealed install becomes current; its number skipped the torn v1
    val p2 = DeltaLog.installBase(spark, dir, "cells", fenceDomain = dir)(mkData(_, "gen2"))
    assert(p2 == s"$dir/cells-v2")
    assert(DeltaLog.currentBase(spark, dir, "cells") == s"$dir/cells-v2")
    // legacy survives as the previous generation until the NEXT install
    assert(f.exists(new Path(s"$dir/cells")))
    val p3 = DeltaLog.installBase(spark, dir, "cells", fenceDomain = dir)(mkData(_, "gen3"))
    assert(p3 == s"$dir/cells-v3")
    assert(DeltaLog.currentBase(spark, dir, "cells") == s"$dir/cells-v3")
    // now legacy and the torn v1 are gone; sealed v2 is kept for
    // in-flight readers; v2 goes on the install after that
    assert(!f.exists(new Path(s"$dir/cells")))
    assert(!f.exists(new Path(s"$dir/cells-v1")))
    assert(f.exists(new Path(s"$dir/cells-v2")))
    DeltaLog.installBase(spark, dir, "cells", fenceDomain = dir)(mkData(_, "gen4")): Unit
    assert(!f.exists(new Path(s"$dir/cells-v2")))
    assert(f.exists(new Path(s"$dir/cells-v3")))
  }

  test("compaction through the versioned base keeps stores readable") {
    // SignatureStore: write → append → compact → probe unchanged; the
    // base is now a sealed -v directory, no bare dir, no .next strays
    val dir = tmpDir("dlog-compact")
    SignatureStore.write(docs.filter(col("doc_id") <= 2),
      "doc_id", "text", dir, nPb = 8)
    SignatureStore.append(docs.filter(col("doc_id") === 3), dir)
    val batch = Seq((9L, "alpha beta gamma delta shared tokens nine"))
      .toDF("doc_id", "text")
    val before = SignatureStore.probe(batch, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    SignatureStore.compact(spark, dir)
    val after = SignatureStore.probe(batch, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(after == before && before.nonEmpty)
    val f = DeltaLog.fs(spark, dir)
    assert(f.exists(new Path(
      s"${DeltaLog.currentBase(spark, dir, "buckets")}/${DeltaLog.CommitMarker}")))
    assert(!f.exists(new Path(s"$dir/.buckets-next")))
    // a torn compact generation planted AFTER the real one is invisible
    val cur = DeltaLog.currentBase(spark, dir, "buckets")
    val v = cur.split("-v").last.toInt
    f.mkdirs(new Path(s"$dir/buckets-v${v + 1}/pb=0"))
    assert(SignatureStore.probe(batch, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet == before)
  }

  test("IncrementalPostings readers skip a torn (marker-less) delta") {
    val dir = tmpDir("dlog-post")
    IncrementalPostings.init(docs, "doc_id", "text", dir)
    IncrementalPostings.commitUpserts(
      Seq((4L, "late arriving doc alpha")).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val before = IncrementalPostings.currentPostings(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    plantTorn(s"$dir/deltas", 777)
    val after = IncrementalPostings.currentPostings(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // the torn number is burned, never reused
    val next = IncrementalPostings.commitUpserts(
      Seq((5L, "another doc beta")).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    assert(next == 778)
  }

  test("SignatureStore probes skip a torn commit") {
    val dir = tmpDir("dlog-sig")
    SignatureStore.write(docs.filter(col("doc_id") <= 2),
      "doc_id", "text", dir, nPb = 8)
    val batch = docs.filter(col("doc_id") === 3)
    val before = SignatureStore.probe(batch, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    plantTorn(s"$dir/commits", 777)
    val after = SignatureStore.probe(batch, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(after == before)
    assert(SignatureStore.append(batch, dir) == 778)
  }

  test("VectorIndex searches skip a torn commit") {
    val dir = tmpDir("dlog-vec")
    val e = Seq.tabulate(40)(i =>
        (i.toLong, Array.tabulate(4)(d => (i * (d + 1) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    VectorIndex.write(e, "vec_id", "embedding", dir, k = 2, iters = 2)
    val q = Array(1f, 2f, 3f, 4f)
    val before = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 5, nProbe = 2).as[(Long, Double)].collect().toSeq
    plantTorn(s"$dir/commits", 777)
    val after = VectorIndex.search(spark, dir, "vec_id", "embedding",
      q, topK = 5, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(after == before)
    VectorIndex.append(e.limit(1).withColumn("vec_id", lit(999L)),
      "vec_id", "embedding", dir)
    assert(DeltaLog.listSeqs(spark, s"$dir/commits").contains(778))
  }

  test("GeoIndex searches skip a torn commit") {
    val dir = tmpDir("dlog-geo")
    GeoIndex.write(Seq((1L, 40.0, -74.0), (2L, 40.1, -74.1),
        (3L, -33.9, 151.2)).toDF("pid", "lat", "lon"),
      "pid", "lat", "lon", dir)
    val before = GeoIndex.knnSearch(spark, dir, 40.05, -74.05, 2)
      .collect().map(_.toString).sorted.toSeq
    plantTorn(s"$dir/commits", 777)
    val after = GeoIndex.knnSearch(spark, dir, 40.05, -74.05, 2)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(GeoIndex.upsert(Seq((9L, 10.0, 10.0)).toDF("pid", "lat", "lon"),
      "pid", "lat", "lon", dir) == 778)
  }

  test("legacy marker-less commits: read adopts in memory, write persists") {
    // a store written by the pre-marker protocol: committed dirs exist
    // but carry no sentinel — a marker-gated read must grandfather them
    // WITHOUT writing (readers may hold read-only credentials), not
    // silently drop the store's history
    val dir = tmpDir("dlog-adopt")
    StatsStore.init(Seq("a", "b").toDF("v"), Seq("v"), dir)
    StatsStore.append(Seq("c").toDF("v"), dir)
    StatsStore.append(Seq("d", "e").toDF("v"), dir)
    val before = StatsStore.profile(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val f = DeltaLog.fs(spark, dir)
    // strip every sentinel: the pre-upgrade on-disk state
    Seq(1, 2).foreach(s =>
      f.delete(new Path(s"$dir/commits/$s/${DeltaLog.CommitMarker}"), false))
    f.delete(new Path(s"$dir/commits/${DeltaLog.AdoptedMarker}"), false)
    // an INCOMPLETE stray (no 'stats' payload child) must NOT be adopted
    plantTorn(s"$dir/commits", 9)
    val after = StatsStore.profile(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // the READ adopted in memory only: nothing was persisted
    Seq(1, 2, 9).foreach(s =>
      assert(!f.exists(new Path(s"$dir/commits/$s/${DeltaLog.CommitMarker}"))))
    assert(!f.exists(new Path(s"$dir/commits/${DeltaLog.AdoptedMarker}")))
    // the next WRITE persists the adoption (sweep + root sentinel before
    // its rename), skipping the incomplete stray; the stray burned seq 9
    // so the new commit lands at 10
    StatsStore.append(Seq("f").toDF("v"), dir)
    Seq(1, 2).foreach(s =>
      assert(f.exists(new Path(s"$dir/commits/$s/${DeltaLog.CommitMarker}"))))
    assert(f.exists(new Path(s"$dir/commits/${DeltaLog.AdoptedMarker}")))
    assert(!f.exists(new Path(s"$dir/commits/9/${DeltaLog.CommitMarker}")))
    // once adopted, a new marker-less dir is a TORN commit again — even
    // with a plausible payload child it stays invisible and unsealed
    val f2 = DeltaLog.fs(spark, dir)
    f2.mkdirs(new Path(s"$dir/commits/11/stats"))
    f2.create(new Path(s"$dir/commits/11/stats/data"), true).close()
    assert(DeltaLog.listSeqs(spark, s"$dir/commits", Some("stats"))
      == Seq(1, 2, 10))
    assert(!f2.exists(new Path(s"$dir/commits/11/${DeltaLog.CommitMarker}")))
  }

  test("mixed sealed+markerless roots never auto-adopt; migrateLegacy does") {
    // the mid-upgrade store the r12 sweep mishandled: legacy marker-less
    // history BELOW marker-era sealed commits, no root sentinel. A
    // marker-less dir here is ambiguous (it could be a marker-era commit
    // that crashed between rename and seal, its batch retried under a
    // later seq — adopting it double-counts), so neither reads nor
    // writes adopt; the operator-asserted migrateLegacy is the only way.
    val dir = tmpDir("dlog-mixed")
    val root = s"$dir/commits"
    val f = DeltaLog.fs(spark, root)
    def legacyCommit(s: Int): Unit = {
      f.mkdirs(new Path(s"$root/$s/docs"))
      f.create(new Path(s"$root/$s/docs/c$s"), true).close()
    }
    legacyCommit(1); legacyCommit(2)
    // a marker-era commit on top (seals the root as a side effect) —
    // then strip the root sentinel to recreate the r11-era on-disk state
    DeltaLog.commit(spark, root, DeltaLog.nextSeq(spark, root), "docs",
        fenceDomain = root) { tmp =>
        f.mkdirs(new Path(s"$tmp/docs"))
        f.create(new Path(s"$tmp/docs/c3"), true).close()
    }
    f.delete(new Path(s"$root/${DeltaLog.AdoptedMarker}"), false)
    Seq(1, 2).foreach(s => // the r11 writer never swept — strip those too
      f.delete(new Path(s"$root/$s/${DeltaLog.CommitMarker}"), false))
    // plant a crashed marker-era commit (complete payload, no seal)
    f.mkdirs(new Path(s"$root/4/docs"))
    f.create(new Path(s"$root/4/docs/crashed"), true).close()
    // reads return ONLY the sealed commit — neither the legacy history
    // nor the crashed dir is auto-adopted, and nothing is persisted
    assert(DeltaLog.listSeqs(spark, root, Some("docs")) == Seq(3))
    assert(!f.exists(new Path(s"$root/${DeltaLog.AdoptedMarker}")))
    // a write doesn't adopt them either (still ambiguous)
    DeltaLog.commit(spark, root, DeltaLog.nextSeq(spark, root), "docs",
        fenceDomain = root) { tmp =>
        f.mkdirs(new Path(s"$tmp/docs"))
        f.create(new Path(s"$tmp/docs/c5"), true).close()
    }
    assert(DeltaLog.listSeqs(spark, root, Some("docs")) == Seq(3, 5))
    assert(!f.exists(new Path(s"$root/1/${DeltaLog.CommitMarker}")))
    // the explicit migration: the operator asserts seqs <= 2 are legacy;
    // the crashed 4 sits above the bound and stays invisible forever
    f.delete(new Path(s"$root/${DeltaLog.AdoptedMarker}"), false)
    // fenceDomain must match the domain this root's writers check —
    // the commits here use the default (the root itself)
    assert(DeltaLog.migrateLegacy(spark, root, "docs", upToSeq = 2,
      fenceDomain = root) == Seq(1, 2))
    assert(DeltaLog.listSeqs(spark, root, Some("docs")) == Seq(1, 2, 3, 5))
    assert(!f.exists(new Path(s"$root/4/${DeltaLog.CommitMarker}")))
    assert(f.exists(new Path(s"$root/${DeltaLog.AdoptedMarker}")))
  }

  test("crashed adoption sweep resumes: intent sentinel, no orphaned legacy") {
    // the write path seals legacy dirs then writes AdoptedMarker — a
    // crash in between used to leave a half-sealed root that the
    // zero-sealed rule misread as an ambiguous mixed upgrade, silently
    // orphaning the unsealed remainder. The AdoptingMarker intent
    // (written before the first seal) proves the mix came from the
    // sweep itself: reads resume it in memory, the next write resumes
    // and completes it.
    val dir = tmpDir("dlog-resume")
    val root = s"$dir/commits"
    val f = DeltaLog.fs(spark, root)
    def legacyCommit(s: Int): Unit = {
      f.mkdirs(new Path(s"$root/$s/docs"))
      f.create(new Path(s"$root/$s/docs/c$s"), true).close()
    }
    legacyCommit(1); legacyCommit(2); legacyCommit(3)
    // simulate the crash window: intent written, dir 1 sealed, then death
    f.create(new Path(s"$root/${DeltaLog.AdoptingMarker}"), true).close()
    f.create(new Path(s"$root/1/${DeltaLog.CommitMarker}"), true).close()
    // a READ during the window sees the full history (in-memory resume)
    assert(DeltaLog.listSeqs(spark, root, Some("docs")) == Seq(1, 2, 3))
    assert(!f.exists(new Path(s"$root/2/${DeltaLog.CommitMarker}")))
    // the next WRITE completes the sweep: seals 2 and 3, lands the root
    // sentinel, clears the intent
    DeltaLog.commit(spark, root, DeltaLog.nextSeq(spark, root), "docs",
        fenceDomain = root) { tmp =>
        f.mkdirs(new Path(s"$tmp/docs"))
        f.create(new Path(s"$tmp/docs/c4"), true).close()
    }
    assert(DeltaLog.listSeqs(spark, root, Some("docs")) == Seq(1, 2, 3, 4))
    Seq(1, 2, 3).foreach(s =>
      assert(f.exists(new Path(s"$root/$s/${DeltaLog.CommitMarker}"))))
    assert(f.exists(new Path(s"$root/${DeltaLog.AdoptedMarker}")))
    assert(!f.exists(new Path(s"$root/${DeltaLog.AdoptingMarker}")))
    // WITHOUT the intent the same half-sealed shape stays ambiguous:
    // nothing is auto-adopted (the documented migrateLegacy case)
    val root2 = s"$dir/commits2"
    val f2 = DeltaLog.fs(spark, root2)
    f2.mkdirs(new Path(s"$root2/1/docs"))
    f2.create(new Path(s"$root2/1/docs/c1"), true).close()
    f2.create(new Path(s"$root2/1/${DeltaLog.CommitMarker}"), true).close()
    f2.mkdirs(new Path(s"$root2/2/docs"))
    f2.create(new Path(s"$root2/2/docs/c2"), true).close()
    assert(DeltaLog.listSeqs(spark, root2, Some("docs")) == Seq(1))
  }

  test("adoption completeness: truncated parquet and missing _SUCCESS reject") {
    val dir = tmpDir("dlog-complete")
    val root = s"$dir/commits"
    val f = DeltaLog.fs(spark, root)
    // seq 1: a real (tiny but valid) spark-written parquet payload
    Seq(1L).toDF("v").coalesce(1).write
      .parquet(s"$root/1/docs")
    // seq 2: payload child present but its parquet is TRUNCATED (PAR1
    // head only — the plantTorn shape) — must not adopt
    f.mkdirs(new Path(s"$root/2/docs"))
    val out = f.create(new Path(s"$root/2/docs/part-00000.parquet"), true)
    out.write(Array[Byte](0x50, 0x41, 0x52, 0x31))
    out.close()
    // seq 3: part- files without _SUCCESS (torn spark output copy)
    f.mkdirs(new Path(s"$root/3/docs"))
    f.create(new Path(s"$root/3/docs/part-00000"), true).close()
    assert(DeltaLog.listSeqs(spark, root, Some("docs")) == Seq(1))
  }

  test("base retention: keepGenerations=2 covers a reader spanning two installs") {
    val dir = tmpDir("dlog-keep")
    val f = DeltaLog.fs(spark, dir)
    def mkData(path: String, tag: String): Unit = {
      f.mkdirs(new Path(path))
      f.create(new Path(s"$path/$tag"), true).close()
    }
    val p1 = DeltaLog.installBase(spark, dir, "b", 2, fenceDomain = dir)(mkData(_, "g1"))
    val p2 = DeltaLog.installBase(spark, dir, "b", 2, fenceDomain = dir)(mkData(_, "g2"))
    // a reader pinned at p1 (two installs ago after this) must still
    // see a complete directory: retention 2 keeps p1 AND p2
    val p3 = DeltaLog.installBase(spark, dir, "b", 2, fenceDomain = dir)(mkData(_, "g3"))
    assert(DeltaLog.currentBase(spark, dir, "b") == p3)
    Seq(p1 -> "g1", p2 -> "g2", p3 -> "g3").foreach { case (p, t) =>
      assert(f.exists(new Path(s"$p/$t")), s"$p lost its payload")
      assert(f.exists(new Path(s"$p/${DeltaLog.CommitMarker}")))
    }
    // the fourth install finally GCs p1, still keeping p2 and p3
    val p4 = DeltaLog.installBase(spark, dir, "b", 2, fenceDomain = dir)(mkData(_, "g4"))
    assert(!f.exists(new Path(p1)))
    assert(f.exists(new Path(s"$p2/g2")) && f.exists(new Path(s"$p3/g3")))
    assert(DeltaLog.currentBase(spark, dir, "b") == p4)
  }

  test("StatsStore reads a legacy base lacking the qtiles column") {
    val dir = tmpDir("dlog-stats-legacy")
    StatsStore.init(Seq(1.0, 2.0, 3.0).toDF("x"), Seq("x"), dir)
    // rewrite the base WITHOUT qtiles — the pre-qtiles on-disk layout,
    // installed as a newer sealed generation so it is what reads resolve
    val legacy = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "base"))
      .drop("qtiles").collect()
    val legacySchema = spark.read
      .parquet(DeltaLog.currentBase(spark, dir, "base"))
      .drop("qtiles").schema
    DeltaLog.installBase(spark, dir, "base", fenceDomain = dir) { tmp =>
      spark.createDataFrame(spark.sparkContext.parallelize(legacy.toSeq, 1),
        legacySchema).write.mode("overwrite").parquet(tmp)
    }: Unit
    // a post-upgrade append carries qtiles; profile, quantiles and
    // compact must all fold the mixed schemas instead of throwing
    StatsStore.append(Seq(4.0, 5.0).toDF("x"), dir)
    val prof = StatsStore.profile(spark, dir).collect()
    assert(prof.length == 1 && prof.head.getAs[Long]("n_nonnull") == 5L)
    val qs = StatsStore.quantiles(spark, dir, Seq(0.5)).collect()
    // only the qtiles-bearing commit (4.0, 5.0) contributes points
    assert(qs.length == 1 && qs.head.getSeq[Double](2).head >= 4.0)
    StatsStore.compact(spark, dir)
    val prof2 = StatsStore.profile(spark, dir).collect()
    assert(prof2.head.getAs[Long]("n_nonnull") == 5L)
  }

  test("StatsStore profiles skip a torn commit") {
    val dir = tmpDir("dlog-stats")
    StatsStore.init(Seq("x", "y").toDF("v"), Seq("v"), dir)
    StatsStore.append(Seq("z").toDF("v"), dir)
    val before = StatsStore.profile(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    plantTorn(s"$dir/commits", 777)
    val after = StatsStore.profile(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(StatsStore.append(Seq("w").toDF("v"), dir) == 778)
  }
}
