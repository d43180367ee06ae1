package graft.sink

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class IndexSinkSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("_id", StringType), StructField("v", StringType)))

  test("parquet sink: upsert replaces, delete removes, commit versions") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val sink = new ParquetIndexSink(spark, dir)

    sink.addDocuments(Seq(("a", "v1"), ("b", "b1")).toDF("_id", "v"))
    sink.commit()
    assert(sink.searchable().count() == 2)

    // upsert: same _id replaces (Lucene updateDocument semantics)
    sink.addDocuments(Seq(("a", "v2")).toDF("_id", "v"))
    sink.commit()
    val afterUpsert = sink.searchable().orderBy("_id")
      .as[(String, String)].collect().toSeq
    assert(afterUpsert == Seq(("a", "v2"), ("b", "b1")))

    // delete by key set
    sink.deleteByIds(Seq("b"))
    sink.commit()
    assert(sink.searchable().as[(String, String)].collect().toSeq == Seq(("a", "v2")))

    // INSERT→DELETE→INSERT in one batch window: exactly one final doc
    sink.deleteByIds(Seq("a"))
    sink.addDocuments(Seq(("a", "v3")).toDF("_id", "v"))
    sink.commit()
    assert(sink.searchable().as[(String, String)].collect().toSeq == Seq(("a", "v3")))
  }

  test("width-only schema evolution: new columns null-fill old docs") {
    val dir = java.nio.file.Files.createTempDirectory("sink-evolve").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v"))
    sink.commit()
    // new column 'w', and 'v' omitted entirely
    sink.addDocuments(Seq(("b", 7L)).toDF("_id", "w"))
    sink.commit()
    val rows = sink.searchable().orderBy("_id")
      .select("_id", "v", "w").as[(String, Option[String], Option[Long])]
      .collect().toSeq
    assert(rows == Seq(("a", Some("v1"), None), ("b", None, Some(7L))))

    // a type change for an existing column must fail loudly, not coerce
    sink.addDocuments(Seq(("c", 1L)).toDF("_id", "v"))
    val e = intercept[IllegalArgumentException](sink.commit())
    assert(e.getMessage.contains("cannot change type"))
  }

  test("manifest publish is compare-and-set: an existing version wins") {
    val dir = java.nio.file.Files.createTempDirectory("sink-cas").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v"))
    sink.commit() // publishes v0
    // a losing committer trying to publish the SAME version must fail —
    // on local FS the old FileSystem.rename silently overwrote here
    val stale = ParquetIndexSink.Manifest(0L, 16, None, Map.empty)
    val e = intercept[IllegalStateException](sink.writeManifest(stale))
    assert(e.getMessage.contains("concurrent commit"))
    // the winner's manifest is untouched: index still serves its data
    assert(sink.searchable().count() == 1)
  }

  test("writer fencing: a rival epoch fences this JVM's commit and vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("sink-fence").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v"))
    sink.commit() // acquires this JVM's session epoch, publishes v0
    // a rival writer (new driver) registers a higher epoch on the same
    // sink root — this JVM's next mutation must die loudly, publishing
    // nothing and GC'ing nothing
    DeltaLog.acquireEpoch(spark, dir): Unit
    sink.addDocuments(Seq(("b", "v2")).toDF("_id", "v"))
    intercept[FencedWriterException](sink.commit())
    intercept[FencedWriterException](sink.vacuum())
    // the fenced commit published nothing: v0 still serves alone
    assert(sink.history() == Seq(0L))
    assert(sink.searchable().select("_id").as[String].collect().toSeq == Seq("a"))
  }

  test("rebucket rewrites under the new modulus; commits keep working") {
    val dir = java.nio.file.Files.createTempDirectory("sink-rebucket").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments((1 to 50).map(i => (s"k$i", s"v$i")).toDF("_id", "v"))
    sink.commit()
    sink.rebucket(16)
    assert(sink.committedBuckets.keySet.max < 16 && sink.committedBuckets.size > 4)
    assert(sink.searchable().count() == 50)
    // post-rebucket commits use the NEW modulus (manifest numBuckets wins)
    sink.addDocuments(Seq(("k1", "v1b"), ("new", "n1")).toDF("_id", "v"))
    sink.commit()
    val rows = sink.searchable().filter(col("_id").isin("k1", "new"))
      .orderBy("_id").as[(String, String)].collect().toSeq
    assert(rows == Seq(("k1", "v1b"), ("new", "n1")))
    assert(sink.searchable().count() == 51)
  }

  test("add-then-delete in one commit window deletes (call order wins)") {
    val dir = java.nio.file.Files.createTempDirectory("sink-order").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1"), ("b", "b1")).toDF("_id", "v"))
    sink.deleteByIds(Seq("a")) // issued AFTER the add: must win
    sink.commit()
    assert(sink.searchable().select("_id").as[String].collect().toSeq == Seq("b"))
  }

  test("distributed delete-by-keys applies in order like deleteByIds") {
    val dir = java.nio.file.Files.createTempDirectory("sink-keys").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1"), ("b", "b1"), ("c", "c1")).toDF("_id", "v"))
    sink.deleteByKeys(Seq("a", "c").toDF("id"))
    sink.addDocuments(Seq(("c", "c2")).toDF("_id", "v")) // re-add after delete
    sink.commit()
    val state = sink.searchable().orderBy("_id")
      .as[(String, String)].collect().toSeq
    assert(state == Seq(("b", "b1"), ("c", "c2")))
  }

  test("uncommitted writes are not visible (commit gating)") {
    val dir = java.nio.file.Files.createTempDirectory("sink2").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v"))
    sink.commit()
    sink.addDocuments(Seq(("b", "x")).toDF("_id", "v"))
    // no commit — searchable still shows only the committed version
    assert(sink.searchable().count() == 1)
  }

  private def parquetBytes(dir: String, rel: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) f.length
      else 0L
    walk(new java.io.File(dir, rel))
  }

  test("merge-on-read: a small commit appends O(batch) bytes, zero base I/O") {
    val dir = java.nio.file.Files.createTempDirectory("sink-mor").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 8)
    // a base big enough that rewriting even ONE touched bucket would dwarf
    // a 1-row delta (the round-2 copy-on-write design rewrote every
    // touched bucket in full)
    sink.addDocuments((0 until 2000).map(i => (s"k$i", "v" * 200 + i))
      .toDF("_id", "v"))
    sink.commit() // initial load → bucketed base
    val before = sink.committedBuckets
    assert(before.size > 1, "expected keys to span multiple buckets")
    val baseBytes = before.values.map(parquetBytes(dir, _)).sum

    def fileState(rel: String): Seq[(String, Long, Long)] = {
      val d = new java.io.File(dir, rel)
      d.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => (f.getName, f.length, f.lastModified)).toSeq
    }
    val baseFilesBefore = before.map { case (b, rel) => b -> fileState(rel) }

    // touch one key → ONE delta dir appears; NO base bucket moves
    sink.addDocuments(Seq(("k0", "v0-updated")).toDF("_id", "v"))
    sink.commit()
    assert(sink.committedBuckets == before,
      "a delta commit must not move any base bucket")
    baseFilesBefore.foreach { case (b, st) =>
      assert(fileState(before(b)) == st, s"base bucket $b files changed")
    }
    assert(sink.committedDeltas.size == 1)
    val deltaBytes = parquetBytes(dir, sink.committedDeltas.head)
    assert(deltaBytes > 0 && deltaBytes * 10 < baseBytes,
      s"delta commit should be O(batch) bytes: delta=$deltaBytes base=$baseBytes")
    // and the merged view is correct
    assert(sink.searchable().filter($"_id" === "k0").select("v")
      .as[String].head() == "v0-updated")
    assert(sink.searchable().count() == 2000)
  }

  test("merge-on-read read path broadcasts the delta side; base never sort-merges") {
    val dir = java.nio.file.Files.createTempDirectory("sink-mor-plan").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 8)
    sink.addDocuments((0 until 2000).map(i => (s"k$i", s"v$i")).toDF("_id", "v"))
    sink.commit()
    sink.addDocuments(Seq(("k7", "v7b")).toDF("_id", "v")); sink.commit()
    val view = sink.searchable()
    view.collect() // finalize the adaptive plan
    val p = view.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"delta anti-join should broadcast the (small) delta key set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"base side must never shuffle for a merge-on-read view:\n$p")
  }

  test("delta shadowing across commits: delete then re-add resolves by version") {
    val dir = java.nio.file.Files.createTempDirectory("sink-shadow").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments(Seq(("a", "v1"), ("b", "b1")).toDF("_id", "v"))
    sink.commit() // base
    sink.deleteByIds(Seq("a")); sink.commit() // delta 1: tombstone
    assert(sink.searchable().select("_id").as[String].collect().toSeq == Seq("b"))
    sink.addDocuments(Seq(("a", "v2")).toDF("_id", "v")); sink.commit() // delta 2
    val rows = sink.searchable().orderBy("_id").as[(String, String)].collect().toSeq
    assert(rows == Seq(("a", "v2"), ("b", "b1")))
  }

  test("compactDeltas folds the log into the base and clears it") {
    val dir = java.nio.file.Files.createTempDirectory("sink-compact").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 8)
    sink.addDocuments((0 until 64).map(i => (s"k$i", s"v$i")).toDF("_id", "v"))
    sink.commit()
    sink.addDocuments(Seq(("k0", "v0b")).toDF("_id", "v")); sink.commit()
    sink.deleteByIds(Seq("k1")); sink.commit()
    assert(sink.committedDeltas.size == 2)
    sink.compactDeltas()
    assert(sink.committedDeltas.isEmpty)
    assert(sink.searchable().count() == 63)
    assert(sink.searchable().filter($"_id" === "k0").select("v")
      .as[String].head() == "v0b")
    assert(sink.searchable().filter($"_id" === "k1").count() == 0)
    // compaction is a no-op on an empty log
    sink.compactDeltas()
    assert(sink.searchable().count() == 63)
  }

  test("delta log auto-compacts once it exceeds maxDeltas") {
    val dir = java.nio.file.Files.createTempDirectory("sink-autocompact").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4, maxDeltas = 2)
    sink.addDocuments((0 until 16).map(i => (s"k$i", s"v$i")).toDF("_id", "v"))
    sink.commit() // base
    sink.addDocuments(Seq(("k0", "a")).toDF("_id", "v")); sink.commit() // 1 delta
    sink.addDocuments(Seq(("k1", "b")).toDF("_id", "v")); sink.commit() // 2 deltas
    assert(sink.committedDeltas.size == 2)
    sink.addDocuments(Seq(("k2", "c")).toDF("_id", "v")); sink.commit() // 3 → fold
    assert(sink.committedDeltas.isEmpty, "third delta should trigger compaction")
    val got = sink.searchable().filter($"_id".isin("k0", "k1", "k2"))
      .orderBy("_id").as[(String, String)].collect().toSeq
    assert(got == Seq(("k0", "a"), ("k1", "b"), ("k2", "c")))
    assert(sink.searchable().count() == 16)
  }

  test("time travel: searchableAt reconstructs any committed version") {
    val dir = java.nio.file.Files.createTempDirectory("sink-timetravel").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments(Seq(("a", "v1"), ("b", "b1")).toDF("_id", "v")); sink.commit()
    sink.addDocuments(Seq(("a", "v2")).toDF("_id", "v")); sink.commit()
    sink.deleteByIds(Seq("b")); sink.commit()
    assert(sink.history() == Seq(0L, 1L, 2L))
    assert(sink.searchableAt(0).orderBy("_id").as[(String, String)].collect().toSeq ==
      Seq(("a", "v1"), ("b", "b1")))
    assert(sink.searchableAt(1).orderBy("_id").as[(String, String)].collect().toSeq ==
      Seq(("a", "v2"), ("b", "b1")))
    assert(sink.searchableAt(2).as[(String, String)].collect().toSeq ==
      Seq(("a", "v2")))
    // latest view ≡ time travel to the max version
    assert(sink.searchable().as[(String, String)].collect().toSeq ==
      sink.searchableAt(2).as[(String, String)].collect().toSeq)
    val e = intercept[IllegalArgumentException](sink.searchableAt(9))
    assert(e.getMessage.contains("history"))
    // vacuum prunes history to the latest (Delta/Iceberg retention)
    sink.vacuum()
    assert(sink.history() == Seq(2L))
    assert(sink.searchable().as[(String, String)].collect().toSeq ==
      Seq(("a", "v2")))
  }

  test("vacuum dryRun is read-only and predicts the real vacuum exactly") {
    val dir = java.nio.file.Files.createTempDirectory("sink-dryrun").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments((0 until 8).map(i => (s"k$i", "v0")).toDF("_id", "v"))
    sink.commit() // v0
    sink.addDocuments(Seq(("k0", "v1")).toDF("_id", "v")); sink.commit() // v1
    sink.addDocuments(Seq(("k1", "v2")).toDF("_id", "v")); sink.commit() // v2
    val f = DeltaLog.fs(spark, dir)
    val ledger = new org.apache.hadoop.fs.Path(s"$dir/${DeltaLog.EpochDir}")
    val claimsBefore = f.listStatus(ledger).length
    val plan = sink.vacuum(keepVersions = 1, dryRun = true)
    // read-only: no claim registered, nothing deleted, all history serves
    assert(plan.dryRun && plan.retainedVersions == Seq(2L))
    assert(f.listStatus(ledger).length == claimsBefore)
    assert(sink.history() == Seq(0L, 1L, 2L))
    assert(sink.searchableAt(0).count() == 8)
    assert(plan.manifests.nonEmpty)
    // the real vacuum deletes EXACTLY what the dry run predicted
    val real = sink.vacuum(keepVersions = 1)
    assert(!real.dryRun)
    assert(real.dataDirs.toSet == plan.dataDirs.toSet)
    assert(real.deltaDirs.toSet == plan.deltaDirs.toSet)
    assert(real.manifests.toSet == plan.manifests.toSet)
    // including the commit dirs the bucket deletes leave empty (a dry
    // run PREDICTS these; the real run deletes and records them)
    assert(real.commitDirs.toSet == plan.commitDirs.toSet)
    assert(sink.history() == Seq(2L))
    assert(sink.searchable().count() == 8)
  }

  test("maintenance modes: dryRun never fences; owner-epoch vacuum keeps the writer live") {
    val dir = java.nio.file.Files.createTempDirectory("sink-maint").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v")); sink.commit()
    // a maintenance call holding the OWNER's explicit epoch runs under
    // that claim — it must not register a new one, so the writer's next
    // commit still succeeds (the forbidden shape is a maintenance JVM
    // resolving with NO epoch, which acquires and fences the writer)
    val owner = DeltaLog.resolveEpoch(spark, dir, null)
    sink.vacuum(keepVersions = 1, epoch = owner): Unit
    sink.addDocuments(Seq(("b", "v2")).toDF("_id", "v"))
    sink.commit() // alive — not fenced by its own maintenance
    assert(sink.searchable().count() == 2)
    // a rival claims the store: the dry run still works (read-only
    // pre-flight never touches the ledger), the real vacuum dies
    DeltaLog.acquireEpoch(spark, dir): Unit
    assert(sink.vacuum(dryRun = true).dryRun)
    intercept[FencedWriterException](sink.vacuum())
  }

  test("change feed: changesSince replays upserts/deletes in commit order") {
    val dir = java.nio.file.Files.createTempDirectory("sink-cdf").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4, maxDeltas = 2)
    sink.addDocuments(Seq(("a", "v1"), ("b", "b1")).toDF("_id", "v")); sink.commit() // v0 load
    sink.addDocuments(Seq(("a", "v2")).toDF("_id", "v")); sink.commit()              // v1 delta
    sink.deleteByIds(Seq("b")); sink.commit()                                        // v2 delta
    // full feed from before the load: bulk load = upserts of every row
    val full = sink.changesSince(-1).orderBy("_dv", "_id")
      .as[(String, String, String, Long)].collect().toSeq
    assert(full == Seq(
      ("a", "v1", "u", 0L), ("b", "b1", "u", 0L),
      ("a", "v2", "u", 1L), ("b", null, "d", 2L)))
    // incremental consumer: only what happened after v1
    val tail = sink.changesSince(1).as[(String, String, String, Long)].collect().toSeq
    assert(tail == Seq(("b", null, "d", 2L)))
    assert(sink.changesSince(2).count() == 0) // caught up
    // compaction commits no logical change: feed content is unchanged
    sink.addDocuments(Seq(("c", "c1")).toDF("_id", "v")); sink.commit()   // v3 → folds
    val afterCompact = sink.changesSince(2).orderBy("_dv", "_id")
      .as[(String, String, String, Long)].collect().toSeq
    assert(afterCompact == Seq(("c", "c1", "u", 3L)))
    // vacuum prunes history → a pre-history cursor fails loudly
    sink.vacuum()
    val e = intercept[IllegalArgumentException](sink.changesSince(-1))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("internal working column names are reserved at addDocuments") {
    val dir = java.nio.file.Files.createTempDirectory("sink-reserved").toString
    val sink = new ParquetIndexSink(spark, dir)
    // _seq/_oseq order rows inside the commit fold — a doc column of the
    // same name would be silently overwritten and dropped
    for (bad <- Seq("gbucket", "_op", "_dv", "_seq", "_oseq")) {
      val e = intercept[IllegalArgumentException] {
        sink.addDocuments(Seq(("a", "x")).toDF("_id", bad))
      }
      assert(e.getMessage.contains("reserved"), s"$bad must be reserved")
    }
  }

  test("a failed auto-compaction does not fail the already-durable commit") {
    val dir = java.nio.file.Files.createTempDirectory("sink-compactfail").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4, maxDeltas = 1)
    sink.addDocuments((0 until 8).map(i => (s"k$i", s"v$i")).toDF("_id", "v"))
    sink.commit() // base
    sink.addDocuments(Seq(("k0", "a")).toDF("_id", "v")); sink.commit() // 1 delta
    // corrupt the delta parquet so the compaction read blows up
    val deltaRoot = java.nio.file.Paths.get(dir, "delta")
    java.nio.file.Files.walk(deltaRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .foreach(p => java.nio.file.Files.write(p, "garbage".getBytes))
    // this commit pushes the log past maxDeltas → auto-compaction runs and
    // fails — but the commit itself is durable and MUST succeed (a thrown
    // commit would wedge a replaying stream, appending the delta forever)
    sink.addDocuments(Seq(("k1", "b")).toDF("_id", "v"))
    sink.commit() // must not throw
    assert(sink.committedDeltas.size == 2,
      "failed compaction leaves the log intact for a later retry")
  }

  test("null _id in an upsert fails the commit loudly, before publish") {
    val dir = java.nio.file.Files.createTempDirectory("sink-nullid").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v"))
    sink.commit()
    sink.addDocuments(Seq((null: String, "bad"), ("b", "ok")).toDF("_id", "v"))
    val e = intercept[Exception](sink.commit())
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("NULL '_id'"), s"unexpected error:\n$chain")
    // the failed commit published nothing: the index still serves v0 only
    assert(sink.committedDeltas.isEmpty)
    assert(sink.searchable().count() == 1)
  }

  test("delete-only first commit publishes an empty searchable version") {
    val dir = java.nio.file.Files.createTempDirectory("sink-delonly").toString
    val sink = new ParquetIndexSink(spark, dir)
    sink.deleteByIds(Seq("ghost"))
    sink.commit()
    assert(sink.searchable().count() == 0) // no throw: empty committed view
    // index becomes fully usable once real docs arrive
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v"))
    sink.commit()
    assert(sink.searchable().count() == 1)
  }

  test("vacuum drops unreferenced data dirs, keeps the committed view") {
    val dir = java.nio.file.Files.createTempDirectory("sink-vacuum").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments((0 until 16).map(i => (s"k$i", s"v$i")).toDF("_id", "v"))
    sink.commit()
    sink.addDocuments(Seq(("k0", "v0b")).toDF("_id", "v"))
    sink.commit()
    sink.vacuum()
    assert(sink.searchable().count() == 16)
    assert(sink.searchable().filter($"_id" === "k0").select("v").as[String].head() == "v0b")
  }

  test("vacuum(keepVersions): time travel survives inside the lease, dies past it") {
    val dir = java.nio.file.Files.createTempDirectory("sink-vlease").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments((0 until 8).map(i => (s"k$i", "v0")).toDF("_id", "v"))
    sink.commit() // v0
    sink.addDocuments(Seq(("k0", "v1")).toDF("_id", "v"))
    sink.commit() // v1
    sink.addDocuments(Seq(("k1", "v2")).toDF("_id", "v"))
    sink.commit() // v2
    sink.vacuum(keepVersions = 2)
    // v1 and v2 both reconstruct — their manifests AND data survive
    assert(sink.history() == Seq(1L, 2L))
    assert(sink.searchableAt(1).filter($"_id" === "k0")
      .select("v").as[String].collect().toSeq == Seq("v1"))
    assert(sink.searchableAt(1).filter($"_id" === "k1")
      .select("v").as[String].collect().toSeq == Seq("v0"))
    assert(sink.searchableAt(2).filter($"_id" === "k1")
      .select("v").as[String].collect().toSeq == Seq("v2"))
    // v0 is outside the lease: its manifest is gone, the miss is loud
    intercept[IllegalArgumentException](sink.searchableAt(0))
    // the live view is untouched
    assert(sink.searchable().count() == 8)
  }

  test("in-memory sink honors the same ordered upsert/delete contract") {
    val sink = new InMemoryIndexSink(spark, docSchema)
    sink.addDocuments(Seq(("a", "v1"), ("b", "b1")).toDF("_id", "v"))
    sink.deleteByKeys(Seq(Some("a"), None).toDF("id")) // null key ignored
    sink.commit()
    assert(sink.searchable().select("_id").as[String].collect().toSeq == Seq("b"))
  }

  test("phrase match requires consecutive tokens with safe boundaries") {
    val docs = Seq(
      (1L, "the merge window opens"),
      (2L, "window merge"),            // reversed order — no match
      (3L, "submerge windowed"),       // substring trap — no match
      (4L, "a  Merge   WINDOW b"),     // multi-space + case normalize
      (5L, "merge window")).toDF("doc_id", "text")
    val got = DocQueries.matchPhrase(docs, "text", "Merge Window")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 4L, 5L))
  }

  test("profile: one-pass column stats with null accounting") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("b")), (None, Some("a"))).toDF("k", "s")
    val p = graft.operators.Profile.profile(df, Seq("k", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(p(0)._1 == "k" && p(0)._2 == 3 && p(0)._3 == 1 &&
      p(0)._5 == "1" && p(0)._6 == "2")
    assert(p(0)._4 == 2) // HLL++ is exact at this cardinality
    assert(p(1)._1 == "s" && p(1)._2 == 3 && p(1)._3 == 1 &&
      p(1)._5 == "a" && p(1)._6 == "b")
  }

  test("matchAllTerms requires every query token (Lucene MUST clauses)") {
    val docs = Seq(
      (1L, "merge window scan done"), // all three
      (2L, "merge window only"),      // missing scan
      (3L, "scan alone"),
      (4L, "window merge scan")       // order irrelevant
    ).toDF("doc_id", "text")
    val got = DocQueries.matchAllTerms(docs, "text", "Merge window SCAN")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 4L))
    // OR semantics for comparison: matchText keeps doc 2 and 3 as well
    assert(DocQueries.matchText(docs, "text", "merge window scan").count() == 4)
  }

  test("multiMatch: best_fields takes the max field, most_fields sums") {
    val docs = Seq(
      (1L, "merge merge here", "en"),  // text tf 2, lang 0
      (2L, "nothing relevant", "de"),  // text 0, lang tf 1 -> boost 3
      (3L, "merge data", "de"),        // text 1, lang 1
      (4L, "clean", "en")              // no match anywhere
    ).toDF("doc_id", "text", "lang")
    def run(mode: String) = DocQueries.multiMatch(docs,
        Seq(("text", 1.0), ("lang", 3.0)), "merge de", mode, 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val best = run("best_fields")
    assert(best == Map(1L -> 2.0, 2L -> 3.0, 3L -> 3.0), best)
    val most = run("most_fields")
    assert(most == Map(1L -> 2.0, 2L -> 3.0, 3L -> 4.0), most)
    // empty query matches nothing; bad mode rejected
    assert(DocQueries.multiMatch(docs, Seq(("text", 1.0)), "",
      "best_fields", 10).count() == 0)
    intercept[IllegalArgumentException] {
      DocQueries.multiMatch(docs, Seq(("text", 1.0)), "merge", "phrase", 10)
    }
  }

  test("boolQuery composes MUST, SHOULD/minimumShouldMatch, and MUST_NOT") {
    val docs = Seq(
      (1L, "merge stream now"),       // must + 1 should
      (2L, "merge scan stream"),      // must + 2 should
      (3L, "merge only here"),        // must, 0 should — below msm
      (4L, "merge window stream"),    // must_not hit
      (5L, "stream scan no m-word")   // missing must
    ).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().toSeq.sorted
    assert(ids(DocQueries.boolQuery(docs, "text", must = Seq("Merge"),
      should = Seq("stream", "scan"), mustNot = Seq("WINDOW"),
      minimumShouldMatch = 1)) == Seq(1L, 2L))
    // msm = 2: only the doc with both should terms survives
    assert(ids(DocQueries.boolQuery(docs, "text", must = Seq("merge"),
      should = Seq("stream", "scan"), minimumShouldMatch = 2)) == Seq(2L))
    // default msm with MUST present is 0 — should terms don't gate
    assert(ids(DocQueries.boolQuery(docs, "text", must = Seq("merge"),
      should = Seq("scan"))) == Seq(1L, 2L, 3L, 4L))
    // should-only: effective msm clamps to ≥1 even if 0 is passed
    // (a no-clause match must not select the whole corpus)
    assert(ids(DocQueries.boolQuery(docs, "text",
      should = Seq("scan"), minimumShouldMatch = 0)) == Seq(2L, 5L))
    // msm > |should| matches nothing, as in Lucene
    assert(DocQueries.boolQuery(docs, "text", should = Seq("scan"),
      minimumShouldMatch = 3).count() == 0)
    // duplicate clauses collapse: {scan, scan} is one clause, msm=2 → empty
    assert(DocQueries.boolQuery(docs, "text", should = Seq("scan", "Scan"),
      minimumShouldMatch = 2).count() == 0)
    // pure MUST_NOT is rejected loudly
    intercept[IllegalArgumentException] {
      DocQueries.boolQuery(docs, "text", mustNot = Seq("merge"))
    }
  }

  test("searchAfter pages through the BM25 ranking without gaps or overlap") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val q = "merge window scan"
    val full = DocQueries.matchTextBM25(docs, "doc_id", "text", q, 30)
      .as[(Long, Double)].collect().toSeq
    assert(full.size >= 15, s"corpus too small for paging test: ${full.size}")
    // page via cursors of 5 and reassemble the ranking prefix exactly
    var pages = Vector(DocQueries.matchTextBM25(docs, "doc_id", "text", q, 5)
      .as[(Long, Double)].collect().toSeq)
    while (pages.last.size == 5 && pages.size < 6) {
      val (lastId, lastScore) = (pages.last.last._1, pages.last.last._2)
      pages :+= DocQueries.searchAfter(docs, "doc_id", "text", q,
        lastScore, lastId, 5).as[(Long, Double)].collect().toSeq
    }
    val paged = pages.flatten
    assert(paged.size >= 15)
    assert(paged == full.take(paged.size))
    assert(paged.map(_._1).distinct.size == paged.size, "overlapping pages")
  }

  test("compositeAfter pages the bucket space without gaps or overlap") {
    val docs = graft.Tables.documents(spark, sf)
    val groupCols = Seq("lang", "source")
    val aggs = Seq(count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("sum_chars"))
    val full = docs.groupBy("lang", "source")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("lang", "source")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(full.size >= 8, s"bucket space too small: ${full.size}")
    // page via after-key cursors of 3 until a short page, reassemble
    var pages = Vector(DocQueries.compositeAfter(docs, groupCols, aggs,
      afterKey = None, size = 3)
      .as[(String, String, Long, Long)].collect().toSeq)
    while (pages.last.size == 3 && pages.size <= full.size / 3 + 1) {
      val cursor = Seq(pages.last.last._1, pages.last.last._2)
      pages :+= DocQueries.compositeAfter(docs, groupCols, aggs,
        afterKey = Some(cursor), size = 3)
        .as[(String, String, Long, Long)].collect().toSeq
    }
    assert(pages.last.size < 3, "paging never drained the bucket space")
    val paged = pages.flatten
    assert(paged == full, "reassembled pages must equal the full bucket space")
    // guards: arity/emptiness checks fail fast
    intercept[IllegalArgumentException] {
      DocQueries.compositeAfter(docs, groupCols, aggs, Some(Seq("en")), 3)
    }
    intercept[IllegalArgumentException] {
      DocQueries.compositeAfter(docs, Seq.empty, aggs, None, 3)
    }
    intercept[IllegalArgumentException] {
      DocQueries.compositeAfter(docs, groupCols, Seq.empty, None, 3)
    }
  }

  test("rareTerms and adjacencyMatrix aggregate in one corpus pass") {
    val docs = Seq(
      (1L, "alpha beta common", "en"),
      (2L, "beta common gamma", "de"),
      (3L, "common delta", "en"),
      (4L, "common", "en")).toDF("doc_id", "text", "lang")
    val rare = DocQueries.rareTerms(docs, "text", maxDocCount = 1, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(rare == Seq(("alpha", 1L), ("delta", 1L), ("gamma", 1L)))
    // threshold admits df=2; the k cut keeps the rarest-first prefix
    val rare2 = DocQueries.rareTerms(docs, "text", maxDocCount = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(rare2 == Seq(("alpha", 1L), ("delta", 1L)))
    intercept[IllegalArgumentException] {
      DocQueries.rareTerms(docs, "text", 0, 5)
    }
    val adj = DocQueries.adjacencyMatrix(docs, Seq(
        "en" -> (col("lang") === "en"),
        "beta" -> array_contains(split(col("text"), " "), "beta"),
        "delta" -> array_contains(split(col("text"), " "), "delta")))
      .as[(String, Long)].collect().toMap
    // beta&delta intersect nowhere → the bucket is absent (ES semantics)
    assert(adj == Map("en" -> 3L, "beta" -> 2L, "delta" -> 1L,
      "en&beta" -> 1L, "en&delta" -> 1L), adj.toString)
    intercept[IllegalArgumentException] {
      DocQueries.adjacencyMatrix(docs, Seq("a&b" -> lit(true)))
    }
    intercept[IllegalArgumentException] {
      DocQueries.adjacencyMatrix(docs,
        Seq("x" -> lit(true), "x" -> lit(false)))
    }
  }

  test("multiTerms / histogram bucket exactly, ES key conventions") {
    val docs = Seq(
      (1L, "en", "web", 100L), (2L, "en", "web", 260L),
      (3L, "en", "book", -3L), (4L, "de", "web", 250L),
      (5L, "de", "book", 500L)).toDF("doc_id", "lang", "source", "n")
    // count desc, then key columns asc on ties
    val mt = DocQueries.multiTerms(docs, Seq("lang", "source"), k = 3)
      .as[(String, String, Long)].collect().toSeq
    assert(mt == Seq(("en", "web", 2L), ("de", "book", 1L),
      ("de", "web", 1L)))
    intercept[IllegalArgumentException] {
      DocQueries.multiTerms(docs, Seq.empty, 3)
    }
    // ES floor key convention — negative values land in the −interval
    // bucket, not bucket 0
    val h = DocQueries.histogram(docs, "n", interval = 250)
      .as[(Long, Long)].collect().toSeq
    assert(h == Seq((-250L, 1L), (0L, 1L), (250L, 2L), (500L, 1L)))
    assert(DocQueries.histogram(docs, "n", 250, minDocCount = 2)
      .as[(Long, Long)].collect().toSeq == Seq((250L, 2L)))
    intercept[IllegalArgumentException] {
      DocQueries.histogram(docs, "n", 0)
    }
  }

  test("autoDateHistogram picks the finest rung within target") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:05"), (2L, "2024-01-01 00:59:59"),
      (3L, "2024-01-01 02:30:00"))
      .toDF("id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    // 2.5 h span: minute rung needs 151 buckets > 5, hour rung needs 3
    val byHour = DocQueries.autoDateHistogram(ev, "ts", targetBuckets = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(byHour.map(_._3).distinct == Seq(3600L))
    assert(byHour.map(_._2) == Seq(2L, 1L))
    assert(byHour.map(_._1).forall(_ % 3600 == 0))
    // generous target → finest rung wins
    val byMin = DocQueries.autoDateHistogram(ev, "ts", targetBuckets = 500)
    assert(byMin.select("interval_s").distinct()
      .as[Long].collect().toSeq == Seq(60L))
    intercept[IllegalArgumentException] {
      DocQueries.autoDateHistogram(ev, "ts", 0)
    }
    intercept[IllegalArgumentException] {
      DocQueries.autoDateHistogram(ev, "ts", 5, Seq(3600L, 60L))
    }
  }

  test("rankEval: hand-computed metrics, unjudged=0, no-relevant=0") {
    val rankings = Seq(
      ("q1", 1, 10L), ("q1", 2, 20L), ("q1", 3, 30L),
      ("q2", 1, 10L), ("q2", 2, 20L)).toDF("query", "rk", "doc_id")
    val judgments = Seq(("q1", 20L, 1), ("q1", 30L, 1), ("q1", 99L, 1))
      .toDF("query", "doc_id", "rel")
    val out = DocQueries.rankEval(rankings, judgments, k = 3)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val l3 = 1.0 / (math.log(3) / math.log(2))
    val dcg = l3 + 0.5                 // hits at ranks 2 and 3
    val idcg = 1.0 + l3 + 0.5          // 3 relevant, k=3
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out("q1") == ((r6(2.0 / 3), 0.5, r6(dcg / idcg))), out.toString)
    // q2 has no judged-relevant docs → zeros, not division errors
    assert(out("q2") == ((0.0, 0.0, 0.0)), out.toString)
    intercept[IllegalArgumentException] {
      DocQueries.rankEval(rankings, judgments, 0)
    }
  }

  test("phraseSuggest: distance-then-frequency, exact self-match, nulls") {
    val docs = Seq((1L, "merge merge window"), (2L, "merge window"),
      (3L, "marge")).toDF("doc_id", "text")
    val sug = DocQueries.phraseSuggest(docs, "doc_id", "text",
      "mrge window zzz", 1)
      .as[(Int, String, Option[String], Option[Long])].collect().toSeq
    // both 'merge'(df 2) and 'marge'(df 1) are 1 edit away → df wins
    assert(sug(0) == ((0, "mrge", Some("merge"), Some(2L))))
    // a known word is its own distance-0 candidate
    assert(sug(1) == ((1, "window", Some("window"), Some(2L))))
    // nothing within range → surfaced with a null suggestion
    assert(sug(2) == ((2, "zzz", None, None)))
    intercept[IllegalArgumentException] {
      DocQueries.phraseSuggest(docs, "doc_id", "text", "x", 0)
    }
  }

  test("diversifiedSampler: per-value cap + deterministic hash cut") {
    val docs = (1L to 30L).map(i => (i, if (i <= 24) "en" else "de"))
      .toDF("doc_id", "lang")
    val s = DocQueries.diversifiedSampler(docs, "doc_id", "lang",
      maxDocsPerValue = 5, shardSize = 8).as[(Long, String)].collect().toSeq
    assert(s.size == 8)
    assert(s.groupBy(_._2).forall(_._2.size <= 5))
    // deterministic: the same call yields the same sample
    val s2 = DocQueries.diversifiedSampler(docs, "doc_id", "lang", 5, 8)
      .as[(Long, String)].collect().toSeq
    assert(s.toSet == s2.toSet)
    // cap binds per value when the shard size stops cutting
    val s3 = DocQueries.diversifiedSampler(docs, "doc_id", "lang", 5, 30)
      .as[(Long, String)].collect().toSeq
    assert(s3.count(_._2 == "en") == 5 && s3.count(_._2 == "de") == 5)
    intercept[IllegalArgumentException] {
      DocQueries.diversifiedSampler(docs, "doc_id", "lang", 0, 5)
    }
  }

  test("stringStats: exact lengths + character-distribution entropy") {
    val docs = Seq(("aab", "en"), ("b", "en"), ("cc", "de"))
      .toDF("text", "lang")
    val st = DocQueries.stringStats(docs, "lang", "text")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // en chars: a×2, b×2 → uniform over 2 symbols → entropy exactly 1
    // de chars: c×2 → single symbol → entropy 0
    assert(st == Seq(("de", 1L, 2L, 2L, 2.0, 0.0),
      ("en", 2L, 1L, 3L, 2.0, 1.0)))
  }

  test("rankFeature / distanceFeature / pinned / termsSet / boolPrefix") {
    val docs = Seq(
      (1L, "alpha merge beta", 1000L),
      (2L, "merge merge window", 0L),
      (3L, "gamma delta", 4000L),
      (4L, "window merge scan", -5L)).toDF("doc_id", "text", "n")
    // saturation: S=pivot scores exactly boost/2; non-positive excluded
    val rf = DocQueries.rankFeature(docs, "doc_id", "n", pivot = 1000.0,
      boost = 2.0, k = 10).as[(Long, Double)].collect().toMap
    assert(rf == Map(1L -> 1.0, 3L -> 1.6))
    // distance: at the origin → full boost; decays with |x − origin|
    val dfr = DocQueries.distanceFeature(docs, "doc_id", "n",
      origin = 1000.0, pivot = 500.0, boost = 2.0, k = 4)
      .as[(Long, Double)].collect()
    assert(dfr.head == ((1L, 2.0)))
    // pinned: listed order first incl. a NON-matching doc; organic
    // tf ranking follows with pins excluded
    val pn = DocQueries.pinnedSearch(docs, "doc_id", "text",
      "merge window", pinnedIds = Seq(3L, 2L), k = 4)
      .as[(Long, Boolean, Long)].collect().toSeq
    assert(pn.map(_._1) == Seq(3L, 2L, 4L, 1L))
    assert(pn.map(_._2) == Seq(true, true, false, false))
    assert(pn.drop(2).map(_._3) == Seq(2L, 1L))
    // termsSet: per-doc required; required > |terms| never matches
    val ts = DocQueries.termsSetQuery(docs, "doc_id", "text",
      Seq("merge", "window"), lit(2))
    assert(ts.select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
    assert(DocQueries.termsSetQuery(docs, "doc_id", "text",
      Seq("merge"), lit(5)).count() == 0)
    // bool_prefix: leading tokens exact, LAST is a prefix; presence
    // scoring (clause count), not tf
    val bp = DocQueries.matchBoolPrefix(docs, "doc_id", "text",
      "merge wi", 10).as[(Long, Long)].collect().toSeq
    assert(bp == Seq((2L, 2L), (4L, 2L), (1L, 1L)))
    intercept[IllegalArgumentException] {
      DocQueries.pinnedSearch(docs, "doc_id", "text", "x", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      DocQueries.termsSetQuery(docs, "doc_id", "text", Seq("a", "a"),
        lit(1))
    }
  }

  test("range and facetCounts compose as filter + aggregate") {
    val docs = Seq(
      (1L, 100L, "en"), (2L, 200L, "en"), (3L, 300L, "de"),
      (4L, 400L, "fr"), (5L, 500L, "de")).toDF("doc_id", "n", "lang")
    // inclusive lower, exclusive upper
    assert(DocQueries.range(docs, "n", Some(200L), Some(500L),
      includeUpper = false).select("doc_id").as[Long].collect().toSet
      == Set(2L, 3L, 4L))
    // one-sided
    assert(DocQueries.range(docs, "n", lower = None, upper = Some(200L))
      .count() == 2)
    intercept[IllegalArgumentException] {
      DocQueries.range(docs, "n")
    }
    val f = DocQueries.facetCounts(docs, "lang", 2)
      .as[(String, Long)].collect().toSeq
    assert(f == Seq(("de", 2L), ("en", 2L))) // count desc, value asc
  }

  test("percolate routes docs to registered queries by clause sets") {
    val docs = Seq(
      (1L, "merge window open"),        // alert_a (no scan)
      (2L, "merge window scan"),        // must_not kills alert_a
      (3L, "merge only"),               // partial must — no match
      (4L, "window merge extra"),       // order-free — alert_a
      (5L, "")
    ).toDF("doc_id", "text")
    val registered = Seq(
      ("alert_a", Seq("merge", "window"), Seq("scan")),
      ("alert_b", Seq("merge", "merge"), Seq.empty[String]) // dup clause collapses
    ).toDF("query_id", "must", "must_not")
    val got = DocQueries.percolate(docs, "doc_id", "text", registered)
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "alert_a"), (4L, "alert_a"),
      (1L, "alert_b"), (2L, "alert_b"), (3L, "alert_b"), (4L, "alert_b")))
    // missing columns rejected loudly
    intercept[IllegalArgumentException] {
      DocQueries.percolate(docs, "doc_id", "text",
        Seq(("q", Seq("a"))).toDF("query_id", "must"))
    }
    // a clause-less query fails LOUDLY at evaluation (never a silent
    // engine-matches-nothing / oracle-matches-everything divergence)
    val boom = intercept[Exception] {
      DocQueries.percolate(docs, "doc_id", "text",
        Seq(("alert_empty", Seq.empty[String], Seq.empty[String]))
          .toDF("query_id", "must", "must_not")).collect()
    }
    assert(boom.getMessage.contains("no MUST or SHOULD"),
      boom.getMessage)
  }

  test("match_phrase_prefix: leading tokens exact, last token a prefix") {
    val docs = Seq(
      (1L, "merge window open"),       // "merge wind" hits (prefix)
      (2L, "merge the window"),        // not consecutive — no hit
      (3L, "submerge window"),         // "merge" must START a token
      (4L, "merge windowless panes"),  // prefix continues further — hits
      (5L, "merge window"),            // exact full phrase — hits
      (6L, "window merge")             // wrong order — no hit
    ).toDF("doc_id", "text")
    def ids(q: String): Set[Long] =
      DocQueries.matchPhrasePrefix(docs, "text", q)
        .select("doc_id").as[Long].collect().toSet
    assert(ids("merge wind") == Set(1L, 4L, 5L))
    // complete last token behaves like matchPhrase WITHOUT the closing
    // boundary: "merge window" also admits "windowless"
    assert(ids("merge window") == Set(1L, 4L, 5L))
    // single token degrades to term-prefix
    assert(ids("merg") == Set(1L, 2L, 4L, 5L, 6L))
    intercept[IllegalArgumentException] {
      DocQueries.matchPhrasePrefix(docs, "text", "  ")
    }
  }

  test("boosting query downranks negative matches without excluding them") {
    val docs = Seq(
      (1L, "merge window clean"),            // positive only
      (2L, "merge window stream stream"),    // positive + negative
      (3L, "stream only here"),              // negative only — no score
      (4L, "unrelated text")
    ).toDF("doc_id", "text")
    val got = DocQueries.boostingSearch(docs, "doc_id", "text",
        "merge window", Seq("stream"), demoteFactor = 0.5, k = 10)
      .as[(Long, Double)].collect().toMap
    val plain = DocQueries.matchTextBM25(docs, "doc_id", "text",
        "merge window", 10)
      .as[(Long, Double)].collect().toMap
    // the negative match stays IN the result set, at half score
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - plain(1L)) < 1e-9)
    assert(math.abs(got(2L) - plain(2L) * 0.5) < 1e-6)
    // factor 0 is must_not-like scoring (zero, still listed)
    val zero = DocQueries.boostingSearch(docs, "doc_id", "text",
        "merge window", Seq("stream"), demoteFactor = 0.0, k = 10)
      .as[(Long, Double)].collect().toMap
    assert(zero(2L) == 0.0 && zero.contains(1L))
    intercept[IllegalArgumentException] {
      DocQueries.boostingSearch(docs, "doc_id", "text", "merge",
        Nil, 0.5, 10)
    }
    intercept[IllegalArgumentException] {
      DocQueries.boostingSearch(docs, "doc_id", "text", "merge",
        Seq("stream"), 1.5, 10)
    }
  }

  test("functionScoreGauss: plateau keeps BM25 order, tail decays, guards") {
    val docs = Seq(
      (1L, "merge window clean", 100L),        // inside the plateau
      (2L, "merge window merge scan", 200L),   // inside the plateau
      (3L, "merge window clean", 2500L),       // scale past the plateau
      (4L, "unrelated text", 100L)
    ).toDF("doc_id", "text", "n_chars")
    val got = DocQueries.functionScoreGauss(docs, "doc_id", "text",
        "merge window", "n_chars", origin = 0.0, scale = 2000.0,
        offset = 500.0, decay = 0.5, k = 10)
      .as[(Long, Double)].collect().toMap
    val plain = DocQueries.matchTextBM25(docs, "doc_id", "text",
        "merge window", 10)
      .as[(Long, Double)].collect().toMap
    // inside the offset plateau the decay factor is exactly 1
    assert(math.abs(got(1L) - plain(1L)) < 1e-9)
    assert(math.abs(got(2L) - plain(2L)) < 1e-9)
    // the ES calibration point: at |v−origin| = offset + scale the
    // factor is exactly `decay` (doc 3 sits there: 2500 = 500 + 2000)
    assert(math.abs(got(3L) - plain(3L) * 0.5) < 1e-6)
    // no-match docs stay excluded (filter precedes the decay)
    assert(!got.contains(4L))
    intercept[IllegalArgumentException] {
      DocQueries.functionScoreGauss(docs, "doc_id", "text", "merge",
        "n_chars", 0.0, -1.0, 0.0, 0.5, 10)
    }
    intercept[IllegalArgumentException] {
      DocQueries.functionScoreGauss(docs, "doc_id", "text", "merge",
        "n_chars", 0.0, 2000.0, 0.0, 1.5, 10)
    }
  }

  test("significantTerms: JLH ranks slice-characteristic vocabulary") {
    val docs = Seq(
      (1L, "der alpha beta", "de"),
      (2L, "der der gamma beta", "de"),   // 'der' once per doc (doc freq)
      (3L, "alpha beta common", "en"),
      (4L, "beta common filler", "en"),
      (5L, "common filler words", "en")
    ).toDF("doc_id", "text", "lang")
    val got = DocQueries.significantTerms(docs, "doc_id", "text",
        col("lang") === "de", minDocCount = 1, k = 10)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // 'der': fg 2/2, bg 2/5 → JLH = (1 − 0.4) · (1 / 0.4) = 1.5
    assert(got("der") == (("der", 2L, 2L, 1.5)))
    // 'beta' is in every fg doc but also 2 bg docs: fg 2/2, bg 4/5
    assert(got("beta")._4 == 0.25)
    // background-only terms score ≤ 0 and are dropped
    assert(!got.contains("common") && !got.contains("filler"))
    // duplicate within a doc counted once (doc-frequency semantics)
    assert(got("der")._2 == 2L)
    // minDocCount prunes one-off foreground terms ('gamma')
    val pruned = DocQueries.significantTerms(docs, "doc_id", "text",
        col("lang") === "de", minDocCount = 2, k = 10)
      .select("term").as[String].collect().toSet
    assert(!pruned.contains("gamma") && pruned.contains("der"))
    intercept[IllegalArgumentException] {
      DocQueries.significantTerms(docs, "doc_id", "text",
        col("lang") === "de", 0, 10)
    }
  }

  test("disMax: best clause wins, tie-breaker folds in the rest") {
    val docs = Seq(
      (1L, "merge window merge window details"), // strong clause A only
      (2L, "scan stream scan stream report"),    // strong clause B only
      (3L, "merge window scan stream"),          // both clauses hit
      (4L, "nothing relevant at all")            // no clause
    ).toDF("doc_id", "text")
    val clauses = Seq("merge window", "scan stream")
    // tieBreaker 0: pure max — a doc hitting both clauses scores its
    // BEST clause, never the sum
    val pure = DocQueries.disMaxSearch(docs, "doc_id", "text", clauses,
        tieBreaker = 0.0, k = 10)
      .as[(Long, Double)].collect().toMap
    val a = DocQueries.matchTextBM25(docs, "doc_id", "text", clauses(0), 10)
      .as[(Long, Double)].collect().toMap
    val b = DocQueries.matchTextBM25(docs, "doc_id", "text", clauses(1), 10)
      .as[(Long, Double)].collect().toMap
    assert(!pure.contains(4L))
    for ((id, sc) <- pure)
      assert(math.abs(sc - math.max(a.getOrElse(id, 0.0),
        b.getOrElse(id, 0.0))) < 1e-9, s"doc $id")
    // tieBreaker 1: the sum — and between, strictly monotone in overlap
    val sum = DocQueries.disMaxSearch(docs, "doc_id", "text", clauses,
        tieBreaker = 1.0, k = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(sum(3L) -
      (a.getOrElse(3L, 0.0) + b.getOrElse(3L, 0.0))) < 1e-6)
    val mid = DocQueries.disMaxSearch(docs, "doc_id", "text", clauses,
        tieBreaker = 0.3, k = 10)
      .as[(Long, Double)].collect().toMap
    assert(mid(3L) > pure(3L) && mid(3L) < sum(3L))
    // single clause degenerates to plain BM25 ranking
    val one = DocQueries.disMaxSearch(docs, "doc_id", "text",
        Seq("merge window"), tieBreaker = 0.3, k = 10)
      .as[(Long, Double)].collect().toMap
    assert(one == a)
    intercept[IllegalArgumentException] {
      DocQueries.disMaxSearch(docs, "doc_id", "text", Nil, 0.3, 10)
    }
    intercept[IllegalArgumentException] {
      DocQueries.disMaxSearch(docs, "doc_id", "text", clauses, 1.5, 10)
    }
  }

  test("percolate SHOULD clauses with minimumShouldMatch defaults") {
    val docs = Seq(
      (1L, "merge window open"),
      (2L, "stream query merge"),
      (3L, "stream only"),
      (4L, "window scan pair")
    ).toDF("doc_id", "text")
    val registered = Seq(
      // must + should, default msm (must present ⇒ 0): should is optional
      ("m_plus_s", Seq("merge"), Seq("stream"), Seq.empty[String], -1),
      // should-only, default msm (must-less ⇒ 1): the OR query
      ("or_q", Seq.empty[String], Seq("open", "scan"), Seq.empty[String], -1),
      // should-only with explicit msm=2 of 3
      ("two_of", Seq.empty[String], Seq("stream", "query", "window"),
        Seq.empty[String], 2),
      // must-less msm=0 saturates to 1 (never a match-all amplifier)
      ("zero_msm", Seq.empty[String], Seq("merge"), Seq.empty[String], 0),
      // msm > |should| matches nothing, as in Lucene
      ("too_many", Seq.empty[String], Seq("merge"), Seq.empty[String], 5)
    ).toDF("query_id", "must", "should", "must_not", "minimum_should_match")
    val got = DocQueries.percolate(docs, "doc_id", "text", registered)
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "m_plus_s"), (2L, "m_plus_s"),       // merge present; should free
      (1L, "or_q"), (4L, "or_q"),               // ≥1 of open/scan
      (2L, "two_of"),                           // stream+query; others hit ≤1
      (1L, "zero_msm"), (2L, "zero_msm")        // saturated msm=1
    ), got.toString)
  }

  test("highlightTerm returns first-match position and edge-clamped snippet") {
    val docs = Seq(
      (1L, "alpha beta MERGE gamma delta epsilon"), // interior match
      (2L, "merge at the very start"),              // left edge clamps
      (3L, "ends with a merge"),                    // right edge clamps
      (4L, "merge early then merge again"),         // FIRST occurrence only
      (5L, "no match here"),
      (6L, "submerged not matched")                 // token, not substring
    ).toDF("doc_id", "text")
    val got = DocQueries.highlightTerm(docs, "doc_id", "text", "Merge")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 3L, "alpha beta merge gamma delta"),
      (2L, 1L, "merge at the"),
      (3L, 4L, "with a merge"),
      (4L, 1L, "merge early then")))
    // multi-token or empty highlight terms are rejected
    intercept[IllegalArgumentException] {
      DocQueries.highlightTerm(docs, "doc_id", "text", "two words")
    }
  }

  test("moreLikeThis ranks docs sharing the source's characteristic terms") {
    val docs = Seq(
      (0L, "quantum flux capacitor quantum"), // source: 3 rare terms
      (1L, "quantum flux theory"),            // shares 2 → ranked first
      (2L, "quantum mechanics basics"),       // shares 1
      (3L, "cooking pasta recipes"),          // shares 0 → absent
      (4L, "the the the the")                 // no overlap either
    ).toDF("doc_id", "text")
    val got = DocQueries.moreLikeThis(docs, "doc_id", "text",
      sourceId = 0L, topTerms = 3, k = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(!got.contains(0L), "source doc must be excluded")
    assert(got == Seq(1L, 2L), got)
    // a source with no tokens (or absent) fails loudly
    intercept[IllegalArgumentException] {
      DocQueries.moreLikeThis(docs, "doc_id", "text", sourceId = 99L)
    }
  }

  test("jsonKeyProfile reports per-key presence, cardinality, and range") {
    val df = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2}""",
      """{"b": "y", "c": true}""",
      "not json at all",
      null
    ).toDF("props")
    val p = graft.operators.Profile.jsonKeyProfile(df, "props")
      .orderBy("key")
      .as[(String, Long, Long, String, String)].collect().toSeq
    // unparseable/null rows contribute nothing; values compare as
    // strings; HLL++ is exact at these cardinalities
    assert(p == Seq(
      ("a", 2L, 2L, "1", "2"),
      ("b", 2L, 2L, "x", "y"),
      ("c", 1L, 1L, "true", "true")))
  }

  test("ranked match orders by term frequency with deterministic ties") {
    val idx = Seq(
      ("1", "merge merge window"), ("2", "merge scan"), ("3", "nothing here"))
      .toDF("_id", "text")
    val out = DocQueries.matchTextRanked(idx, "text", "merge window scan", 10)
      .select("_id", "score").as[(String, Int)].collect().toSeq
    assert(out == Seq(("1", 3), ("2", 2)))
  }

  test("collapseTop keeps each group's best by (score desc, id asc), no Window") {
    val scored = Seq(
      ("s1", 1L, 5), ("s1", 2L, 9), ("s1", 3L, 9),   // s1 best: id 2 (tie on 9)
      ("s2", 4L, 7),
      ("s3", 5L, 1), ("s3", 6L, 2),                  // s3 best: id 6
      ("s4", 7L, 8)
    ).toDF("source", "doc_id", "score")
    val got = DocQueries.collapseTop(scored, "source", "doc_id", "score", 3)
      .as[(String, Long, Int)].collect().toSeq
    // top-3 groups by representative score: s1(9) > s4(8) > s2(7)
    assert(got == Seq(("s1", 2L, 9), ("s4", 7L, 8), ("s2", 4L, 7)), got.toString)
    val plan = DocQueries.collapseTop(scored, "source", "doc_id", "score", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("doc queries: term, term-in-set, match-text over an index view") {
    val idx = Seq(
      ("1", "en", "the quick brown fox"),
      ("2", "de", "der schnelle fuchs"),
      ("3", "en", "lazy dogs sleep")).toDF("_id", "lang", "text")
    assert(DocQueries.matchAll(idx).count() == 3)
    assert(DocQueries.term(idx, "lang", "de").select("_id").as[String].head() == "2")
    assert(DocQueries.termInSet(idx, "_id", Seq("1", "3")).count() == 2)
    assert(DocQueries.matchText(idx, "text", "FOX sleeping").select("_id")
      .as[String].collect().toSet == Set("1"))
  }
}
