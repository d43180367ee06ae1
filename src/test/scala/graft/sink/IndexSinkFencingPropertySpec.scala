package graft.sink

import org.apache.hadoop.fs.{Path => HPath}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property check for the DOCUMENT SINK's writer fencing under random
  * interleavings of commits, vacuums, rival arrivals and restarts — the
  * sink-level twin of [[DeltaLogCrashPropertySpec]]'s store schedules
  * (the r14 verdict reviewed the vacuum design as sound; this pins it
  * adversarially). Invariants, checked after every op:
  *
  *   1. `searchable()` always equals the model (last committed value per
  *      key) — a fenced mutation changes nothing visible;
  *   2. a fenced commit/vacuum fails with [[FencedWriterException]], and
  *      pending ops survive to the writer's next successful commit
  *      (at-least-once replay, not loss);
  *   3. after any vacuum, every bucket dir a retained manifest
  *      references still exists on disk (the snapshot-then-delete
  *      convention: GC can never eat a referenced file);
  *   4. a restart (fresh epoch) always reclaims the store.
  */
class IndexSinkFencingPropertySpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case object Commit extends Op
  private case object Vacuum extends Op
  private case object Rival extends Op // a second writer claims the store
  private case object Restart extends Op // this writer re-acquires

  private val opGen: Gen[Op] = Gen.frequency(
    (5, Gen.const(Commit)), (3, Gen.const(Vacuum)),
    (2, Gen.const(Rival)), (2, Gen.const(Restart)))

  test("interleaved commit/vacuum/rival/restart schedules keep the sink consistent") {
    val prop = Prop.forAll(Gen.listOfN(14, opGen)) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("sink-fenceprop").toString
      val sink = new ParquetIndexSink(spark, dir, numBuckets = 2)
      val f = DeltaLog.fs(spark, dir)
      var expected = Map.empty[String, String] // committed view
      var pending = Map.empty[String, String] // buffered, not yet committed
      var fenced = false // our session epoch is older than a rival's
      var hasEpoch = false // we've mutated since the last restart
      var n = 0
      def view(): Map[String, String] =
        if (sink.history().isEmpty) Map.empty
        else sink.searchable().select("_id", "v").as[(String, String)]
          .collect().toMap
      def retainedComplete(): Boolean =
        sink.committedBuckets.values.forall(rel =>
          f.exists(new HPath(s"$dir/$rel")))
      // Commit opens every schedule: the sink is born through a real
      // commit (matching production), and it gives rivals something to
      // fence.
      (Commit :: ops).forall { op =>
        val stepOk = op match {
          case Commit =>
            n += 1
            val (k, v) = (s"k${n % 3}", s"v$n")
            sink.addDocuments(Seq((k, v)).toDF("_id", "v"))
            pending += (k -> v)
            if (fenced) {
              val thrown =
                try { sink.commit(); false }
                catch { case _: FencedWriterException => true }
              // pending ops stay buffered in the sink — they land with
              // the next successful commit after a restart
              thrown
            } else {
              sink.commit()
              hasEpoch = true
              expected ++= pending
              pending = Map.empty
              true
            }
          case Vacuum =>
            if (fenced && sink.history().nonEmpty) {
              try { sink.vacuum(); false }
              catch { case _: FencedWriterException => true }
            } else {
              sink.vacuum(): Unit
              if (sink.history().nonEmpty) hasEpoch = true
              true
            }
          case Rival =>
            DeltaLog.acquireEpoch(spark, dir): Unit
            // only fences us if we actually hold an older claim; if we
            // have not mutated yet, our next acquire goes PAST the rival
            if (hasEpoch) fenced = true
            true
          case Restart =>
            DeltaLog.clearSessionEpoch(dir)
            fenced = false
            hasEpoch = false
            true
        }
        // invariants hold after EVERY op, not just at schedule end
        stepOk && view() == expected &&
          (op != Vacuum || retainedComplete())
      } && retainedComplete()
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}
