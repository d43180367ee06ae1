package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

class BatchingSpec extends SparkSpec {
  import spark.implicits._

  test("withGroupRowNumber equals the window form on skewed groups") {
    // group sizes 1, 10, 200 — the skew the per-group window would
    // funnel into single tasks at scale
    val rows = Seq.tabulate(1)(i => ("tiny", i.toLong)) ++
      Seq.tabulate(10)(i => ("mid", i.toLong)) ++
      Seq.tabulate(200)(i => ("big", i.toLong))
    val df = rows.toDF("g", "v")
    val got = Batching.withGroupRowNumber(df, "g", col("v"), "rk")
      .select("g", "v", "rk").as[(String, Long, Long)].collect().toSet
    val want = df.withColumn("rk",
        row_number().over(Window.partitionBy("g").orderBy("v"))
          .cast("long"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("withGroupRowNumber: each group numbers 1..n contiguously") {
    val df = spark.range(1000).select(
      (col("id") % 7).cast("string").as("g"), col("id").as("v"))
    val out = Batching.withGroupRowNumber(df, "g", col("v"), "rk")
    val perGroup = out.groupBy("g").agg(count(lit(1)).as("n"),
      min("rk").as("mn"), max("rk").as("mx"),
      countDistinct("rk").as("d"))
      .as[(String, Long, Long, Long, Long)].collect()
    for ((g, n, mn, mx, d) <- perGroup)
      assert(mn == 1L && mx == n && d == n, s"group $g: $mn..$mx/$n")
  }

  test("two-phase numbering rejects high-cardinality group columns loudly") {
    // the per-(partition, group) collect is partitions x groups-sized;
    // a unique-per-row groupCol must fail with guidance, not OOM the
    // driver silently at scale
    val wide = spark.range(Batching.MaxGroupsPerPartition + 2L)
      .select(col("id").cast("string").as("g"), col("id").as("v"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val e1 = intercept[Exception] {
        Batching.withGroupRowNumber(wide, "g", col("v"), "rk").count()
      }
      assert(e1.toString.contains("distinct") ||
        Option(e1.getCause).exists(_.toString.contains("distinct")), e1)
      val e2 = intercept[Exception] {
        Corpus.groupPercentRank(wide, "g", col("v"), "pr").count()
      }
      assert(e2.toString.contains("distinct") ||
        Option(e2.getCause).exists(_.toString.contains("distinct")), e2)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("verifiedEnd fires exactly once, at exhaustion, with the row count") {
    var calls = 0
    var seen = -1L
    val it = Batching.verifiedEnd(Iterator(1, 2, 3)) { n =>
      calls += 1; seen = n
    }
    assert(it.toList == List(1, 2, 3))
    assert(!it.hasNext && !it.hasNext) // idempotent after exhaustion
    assert(calls == 1 && seen == 3L)
    // empty partitions verify too (count 0)
    var n0 = -1L
    assert(!Batching.verifiedEnd(Iterator.empty[Int])(n0 = _).hasNext)
    assert(n0 == 0L)
  }

  test("verifiedEnd: exact-n consumption via next() alone still verifies") {
    // a consumer that knows the count pulls with next() and never makes
    // a trailing hasNext call (copyToArray fills the array and exits on
    // the length check; custom mapPartitions loops do the same) — full
    // consumption must verify, not read as abandonment
    var calls = 0
    var seen = -1L
    val it = Batching.verifiedEnd(Iterator(1, 2, 3)) { n =>
      calls += 1; seen = n
    }
    it.next(); it.next()
    assert(calls == 0) // not yet drained
    assert(it.next() == 3)
    assert(calls == 1 && seen == 3L) // verified AT the last next()
    // copyToArray into an exact-size target: same protocol
    var calls2 = 0
    val it2 = Batching.verifiedEnd(Iterator(4, 5)) { n =>
      calls2 += 1; assert(n == 2L)
    }
    val out = new Array[Int](2)
    it2.copyToArray(out)
    assert(out.toSeq == Seq(4, 5) && calls2 == 1)
  }

  test("exact-n task consumer passes the drain guard end-to-end") {
    // the Spark-path twin: a mapPartitions consumer that pulls exactly
    // the known partition count via next() (no trailing hasNext) must
    // complete — the task-completion listener sees a drained iterator,
    // not an abandoned one
    val df = spark.range(256).select(col("id").as("v"))
    val numbered = Batching.withGlobalRowNumber(df, col("v"), "rk")
    val counts = numbered.rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size)))
      .collect().toMap
    val bc = spark.sparkContext.broadcast(counts)
    val rkIdx = numbered.schema.fieldIndex("rk")
    val total = numbered.rdd.mapPartitionsWithIndex { (pid, it) =>
      val n = bc.value(pid)
      var s = 0L
      var i = 0
      // copyToArray's protocol: hasNext gates each pull (codegen row
      // iterators require it), but the length check short-circuits
      // FIRST — no trailing hasNext after the last element
      while (i < n && it.hasNext) { s += it.next().getLong(rkIdx); i += 1 }
      Iterator.single(s)
    }.sum()
    assert(total == 256L * 257L / 2L)
  }

  test("completion-listener drain probe: verify failures propagate, untouched-empty passes") {
    // an untouched, already-empty iterator verifies at task completion
    // (count 0) — no spurious abandonment error
    val ok = spark.sparkContext.parallelize(1 to 4, 2).mapPartitions { it =>
      var n = 0; while (it.hasNext) { it.next(); n += 1 }
      Batching.verifiedEnd(Iterator.empty[Int])(c =>
        if (c != 0L) throw new IllegalStateException("impossible")): Unit
      Iterator.single(n)
    }.sum()
    assert(ok == 4.0)
    // ...but a DIVERGENCE thrown by that last-chance verify must fail
    // the task, never be swallowed by the probe's guard
    val bad = spark.sparkContext.parallelize(1 to 4, 2).mapPartitions { it =>
      while (it.hasNext) it.next()
      Batching.verifiedEnd(Iterator.empty[Int])(_ =>
        throw new IllegalStateException("diverged-probe")): Unit
      Iterator.empty[Int]
    }
    val e = intercept[Exception](bad.count())
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("diverged-probe"), msg)
  }

  test("limit on an unverified numbered result fails loudly; persist-then-limit passes") {
    // the verifiedEnd abandonment guard: a limit/take that abandons the
    // pass-2 iterator mid-partition can't run the divergence check, so
    // the task must fail with the persist()-then-limit guidance instead
    // of returning unverified numbers
    val df = spark.range(5000).select(col("id").as("v"))
    val numbered = Batching.withGlobalRowNumber(df, col("v"), "rk")
    val e = intercept[Exception](numbered.limit(3).collect())
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("persist"), msg)
    // the documented pattern: persist drains every partition (the
    // verification runs during materialization), limit reads the cache
    val cached = Batching.withGlobalRowNumber(df, col("v"), "rk").persist()
    try {
      assert(cached.count() == 5000L)
      assert(cached.limit(3).collect().length == 3)
      assert(cached.orderBy("rk").take(1).head.getLong(1) == 1L)
    } finally { cached.unpersist(); () }
  }

  test("snapshot divergence fails loudly through the Spark task path") {
    // the pass-2 guard's failure mode end-to-end: a partition whose
    // replay count mismatches pass 1 must kill the job with the
    // deterministic-source guidance, not renumber silently
    val rdd = spark.range(10).repartition(2).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Batching.verifiedEnd(it)(n =>
          Batching.snapshotDiverged("testOp", pid,
            s"pass 1 counted ${n + 1} rows, pass 2 saw $n"))
      }
    val e = intercept[Exception](rdd.count())
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("diverged") && msg.contains("deterministic"), msg)
  }

  test("nondeterministic sources stay green while the shuffle snapshot holds") {
    // rand()-derived input: the range shuffle's map stage runs once and
    // both passes read its files (skipped stage), so the two-phase
    // numbering is consistent — and the new count guard confirms the
    // snapshot rather than rejecting the source outright (it only fails
    // when a between-pass recompute actually diverges)
    val df = spark.range(500).select(
      (col("id") % 5).cast("string").as("g"),
      rand(seed = 7).as("v"))
    val out = Batching.withGroupRowNumber(df, "g", col("v"), "rk")
    val perGroup = out.groupBy("g").agg(count(lit(1)).as("n"),
      min("rk").as("mn"), max("rk").as("mx"), countDistinct("rk").as("d"))
      .as[(String, Long, Long, Long, Long)].collect()
    for ((g, n, mn, mx, d) <- perGroup)
      assert(mn == 1L && mx == n && d == n, s"group $g: $mn..$mx/$n")
    val cum = Corpus.withGlobalCumSum(
      spark.range(300).select(rand(11).as("o"), lit(2L).as("w")),
      col("o"), col("w"), "cs")
    assert(cum.agg(max("cs")).as[Long].head() == 598L) // (300-1) * 2
  }

  test("interleaveBySource round-robins sources by rank") {
    val docs = (1L to 30L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val out = Corpus.interleaveBySource(docs, "doc_id", "source")
      .orderBy("position")
      .as[(Long, Long, String, Long)].collect().toSeq
    // positions group into rounds of 3 distinct sources; within a
    // round, sources appear in lexicographic order
    for (round <- out.grouped(3)) {
      assert(round.map(_._3).toSet.size == 3)
      assert(round.map(_._3) == round.map(_._3).sorted)
      assert(round.map(_._4).toSet.size == 1) // same rank across the round
    }
  }
}
