package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a quick brown fox appears"),  // shares "quick brown fox"
      (2L, "totally unrelated content here"),
      (3L, "the quick brown fox jumps")   // verbatim copy: many shared
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, bench, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.map(_._3) == Seq(true, false, true))
    assert(out(0)._2 == 1) // exactly "quick brown fox"
    assert(out(2)._2 == 3) // all three shingles of the 5-word doc
  }

  test("decontaminate broadcasts the benchmark side") {
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val train = Seq((2L, "a b c d")).toDF("doc_id", "text")
    val plan = Corpus.decontaminate(train, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark probe should be a broadcast join:\n$plan")
  }

  test("global cumulative sum matches the window reference") {
    val df = spark.range(1000).select(
      col("id"), (pmod(col("id") * 37 + 11, lit(50)) + 1).as("w"))
    val got = Corpus.withGlobalCumSum(df, col("id"), col("w"), "cum")
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    val expect = df.select(col("id"),
        coalesce(sum("w").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("cum"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("binTexts concatenates each bin's docs in id order") {
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j")).toDF("doc_id", "text")
    // token counts 3,2,4,1; starts 0,3,5,9; budget 5 → bins 0,0,1,1
    val out = Corpus.binTexts(docs, "doc_id", "text", 5L)
      .orderBy("bin_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((0L, 2L, 5L, "a b c d e"), (1L, 2L, 5L, "f g h i j")))
  }

  test("deterministic sample is reproducible and permille-bounded") {
    val df = spark.range(2000).toDF("id")
    val a = Corpus.deterministicSample(df, "id", 200).as[Long].collect().toSet
    val b = Corpus.deterministicSample(df, "id", 200).as[Long].collect().toSet
    assert(a == b) // same keep-set every run
    assert(math.abs(a.size - 400) < 80, s"~20% expected, got ${a.size}/2000")
    // monotone: a larger rate keeps a superset
    val c = Corpus.deterministicSample(df, "id", 500).as[Long].collect().toSet
    assert(a.subsetOf(c))
    assert(Corpus.deterministicSample(df, "id", 0).count() == 0)
    assert(Corpus.deterministicSample(df, "id", 1000).count() == 2000)
  }

  test("capPerStratum keeps a deterministic hash prefix per stratum") {
    val df = spark.range(100).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("src"))
    val capped = Corpus.capPerStratum(df, "id", "src", 5)
    assert(capped.groupBy("src").count().select("count")
      .as[Long].collect().forall(_ == 5))
    // deterministic: identical keep-set on re-run
    val a = capped.select("id").as[Long].collect().toSet
    val b = Corpus.capPerStratum(df, "id", "src", 5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // prefix property: cap 3 keeps a subset of cap 5
    val c = Corpus.capPerStratum(df, "id", "src", 3)
      .select("id").as[Long].collect().toSet
    assert(c.subsetOf(a) && c.size == 12)
    // cap above stratum size keeps everything
    assert(Corpus.capPerStratum(df, "id", "src", 1000).count() == 100)
  }

  test("packSequences: bin is the bin the doc's start offset falls in") {
    // token counts: 3, 4, 2, 5, 1 — budget 6
    // starts:       0, 3, 7, 9, 14 → bins 0, 0, 1, 1, 2
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b"),
      (4L, "a b c d e"), (5L, "a")).toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, "doc_id", "text", 6L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L),
      (4L, 5L, 1L), (5L, 1L, 2L)))
  }
}
