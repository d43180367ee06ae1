package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property checks for the two dedup guarantees that hold by
  * construction, exercised over generated corpora rather than goldens
  * (one Spark job per property — all cases batched into one frame):
  *
  *   - Winnowing (Schleimer/Wilkerson/Aiken): any shared substring of
  *     ≥ k + w − 1 tokens between two documents yields at least one
  *     SHARED fingerprint.
  *   - duplicateSpans: every shared substring of ≥ k tokens is COVERED
  *     by an emitted run on each participating document (runs may
  *     extend beyond the planted span when accidental duplicates abut —
  *     covering, not equality, is the contract).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  // vocab large enough that accidental k-gram collisions are rare but
  // possible — the properties must hold either way
  private def word(r: Random): String = "w" + r.nextInt(40)
  private def words(r: Random, n: Int): Seq[String] =
    Seq.fill(n)(word(r))

  private case class Case(idA: Long, idB: Long, textA: String,
    textB: String, startA: Int, startB: Int, runLen: Int)

  private def genCases(nCases: Int, minRun: Int): Seq[Case] = {
    val r = new Random(42)
    (0 until nCases).map { i =>
      val run = words(r, minRun + r.nextInt(5))
      val (preA, sufA) = (words(r, r.nextInt(8)), words(r, r.nextInt(8)))
      val (preB, sufB) = (words(r, r.nextInt(8)), words(r, r.nextInt(8)))
      Case(2L * i, 2L * i + 1,
        (preA ++ run ++ sufA).mkString(" "),
        (preB ++ run ++ sufB).mkString(" "),
        preA.length, preB.length, run.length)
    }
  }

  test("winnowing: shared >= k+w-1-token substrings share a fingerprint") {
    val cases = genCases(40, k + w - 1)
    val docs = cases.flatMap(c =>
        Seq((c.idA, c.textA), (c.idB, c.textB)))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text", k, w)
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }
    cases.foreach { c =>
      assert(fps(c.idA).intersect(fps(c.idB)).nonEmpty,
        s"case ${c.idA / 2}: no shared fingerprint for shared " +
          s"${c.runLen}-token run\nA: ${c.textA}\nB: ${c.textB}")
    }
  }

  test("duplicateSpans: every shared >= k-token substring is covered") {
    val cases = genCases(40, k)
    val docs = cases.flatMap(c =>
        Seq((c.idA, c.textA), (c.idB, c.textB)))
      .toDF("doc_id", "text")
    val runs = Dedup.duplicateSpans(docs, "doc_id", "text", k)
      .select("doc_id", "span_start", "span_tokens")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3)).toSeq }
    def covered(id: Long, start: Int, len: Int): Boolean =
      runs.getOrElse(id, Seq.empty).exists { case (s, l) =>
        s <= start && s + l >= start + len }
    cases.foreach { c =>
      assert(covered(c.idA, c.startA, c.runLen) &&
        covered(c.idB, c.startB, c.runLen),
        s"case ${c.idA / 2}: planted ${c.runLen}-token run not covered" +
          s"\nA: ${c.textA}\nB: ${c.textB}\nruns: $runs")
    }
  }
}
