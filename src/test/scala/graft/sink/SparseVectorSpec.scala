package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SparseVectorSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "merge merge window"),   // tf(merge)=2, tf(window)=1
    (2L, "merge scan"),
    (3L, "nothing relevant here"),
    (4L, "window window window")
  ).toDF("doc_id", "text")

  test("score is the query-weighted impact dot product") {
    val out = DocQueries.sparseVectorQuery(docs, "doc_id", "text",
      Seq(("merge", 2.0), ("window", 1.0)), 10)
      .as[(Long, Double)].collect().toMap
    // N=4; df(merge)=2, df(window)=2; idf = ln(1 + 4/2) = ln 3
    def impact(tf: Double) = BigDecimal((1.0 + math.log(tf)) * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def c(qw: Double, tf: Double) = BigDecimal(qw * impact(tf))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == c(2.0, 2) + c(1.0, 1))
    assert(out(2L) == c(2.0, 1))
    assert(out(4L) == c(1.0, 3))
    // doc 3 has no query term: absent, not zero-scored
    assert(!out.contains(3L))
  }

  test("k cuts by (score desc, id): ties break on ascending id") {
    val tied = Seq((5L, "scan"), (2L, "scan"), (9L, "scan"))
      .toDF("doc_id", "text")
    val out = DocQueries.sparseVectorQuery(tied, "doc_id", "text",
      Seq(("scan", 1.0)), 2).as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(2L, 5L), s"got $out")
  }

  test("plan prunes to query-term postings and cuts with top-k") {
    val df = DocQueries.sparseVectorQuery(docs, "doc_id", "text",
      Seq(("merge", 1.0)), 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k should never be a global sort:\n$p")
    // the literal IN prune sits under the first aggregate, so the
    // (doc, term) shuffle carries only query-term rows
    assert(p.contains("_t#") && p.contains("merge"),
      s"query-term prune missing:\n$p")
    assert(!p.contains("Window"), s"no window rank expected:\n$p")
  }
}
