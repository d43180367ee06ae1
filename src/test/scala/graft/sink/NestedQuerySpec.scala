package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NestedQuerySpec extends SparkSpec {
  import spark.implicits._

  // parent 1: one element satisfies BOTH conjuncts
  // parent 2: qty hits on element a, disc hits on element b — the
  //           flattened object mapping would match, nested must not
  // parent 3: no hits at all
  private def parents = Seq(
    (1L, Seq((1, 50.0, 0.10), (2, 5.0, 0.01))),
    (2L, Seq((1, 50.0, 0.01), (2, 5.0, 0.10))),
    (3L, Seq((1, 5.0, 0.01)))
  ).toDF("id", "raw")
    .select(col("id"), transform(col("raw"), x =>
      struct(x.getField("_1").as("ln"), x.getField("_2").as("qty"),
        x.getField("_3").as("disc"))).as("items"))

  test("nested query: all conjuncts must hit the SAME element") {
    val out = DocQueries.nestedQuery(parents, "items",
        x => x.getField("qty") >= 45 && x.getField("disc") >= 0.05)
      .select(col("id"), size(col("inner_hits")).as("n"))
      .as[(Long, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 1)), s"got $out")
    // the flattened form (each conjunct against ANY element) would
    // also match parent 2 — pin the distinction explicitly
    val flattened = parents.filter(
      exists(col("items"), x => x.getField("qty") >= 45) &&
      exists(col("items"), x => x.getField("disc") >= 0.05))
    assert(flattened.count() == 2)
  }

  test("inner_hits keeps exactly the matching elements") {
    val hits = DocQueries.nestedQuery(parents, "items",
        x => x.getField("qty") >= 45)
      .select(col("id"), transform(col("inner_hits"),
        x => x.getField("ln")).as("lns"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(hits == Map(1L -> Seq(1), 2L -> Seq(1)), s"got $hits")
  }

  test("nested query plans as a projection: no explode, no join") {
    val p = DocQueries.nestedQuery(parents, "items",
      x => x.getField("qty") >= 45).queryExecution.optimizedPlan.toString
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"nested query should be a pure array-filter projection:\n$p")
  }
}
