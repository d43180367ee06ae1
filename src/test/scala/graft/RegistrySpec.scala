package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integrity of the split query registry: Map `++` silently overrides
  * duplicate keys, so a name accidentally reused across two registry
  * files would shadow a gate without any failure — this pins the
  * composition instead.
  */
class RegistrySpec extends AnyFunSuite {

  test("registry files have disjoint query names (no silent override)") {
    val parts = Seq(
      "pipeline+search" -> QueriesPipelineSearch.queries.keySet,
      "dedup+geo+vector" -> QueriesDedupGeoVector.queries.keySet,
      "text+media+corpus" -> QueriesTextMediaCorpus.queries.keySet,
      "joins+aggs+streaming" -> QueriesJoinsAggsStreaming.queries.keySet)
    for {
      (na, a) <- parts
      (nb, b) <- parts if na < nb
    } assert((a intersect b).isEmpty,
      s"$na and $nb both define: ${(a intersect b).mkString(", ")}")
    assert(SparkEntry.queries.size == parts.map(_._2.size).sum)
  }

  test("oracle files have disjoint names and cover every query exactly") {
    val parts = Seq(
      "A" -> OraclesA.oracleSql.keySet,
      "B" -> OraclesB.oracleSql.keySet,
      "C" -> OraclesC.oracleSql.keySet)
    for {
      (na, a) <- parts
      (nb, b) <- parts if na < nb
    } assert((a intersect b).isEmpty,
      s"Oracles$na and Oracles$nb both define: ${(a intersect b).mkString(", ")}")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o == q,
      s"oracle-less queries: ${(q diff o).mkString(", ")}; " +
        s"orphan oracles: ${(o diff q).mkString(", ")}")
  }
}
