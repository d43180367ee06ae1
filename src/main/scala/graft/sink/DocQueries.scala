package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query shapes the ingested documents must serve (SURVEY §2.6): the
  * reference's E2E tests assert match-all scan, term (point) lookup,
  * set-membership, full-text match, and field retrieval incl. multi-valued
  * fields. These are thin Column combinators over the searchable view —
  * Catalyst pushes the predicates into the scan.
  */
object DocQueries {

  /** MatchAllQuery — full scan. */
  def matchAll(index: DataFrame): DataFrame = index

  /** TermQuery — exact point lookup on an ATOM field. */
  def term(index: DataFrame, field: String, value: String): DataFrame =
    index.filter(col(field) === lit(value))

  /** TermInSetQuery — set membership (also the delete-predicate shape). */
  def termInSet(index: DataFrame, field: String, values: Seq[String]): DataFrame =
    index.filter(col(field).isin(values: _*))

  /** MatchQuery — whitespace-tokenized full-text match: document matches if
    * any token of the field equals any query token (OR semantics, the
    * Lucene MatchQuery default).
    */
  def matchText(index: DataFrame, field: String, query: String): DataFrame = {
    val qTokens = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val fieldTokens = split(lower(col(field)), "\\s+")
    index.filter(
      arrays_overlap(fieldTokens, array(qTokens.map(lit): _*)))
  }

  /** Field retrieval — projection of requested fields. */
  def retrieve(index: DataFrame, fields: Seq[String]): DataFrame =
    index.select(fields.map(col): _*)

  /** Ranked MatchQuery: term-frequency score over the query tokens
    * (the deterministic core of Lucene's ranking — integer tf, so results
    * are engine-exact; idf/norms are corpus-dependent refinements).
    */
  def matchTextRanked(index: DataFrame, field: String, query: String,
      k: Int): DataFrame = {
    val qTokens = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val fieldTokens = split(lower(col(field)), "\\s+")
    // empty query → empty result (same contract as matchText), not a
    // reduce-on-empty crash
    val score =
      if (qTokens.isEmpty) lit(0)
      else qTokens.map(t =>
        size(filter(fieldTokens, tok => tok === lit(t))))
        .reduce(_ + _)
    index.withColumn("score", score)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(index.columns.head))
      .limit(k)
  }
}
