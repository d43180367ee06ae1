package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators — whitespace tokenizer,
  * word n-gram shingles, stopword stats, canonical fingerprint, n-gram
  * language heuristic. All built-in expression compositions (codegen'd);
  * the only state is broadcast-size literals.
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles: `["a b c", "b c d", …]`; docs shorter than n
    * words yield the whole doc as one shingle (so no doc is unhashable).
    * Delegates to the native [[WordShingles]] expression — the composed
    * HOF form (slice per shingle, interpreted) is quadratic per document.
    */
  def wordShingles(text: Column, n: Int): Column =
    TextExpressions.wordShingles(text, n)

  /** Ratio of tokens that are in `stopwords` (0 for empty docs). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t)))
        .cast("double") / size(toks))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct
    * lowercase token set — robust to word order and duplication, exact for
    * bag-of-words content identity.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " "))

  /** Per-language stopword markers for the n-gram/marker language ID
    * heuristic. Tiny closed-class word lists (public knowledge).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** Marker-count language ID: argmax over per-language marker hits,
    * ties broken by language code order, no hits → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val w = array(words.map(lit): _*)
      (lang, size(filter(toks, t => array_contains(w, t))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), elseCol) =>
      when(s > 0 && s === best, lit(lang)).otherwise(elseCol)
    }
  }
}
