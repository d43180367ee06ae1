package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. Each is a narrow
  * projection over the text column — no shuffle, codegen-friendly, scales
  * with scan bandwidth.
  */
object TextAnalysis {

  val qualityStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Per-doc quality features: char length, token count, mean token
    * length, punctuation ratio, stopword ratio, and a composite score in
    * [0, 1] (simple length/punct/stopword heuristic).
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = TextFunctions.tokenCount(t)
    val nChars = length(t)
    val punct = length(t) - length(regexp_replace(t, "[.!?,;:]", ""))
    val tokLenSum = aggregate(
      transform(TextFunctions.tokens(t), tk => length(tk)),
      lit(0), (acc, x) => acc + x)
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      // mean over actual token lengths — (n_chars - separators)/n would
      // overcount under repeated/leading/trailing whitespace
      when(nTok === 0, 0.0)
        .otherwise(tokLenSum.cast("double") / nTok).as("mean_token_len"),
      when(nChars === 0, 0.0)
        .otherwise(punct.cast("double") / nChars).as("punct_ratio"),
      TextFunctions.stopwordRatio(t, qualityStopwords).as("stopword_ratio"))
  }

  /** Token counts: whitespace tokens plus a BPE-ish subword estimate
    * (regex word pieces: runs of ASCII alphanumerics, or any single other
    * non-space char — the classic pre-tokenizer shape, RE2-compatible so
    * the same pattern runs in any engine).
    */
  val piecePattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(piecePattern), lit(0)))
        .as("piece_tokens"))

  /** Language ID via stopword-marker argmax (TextFunctions.langId). */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.langId(col(textCol)).as("pred_lang"))

  /** Canonical content fingerprint (md5 of sorted distinct token set). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
}
