package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as a single row-level expression.
  *
  * The composed built-in form (`transform(sequence(...), slice +
  * array_join)`) is evaluated interpreted with one closure dispatch and an
  * O(n) slice copy PER SHINGLE — quadratic per document and the dominant
  * cost of the minhash/Jaccard dedup benchmarks. This expression does the
  * whole document in one JVM call (still `CodegenFallback`, but the
  * fallback granularity is per row, not per element).
  *
  * Semantics match `TextFunctions.wordShingles` exactly: whitespace
  * tokens; documents shorter than `n` words yield one whole-doc shingle
  * (possibly the empty string for empty docs).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    val out: Array[String] =
      if (toks.length < n) Array(toks.mkString(" "))
      else {
        val m = toks.length - n + 1
        val res = new Array[String](m)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          res(i) = sb.toString; i += 1
        }
        res
      }
    new GenericArrayData(out.map(UTF8String.fromString(_): AnyRef))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Shared md5-56 digest helper for the native hash expressions: digest
  * bytes 8–14 little-endian — the exact value of
  * `Corpus.hexLow56(md5(s))` and DuckDB's `md5_number_lower(s) % 2^56`
  * (one hash family across Column, JVM, and oracle forms; pinned in
  * TextFunctionsSpec/SimilaritySpec). ThreadLocal digest: task threads
  * reuse one MessageDigest instead of allocating per value.
  */
private[graft] object Md5Low56 {
  private val md = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var l = 0L
    var i = 14
    while (i >= 8) { l = (l << 8) | (d(i) & 0xffL); i -= 1 }
    l
  }
  def hash(s: String): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** md5-56 over every word `n`-gram shingle in one row-level pass —
  * the fused form of `transform(wordShingles(text, n), s =>
  * sampleHash(s))`, whose interpreted HOF evaluation pays closure
  * dispatch plus a 7-term substring/conv/shiftleft tree PER SHINGLE
  * (the r9 winnowing hot path). Shingle semantics match
  * [[WordShingles]] exactly (whitespace tokens, short docs collapse to
  * one whole-doc shingle); hash values match [[Md5Low56]] — identical
  * output, ~10× less per-row overhead.
  */
case class WordShingleHash56(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hash56"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    val out: Array[Long] =
      if (toks.length < n) Array(Md5Low56.hash(toks.mkString(" ")))
      else {
        val m = toks.length - n + 1
        val res = new Array[Long](m)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          res(i) = Md5Low56.hash(sb.toString); i += 1
        }
        res
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHash56 =
    copy(child = newChild)
}

/** Multi-pattern substring search via an Aho–Corasick automaton — the
  * scale answer to blocklist/badword filtering: matching a 10k-term
  * list per document as 10k `contains` calls (or one alternation
  * regex) is O(terms × text) with catastrophic constants; the
  * automaton walks the text ONCE, O(text + matches), independent of
  * list size. Returns the DISTINCT matched patterns in pattern-list
  * order (deterministic). Case handling is the caller's (pass
  * `lower(text)` + lowercased patterns for case-insensitive matching).
  *
  * The automaton builds lazily once per expression instance per JVM
  * (`@transient lazy` — executors rebuild on first row, then every row
  * shares it); patterns are plan literals, so the build is bounded and
  * driver-free.
  */
case class MultiSubstringMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_substring_match"

  // goto/fail/output tables over a dense char->child map per node
  @transient private lazy val automaton: MultiSubstringMatch.Ac =
    MultiSubstringMatch.build(patterns)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val ac = automaton
    val hit = new Array[Boolean](patterns.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !ac.goto(s).contains(c)) s = ac.fail(s)
      state = ac.goto(s).getOrElse(c, 0)
      // outputs are PROPAGATED along failure links at build time, so
      // one lookup per character suffices — no per-char fail-chain walk
      // (which would be O(text × pattern depth) on self-similar input)
      val p = ac.out(state)
      var j = 0
      while (j < p.length) { hit(p(j)) = true; j += 1 }
      i += 1
    }
    val matched = patterns.indices.filter(hit)
      .map(i => UTF8String.fromString(patterns(i)): AnyRef)
    new GenericArrayData(matched.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): MultiSubstringMatch =
    copy(child = newChild)
}

object MultiSubstringMatch {
  /** goto: per-state char→state map; fail: failure links; out: pattern
    * indexes matched AT each state — dictionary-suffix outputs are
    * propagated during the BFS (`out(s) ++= out(fail(s))`, valid
    * because fail targets are strictly shallower and thus already
    * final), so eval does ONE output lookup per character.
    */
  private[functions] case class Ac(goto: Array[Map[Char, Int]],
    fail: Array[Int], out: Array[Array[Int]])

  private[functions] def build(patterns: Seq[String]): Ac = {
    val goto = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = goto(s).getOrElseUpdate(c, {
          goto += scala.collection.mutable.Map.empty[Char, Int]
          out += scala.collection.mutable.ArrayBuffer.empty[Int]
          goto.length - 1
        })
      }
      out(s) += pi
    }
    val fail = new Array[Int](goto.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(s) = goto(f).getOrElse(c, 0)
        if (fail(s) == s) fail(s) = 0
        out(s) ++= out(fail(s)) // dictionary-suffix outputs (BFS order)
      }
    }
    Ac(goto.map(_.toMap).toArray, fail, out.map(_.toArray).toArray)
  }
}

/** `[md5_56(prefix + "0"), md5_56(prefix + "1"), …)` of length `count`
  * in one row-level pass — the per-position hash family behind
  * deterministic token masking (`prefix = id + ":"`), fused so the
  * interpreted per-element md5 chain disappears. Null when either
  * input is null; empty array for count ≤ 0.
  */
case class PrefixIndexHash56(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "prefix_index_hash56"

  override def nullSafeEval(prefix: Any, count: Any): Any = {
    val p = prefix.asInstanceOf[UTF8String].toString
    // any integral count type works — a BIGINT from a SQL caller must
    // not throw ClassCastException per row (AbstractDataType is
    // private[sql], so declared implicit casts are unavailable here)
    val c = count match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long =>
        // fail loudly, like every other out-of-range input here — a
        // silent clamp hands the caller an Int.MaxValue-sized array
        if (l.longValue > Int.MaxValue.toLong)
          throw new IllegalArgumentException(
            s"prefix_index_hash56: count $l exceeds Int.MaxValue")
        l.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case other => throw new IllegalArgumentException(
        s"prefix_index_hash56: integral count expected, got $other")
    }
    val res = new Array[Long](math.max(c, 0))
    var i = 0
    while (i < res.length) { res(i) = Md5Low56.hash(p + i); i += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrefixIndexHash56 =
    copy(left = newLeft, right = newRight)
}

/** One-pass text statistics: codepoint count, token count, token-length
  * sum, punctuation count, and per-marker-set hit counts — all from a
  * SINGLE tokenization of the document.
  *
  * The composed-HOF form (`size(filter(split(...)))` per marker set)
  * is interpreted AND re-tokenizes the document once per set: language ID
  * over 5 marker lists plus quality's stopword ratio costs ~7 splits and
  * 7 closure-dispatched array walks per row. This expression does one
  * split and one hash lookup per token (a token in several sets — "que"
  * is both French and Spanish — increments each), matching the HOF
  * semantics exactly: whitespace tokens, lowercased for marker matching,
  * hits counted with multiplicity.
  *
  * Output struct: `(n_chars, n_tokens, tok_len_sum, n_punct, hits)` where
  * `n_chars`/`tok_len_sum` count Unicode codepoints (Spark `length()`
  * semantics) and `n_punct` counts `[.!?,;:]` occurrences.
  */
case class TextMarkerStats(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextMarkerStats.schema
  override def prettyName: String = "text_marker_stats"

  /** token (lowercase) → indices of the marker sets containing it. */
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    markerSets.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val hits = new Array[Int](markerSets.length)
    var nPunct = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':')
        nPunct += 1
      i += 1
    }
    val toks = s.split("\\s+")
    var nTokens = 0
    var tokLenSum = 0
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        nTokens += 1
        tokLenSum += tok.codePointCount(0, tok.length)
        val sets = lookup.get(tok.toLowerCase(java.util.Locale.ROOT))
        if (sets != null) {
          var j = 0
          while (j < sets.length) { hits(sets(j)) += 1; j += 1 }
        }
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](
      s.codePointCount(0, s.length), nTokens, tokLenSum, nPunct,
      new GenericArrayData(hits.map(Int.box(_): AnyRef))))
  }

  override protected def withNewChildInternal(newChild: Expression): TextMarkerStats =
    copy(child = newChild)
}

object TextMarkerStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("tok_len_sum", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
}

/** Boilerplate/repetition score: frequency of the MOST frequent word
  * n-gram divided by the total n-gram count — 1.0 for a fully repetitive
  * document, → 0 for diverse text. The classic template/spam signal a
  * pretraining quality filter cuts on.
  *
  * Shingle semantics match [[WordShingles]] (short docs collapse to one
  * whole-doc shingle, so the score is defined for every document); one
  * tokenization + one hash-count pass per row.
  */
case class RepetitionScore(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "repetition_score"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return 1.0 // single whole-doc shingle
    val m = toks.length - n + 1
    val counts = new java.util.HashMap[String, Int](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var maxCount = 0
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > maxCount) maxCount = c
      i += 1
    }
    maxCount.toDouble / m
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionScore =
    copy(child = newChild)
}

/** Byte-pair-encoding tokenizer over a ranked merge table — the real
  * subword tokenization a training pipeline counts sequence budgets with
  * (the regex "piece" estimate in `TextAnalysis.tokenCounts` is the
  * cheap approximation; this is the exact algorithm).
  *
  * Standard greedy BPE per whitespace word: start from characters, then
  * repeatedly merge the adjacent pair with the LOWEST merge rank until no
  * ranked pair remains. The merge table is a construction-time literal
  * (broadcast with the plan, like the LSH planes); vocabulary training is
  * an offline corpus job, not a per-row concern.
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, i)
    }
    m
  }

  private def encodeWord(word: String, out: java.util.ArrayList[String]): Unit = {
    // seed with CODE POINTS, not UTF-16 units — a char-based split tears
    // supplementary-plane characters (emoji, CJK-B) into lone surrogates
    var parts = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toBuffer
    var continue = parts.length > 1
    while (continue) {
      // lowest-rank adjacent pair
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var i = 0
      while (i < parts.length - 1) {
        val r = rank.get(parts(i) + " " + parts(i + 1))
        if (r != null && r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) continue = false
      else {
        // merge EVERY occurrence of that pair, left to right
        val a = parts(best); val b = parts(best + 1)
        val merged = scala.collection.mutable.Buffer[String]()
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            merged += a + b; j += 2
          } else { merged += parts(j); j += 1 }
        }
        parts = merged
        continue = parts.length > 1
      }
    }
    parts.foreach(out.add)
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .split("\\s+").filter(_.nonEmpty)
    val out = new java.util.ArrayList[String]()
    words.foreach(encodeWord(_, out))
    val arr = new Array[AnyRef](out.size)
    var i = 0
    while (i < out.size) { arr(i) = UTF8String.fromString(out.get(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** One-pass query-term frequency statistics for ranked retrieval: document
  * length (token count) plus the exact term frequency of each query term,
  * from a SINGLE tokenization of the text.
  *
  * The composed HOF form (`size(filter(split(...)))` per term) re-splits
  * and re-scans the document once per derived column — dl plus one per
  * query term, interpreted — the exact per-use re-evaluation trap
  * `TextMarkerStats` exists to avoid. Tokenization is the corpus
  * convention shared with `TextFunctions.tokenCount` and the SQL oracles:
  * lowercase, split on a single space, empty tokens dropped.
  */
case class TermFreqStats(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(terms.nonEmpty, "term_freq_stats needs at least one term")
  require(terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.size == terms.size,
    s"term_freq_stats terms must be distinct (case-insensitively), got $terms")

  override def dataType: DataType = TermFreqStats.schema
  override def prettyName: String = "term_freq_stats"

  /** lowercase term → its index in `terms`. The terms are folded here
    * because the DOCUMENT is lowercased before matching — a caller
    * passing 'Merge' (e.g. via the registered SQL function) would
    * otherwise silently count 0 for every row.
    */
  @transient private lazy val lookup: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(t.toLowerCase(java.util.Locale.ROOT), i)
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val tf = new Array[Int](terms.length)
    var dl = 0
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          dl += 1
          val idx = lookup.get(s.substring(start, i))
          if (idx != null) tf(idx.intValue) += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      dl, new GenericArrayData(tf.map(Int.box(_): AnyRef))))
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqStats =
    copy(child = newChild)
}

object TermFreqStats {
  val schema: StructType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tf", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
}

/** Unicode canonicalization in one row-level pass: NFC normalization
  * (java.text.Normalizer — composed forms, so visually-identical texts
  * hash identically in dedup), SIMPLE per-codepoint case folding
  * (`Character.toLowerCase(int)` — deliberately NOT the context-
  * sensitive `String.toLowerCase`, whose final-sigma and locale rules
  * diverge from every SQL engine's simple folding), and ASCII
  * whitespace-run collapse + trim. The mandatory first step before any
  * content hashing: without it, NFC/NFD variants of the same text
  * land in different dedup clusters and different index postings.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any = {
    val s = java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
          cp == '\f' || cp == 0x0b) {
        pendingSpace = sb.length() > 0
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Jaro–Winkler similarity as one row-level expression — the fuzzy
  * record-linkage scorer (names, titles, addresses) Spark has no
  * built-in for, and whose O(|a|·window) matching loop would be a
  * per-row UDF otherwise.
  *
  * The exact convention is pinned to DuckDB's `jaro_winkler_similarity`
  * (the oracle), verified bit-exact on 20k random pairs across four
  * alphabets: either side empty → 0.0 (including BOTH empty), equal
  * strings → 1.0, Jaro match window `max(|a|,|b|)/2 - 1` (no clamp),
  * transpositions = unmatched-order pairs / 2 (integer), and the
  * Winkler prefix boost `j + l·0.1·(1−j)` (common prefix l ≤ 4) applied
  * only when jaro > 0.7. Operates on UTF-16 code units, matching the
  * oracle on ASCII corpora (TPC-H names); null if either input is null.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0d
    if (s1 == s2) return 1.0d
    val win = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + win + 1)
      var j = math.max(0, i - win)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0d
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // division order matters for bit-exactness vs the oracle
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val lim = math.min(4, math.min(l1, l2))
      while (l < lim && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normalizeText(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))

  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  def wordShingleHash56(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHash56(ColumnBridge.expression(text), n))

  def prefixIndexHash56(prefix: Column, count: Column): Column =
    ColumnBridge.column(PrefixIndexHash56(
      ColumnBridge.expression(prefix), ColumnBridge.expression(count)))

  def multiSubstringMatch(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiSubstringMatch(
      ColumnBridge.expression(text), patterns))

  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text), merges))

  def repetitionScore(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionScore(ColumnBridge.expression(text), n))

  def textMarkerStats(text: Column, markerSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(
      TextMarkerStats(ColumnBridge.expression(text), markerSets))

  def termFreqStats(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(
      TermFreqStats(ColumnBridge.expression(text), terms))
}
