package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lucene `query_string` mini-language → one Catalyst predicate — the
  * user-facing query box compiled straight into the scan filter, so
  * the whole boolean tree pushes into Catalyst (and, for pure
  * conjunctions over stored columns, down to parquet) instead of
  * running clause-by-clause.
  *
  * Supported surface (the deterministic core of Lucene's syntax):
  * `word`, `"a phrase"`, `prefix*`, `field:word`, `field:"a phrase"`,
  * `field:prefix*`, field-grouped clauses `field:(a OR "b c" NOT d*)`
  * (the group's default field becomes `field`; an explicit field
  * inside the group wins, Lucene's scoping), `AND` / `OR` / `NOT`
  * (that precedence, NOT tightest), parentheses, backslash escapes
  * (`\"`, `\(`, `\)`, `\*`, `\:`, `\\`, `\ ` — the escaped character
  * is literal text: `foo\*` is the term `foo*`, not a prefix), and
  * implicit adjacency = the default operator — AND (Lucene's
  * `q.op=AND` profile) unless `defaultOr = true` selects the `q.op=OR`
  * profile, where adjacent clauses OR at OR precedence. TEXT fields
  * get analyzed semantics — whitespace-lowercase token membership, the
  * space-padded consecutive-phrase trick, token-prefix `exists` — and
  * every other field gets keyword semantics (exact equality / string
  * startsWith; a phrase on a keyword field is whole-string equality of
  * the quoted text).
  *
  * The parser is a ~90-line recursive descent over the query STRING —
  * driver-side, bounded by query length; nothing about it touches the
  * data path. Malformed queries (unbalanced parens, dangling operator,
  * empty clause, unterminated quote, dangling escape, empty group)
  * fail loudly at parse time.
  */
object QueryString {

  sealed trait Node
  final case class Term(field: Option[String], word: String) extends Node
  final case class Phrase(field: Option[String], text: String) extends Node
  final case class Prefix(field: Option[String], prefix: String) extends Node
  final case class Not(n: Node) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node

  // ---- lexer ---------------------------------------------------------

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  /** `field:(` — opens a group whose unfielded clauses scope to `field`. */
  private final case class FieldLParen(field: String) extends Tok
  private final case class Quoted(field: Option[String], text: String)
    extends Tok
  /** `wild` = the word ended with an UNESCAPED `*` (already stripped). */
  private final case class Word(field: Option[String], text: String,
    wild: Boolean) extends Tok

  private def lex(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    def quoted(field: Option[String]): Unit = {
      // i at the opening quote; \" and \\ are literal inside the phrase
      val sb = new StringBuilder
      var j = i + 1
      var closed = false
      while (j < q.length && !closed) q(j) match {
        case '\\' if j + 1 < q.length => sb += q(j + 1); j += 2
        case '"' => closed = true; j += 1
        case c => sb += c; j += 1
      }
      require(closed, s"unterminated quote at offset $i in: $q")
      out += Quoted(field, sb.toString)
      i = j
    }
    while (i < q.length) {
      q(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '"' => quoted(None)
        case _ =>
          // scan one word honoring backslash escapes: the escaped char
          // is literal text — it neither terminates the word nor acts
          // as field separator / wildcard / keyword
          val sb = new StringBuilder
          var field: Option[String] = None
          var hadEscape = false
          var lastUnescapedStar = false
          var j = i
          var stop = false
          while (j < q.length && !stop) q(j) match {
            case '\\' =>
              require(j + 1 < q.length, s"dangling escape at end of: $q")
              sb += q(j + 1); hadEscape = true
              lastUnescapedStar = false; j += 2
            case c if c.isWhitespace || c == '(' || c == ')' || c == '"' =>
              stop = true
            case ':' if field.isEmpty && sb.nonEmpty =>
              field = Some(sb.toString); sb.clear()
              lastUnescapedStar = false; j += 1
            case c =>
              sb += c; lastUnescapedStar = c == '*'; j += 1
          }
          i = j
          val w = sb.toString
          (field, w) match {
            case (None, "AND") if !hadEscape => out += AndTok
            case (None, "OR") if !hadEscape => out += OrTok
            case (None, "NOT") if !hadEscape => out += NotTok
            case (Some(f), "") if i < q.length && q(i) == '"' =>
              quoted(Some(f))
            case (Some(f), "") if i < q.length && q(i) == '(' =>
              out += FieldLParen(f); i += 1
            case (Some(f), "") => throw new IllegalArgumentException(
              s"field '$f:' must be followed by a value in: $q")
            case _ =>
              if (lastUnescapedStar) out += Word(field, w.dropRight(1),
                wild = true)
              else out += Word(field, w, wild = false)
          }
      }
    }
    out.result()
  }

  /** Scope a group's unfielded leaves to `f`; explicit fields win. */
  private def scopeField(n: Node, f: String): Node = n match {
    case Term(None, w) => Term(Some(f), w)
    case Phrase(None, t) => Phrase(Some(f), t)
    case Prefix(None, p) => Prefix(Some(f), p)
    case leaf @ (_: Term | _: Phrase | _: Prefix) => leaf
    case Not(x) => Not(scopeField(x, f))
    case And(l, r) => And(scopeField(l, f), scopeField(r, f))
    case Or(l, r) => Or(scopeField(l, f), scopeField(r, f))
  }

  // ---- parser (OR < AND < NOT; adjacency = the default operator) -----

  def parse(q: String): Node = parse(q, defaultOr = false)

  /** `defaultOr = true` selects Lucene's `q.op=OR` profile: implicit
    * adjacency joins clauses with OR at OR precedence (`a b AND c` ≡
    * `a OR (b AND c)`); the default `q.op=AND` profile joins at AND
    * precedence (`a b OR c` ≡ `(a AND b) OR c`).
    */
  def parse(q: String, defaultOr: Boolean): Node = {
    var toks = lex(q)
    require(toks.nonEmpty, "empty query")
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = {
      require(toks.nonEmpty,
        s"unexpected end of query (dangling operator?) in: $q")
      val t = toks.head; toks = toks.tail; t
    }
    def primary(): Node = next() match {
      case LParen =>
        val n = orExpr()
        require(peek.contains(RParen), s"unbalanced parentheses in: $q")
        next(); n
      case FieldLParen(f) =>
        val n = orExpr()
        require(peek.contains(RParen), s"unbalanced parentheses in: $q")
        next(); scopeField(n, f)
      case NotTok => Not(primary())
      case Quoted(f, t) =>
        require(t.trim.nonEmpty, s"empty phrase in: $q"); Phrase(f, t)
      case Word(f, w, wild) =>
        require(w.nonEmpty, s"bare '*' is not a valid clause in: $q")
        if (wild) Prefix(f, w) else Term(f, w)
      case t => throw new IllegalArgumentException(
        s"dangling operator or misplaced token $t in: $q")
    }
    def startsClause(t: Tok): Boolean = t match {
      case LParen | NotTok | _: FieldLParen | _: Quoted | _: Word => true
      case _ => false
    }
    def andExpr(): Node = {
      var n = primary()
      var go = true
      while (go) peek match {
        case Some(AndTok) => next(); n = And(n, primary())
        case Some(t) if !defaultOr && startsClause(t) =>
          n = And(n, primary()) // adjacency, q.op=AND
        case _ => go = false
      }
      n
    }
    def orExpr(): Node = {
      var n = andExpr()
      var go = true
      while (go) peek match {
        case Some(OrTok) => next(); n = Or(n, andExpr())
        case Some(t) if defaultOr && startsClause(t) =>
          n = Or(n, andExpr()) // adjacency, q.op=OR
        case _ => go = false
      }
      n
    }
    val root = orExpr()
    require(toks.isEmpty, s"unbalanced parentheses in: $q")
    root
  }

  // ---- compiler ------------------------------------------------------

  /** Compile a parsed tree to one Column predicate. `textFields` get
    * analyzed (tokenized) semantics; everything else keyword semantics.
    */
  def compile(node: Node, defaultField: String,
      textFields: Set[String]): Column = {
    def toks(f: String) =
      filter(split(lower(col(f)), " "), t => t =!= lit(""))
    def padded(f: String) =
      concat(lit(" "), array_join(toks(f), " "), lit(" "))
    def fld(o: Option[String]) = o.getOrElse(defaultField)
    node match {
      case Term(f, w) =>
        val name = fld(f)
        if (textFields(name))
          array_contains(toks(name), w.toLowerCase(java.util.Locale.ROOT))
        else col(name) === lit(w)
      case Phrase(f, t) =>
        val name = fld(f)
        if (textFields(name))
          padded(name).contains(
            " " + DocQueries.queryTokens(t).mkString(" ") + " ")
        else col(name) === lit(t)
      case Prefix(f, p) =>
        val name = fld(f)
        if (textFields(name))
          exists(toks(name),
            t => t.startsWith(p.toLowerCase(java.util.Locale.ROOT)))
        else col(name).startsWith(lit(p))
      case Not(n) => !compile(n, defaultField, textFields)
      case And(l, r) =>
        compile(l, defaultField, textFields) &&
          compile(r, defaultField, textFields)
      case Or(l, r) =>
        compile(l, defaultField, textFields) ||
          compile(r, defaultField, textFields)
    }
  }

  /** Parse + compile + filter in one call — the query-box entry point.
    * `defaultOr` selects the `q.op=OR` adjacency profile (see [[parse]]).
    */
  def search(docs: DataFrame, defaultField: String, query: String,
      textFields: Set[String], defaultOr: Boolean = false): DataFrame =
    docs.filter(compile(parse(query, defaultOr), defaultField, textFields))

  /** The `simple_query_string` never-throw contract: parse with the
    * full grammar; if the query is malformed (unbalanced parens,
    * dangling operator, stray quote…), degrade to a bag-of-terms query
    * over the default field — specials stripped, operator keywords
    * dropped, remaining words joined by the default operator. A user's
    * stray paren must return results, not an error page. Still throws
    * only when NO searchable term survives (an all-specials query has
    * no degraded meaning).
    */
  def parseLenient(q: String, defaultOr: Boolean = false): Node =
    try parse(q, defaultOr) catch {
      case _: IllegalArgumentException =>
        val words = q.split("""[\s()"*\\]+""").filter(_.nonEmpty)
          .filterNot(w => w == "AND" || w == "OR" || w == "NOT")
          .map(w => if (w.contains(':')) w.substring(w.indexOf(':') + 1) else w)
          .filter(_.nonEmpty)
        require(words.nonEmpty, s"no searchable terms in: $q")
        words.map(w => Term(None, w): Node)
          .reduce((l, r) => if (defaultOr) Or(l, r) else And(l, r))
    }

  /** [[search]] with [[parseLenient]] — the `simple_query_string` box. */
  def searchLenient(docs: DataFrame, defaultField: String, query: String,
      textFields: Set[String], defaultOr: Boolean = false): DataFrame =
    docs.filter(compile(parseLenient(query, defaultOr), defaultField,
      textFields))
}
