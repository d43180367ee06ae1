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
  * `field:prefix*`, `AND` / `OR` / `NOT` (that precedence, NOT
  * tightest), parentheses, and implicit adjacency = the default
  * operator (AND, Lucene's `q.op=AND` profile). TEXT fields get
  * analyzed semantics — whitespace-lowercase token membership, the
  * space-padded consecutive-phrase trick, token-prefix `exists` — and
  * every other field gets keyword semantics (exact equality / string
  * startsWith; a phrase on a keyword field is whole-string equality of
  * the quoted text).
  *
  * The parser is a ~60-line recursive descent over the query STRING —
  * driver-side, bounded by query length; nothing about it touches the
  * data path. Malformed queries (unbalanced parens, dangling operator,
  * empty clause, unterminated quote) fail loudly at parse time.
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
  private final case class Quoted(field: Option[String], text: String)
    extends Tok
  private final case class Word(field: Option[String], text: String)
    extends Tok

  private def lex(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    def quoted(field: Option[String]): Unit = {
      val end = q.indexOf('"', i + 1)
      require(end >= 0, s"unterminated quote at offset $i in: $q")
      out += Quoted(field, q.substring(i + 1, end))
      i = end + 1
    }
    while (i < q.length) {
      q(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '"' => quoted(None)
        case _ =>
          var j = i
          while (j < q.length && !q(j).isWhitespace &&
            q(j) != '(' && q(j) != ')' && q(j) != '"') j += 1
          val w = q.substring(i, j)
          i = j
          w match {
            case "AND" => out += AndTok
            case "OR" => out += OrTok
            case "NOT" => out += NotTok
            case _ =>
              val colonAt = w.indexOf(':')
              if (colonAt > 0) {
                val (f, rest) = (w.substring(0, colonAt),
                  w.substring(colonAt + 1))
                if (rest.isEmpty) {
                  require(i < q.length && q(i) == '"',
                    s"field '$f:' must be followed by a value in: $q")
                  quoted(Some(f))
                } else out += Word(Some(f), rest)
              } else out += Word(None, w)
          }
      }
    }
    out.result()
  }

  // ---- parser (OR < AND < NOT; adjacency = AND) ----------------------

  def parse(q: String): Node = {
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
      case NotTok => Not(primary())
      case Quoted(f, t) =>
        require(t.trim.nonEmpty, s"empty phrase in: $q"); Phrase(f, t)
      case Word(f, w) =>
        if (w.endsWith("*")) {
          require(w.length > 1, s"bare '*' is not a valid clause in: $q")
          Prefix(f, w.dropRight(1))
        } else Term(f, w)
      case t => throw new IllegalArgumentException(
        s"dangling operator or misplaced token $t in: $q")
    }
    def startsClause(t: Tok): Boolean = t match {
      case LParen | NotTok | _: Quoted | _: Word => true
      case _ => false
    }
    def andExpr(): Node = {
      var n = primary()
      var go = true
      while (go) peek match {
        case Some(AndTok) => next(); n = And(n, primary())
        case Some(t) if startsClause(t) => n = And(n, primary()) // adjacency
        case _ => go = false
      }
      n
    }
    def orExpr(): Node = {
      var n = andExpr()
      while (peek.contains(OrTok)) { next(); n = Or(n, andExpr()) }
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

  /** Parse + compile + filter in one call — the query-box entry point. */
  def search(docs: DataFrame, defaultField: String, query: String,
      textFields: Set[String]): DataFrame =
    docs.filter(compile(parse(query), defaultField, textFields))
}
