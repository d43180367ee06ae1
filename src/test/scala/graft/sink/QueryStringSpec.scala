package graft.sink

import graft.SparkSpec

class QueryStringSpec extends SparkSpec {
  import spark.implicits._
  import QueryString._

  private val docs = Seq(
    (1L, "merge window scan", "en"),
    (2L, "window scan merge", "de"),
    (3L, "scan window", "de"),
    (4L, "filter pushdown merge", "en"),
    (5L, "merge", "de")).toDF("doc_id", "text", "lang")

  private def ids(q: String): Set[Long] =
    QueryString.search(docs, "text", q, Set("text"))
      .select("doc_id").as[Long].collect().toSet

  test("precedence: NOT > AND > OR; adjacency is AND") {
    // OR binds loosest: (scan AND window) OR filter
    assert(ids("scan AND window OR filter*") == Set(1L, 2L, 3L, 4L))
    // NOT binds tightest: merge AND (NOT window)
    assert(ids("merge AND NOT window") == Set(4L, 5L))
    // adjacency = AND
    assert(ids("merge window") == ids("merge AND window"))
    // parens override
    assert(ids("merge AND (window OR pushdown)") == Set(1L, 2L, 4L))
  }

  test("fields, phrases, prefixes; keyword vs analyzed semantics") {
    // keyword field: exact equality, no tokenization
    assert(ids("lang:de") == Set(2L, 3L, 5L))
    assert(ids("lang:d*") == Set(2L, 3L, 5L))
    // analyzed phrase: consecutive tokens
    assert(ids("\"window scan\"") == Set(1L, 2L))
    assert(ids("text:\"scan merge\"") == Set(2L))
    // token prefix
    assert(ids("push*") == Set(4L))
    // combined, mixed fields
    assert(ids("lang:de AND \"window scan\"") == Set(2L))
    assert(ids("lang:en OR \"scan window\"") == Set(1L, 3L, 4L))
  }

  test("parse tree shapes") {
    assert(parse("a b") == And(Term(None, "a"), Term(None, "b")))
    assert(parse("a OR b c") ==
      Or(Term(None, "a"), And(Term(None, "b"), Term(None, "c"))))
    assert(parse("NOT a OR b") == Or(Not(Term(None, "a")), Term(None, "b")))
    assert(parse("f:\"x y\"") == Phrase(Some("f"), "x y"))
    assert(parse("f:x*") == Prefix(Some("f"), "x"))
  }

  test("malformed queries fail loudly") {
    intercept[IllegalArgumentException] { parse("") }
    intercept[IllegalArgumentException] { parse("(a OR b") }
    intercept[IllegalArgumentException] { parse("a OR b)") }
    intercept[IllegalArgumentException] { parse("a AND") }
    intercept[IllegalArgumentException] { parse("\"unterminated") }
    intercept[IllegalArgumentException] { parse("a OR OR b") }
    intercept[IllegalArgumentException] { parse("*") }
    intercept[IllegalArgumentException] { parse("f:") }
  }

  test("field-grouped clauses: group default field, explicit field wins") {
    assert(parse("f:(a OR b)") ==
      Or(Term(Some("f"), "a"), Term(Some("f"), "b")))
    // every leaf kind is scoped; explicit fields inside the group win
    assert(parse("""f:(a "x y" NOT c* g:d)""") ==
      And(And(And(Term(Some("f"), "a"), Phrase(Some("f"), "x y")),
        Not(Prefix(Some("f"), "c"))), Term(Some("g"), "d")))
    // nested groups: inner scope wins over outer
    assert(parse("f:(a OR g:(b))") ==
      Or(Term(Some("f"), "a"), Term(Some("g"), "b")))
    // semantics on data: lang:(de OR en) over the keyword field
    assert(ids("lang:(de OR en)") == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids("lang:(de) AND merge") == Set(2L, 5L))
    // malformed groups
    intercept[IllegalArgumentException] { parse("f:(a OR b") }
    intercept[IllegalArgumentException] { parse("f:()") }
  }

  test("backslash escapes make specials literal") {
    // escaped quote inside a phrase
    assert(parse("\"a \\\"b\\\" c\"") == Phrase(None, "a \"b\" c"))
    // escaped star: a literal term, not a prefix
    assert(parse("foo\\*") == Term(None, "foo*"))
    // escaped colon: no field split
    assert(parse("a\\:b") == Term(None, "a:b"))
    // escaped space glues one term
    assert(parse("a\\ b") == Term(None, "a b"))
    // escaped parens / backslash
    assert(parse("\\(x\\)") == Term(None, "(x)"))
    assert(parse("a\\\\b") == Term(None, "a\\b"))
    // an escape never makes a keyword
    assert(parse("\\AND") == Term(None, "AND"))
    // dangling escape is malformed
    intercept[IllegalArgumentException] { parse("abc\\") }
  }

  test("parseLenient: malformed queries degrade to bag-of-terms") {
    // valid queries parse identically to the strict path
    assert(parseLenient("a AND b") == parse("a AND b"))
    // malformed: unbalanced paren → terms ANDed, keywords dropped
    assert(parseLenient("merge (window scan") ==
      And(And(Term(None, "merge"), Term(None, "window")),
        Term(None, "scan")))
    assert(parseLenient("a OR OR b") == And(Term(None, "a"), Term(None, "b")))
    // field prefixes degrade to the bare value on the default field
    assert(parseLenient("\"unterminated lang:de") ==
      And(Term(None, "unterminated"), Term(None, "de")))
    // OR profile degrades with OR
    assert(parseLenient("merge (window", defaultOr = true) ==
      Or(Term(None, "merge"), Term(None, "window")))
    // an all-specials query has no degraded meaning
    intercept[IllegalArgumentException] { parseLenient("((((") }
    // data semantics through searchLenient
    assert(QueryString.searchLenient(docs, "text", "merge (window scan",
        Set("text")).select("doc_id").as[Long].collect().toSet ==
      ids("merge AND window AND scan"))
  }

  test("q.op=OR profile: adjacency ORs at OR precedence") {
    assert(parse("a b", defaultOr = true) ==
      Or(Term(None, "a"), Term(None, "b")))
    // a b AND c  ==  a OR (b AND c) under q.op=OR
    assert(parse("a b AND c", defaultOr = true) ==
      Or(Term(None, "a"), And(Term(None, "b"), Term(None, "c"))))
    // explicit operators unaffected by the profile
    assert(parse("a AND b", defaultOr = true) ==
      And(Term(None, "a"), Term(None, "b")))
    def orIds(q: String): Set[Long] =
      QueryString.search(docs, "text", q, Set("text"), defaultOr = true)
        .select("doc_id").as[Long].collect().toSet
    assert(orIds("pushdown window") == Set(1L, 2L, 3L, 4L))
    assert(orIds("merge filter") == ids("merge OR filter"))
  }
}
