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
}
