package graft.sink

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class DateMathSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-03-15T10:30:45Z")
  private def r(e: String): Instant = DateMath.resolve(e, now)

  test("now anchor: offsets and truncations, applied left to right") {
    assert(r("now") == now)
    assert(r("now/d") == Instant.parse("2024-03-15T00:00:00Z"))
    assert(r("now-7d/d") == Instant.parse("2024-03-08T00:00:00Z"))
    assert(r("now/d-7d") == Instant.parse("2024-03-08T00:00:00Z"))
    assert(r("now-2h") == Instant.parse("2024-03-15T08:30:45Z"))
    assert(r("now+30m/h") == Instant.parse("2024-03-15T11:00:00Z"))
    // /w truncates to Monday (ISO weeks); 2024-03-15 is a Friday
    assert(r("now/w") == Instant.parse("2024-03-11T00:00:00Z"))
    assert(r("now/M") == Instant.parse("2024-03-01T00:00:00Z"))
    assert(r("now/y") == Instant.parse("2024-01-01T00:00:00Z"))
  }

  test("absolute anchors; calendar-aware month arithmetic clamps") {
    assert(r("2024-01-15||+1M") == Instant.parse("2024-02-15T00:00:00Z"))
    // Jan 31 + 1 month clamps to leap-February 29 (the ES behavior)
    assert(r("2024-01-31||+1M") == Instant.parse("2024-02-29T00:00:00Z"))
    assert(r("2024-01-31||+1M/M") == Instant.parse("2024-02-01T00:00:00Z"))
    assert(r("2024-03-15T06:45:00||/h") ==
      Instant.parse("2024-03-15T06:00:00Z"))
    assert(r("2023-12-31||+1y-1d") == Instant.parse("2024-12-30T00:00:00Z"))
  }

  test("malformed expressions fail loudly") {
    intercept[IllegalArgumentException] { r("") }
    intercept[IllegalArgumentException] { r("now-d") }       // no amount
    intercept[IllegalArgumentException] { r("now-7") }       // no unit
    intercept[IllegalArgumentException] { r("now/") }        // dangling /
    intercept[IllegalArgumentException] { r("now-7q") }      // bad unit
    intercept[IllegalArgumentException] { r("2024-01-01-7d") } // no ||
    intercept[IllegalArgumentException] { r("nowx") }        // junk tail
  }
}
