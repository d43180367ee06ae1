package graft.sink

import java.time.{DayOfWeek, Instant, LocalDate, LocalDateTime, ZoneOffset,
  ZonedDateTime}
import java.time.temporal.{ChronoUnit, TemporalAdjusters}

/** ES date-math expressions — `now-7d/d`, `2024-01-15||+1M/M` — the
  * range-query time bounds every Kibana-style consumer sends. Resolved
  * ENTIRELY on the driver against an explicit `now` (no hidden clock:
  * the caller passes the anchor, so a query plan is reproducible and a
  * test can pin it), producing an [[Instant]] the caller drops into a
  * range predicate as a plan literal — the scan still gets a plain
  * pushable timestamp comparison.
  *
  * Grammar: anchor (`now` | `<ISO date or datetime>||`) followed by any
  * number of `+Nu` / `-Nu` offsets and `/u` truncations, applied left
  * to right (the ES evaluation order). Units: `y M w d h m s` —
  * calendar-aware arithmetic for `y/M/w` (adding a month to Jan 31
  * clamps to Feb 29/28, like ES), fixed-duration for the rest. `/w`
  * truncates to Monday (ISO weeks, the ES convention). All in UTC.
  * Malformed expressions fail loudly with the offset that broke.
  */
object DateMath {

  private def unit(c: Char, expr: String): ChronoUnit = c match {
    case 'y' => ChronoUnit.YEARS
    case 'M' => ChronoUnit.MONTHS
    case 'w' => ChronoUnit.WEEKS
    case 'd' => ChronoUnit.DAYS
    case 'h' | 'H' => ChronoUnit.HOURS
    case 'm' => ChronoUnit.MINUTES
    case 's' => ChronoUnit.SECONDS
    case other => throw new IllegalArgumentException(
      s"unknown date-math unit '$other' in: $expr")
  }

  private def truncate(t: ZonedDateTime, u: ChronoUnit): ZonedDateTime =
    u match {
      case ChronoUnit.YEARS =>
        t.`with`(TemporalAdjusters.firstDayOfYear).truncatedTo(ChronoUnit.DAYS)
      case ChronoUnit.MONTHS =>
        t.`with`(TemporalAdjusters.firstDayOfMonth).truncatedTo(ChronoUnit.DAYS)
      case ChronoUnit.WEEKS =>
        t.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
          .truncatedTo(ChronoUnit.DAYS)
      case fine => t.truncatedTo(fine)
    }

  def resolve(expr: String, now: Instant): Instant = {
    require(expr.nonEmpty, "empty date-math expression")
    val (anchor, rest) =
      if (expr.startsWith("now")) {
        (ZonedDateTime.ofInstant(now, ZoneOffset.UTC), expr.drop(3))
      } else {
        val sep = expr.indexOf("||")
        require(sep >= 0,
          s"absolute anchor needs '||' before the math in: $expr")
        val a = expr.take(sep)
        val parsed =
          if (a.contains("T")) LocalDateTime.parse(a)
          else LocalDate.parse(a).atStartOfDay()
        (parsed.atZone(ZoneOffset.UTC), expr.drop(sep + 2))
      }
    var t = anchor
    var i = 0
    while (i < rest.length) {
      rest(i) match {
        case '/' =>
          require(i + 1 < rest.length,
            s"dangling '/' at end of: $expr")
          t = truncate(t, unit(rest(i + 1), expr))
          i += 2
        case sign @ ('+' | '-') =>
          var j = i + 1
          while (j < rest.length && rest(j).isDigit) j += 1
          require(j > i + 1, s"missing amount after '$sign' in: $expr")
          require(j < rest.length, s"missing unit at end of: $expr")
          val n = rest.substring(i + 1, j).toLong
          val u = unit(rest(j), expr)
          t = if (sign == '+') t.plus(n, u) else t.minus(n, u)
          i = j + 1
        case other => throw new IllegalArgumentException(
          s"unexpected '$other' at offset $i in date-math: $expr")
      }
    }
    t.toInstant
  }
}
