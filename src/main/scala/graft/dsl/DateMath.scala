package graft.dsl

import java.time._
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** ES date math (`now-7d/d`, `now-1M+3d/h`, …) against an INJECTED clock.
  *
  * ES resolves `now` on the coordinating node at query time; a
  * deterministic engine (and its oracle) needs the anchor pinned, so the
  * anchor is always explicit — either [[EsQueryJson.withNow]] around query
  * construction or a `"now"` key in the range body. Resolution happens at
  * plan-construction time on the driver: the filter the executors see is a
  * plain timestamp literal (pushable to the scan like any other bound).
  *
  * Supported: `now` anchor, then `±N` steps of `y M w d h H m s`, then an
  * optional `/unit` floor-rounding (`/w` rounds to Monday, ES semantics).
  * All arithmetic in UTC. */
object DateMath {

  private val Step = "([+-])(\\d+)([yMwdhHms])".r
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def resolve(expr: String, now: Instant): Instant = {
    require(expr.startsWith("now"), s"date math must start with 'now': $expr")
    val rest = expr.stripPrefix("now")
    val (steps, rounding) = rest.lastIndexOf('/') match {
      case -1 => (rest, None)
      case i => (rest.substring(0, i), Some(rest.substring(i + 1)))
    }
    val consumed = Step.findAllMatchIn(steps).map(_.matched.length).sum
    require(consumed == steps.length, s"malformed date math steps '$steps' in $expr")
    var z = now.atZone(ZoneOffset.UTC)
    Step.findAllMatchIn(steps).foreach { m =>
      val n = m.group(2).toLong * (if (m.group(1) == "-") -1 else 1)
      z = m.group(3) match {
        case "y" => z.plusYears(n)
        case "M" => z.plusMonths(n)
        case "w" => z.plusWeeks(n)
        case "d" => z.plusDays(n)
        case "h" | "H" => z.plusHours(n)
        case "m" => z.plusMinutes(n)
        case "s" => z.plusSeconds(n)
      }
    }
    rounding.foreach { u =>
      z = u match {
        case "y" => z.withDayOfYear(1).truncatedTo(ChronoUnit.DAYS)
        case "M" => z.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
        case "w" => z.`with`(DayOfWeek.MONDAY).truncatedTo(ChronoUnit.DAYS)
        case "d" => z.truncatedTo(ChronoUnit.DAYS)
        case "h" | "H" => z.truncatedTo(ChronoUnit.HOURS)
        case "m" => z.truncatedTo(ChronoUnit.MINUTES)
        case "s" => z.truncatedTo(ChronoUnit.SECONDS)
        case other => throw new IllegalArgumentException(s"unsupported rounding /$other in $expr")
      }
    }
    z.toInstant
  }

  /** `yyyy-MM-dd HH:mm:ss` UTC literal (what both engines compare as a
    * timestamp). */
  def literal(expr: String, now: Instant): String =
    Fmt.format(resolve(expr, now).atZone(ZoneOffset.UTC))

  /** True iff `expr` is well-formed date math (`now` + valid steps +
    * optional valid rounding). ES applies date math only to date-MAPPED
    * fields; without a mapping, a string like `"nowhere"` must compile to a
    * plain string bound, not an error — callers gate on this. */
  def isDateMath(expr: String): Boolean =
    expr.startsWith("now") && (try { resolve(expr, Instant.EPOCH); true }
      catch { case _: RuntimeException => false })
}
