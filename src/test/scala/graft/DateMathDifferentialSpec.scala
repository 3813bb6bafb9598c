package graft

import graft.dsl.DateMath
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 11 — date math. The engine resolves through
  * java.time; this twin re-derives the calendar INDEPENDENTLY: epoch-day
  * integer arithmetic, own leap-year rule, own month-end clamping, own
  * ISO-Monday derivation from epoch-day mod 7 (1970-01-01 was a
  * Thursday). 400 seeded expressions over boundary-heavy anchors (month
  * ends, Feb 29, year ends) — step order, clamping, and rounding floors
  * must agree to the second.
  */
class DateMathDifferentialSpec extends AnyFunSuite {

  // ---- independent calendar twin ----

  private def isLeap(y: Int) = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
  private def daysIn(y: Int, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case 2 => if (isLeap(y)) 29 else 28
  }
  case class T(y: Int, m: Int, d: Int, hh: Int, mm: Int, ss: Int)

  private def toEpochDay(y: Int, m: Int, d: Int): Long = {
    // days since 1970-01-01 by summing whole years then months
    var days = 0L
    if (y >= 1970) (1970 until y).foreach(yy => days += (if (isLeap(yy)) 366 else 365))
    else (y until 1970).foreach(yy => days -= (if (isLeap(yy)) 366 else 365))
    (1 until m).foreach(mm => days += daysIn(y, mm))
    days + (d - 1)
  }
  private def fromEpochDay(ed: Long): (Int, Int, Int) = {
    var y = 1970; var rem = ed
    while (rem < 0) { y -= 1; rem += (if (isLeap(y)) 366 else 365) }
    while (rem >= (if (isLeap(y)) 366 else 365)) { rem -= (if (isLeap(y)) 366 else 365); y += 1 }
    var m = 1
    while (rem >= daysIn(y, m)) { rem -= daysIn(y, m); m += 1 }
    (y, m, rem.toInt + 1)
  }
  private def toSecs(t: T): Long =
    toEpochDay(t.y, t.m, t.d) * 86400L + t.hh * 3600L + t.mm * 60L + t.ss
  private def fromSecs(s: Long): T = {
    val ed = Math.floorDiv(s, 86400L); val rem = Math.floorMod(s, 86400L)
    val (y, m, d) = fromEpochDay(ed)
    T(y, m, d, (rem / 3600).toInt, (rem % 3600 / 60).toInt, (rem % 60).toInt)
  }

  private def plusMonths(t: T, n: Long): T = {
    val tot = t.y * 12L + (t.m - 1) + n
    val y2 = Math.floorDiv(tot, 12L).toInt; val m2 = Math.floorMod(tot, 12L).toInt + 1
    t.copy(y = y2, m = m2, d = math.min(t.d, daysIn(y2, m2)))
  }

  private def step(t: T, unit: String, n: Long): T = unit match {
    case "y" => plusMonths(t, n * 12)
    case "M" => plusMonths(t, n)
    case "w" => fromSecs(toSecs(t) + n * 7 * 86400L)
    case "d" => fromSecs(toSecs(t) + n * 86400L)
    case "h" | "H" => fromSecs(toSecs(t) + n * 3600L)
    case "m" => fromSecs(toSecs(t) + n * 60L)
    case "s" => fromSecs(toSecs(t) + n)
  }

  private def floor(t: T, unit: String): T = unit match {
    case "y" => T(t.y, 1, 1, 0, 0, 0)
    case "M" => T(t.y, t.m, 1, 0, 0, 0)
    case "w" =>
      // ISO day-of-week from epoch day: day 0 (1970-01-01) was THURSDAY
      val ed = toEpochDay(t.y, t.m, t.d)
      val dow = Math.floorMod(ed + 3, 7L) // 0 = Monday
      val (y2, m2, d2) = fromEpochDay(ed - dow)
      T(y2, m2, d2, 0, 0, 0)
    case "d" => t.copy(hh = 0, mm = 0, ss = 0)
    case "h" | "H" => t.copy(mm = 0, ss = 0)
    case "m" => t.copy(ss = 0)
    case "s" => t
  }

  test("400 seeded expressions over boundary anchors match the independent calendar") {
    val rnd = new Random(19700101L)
    val anchors = Seq(
      T(2024, 1, 31, 12, 30, 45), T(2024, 2, 29, 23, 59, 59), T(2023, 2, 28, 0, 0, 1),
      T(2024, 12, 31, 23, 0, 0), T(2020, 3, 1, 6, 7, 8), T(2019, 12, 31, 0, 0, 0),
      T(2000, 2, 29, 11, 11, 11), T(2100, 1, 15, 9, 0, 0), T(1999, 5, 31, 17, 45, 0))
    val units = Seq("y", "M", "w", "d", "h", "H", "m", "s")
    (0 until 400).foreach { ci =>
      val anchor = anchors(rnd.nextInt(anchors.size))
      val nSteps = rnd.nextInt(4)
      val steps = (1 to nSteps).map { _ =>
        val u = units(rnd.nextInt(units.size))
        val sign = if (rnd.nextBoolean()) "+" else "-"
        val n = u match {
          case "y" => 1 + rnd.nextInt(5)
          case "M" => 1 + rnd.nextInt(26)
          case "d" => 1 + rnd.nextInt(800)
          case _ => 1 + rnd.nextInt(40)
        }
        (sign, n, u)
      }
      val rounding = if (rnd.nextBoolean()) Some(units(rnd.nextInt(units.size))) else None
      val expr = "now" + steps.map { case (s, n, u) => s"$s$n$u" }.mkString +
        rounding.map("/" + _).getOrElse("")
      val nowInstant = java.time.Instant.ofEpochSecond(toSecs(anchor))
      val got = DateMath.resolve(expr, nowInstant).getEpochSecond
      var t = anchor
      steps.foreach { case (s, n, u) => t = step(t, u, if (s == "-") -n else n) }
      rounding.foreach(u => t = floor(t, u))
      assert(got == toSecs(t),
        s"date-math divergence (case $ci): '$expr' @ $anchor engine=$got twin=${toSecs(t)} " +
          s"(engine=${DateMath.literal(expr, nowInstant)})")
    }
  }

  test("malformed inputs classify false and resolve loudly (fuzzed)") {
    val rnd = new Random(77L)
    val junk = Seq("nowhere", "now-", "now3d", "now-3q", "now/x", "now-3d/",
      "now--3d", "now-3d3", "later-1d") ++
      (1 to 40).map(_ => "now" + Random.alphanumeric.take(rnd.nextInt(6)).mkString)
    junk.foreach { s =>
      val ok = DateMath.isDateMath(s)
      if (!ok) intercept[RuntimeException] {
        DateMath.resolve(s, java.time.Instant.EPOCH); ()
      }
    }
    // the classifier is consistent with resolve on every junk input
    junk.foreach { s =>
      val resolvable = try { DateMath.resolve(s, java.time.Instant.EPOCH); true }
        catch { case _: RuntimeException => false }
      assert(DateMath.isDateMath(s) == resolvable, s"classifier drift on '$s'")
    }
  }
}
