package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import java.time.{DayOfWeek, Instant, ZoneOffset}
import java.time.temporal.{ChronoUnit, TemporalAdjusters}
import scala.util.Random

/** Differential front 17 — the SESSIONIZATION / event-analytics family
  * (Tier-C C5). A seeded generator builds user event streams with
  * controlled structure (session gaps straddling the threshold, funnel
  * progressions with on-time and late stage hits, conversions with and
  * without in-window predecessors, sub-second timestamps exercising the
  * whole-second truncation contract), and a plain-Scala twin re-derives
  * every report from the documented contracts with no engine code — its
  * own per-user sorted folds, its own Monday-week truncation (java.time
  * over UTC, the session zone), its own exact-percentile interpolation
  * for the RFM cutoffs. Engine answers must match the twin exactly.
  * Seeded — deterministic corpus, found bugs stay found. */
class SessionizeDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private case class Ev(userId: Long, eventId: Long, epochMillis: Long,
                        eventType: String, value: Double) {
    def sec: Long = Math.floorDiv(epochMillis, 1000L) // whole-second contract
  }

  private val types = Seq("visit", "view", "cart", "signup", "purchase", "support")

  private lazy val fixture: Seq[Ev] = {
    val rnd = new Random(170816002L)
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC
    var eid = 0L
    (1L to 40L).flatMap { u =>
      var t = base + rnd.nextInt(21 * 86400) * 1000L
      val n = 15 + rnd.nextInt(45)
      (0 until n).map { _ =>
        // gaps cluster under/over the 30-min session threshold; some
        // sub-second fractions exercise the truncation contract
        val gap = rnd.nextInt(4) match {
          case 0 => 5 + rnd.nextInt(120)            // seconds apart
          case 1 => 60 * (5 + rnd.nextInt(24))      // minutes apart (near threshold)
          case 2 => 1795 + rnd.nextInt(11)          // straddles 1800 s exactly
          case _ => 3600 * (1 + rnd.nextInt(100))   // hours/days apart
        }
        t += gap * 1000L + (if (rnd.nextBoolean()) rnd.nextInt(1000) else 0)
        eid += 1
        Ev(u, eid, t, types(rnd.nextInt(types.size)), (rnd.nextInt(2000) + 1) / 100.0)
      }
    }
  }

  private lazy val eventsDf = {
    val sp = spark
    import sp.implicits._
    fixture.map(e => (e.userId, e.eventId, new Timestamp(e.epochMillis), e.eventType, e.value))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Twin sessions: per user in (ts, event_id) order, whole-second gap
    * > gapMinutes*60 starts a new session. */
  private def twinSessions(gapMinutes: Int): Map[Long, Long] = // event_id -> session_id
    fixture.groupBy(_.userId).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e.epochMillis, e.eventId))
      var sess = 0L; var prev: Option[Ev] = None
      sorted.map { e =>
        if (prev.forall(p => e.sec - p.sec > gapMinutes * 60L)) sess += 1
        prev = Some(e)
        e.eventId -> sess
      }
    }

  test("assign + userStats == twin per-user gap fold") {
    val gap = 30
    val want = twinSessions(gap)
    val got = graft.ext.Sessionize.assign(eventsDf, gap)
      .select("event_id", "session_id").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(got == want)
    // the threshold must be exercised from both sides (1795..1805 s gaps)
    val gaps = fixture.groupBy(_.userId).values.flatMap { evs =>
      evs.sortBy(e => (e.epochMillis, e.eventId)).sliding(2).collect {
        case Seq(a, b) => b.sec - a.sec }
    }
    assert(gaps.exists(g => g > 1790 && g <= 1800) && gaps.exists(g => g > 1800 && g < 1810),
      "fixture degenerate: no gaps straddling the threshold")
    val wantStats = fixture.groupBy(_.userId).map { case (u, evs) =>
      val sizes = evs.groupBy(e => want(e.eventId)).values.map(_.size.toLong)
      (u, sizes.size.toLong, evs.size.toLong, sizes.max)
    }.toSet
    val gotStats = graft.ext.Sessionize.userStats(eventsDf, gap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotStats == wantStats)
  }

  /** Twin funnel fold: greedy earliest-match, `within` kill rule. */
  private def twinFunnel(stages: Seq[String], within: Option[Long]): Seq[(Int, Long, Option[Double])] = {
    val perUser = fixture.filter(e => stages.contains(e.eventType))
      .groupBy(_.userId).map { case (_, evs) =>
        val sorted = evs.sortBy(e => (e.epochMillis, e.eventType))
        var stage = 0; var t0: Option[Ev] = None; var tn: Option[Ev] = None; var dead = false
        sorted.foreach { e =>
          val qualifies = !dead && stage < stages.size && e.eventType == stages(stage)
          if (qualifies) {
            val onTime = within.forall(w => tn.forall(p => e.sec - p.sec <= w))
            if (onTime) { stage += 1; if (t0.isEmpty) t0 = Some(e); tn = Some(e) }
            else dead = true
          }
        }
        (stage, t0, tn)
      }.toSeq
    perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (st, rows) =>
      val spans = rows.map(r => (r._3.get.sec - r._2.get.sec).toDouble)
      (st, rows.size.toLong,
        if (st == 0) None else Some(round6(spans.sum / spans.size)))
    }
  }

  test("funnel == twin greedy fold (plain + conversion-window kill)") {
    val stages = Seq("visit", "signup", "purchase")
    for (within <- Seq(None, Some(86400L))) {
      val want = twinFunnel(stages, within)
      val got = graft.ext.Sessionize.funnel(eventsDf, stages, within).collect()
        .map(r => (r.getAs[Int]("stage_reached"), r.getAs[Long]("n_users"),
          Option(r.get(r.fieldIndex("avg_span_secs"))).map(_.asInstanceOf[Double]))).toSeq
      assert(got == want, s"within=$within: got=$got want=$want")
    }
    // the kill rule must fire on this fixture (windowed counts differ)
    assert(twinFunnel(stages, Some(86400L)) != twinFunnel(stages, None),
      "fixture degenerate: the conversion window never kills a funnel")
  }

  test("cohortRetention == twin Monday-week cohort table") {
    def weekStartSec(sec: Long): Long =
      Instant.ofEpochSecond(sec).atZone(ZoneOffset.UTC)
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        .truncatedTo(ChronoUnit.DAYS).toEpochSecond
    val cohortOf = fixture.groupBy(_.userId).view
      .mapValues(evs => weekStartSec(evs.map(_.sec).min)).toMap
    val activeWeeks = fixture.map(e => (e.userId, weekStartSec(e.sec))).distinct
    val counts = activeWeeks.groupBy { case (u, wk) =>
      (cohortOf(u), ((wk - cohortOf(u)) / (7L * 86400L)).toInt)
    }.view.mapValues(_.size.toLong).toMap
    val want = counts.map { case ((c, off), n) =>
      (c, off, n, round6(n.toDouble / counts((c, 0)))) }.toSet
    val got = graft.ext.Sessionize.cohortRetention(eventsDf).collect()
      .map(r => (r.getAs[Timestamp]("cohort").getTime / 1000L, r.getAs[Int]("week_offset"),
        r.getAs[Long]("n_users"), r.getAs[Double]("retention_rate"))).toSet
    assert(got == want)
    assert(counts.keySet.map(_._1).size >= 3, "fixture degenerate: fewer than 3 cohorts")
  }

  test("eventTransitions + topPaths + lastTouchAttribution == twin journeys") {
    val byUser = fixture.groupBy(_.userId).view
      .mapValues(_.sortBy(e => (e.epochMillis, e.eventId))).toMap
    // transition matrix
    val pairCnt = byUser.values.flatMap(_.sliding(2).collect {
      case Seq(a, b) => (a.eventType, b.eventType) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outTot = pairCnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val wantTr = pairCnt.map { case ((f, t), n) =>
      (f, t, n, round6(n.toDouble / outTot(f))) }.toSet
    val gotTr = graft.ext.Sessionize.eventTransitions(eventsDf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotTr == wantTr)
    // entry paths (depth 3, topK large enough to be total — avoids
    // modelling the truncation tie order)
    val wantPaths = byUser.values.map(_.take(3).map(_.eventType).mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotPaths = graft.ext.Sessionize.topPaths(eventsDf, depth = 3, topK = 10000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotPaths == wantPaths)
    // last-touch attribution over 1 h
    val wantAttr = byUser.values.flatMap { evs =>
      evs.zipWithIndex.collect { case (e, i) if e.eventType == "purchase" =>
        if (i > 0 && e.sec - evs(i - 1).sec <= 3600L) evs(i - 1).eventType else "(none)"
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotAttr = graft.ext.Sessionize.lastTouchAttribution(eventsDf, "purchase", 3600L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotAttr == wantAttr)
    assert(wantAttr.contains("(none)"), "fixture degenerate: every conversion has a predecessor")
  }

  test("rfmSegments == twin quantile-cutoff scoring") {
    // per-user metrics (sec-truncated recency base, 4-dp monetary like the engine)
    val perUser = fixture.groupBy(_.userId).map { case (u, evs) =>
      (u, evs.map(_.sec).max, evs.size.toLong, round4(evs.map(_.value).sum))
    }.toSeq
    val asOf = perUser.map(_._2).max
    val us = perUser.map { case (u, last, f, m) => (u, (asOf - last).toDouble, f.toDouble, m) }
    // Spark/DuckDB exact percentile: rank p*(n-1), linear interpolation
    def pct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      val r = p * (s.size - 1)
      val lo = math.floor(r).toInt; val hi = math.ceil(r).toInt
      if (lo == hi) s(lo) else s(lo) + (r - lo) * (s(hi) - s(lo))
    }
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    val (cr, cf, cm) = (ps.map(pct(us.map(_._2), _)), ps.map(pct(us.map(_._3), _)),
      ps.map(pct(us.map(_._4), _)))
    def score(v: Double, cuts: Seq[Double], smallerBetter: Boolean): Int =
      cuts.count(c => if (smallerBetter) v < round6(c) else v > round6(c)) + 1
    val want = us.map { case (_, r, f, m) =>
      score(r, cr, smallerBetter = true) * 100 + score(f, cf, smallerBetter = false) * 10 +
        score(m, cm, smallerBetter = false)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.ext.Sessionize.rfmSegments(eventsDf, col("value")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.size >= 5, "fixture degenerate: fewer than 5 RFM segments")
  }
}
