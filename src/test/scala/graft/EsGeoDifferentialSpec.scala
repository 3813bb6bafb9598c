package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 10 — the geo family: seeded random points against
  * INDEPENDENTLY-STRUCTURED twins (not textual mirrors of the engine's
  * SQL): the polygon twin is a winding-number test where the engine ray-
  * casts; the geohash twin is the textbook binary-search interleave where
  * the engine quantizes arithmetically; haversine/geotile re-derive the
  * published formulas in plain Scala. Random uniform points keep every
  * case off cell/radius boundaries, so a disagreement is a real bug, not
  * an fp tie.
  */
class EsGeoDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private lazy val pts: Seq[(Long, Double, Double)] = {
    val rnd = new Random(606060L)
    (1L to 300L).map(i =>
      (i, rnd.nextDouble() * 170.0 - 85.0, rnd.nextDouble() * 360.0 - 180.0))
  }

  private def df = {
    val sp = spark
    import sp.implicits._
    pts.toDF("doc_id", "loc_lat", "loc_lon")
  }

  private def round4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def havKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
    val (dp, dl) = (math.toRadians(lat2 - lat1), math.toRadians(lon2 - lon1))
    val a = math.pow(math.sin(dp / 2), 2) +
      math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)
    2 * 6371.0088 * math.asin(math.min(1.0, math.sqrt(a)))
  }

  private def run(body: String): Seq[Long] =
    graft.dsl.EsQueryJson.search(df,
      s"""{"query": {"bool": {"filter": [$body]}}, "sort": ["doc_id"], "size": 400}""")
      .collect().map(_.getAs[Long]("doc_id")).toSeq

  test("geo_distance and geo_bounding_box match the twins (45 cases)") {
    val rnd = new Random(11317L)
    (0 until 25).foreach { ci =>
      val oLat = rnd.nextDouble() * 170 - 85
      val oLon = rnd.nextDouble() * 360 - 180
      val km = 100 + rnd.nextDouble() * 7900
      val got = run(
        f"""{"geo_distance": {"distance": "$km%.3fkm", "loc": {"lat": $oLat, "lon": $oLon}}}""")
      val r = f"$km%.3f".toDouble
      val want = pts.collect {
        case (id, la, lo) if round4(havKm(la, lo, oLat, oLon)) <= r => id }
      assert(got == want, s"geo_distance divergence (case $ci origin=($oLat,$oLon) r=$r)")
    }
    (0 until 20).foreach { ci =>
      val la1 = rnd.nextDouble() * 170 - 85; val la2 = rnd.nextDouble() * 170 - 85
      val lo1 = rnd.nextDouble() * 360 - 180; val lo2 = rnd.nextDouble() * 360 - 180
      val (top, bot) = (math.max(la1, la2), math.min(la1, la2))
      val (left, right) = (math.min(lo1, lo2), math.max(lo1, lo2))
      val got = run(
        s"""{"geo_bounding_box": {"loc": {"top_left": {"lat": $top, "lon": $left},
           | "bottom_right": {"lat": $bot, "lon": $right}}}}""".stripMargin)
      val want = pts.collect {
        case (id, la, lo) if la <= top && la >= bot && lo >= left && lo <= right => id }
      assert(got == want, s"geo_bounding_box divergence (case $ci)")
    }
  }

  test("geo_polygon (ray cast) matches the winding-number twin (15 convex polygons)") {
    val rnd = new Random(27103L)
    (0 until 15).foreach { ci =>
      // convex polygon: random points sorted by angle around their centroid
      val n = 4 + rnd.nextInt(4)
      val cLat = rnd.nextDouble() * 120 - 60
      val cLon = rnd.nextDouble() * 300 - 150
      val raw = (1 to n).map(_ => (cLat + rnd.nextDouble() * 40 - 20,
        cLon + rnd.nextDouble() * 40 - 20))
      val cy = raw.map(_._1).sum / n; val cx = raw.map(_._2).sum / n
      val poly = raw.sortBy { case (y, x) => math.atan2(y - cy, x - cx) }
      val ptsJson = poly.map { case (y, x) => s"""{"lat": $y, "lon": $x}""" }.mkString(", ")
      val got = run(s"""{"geo_polygon": {"loc": {"points": [$ptsJson]}}}""")
      def winding(lat: Double, lon: Double): Boolean = {
        var w = 0
        poly.indices.foreach { i =>
          val (y1, x1) = poly(i); val (y2, x2) = poly((i + 1) % poly.length)
          val cross = (x2 - x1) * (lat - y1) - (lon - x1) * (y2 - y1)
          if (y1 <= lat) { if (y2 > lat && cross > 0) w += 1 }
          else if (y2 <= lat && cross < 0) w -= 1
        }
        w != 0
      }
      val want = pts.collect { case (id, la, lo) if winding(la, lo) => id }
      assert(got == want, s"geo_polygon divergence (case $ci, poly=$poly)")
    }
  }

  test("geohash_grid matches the textbook binary-search encoder (precisions 1..6)") {
    val d = df
    def twinHash(lat: Double, lon: Double, precision: Int): String = {
      val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      val sb = new StringBuilder
      var ch = 0; var bits = 0; var even = true
      while (sb.length < precision) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
          else { ch = ch << 1; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
          else { ch = ch << 1; latHi = mid }
        }
        even = !even; bits += 1
        if (bits == 5) { sb.append(base32(ch)); ch = 0; bits = 0 }
      }
      sb.toString
    }
    (1 to 6).foreach { p =>
      val got = graft.dsl.EsQueryJson.aggregations(d,
        s"""{"aggs": {"g": {"geohash_grid": {"field": "loc", "precision": $p}}}}""")("g")
        .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("doc_count")).toMap
      val want = pts.groupBy { case (_, la, lo) => twinHash(la, lo, p) }
        .view.mapValues(_.size.toLong).toMap
      assert(got == want, s"geohash_grid divergence at precision $p:\n" +
        s" engine-only=${got.toSet -- want.toSet} twin-only=${want.toSet -- got.toSet}")
    }
  }

  test("geotile_grid matches the slippy-map twin (zooms 2..8) and _geo_distance sort") {
    val d = df
    def tile(lat: Double, lon: Double, z: Int): String = {
      val n = (1L << z).toDouble
      val x = math.min(math.floor((lon + 180.0) / 360.0 * n).toLong, (1L << z) - 1)
      val rad = math.toRadians(lat)
      val y = math.min(math.floor(
        (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.Pi) / 2.0 * n).toLong,
        (1L << z) - 1)
      s"$z/$x/$y"
    }
    (2 to 8 by 2).foreach { z =>
      val got = graft.dsl.EsQueryJson.aggregations(d,
        s"""{"aggs": {"g": {"geotile_grid": {"field": "loc", "precision": $z}}}}""")("g")
        .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("doc_count")).toMap
      val want = pts.groupBy { case (_, la, lo) => tile(la, lo, z) }
        .view.mapValues(_.size.toLong).toMap
      assert(got == want, s"geotile_grid divergence at zoom $z")
    }
    val rnd = new Random(505L)
    (0 until 5).foreach { ci =>
      val oLat = rnd.nextDouble() * 170 - 85
      val oLon = rnd.nextDouble() * 360 - 180
      val got = graft.dsl.EsQueryJson.search(df,
        s"""{"query": {"match_all": {}},
           | "sort": [{"_geo_distance": {"loc": {"lat": $oLat, "lon": $oLon},
           |   "unit": "km"}}, "doc_id"], "size": 300}""".stripMargin)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      val want = pts.map { case (id, la, lo) => (round4(havKm(la, lo, oLat, oLon)), id) }
        .sorted.map(_._2)
      assert(got == want, s"_geo_distance sort divergence (case $ci)")
    }
  }
}
