package graft.dsl

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES geo queries: `geo_distance`, `geo_bounding_box`, `geotile_grid`.
  *
  * A geo point field `F` is the column pair `F_lat`/`F_lon` (degrees,
  * doubles). The driver tables carry no coordinates, so
  * [[withDerivedCoords]] derives a deterministic point from a key column
  * via the md5-60 hash family — the same cross-engine-deterministic
  * pattern as the LSH planes ([[graft.functions.Hashing]]): the DuckDB
  * oracle recomputes identical coordinates, so geo results hash-check
  * exactly like any other query.
  *
  * All math is plain codegen'd double arithmetic with the association
  * written identically in the oracle SQL (NOTES.md cross-engine rule);
  * distances round to 4 dp before any filter/sort so boundary rows are
  * engine-stable. Scale: every predicate is narrow scan work; geotile_grid
  * is a hash groupBy on the tile key.
  */
object Geo {

  /** Latitude in [-85, 85) (inside the web-mercator domain) and longitude
    * in [-180, 180), 1e-4° resolution, derived from `key`. */
  def derivedLat(key: Column): Column =
    (Hashing.md5Long60(concat(lit("lat:"), key.cast("string"))) % 1700000) / 10000.0 - 85.0
  def derivedLon(key: Column): Column =
    (Hashing.md5Long60(concat(lit("lon:"), key.cast("string"))) % 3600000) / 10000.0 - 180.0

  def withDerivedCoords(df: DataFrame, key: Column, name: String): DataFrame =
    df.withColumn(s"${name}_lat", derivedLat(key))
      .withColumn(s"${name}_lon", derivedLon(key))

  /** DuckDB twins of the coordinate derivation (oracle builders). */
  def sqlDerivedLat(key: String): String =
    s"(${Hashing.sqlMd5Long60(s"'lat:' || CAST($key AS VARCHAR)")} % 1700000) / 10000.0 - 85.0"
  def sqlDerivedLon(key: String): String =
    s"(${Hashing.sqlMd5Long60(s"'lon:' || CAST($key AS VARCHAR)")} % 3600000) / 10000.0 - 180.0"

  /** Haversine great-circle distance in km, 4 dp. 12742.0176 = 2 × the
    * IUGG mean earth radius 6371.0088 km. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    round(lit(12742.0176) * asin(least(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)),
      lit(1.0))), 4)

  /** DuckDB twin of [[haversineKm]] — identical association, term order,
    * and rounding, so the doubles match bit-for-bit. */
  def sqlHaversineKm(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"round(12742.0176 * asin(least(sqrt(" +
      s"pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2)), " +
      s"1.0)), 4)"

  def boundingBox(lat: Column, lon: Column,
                  topLeftLat: Double, topLeftLon: Double,
                  bottomRightLat: Double, bottomRightLon: Double): Column =
    lat <= topLeftLat && lat >= bottomRightLat &&
      lon >= topLeftLon && lon <= bottomRightLon

  /** `geo_polygon`: point-in-polygon by ray casting — odd count of polygon
    * edges crossed by the horizontal ray from the point to +∞ lon. Plain
    * double arithmetic per edge (no trig), association mirrored textually
    * by [[sqlPointInPolygon]]; a horizontal edge divides by zero into ±inf,
    * which both engines compare identically (the crossing guard already
    * excludes it). */
  def pointInPolygon(lat: Column, lon: Column, pts: Seq[(Double, Double)]): Column = {
    require(pts.length >= 3, s"polygon needs >= 3 points, got ${pts.length}")
    val crossings = pts.indices.map { i =>
      val (yi, xi) = pts(i); val (yj, xj) = pts((i + 1) % pts.length)
      val crosses = (lit(yi) > lat) =!= (lit(yj) > lat)
      val xAt = (lit(xj) - lit(xi)) * (lat - lit(yi)) / (lit(yj) - lit(yi)) + lit(xi)
      when(crosses && lon < xAt, 1).otherwise(0)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** DuckDB twin of [[pointInPolygon]] — identical per-edge expression. */
  def sqlPointInPolygon(lat: String, lon: String, pts: Seq[(Double, Double)]): String = {
    val terms = pts.indices.map { i =>
      val (yi, xi) = pts(i); val (yj, xj) = pts((i + 1) % pts.length)
      s"(CASE WHEN (($yi > $lat) <> ($yj > $lat)) AND " +
        s"$lon < ($xj - $xi) * ($lat - $yi) / ($yj - $yi) + $xi THEN 1 ELSE 0 END)"
    }
    s"(${terms.mkString(" + ")}) % 2 = 1"
  }

  /** Web-mercator tile key `z/x/y` at `precision` = zoom z (ES
    * geotile_grid key format). Latitude must already be inside the
    * mercator domain (±85.05113°) — [[derivedLat]] guarantees it. */
  def geotileKey(lat: Column, lon: Column, precision: Int): Column = {
    val n = lit((1L << precision).toDouble)
    val hi = lit((1L << precision) - 1)
    // clamp lon=180 (x would quantize to 2^z) into the last tile, as ES does
    val x = least(floor((lon + 180.0) / 360.0 * n).cast("long"), hi)
    val y = least(floor((lit(1.0) - log(tan(radians(lat)) + lit(1.0) / cos(radians(lat))) / lit(math.Pi)) / 2.0 * n).cast("long"), hi)
    concat_ws("/", lit(precision), x, y)
  }

  /** DuckDB twin of [[geotileKey]]. */
  def sqlGeotileKey(lat: String, lon: String, precision: Int): String = {
    val n = s"${(1L << precision).toDouble}"
    val hi = (1L << precision) - 1
    s"($precision || '/' || least(CAST(floor(($lon + 180.0) / 360.0 * $n) AS BIGINT), $hi) || '/' || " +
      s"least(CAST(floor((1.0 - ln(tan(radians($lat)) + 1.0 / cos(radians($lat))) / pi()) / 2.0 * $n) AS BIGINT), $hi))"
  }

  // ---- geohash (ES geohash_grid): base32 cell key of `precision` chars.
  // 5·p bits total — lon takes the even bit positions from the MSB (one
  // extra bit when 5·p is odd), lat the odd ones; both quantized by a
  // plain floor, so the whole key is integer math both engines compute
  // identically (no trig, no float folds).

  private val geohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** The interleaved 5·p-bit geohash integer. */
  def geohashKey(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12, s"geohash precision 1..12, got $precision")
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    // clamp: lon=180 / lat=90 quantize to 2^bits, whose extra bit would
    // corrupt the interleave — ES maps the boundary into the last cell
    val lonq = least(floor((lon + 180.0) / 360.0 * (1L << lonBits).toDouble).cast("long"),
      lit((1L << lonBits) - 1))
    val latq = least(floor((lat + 90.0) / 180.0 * (1L << latBits).toDouble).cast("long"),
      lit((1L << latBits) - 1))
    val terms =
      (0 until lonBits).map(i =>
        shiftright(lonq, lonBits - 1 - i).bitwiseAND(lit(1L)) * lit(1L << (total - 1 - 2 * i))) ++
      (0 until latBits).map(j =>
        shiftright(latq, latBits - 1 - j).bitwiseAND(lit(1L)) * lit(1L << (total - 2 - 2 * j)))
    val gh = terms.reduce(_ + _)
    val chars = array(geohashAlphabet.map(c => lit(c.toString)): _*)
    concat((0 until precision).map(k =>
      element_at(chars,
        (shiftright(gh, 5 * (precision - 1 - k)).bitwiseAND(lit(31L)) + 1).cast("int"))): _*)
  }

  /** DuckDB twins — [[sqlGeohashInt]] emits the interleaved integer (bind
    * it to a column in a CTE), [[sqlGeohashChars]] the base32 string over
    * that bound name. */
  def sqlGeohashInt(lat: String, lon: String, precision: Int): String = {
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    val lonq = s"least(CAST(floor(($lon + 180.0) / 360.0 * ${(1L << lonBits).toDouble}) AS BIGINT), ${(1L << lonBits) - 1})"
    val latq = s"least(CAST(floor(($lat + 90.0) / 180.0 * ${(1L << latBits).toDouble}) AS BIGINT), ${(1L << latBits) - 1})"
    val terms =
      (0 until lonBits).map(i =>
        s"((($lonq >> ${lonBits - 1 - i}) & 1) * ${1L << (total - 1 - 2 * i)})") ++
      (0 until latBits).map(j =>
        s"((($latq >> ${latBits - 1 - j}) & 1) * ${1L << (total - 2 - 2 * j)})")
    terms.mkString("(", " + ", ")")
  }

  def sqlGeohashChars(gh: String, precision: Int): String =
    (0 until precision).map(k =>
      s"substr('$geohashAlphabet', CAST((($gh >> ${5 * (precision - 1 - k)}) & 31) AS INT) + 1, 1)")
      .mkString("(", " || ", ")")
}
