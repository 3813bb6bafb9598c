package graft

import graft.dsl.Geo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark

  private def one(c: org.apache.spark.sql.Column): Any = {
    import sp.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect().head.get(0)
  }

  test("haversine: reference distances") {
    // one degree of longitude at the equator ≈ 111.1949 km
    assert(one(Geo.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(1.0))) == 111.1951)
    // same point → 0
    assert(one(Geo.haversineKm(lit(35.0), lit(70.0), lit(35.0), lit(70.0))) == 0.0)
    // antipodal ≈ half the earth circumference
    val anti = one(Geo.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(180.0))).asInstanceOf[Double]
    assert(math.abs(anti - 20015.1144) < 0.01)
  }

  test("geotile keys: known tiles") {
    // lat 0 sits on the y boundary: floor puts it in the southern row
    assert(one(Geo.geotileKey(lit(0.0), lit(0.0), 1)) == "1/1/1")
    // NE quadrant at z=1 is tile 1/1/0
    assert(one(Geo.geotileKey(lit(45.0), lit(45.0), 1)) == "1/1/0")
    // SW quadrant at z=2
    assert(one(Geo.geotileKey(lit(-45.0), lit(-90.0), 2)) == "2/1/2")
  }

  test("derived coordinates stay in the mercator domain and are deterministic") {
    import sp.implicits._
    val df = (1L to 500L).toDF("k")
      .select(Geo.derivedLat(col("k")).as("lat"), Geo.derivedLon(col("k")).as("lon"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.forall { case (la, lo) => la >= -85.0 && la < 85.0 && lo >= -180.0 && lo < 180.0 })
    val again = (1L to 500L).toDF("k")
      .select(Geo.derivedLat(col("k")).as("lat"), Geo.derivedLon(col("k")).as("lon"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.sameElements(again))
  }

  test("bounding box: inclusive edges, lat/lon independent") {
    val in = Geo.boundingBox(lit(10.0), lit(20.0), 10.0, 20.0, -10.0, 40.0)
    assert(one(in) == true)
    val out = Geo.boundingBox(lit(10.1), lit(20.0), 10.0, 20.0, -10.0, 40.0)
    assert(one(out) == false)
  }

  test("point-in-polygon: ray casting on a square and a concave polygon") {
    val square = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0))
    def in(lat: Double, lon: Double, pts: Seq[(Double, Double)]) =
      one(Geo.pointInPolygon(lit(lat), lit(lon), pts)) == true
    assert(in(5.0, 5.0, square))
    assert(!in(15.0, 5.0, square))
    assert(!in(5.0, -1.0, square))
    // concave "C" shape: the notch is outside
    val c = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (8.0, 10.0),
      (8.0, 2.0), (2.0, 2.0), (2.0, 10.0), (0.0, 10.0))
    assert(in(1.0, 5.0, c))   // bottom bar
    assert(!in(5.0, 5.0, c))  // inside the notch
    assert(in(9.0, 5.0, c))   // top bar
  }
}
