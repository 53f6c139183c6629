package graft

import graft.functions.GeoFunctions._
import org.apache.spark.sql.functions._

/** Scalar surface unit vectors (FIXTURES.md §A3) + exhaustive grid
  * properties (plain loops — the offline cache has no scalatest-plus
  * scalacheck bridge, and the domains are small enough to enumerate). */
class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c).collect().head.getAs[T](0)

  test("F1 WKT parse: canonical POINT") {
    val got = one[collection.Seq[Double]](wktToCoords(lit("POINT (113.5 15.0)")))
    assert(got.toList == List(113.5, 15.0))
  }

  test("F2 ECEF matches the reference's own math at h=124 m") {
    // check values computed with _util.py:58-79 (WGS84, height 124)
    val x = one[Double](ecefX(lit(113.5), lit(15.0)))
    val y = one[Double](ecefY(lit(113.5), lit(15.0)))
    assert(math.abs(x - -2457214.9214875605) < 1e-6)
    assert(math.abs(y - 5651207.424140891) < 1e-6)
  }

  test("F3 ROT decode: 4.733 -> 1 deg/min, 9.466 -> 4, 0 -> 0") {
    assert(math.abs(one[Double](rotDecode(lit(4.733))) - 1.0) < 1e-12)
    assert(math.abs(one[Double](rotDecode(lit(9.466))) - 4.0) < 1e-12)
    assert(one[Double](rotDecode(lit(0.0))) == 0.0)
  }

  test("F5 haversine: zero distance; quarter meridian ~ 10,007.5 km") {
    assert(one[Double](haversineKm(lit(10.0), lit(20.0), lit(10.0), lit(20.0))) == 0.0)
    val quarter = one[Double](haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(90.0)))
    assert(math.abs(quarter - 10007.543) < 0.1)
  }

  test("F6 path angle: due east = 0, due north = 90") {
    assert(math.abs(one[Double](pathAngleDeg(lit(1.0), lit(0.0)))) < 1e-12)
    assert(math.abs(one[Double](pathAngleDeg(lit(0.0), lit(1.0))) - 90.0) < 1e-12)
  }

  test("F4 pixel transform: grid anchor and cell stepping") {
    assert(one[Long](pixelCol(lit(100.0), 100.0, 0.25)) == 0L)
    assert(one[Long](pixelCol(lit(100.26), 100.0, 0.25)) == 1L)
    assert(one[Long](pixelRow(lit(30.0), 30.0, 0.25)) == 0L)
    assert(one[Long](pixelRow(lit(29.74), 30.0, 0.25)) == 1L)
  }

  test("F9 point-in-polygon: crown fixture hits 0/1/2/3-crossing parities") {
    val poly = graft.operators.AisOps.CrownPoly
    def pip(px: Long, py: Long): Long =
      one[Long](pointInPolygon(lit(px), lit(py), poly))
    assert(pip(1500, 500) == 1, "bottom center: 1 crossing, inside")
    assert(pip(500, 1000) == 1, "left wing interior: 1 crossing")
    assert(pip(950, 2400) == 1, "left peak interior: 3 crossings, still odd")
    assert(pip(1500, 2000) == 0, "notch: 2 crossings — concavity exercised")
    assert(pip(100, 1000) == 0, "left of the polygon: 2 crossings, outside")
    assert(pip(1500, 2700) == 0, "above both peaks: 0 crossings")
    assert(pip(2900, 150) == 0, "outside, level with the horizontal base edge")
  }

  test("T7 dead reckoning: northbound leg adds only latitude") {
    val lat = one[Double](deadReckonLat(lit(10.0), lit(10.0), lit(0.0), lit(3600.0)))
    // 10 kn for 1 h = 18,520 m; / 111,320 m/deg ~ 0.16636 deg
    assert(math.abs(lat - (10.0 + 18520.0 / 111320.0)) < 1e-9)
    val lon = one[Double](deadReckonLon(lit(20.0), lit(10.0), lit(10.0), lit(0.0), lit(3600.0)))
    assert(math.abs(lon - 20.0) < 1e-9)
  }

  test("property: WKT format∘parse = id across the full synthetic grid") {
    val rows = for (lonI <- 100 to 129; latI <- 0 to 29) yield (lonI, latI)
    val got = rows.toDF("lon", "lat")
      .withColumn("wkt", concat(lit("POINT ("), $"lon", lit(" "), $"lat", lit(")")))
      .select($"lon", $"lat", wktToCoords($"wkt").as("c"))
      .collect()
    got.foreach { r =>
      val c = r.getAs[collection.Seq[Double]]("c")
      assert(c.toList == List(r.getInt(0).toDouble, r.getInt(1).toDouble))
    }
  }

  test("property: ROT decode is even, monotone in |x|, non-negative") {
    val xs = BigDecimal(-126.0) to BigDecimal(126.0) by BigDecimal(0.5) map (_.toDouble)
    def expected(x: Double) = math.pow(x / 4.733, 2)
    val decoded = xs.map(expected)
    val fromSpark = xs.toDF("x").select(rotDecode($"x").as("d")).collect().map(_.getDouble(0))
    xs.indices.foreach { i =>
      assert(math.abs(fromSpark(i) - decoded(i)) < 1e-9)
      assert(fromSpark(i) >= 0.0)
    }
    // even + monotone via mirrored pairs
    val m = xs.zip(fromSpark).toMap
    m.keys.filter(_ >= 0).foreach { x => assert(m(x) == m(-x)) }
  }

  test("property: bbox filter output is a subset with in-range coords") {
    val df = Tbl.events(spark, "/root/testdata/sf0.001")
      .withColumn("lon", lonOf($"user_id", $"event_id"))
      .withColumn("lat", latOf($"user_id", $"event_id"))
    val inBox = df.where($"lat" > 7 && $"lat" < 23 && $"lon" > 105 && $"lon" < 123)
    assert(inBox.count() <= df.count())
    val bad = inBox.where($"lat" <= 7 || $"lat" >= 23 || $"lon" <= 105 || $"lon" >= 123)
    assert(bad.count() == 0)
  }
}
