package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesy / kinematics column functions — the reference's scalar surface
  * (SURVEY.md §2.4) rebuilt as pure Catalyst column expressions: no UDFs,
  * so whole-stage codegen stays intact (the reference pays two JVM↔Python
  * round trips per row here, `preprocess.py:51,58`).
  *
  * Determinism: everything below is IEEE +,-,*,/ plus libm sin/cos/sqrt —
  * bit-identical between the JVM and the DuckDB oracle on this platform —
  * and every query output applies a final coarse `round`.
  */
object GeoFunctions {


  /** deg→rad / rad→deg via explicit `x*π/180` — JVM `toRadians` is
    * `x/180*π`, which can differ in the last bit from DuckDB's
    * `x*pi()/180`; spelling it out keeps both engines bit-identical. */
  private[graft] def rad(c: Column): Column = c * math.Pi / 180.0
  private[graft] def deg(c: Column): Column = c * 180.0 / math.Pi

  /** WGS84 ellipsoid, exactly as the reference declares it
    * (`_util.py:65`: a=6378137, 1/f=298.257223563, fixed height 124 m). */
  val WGS84_A = 6378137.0
  val WGS84_INV_F = 298.257223563
  val FIXED_HEIGHT_M = 124.0

  /** Synthetic-but-deterministic lon/lat grid over the events table: the
    * batch stand-in for the AIS position stream (FIXTURES.md §B). Exact
    * hundredth-degree arithmetic, identical in oracle SQL. */
  def lonOf(userId: Column, eventId: Column): Column =
    lit(100.0) + (userId % 30).cast("double") + (eventId % 100).cast("double") / 100.0
  def latOf(userId: Column, eventId: Column): Column =
    (eventId % 30).cast("double") + (userId % 100).cast("double") / 100.0

  /** F1 — WKT `POINT (lon lat)` → array<double> via built-ins only;
    * mirrors the reference's strip-letters-and-parens regex
    * (`preprocess.py:46-48`, including its any-letter tolerance). */
  def wktToCoords(wkt: Column): Column =
    transform(split(trim(regexp_replace(wkt, "[a-zA-Z()]", "")), " "),
              x => x.cast("double"))

  /** F2 — geodetic (lon,lat,h=124m) → geocentric ECEF (x,y); z computed
    * then dropped exactly like the reference (`_util.py:58-79`). */
  def ecefX(lon: Column, lat: Column): Column = {
    val f = lit(1.0) / WGS84_INV_F
    val e2 = f * (lit(2.0) - f)
    val latR = rad(lat); val lonR = rad(lon)
    val n = lit(WGS84_A) / sqrt(lit(1.0) - e2 * sin(latR) * sin(latR))
    (n + FIXED_HEIGHT_M) * cos(latR) * cos(lonR)
  }
  def ecefY(lon: Column, lat: Column): Column = {
    val f = lit(1.0) / WGS84_INV_F
    val e2 = f * (lit(2.0) - f)
    val latR = rad(lat); val lonR = rad(lon)
    val n = lit(WGS84_A) / sqrt(lit(1.0) - e2 * sin(latR) * sin(latR))
    (n + FIXED_HEIGHT_M) * cos(latR) * sin(lonR)
  }

  /** F3 — AIS rate-of-turn decode: (rot_ais / 4.733)², via multiplication
    * (exact-op twin of the oracle) — `README.md:78`. */
  def rotDecode(rotAis: Column): Column = {
    val y = rotAis / 4.733
    y * y
  }

  /** F5 — haversine great-circle distance in km (declared intent,
    * `preprocess.py:6`); R = 6371.0 km. */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = rad(lat2 - lat1) / 2.0
    val dLon = rad(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(rad(lat1)) * cos(rad(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** F6 — path angle through consecutive positions (`README.md:48`). */
  def pathAngleDeg(dLon: Column, dLat: Column): Column =
    deg(atan2(dLat, dLon))

  /** F4 — inverse-affine raster transform lon/lat → pixel (col,row) for a
    * north-up grid anchored at (lon0, latMax), cell size `deg` degrees
    * (`_util.py:8-56`, corner-constant bugs not reproduced — SURVEY §7.4.5). */
  def pixelCol(lon: Column, lon0: Double, deg: Double): Column =
    floor((lon - lon0) / deg).cast("long")
  def pixelRow(lat: Column, latMax: Double, deg: Double): Column =
    floor((lit(latMax) - lat) / deg).cast("long")

  /** F9 — point-in-polygon by even-odd ray casting over INTEGER
    * coordinates (centi-degrees), multiply-only crossing test so the
    * arithmetic is exact int64 and therefore engine-agnostic: a
    * horizontal +x ray from (px,py) crosses edge (x1,y1)→(x2,y2) iff
    * the edge straddles py ((y1>py) != (y2>py)) and the signed area
    * (x2−x1)(py−y1) − (px−x1)(y2−y1) carries the sign of (y2−y1) —
    * the division-free form of `px < x1 + (x2−x1)(py−y1)/(y2−y1)`.
    * The polygon is a compile-time constant, so the per-edge
    * indicators unroll into ONE codegen'd integer expression: map-only,
    * no join against a vertex relation, no HOF, no UDF. Geofencing is
    * the natural next step past W1's axis-aligned bbox — the reference
    * stops at the bbox (`preprocess.py:52-55`); this is the same
    * predicate family generalized to arbitrary simple polygons.
    * Horizontal edges (y1 == y2) never straddle — they are dropped at
    * construction time (their term is constant 0, and Spark would warn
    * about the trivially-constant straddle comparison).
    * Boundary points get a deterministic (side-dependent) parity —
    * identical in both engines because every op is exact. */
  def pointInPolygon(px: Column, py: Column, poly: Seq[(Int, Int)]): Column = {
    val crossings = poly.indices.flatMap { i =>
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % poly.size)
      if (y1 == y2) None else Some {
        val straddles = (lit(y1.toLong) > py) =!= (lit(y2.toLong) > py)
        val cross = lit((x2 - x1).toLong) * (py - y1.toLong) -
          (px - x1.toLong) * lit((y2 - y1).toLong)
        when(straddles && ((cross > 0) === lit(y2 > y1)), 1L).otherwise(0L)
      }
    }.reduce(_ + _)
    crossings % 2
  }

  /** T7 — dead-reckoning straight-line projection (`README.md:46`):
    * advance a position by speed (knots) on course (deg) for dt seconds.
    * 1 knot = 1852 m/h; meters-per-degree approximations in exact ops. */
  def deadReckonLon(lon: Column, lat: Column, sogKn: Column, cogDeg: Column,
                    dtS: Column): Column = {
    val distM = sogKn * 1852.0 / 3600.0 * dtS
    lon + distM * sin(rad(cogDeg)) / (lit(111320.0) * cos(rad(lat)))
  }
  def deadReckonLat(lat: Column, sogKn: Column, cogDeg: Column, dtS: Column): Column = {
    val distM = sogKn * 1852.0 / 3600.0 * dtS
    lat + distM * cos(rad(cogDeg)) / 111320.0
  }
}
