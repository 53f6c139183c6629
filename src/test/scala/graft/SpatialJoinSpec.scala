package graft

import graft.operators.SpatialJoinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked spatial neighbor join (`j7_spatial_join`): the blocking
  * must be invisible — same pairs as an all-pairs scan, including pairs
  * straddling a cell border, excluding the radius boundary itself. */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private val R = SpatialJoinOps.RadiusMilli // 2000

  private def pts(rows: (Long, Long, Long, Long, Long)*): DataFrame =
    rows.toDF("event_id", "user_id", "lon_m", "lat_m", "tb")

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    SpatialJoinOps.neighborPairs(df)
      .select("event_a", "event_b", "d2").as[(Long, Long, Long)]
      .collect().toSet

  test("cross-cell border pair is found; boundary distance is excluded") {
    val found = pairs(pts(
      (1L, 10L, 1999L, 500L, 0L),   // cell (0,0), 2 milli from the border
      (2L, 11L, 2001L, 500L, 0L),   // cell (1,0) — adjacent, distance 2
      (3L, 12L, 1999L, 500L + R, 0L), // exactly R above #1: d2 == R², OUT
      (4L, 13L, 9000L, 9000L, 0L))) // far away
    assert(found === Set((1L, 2L, 4L)))
  }

  test("co-located points pair with d2 = 0; bucket mismatch blocks pairing") {
    val found = pairs(pts(
      (1L, 10L, 5000L, 5000L, 3L),
      (2L, 11L, 5000L, 5000L, 3L),   // identical position, same bucket
      (3L, 12L, 5000L, 5000L, 4L)))  // identical position, NEXT bucket
    assert(found === Set((1L, 2L, 0L)))
  }

  test("randomized: blocked join equals the all-pairs scan, exactly once") {
    // fixed-seed generator (Date.now/Math.random are fine in tests but a
    // fixed seed keeps failures reproducible)
    val rnd = new scala.util.Random(20260813L)
    val rows = (1L to 300L).map { i =>
      (i, 100 + rnd.nextInt(40).toLong,
       rnd.nextLong(30000L), rnd.nextLong(30000L), rnd.nextInt(3).toLong)
    }
    val df = pts(rows: _*)
    val blocked = pairs(df)
    val a = df.select($"event_id".as("ea"), $"lon_m".as("xa"),
                      $"lat_m".as("ya"), $"tb".as("ta"))
    val b = df.select($"event_id".as("eb"), $"lon_m".as("xb"),
                      $"lat_m".as("yb"), $"tb".as("tbb"))
    val brute = a.crossJoin(b)
      .where($"ea" < $"eb" && $"ta" === $"tbb")
      .withColumn("d2", ($"xa" - $"xb") * ($"xa" - $"xb") +
                        ($"ya" - $"yb") * ($"ya" - $"yb"))
      .where($"d2" < R * R)
      .select("ea", "eb", "d2").as[(Long, Long, Long)].collect()
    assert(brute.length === brute.toSet.size) // sanity: brute is unique
    assert(blocked === brute.toSet)
  }

  test("geofence join: planted points, incl. a hit across the cell border") {
    // fence 0: diamond center (400,400) r=150, bbox [250,550]² — it
    // straddles the 512 cell border, so (520,400) (L1 dist 120, inside)
    // lands in cell 1 while the fence center sits in cell 0
    val planted = Seq(
      (1L, 400L, 400L),  // fence 0 center
      (2L, 520L, 400L),  // fence 0, point's cell != center's cell
      (3L, 400L, 551L),  // 1 past fence 0's bbox — out
      (4L, 400L, 549L),  // inside bbox, outside diamond (L1 149? no: 149<150 — in)
      (5L, 751L, 400L),  // between fences 0 and 1 — out
      (6L, 1100L, 500L), // fence 1 (r=175): L1 dist 100 — in
      (7L, 2999L, 2999L) // outside every bbox
    ).toDF("event_id", "px", "py")
    val hits = SpatialJoinOps.fenceHits(planted)
      .select($"event_id", $"fence_id").as[(Long, Long)].collect().toSet
    assert(hits === Set((1L, 0L), (2L, 0L), (4L, 0L), (6L, 1L)))
  }

  test("geofence parity: data-driven fold agrees with the constant unroll") {
    // the HOF fold (vertices as data) and GeoFunctions.pointInPolygon
    // (vertices unrolled at plan time) implement the same crossing
    // test — differential-check them over a dense grid on the crown
    val poly = graft.operators.AisOps.CrownPoly
    val verts = array(poly.map { case (x, y) =>
      struct(lit(x.toLong).as("x"), lit(y.toLong).as("y")) }: _*)
    val grid = (for (px <- 0L to 3000L by 77L; py <- 0L to 3000L by 77L)
      yield (px, py)).toDF("px", "py")
    val both = grid.select(
      SpatialJoinOps.hofParity($"px", $"py", verts, poly.size).as("hof"),
      graft.functions.GeoFunctions.pointInPolygon($"px", $"py", poly).as("unrolled"))
    assert(both.where($"hof" =!= $"unrolled").count() === 0L)
  }
}
