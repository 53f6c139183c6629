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
}
