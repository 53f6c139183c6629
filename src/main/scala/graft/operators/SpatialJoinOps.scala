package graft.operators

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid-blocked spatial neighbor join — the encounter-detection operator
  * the reference's vessel-tracking domain implies (pairs of position
  * reports within a radius of each other at the same time; the README's
  * collision/proximity intent around `predict_path.py`), built the only
  * way it survives 100 TB:
  *
  *  - **Cell blocking.** Each point lands in a square grid cell whose
  *    edge equals the search radius, so any pair within the radius sits
  *    in the same or an adjacent cell. The probe side of the self-join
  *    expands to its 3×3 cell neighborhood — a FIXED 9×, never
  *    data-dependent — the build side stays put, and the join is a plain
  *    hash equi-join on (cell_x, cell_y, time bucket). No cross product
  *    anywhere (PlanSpec pin); shuffle keys are three small ints; skew
  *    is bounded by physical cell density, and the salted-join rewrite
  *    (`x_salted_join` / `x_auto_salt_join`) composes if a cell is hot.
  *  - **Exactly-once pairs.** The build side's own cell is unique and
  *    only the probe with the smaller event_id emits, so each
  *    qualifying pair appears exactly once — no post-hoc distinct.
  *  - **Integer-exact refine.** The within-radius predicate is squared
  *    planar distance in milli-degree integers, so the DuckDB oracle
  *    matches bit-for-bit. A geodetic deployment swaps the refine for
  *    the haversine expression (F5, `GeoFunctions`) without touching
  *    the blocking shape — the blocking bound stays conservative for
  *    any metric dominated by the planar one on the cell size.
  */
object SpatialJoinOps extends QueryModule {

  /** Search radius == grid-cell edge, milli-degrees. Equality is what
    * makes the 3×3 neighborhood sufficient: |Δx|,|Δy| < R ⇒ adjacent. */
  private[graft] val RadiusMilli = 2000L
  /** Co-presence bucket: "at the same time" = same 6 h bucket. */
  private[graft] val BucketUs = 21600L * 1000000L

  /** Deterministic synthetic positions on the 30×30-degree test grid
    * (same derivation idiom as `AisOps`' WKT fixtures): the vessel
    * (user) fixes the coarse position, the report (event) spreads it
    * fractionally. Integer arithmetic end to end — both engines compute
    * the identical value. */
  private def points(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.events(s, d).select(
      $"event_id", $"user_id",
      (($"user_id" % 30) * 1000 + ($"event_id" * 13) % 1000).as("lon_m"),
      (($"event_id" % 30) * 1000 + ($"event_id" * 7) % 1000).as("lat_m"),
      expr(s"unix_micros(ts) div $BucketUs").as("tb"))
  }

  /** The 3×3 neighborhood as a literal array of (dx, dy) structs —
    * constant-folded, so the probe-side explode is a fixed 9-way
    * row multiplication of three int key columns. */
  private def neighborhood: Column =
    array((for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)

  /** Core pair join, shared by the batch query and the unit spec (which
    * feeds planted points through the same shape). `pts` must carry
    * (event_id, user_id, lon_m, lat_m, tb). */
  private[graft] def neighborPairs(pts: DataFrame): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val R = RadiusMilli
    val cells = pts
      .withColumn("cx", expr(s"lon_m div $R"))
      .withColumn("cy", expr(s"lat_m div $R"))
    val probes = cells.select(
        $"event_id".as("event_a"), $"user_id".as("vessel_a"),
        $"lon_m".as("lon_a"), $"lat_m".as("lat_a"), $"tb",
        explode(neighborhood).as("nb"),
        $"cx", $"cy")
      .select($"event_a", $"vessel_a", $"lon_a", $"lat_a", $"tb",
              ($"cx" + $"nb.dx").as("jx"), ($"cy" + $"nb.dy").as("jy"))
    val builds = cells.select(
        $"event_id".as("event_b"), $"user_id".as("vessel_b"),
        $"lon_m".as("lon_b"), $"lat_m".as("lat_b"), $"tb",
        $"cx".as("jx"), $"cy".as("jy"))
    probes.join(builds, Seq("jx", "jy", "tb"))
      .where($"event_a" < $"event_b")
      .withColumn("d2",
        ($"lon_a" - $"lon_b") * ($"lon_a" - $"lon_b") +
        ($"lat_a" - $"lat_b") * ($"lat_a" - $"lat_b"))
      .where($"d2" < R * R)
      .select($"tb", $"vessel_a", $"vessel_b", $"event_a", $"event_b", $"d2")
  }

  private def spatialJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    neighborPairs(points(s, d))
      .orderBy($"tb", $"event_a", $"event_b")
  }

  private val spatialJoinSql =
    s"""WITH p AS (
       |  SELECT event_id, user_id,
       |         (user_id % 30) * 1000 + (event_id * 13) % 1000 AS lon_m,
       |         (event_id % 30) * 1000 + (event_id * 7) % 1000 AS lat_m,
       |         epoch_us(ts) // $BucketUs AS tb
       |  FROM events)
       |SELECT a.tb AS tb, a.user_id AS vessel_a, b.user_id AS vessel_b,
       |       a.event_id AS event_a, b.event_id AS event_b,
       |       (a.lon_m-b.lon_m)*(a.lon_m-b.lon_m)
       |         + (a.lat_m-b.lat_m)*(a.lat_m-b.lat_m) AS d2
       |FROM p a JOIN p b
       |  ON a.tb = b.tb AND a.event_id < b.event_id
       | AND abs(a.lon_m-b.lon_m) <= $RadiusMilli
       | AND abs(a.lat_m-b.lat_m) <= $RadiusMilli
       | AND (a.lon_m-b.lon_m)*(a.lon_m-b.lon_m)
       |       + (a.lat_m-b.lat_m)*(a.lat_m-b.lat_m) < ${RadiusMilli * RadiusMilli}
       |ORDER BY tb, event_a, event_b""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j7_spatial_join" -> (spatialJoin _))

  override def oracles: Map[String, String] = Map(
    "j7_spatial_join" -> spatialJoinSql)
}
