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

  // ---------------------------------------------------------------- J10

  /** Geofence-join cell edge (centi-degrees). Deliberately NOT aligned
    * with the fence grid (fences sit on a 700-step lattice), so fences
    * straddle cell borders and the fence side genuinely expands over
    * its covered cells — the general shape, not a one-cell special
    * case. */
  private[graft] val FenceCellEdge = 512L
  private[graft] val FenceCount = 16

  /** J10 fence relation — the fences are DATA, not compile-time
    * constants (the realistic geofencing shape: port boundaries,
    * exclusion zones — a relation that changes without a redeploy).
    * 16 concave-free diamonds on a 700-step lattice, radius varying by
    * fence, vertices carried as an `array<struct<x,y>>` column. */
  private[graft] def fenceRelation(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(FenceCount.toLong).toDF("fence_id")
      .select($"fence_id",
              (($"fence_id" % 4) * 700 + 400).as("cx"),
              (expr("fence_id div 4") * 700 + 400).as("cy"),
              (($"fence_id" % 3) * 25 + 150).as("r"))
      .select($"fence_id",
              array(struct(($"cx" - $"r").as("x"), $"cy".as("y")),
                    struct($"cx".as("x"), ($"cy" + $"r").as("y")),
                    struct(($"cx" + $"r").as("x"), $"cy".as("y")),
                    struct($"cx".as("x"), ($"cy" - $"r").as("y"))).as("verts"),
              ($"cx" - $"r").as("xmin"), ($"cx" + $"r").as("xmax"),
              ($"cy" - $"r").as("ymin"), ($"cy" + $"r").as("ymax"))
  }

  /** Even-odd ray-cast parity where the polygon arrives as DATA — a
    * fold over an `array<struct<x,y>>` vertex column. The
    * constant-polygon twin (`GeoFunctions.pointInPolygon`) unrolls at
    * plan time instead; this one cannot, because the vertices are join
    * output. Same division-free int64 crossing test, so the DuckDB
    * oracle (column refs instead of literals) is op-for-op identical. */
  private[graft] def hofParity(px: Column, py: Column, verts: Column,
                               n: Int): Column = {
    val crossings = aggregate(sequence(lit(1), lit(n)), lit(0L), (acc, i) => {
      val v1 = element_at(verts, i)
      val v2 = element_at(verts, i % n + 1)
      val (x1, y1) = (v1.getField("x"), v1.getField("y"))
      val (x2, y2) = (v2.getField("x"), v2.getField("y"))
      val straddles = (y1 > py) =!= (y2 > py)
      val cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
      acc + when(straddles && ((cross > 0) === (y2 > y1)), 1L).otherwise(0L)
    })
    crossings % 2
  }

  /** J10 — point-in-MANY-polygons join: every position classified
    * against the fence RELATION. Cell-blocked like J7: the fence side
    * explodes over the cells its bbox covers (bounded by
    * (2r/cell+2)², never data-dependent on the points), the point side
    * hashes its ONE cell, and the join is a broadcast hash EQUI-join
    * on (jx, jy) — each (point, fence) pair meets exactly once because
    * a point has one cell and a fence covers each cell once, so no
    * dedup tier exists. bbox refine prunes corner cells, then the HOF
    * parity does the exact geometry. At 100 TB: fences (thousands of
    * rows after cell expansion) broadcast; the 10¹²-row point side
    * never shuffles — the only exchange is the 16-row final agg. */
  /** Core classification join, shared by the batch query and the unit
    * spec (which plants known points). `pts` must carry
    * (event_id, px, py); output is one row per (point, containing
    * fence). */
  private[graft] def fenceHits(pts: DataFrame): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val cells = pts
      .withColumn("jx", expr(s"px div $FenceCellEdge"))
      .withColumn("jy", expr(s"py div $FenceCellEdge"))
    val fcells = fenceRelation(s)
      .withColumn("jx", explode(sequence(expr(s"xmin div $FenceCellEdge"),
                                         expr(s"xmax div $FenceCellEdge"))))
      .withColumn("jy", explode(sequence(expr(s"ymin div $FenceCellEdge"),
                                         expr(s"ymax div $FenceCellEdge"))))
    cells.join(broadcast(fcells), Seq("jx", "jy"))
      .where($"px".between($"xmin", $"xmax") &&
             $"py".between($"ymin", $"ymax"))
      .where(hofParity($"px", $"py", $"verts", 4) === 1)
  }

  private def geofenceJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    fenceHits(Tbl.events(s, d).select(
        $"event_id",
        (($"user_id" % 30) * 100 + ($"event_id" % 100)).as("px"),
        (($"event_id" % 30) * 100 + ($"user_id" % 100)).as("py")))
      .groupBy($"fence_id")
      .agg(count(lit(1)).as("n_inside"),
           sum($"event_id" % 97).as("ck"),
           min($"event_id").as("first_ev"),
           max($"event_id").as("last_ev"))
      .orderBy($"fence_id")
  }

  /** SQL twin: the fence table (WITH its cell expansion) is generated
    * from the SAME Scala constants, one VALUES row per (fence, cell);
    * the parity predicate is the same four crossing terms with column
    * refs in place of the Spark side's struct fields. */
  private val geofenceJoinSql = {
    val rows = (0 until FenceCount).flatMap { f =>
      val cx = (f % 4) * 700 + 400
      val cy = (f / 4) * 700 + 400
      val r = (f % 3) * 25 + 150
      val (xmin, xmax, ymin, ymax) = (cx - r, cx + r, cy - r, cy + r)
      val vs = Seq((cx - r, cy), (cx, cy + r), (cx + r, cy), (cx, cy - r))
        .map { case (x, y) => s"$x, $y" }.mkString(", ")
      for (jx <- (xmin / FenceCellEdge) to (xmax / FenceCellEdge);
           jy <- (ymin / FenceCellEdge) to (ymax / FenceCellEdge))
        yield s"($f, $vs, $xmin, $xmax, $ymin, $ymax, $jx, $jy)"
    }
    val parity = Seq(("x1", "y1", "x2", "y2"), ("x2", "y2", "x3", "y3"),
                     ("x3", "y3", "x4", "y4"), ("x4", "y4", "x1", "y1"))
      .map { case (x1, y1, x2, y2) =>
        s"(CASE WHEN (($y1 > py) != ($y2 > py)) AND " +
          s"(((($x2 - $x1) * (py - $y1) - (px - $x1) * ($y2 - $y1)) > 0) = " +
          s"(($y2 - $y1) > 0)) THEN 1 ELSE 0 END)"
      }.mkString("(", " + ", ") % 2")
    s"""WITH p AS (
       |  SELECT event_id,
       |         (user_id % 30) * 100 + (event_id % 100) AS px,
       |         (event_id % 30) * 100 + (user_id % 100) AS py
       |  FROM events),
       |f(fence_id, x1, y1, x2, y2, x3, y3, x4, y4,
       |  xmin, xmax, ymin, ymax, jx, jy) AS (VALUES
       |  ${rows.mkString(",\n  ")})
       |SELECT CAST(fence_id AS BIGINT) AS fence_id,
       |  CAST(count(*) AS BIGINT) AS n_inside,
       |  CAST(sum(event_id % 97) AS BIGINT) AS ck,
       |  min(event_id) AS first_ev, max(event_id) AS last_ev
       |FROM p JOIN f
       |  ON px // $FenceCellEdge = jx AND py // $FenceCellEdge = jy
       | AND px BETWEEN xmin AND xmax AND py BETWEEN ymin AND ymax
       | AND $parity = 1
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j7_spatial_join" -> (spatialJoin _),
    "j10_geofence_join" -> (geofenceJoin _))

  override def oracles: Map[String, String] = Map(
    "j7_spatial_join" -> spatialJoinSql,
    "j10_geofence_join" -> geofenceJoinSql)
}
