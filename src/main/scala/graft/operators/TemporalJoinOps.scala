package graft.operators

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference's trajectory pipeline implies but never
  * ships (per-vessel "previous position" features, `README.md:48`), built
  * the way they must be built at 100 TB:
  *
  *  - **As-of join** (latest left row at-or-before each right row, per
  *    key): NOT a range join — the union+ordered-window formulation does
  *    ONE shuffle on the key, one sort, one linear pass. A naive
  *    inequality join is O(n·m) per key and unbounded; this is O(n+m).
  *  - **Range join** (count left rows in a trailing interval of each
  *    right row): time-bucketized to the interval width, so each probe
  *    row joins exactly 2 buckets — the blow-up is a fixed 2×, never
  *    quadratic, and the join stays a hash equi-join on (key, bucket)
  *    that AQE can plan like any other.
  *
  * Both run inside `events` (purchase←click, error←click) so the oracle
  * shares one table; ties are broken on event_id for hash-stable output.
  */
object TemporalJoinOps extends QueryModule {

  /** For each purchase, the latest click at-or-before it per user.
    * Union both sides tagged (clicks sort before purchases at equal ts),
    * then `last(click_struct, ignoreNulls)` over an ordered running
    * window carries the most recent click forward — left-as-of via one
    * struct so all carried fields come from the same click row. */
  private def asofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("t_us"),
              when($"event_type" === "purchase", 1).otherwise(0).as("tag"),
              $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"t_us", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickStruct = when($"tag" === 0,
      struct($"t_us".as("c_t_us"), $"event_id".as("c_event_id")))
    ev.withColumn("lc", last(clickStruct, ignoreNulls = true).over(w))
      .where($"tag" === 1)
      .select($"user_id", $"event_id", $"t_us",
              $"lc.c_event_id".as("click_event_id"),
              ($"t_us" - $"lc.c_t_us").as("lag_us"))
      .orderBy($"user_id", $"event_id")
  }

  private val asofJoinSql =
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS t_us,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
      |         event_id
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |m AS (
      |  SELECT *,
      |    last_value(CASE WHEN tag = 0 THEN t_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_t_us,
      |    last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_event_id
      |  FROM u)
      |SELECT user_id, event_id, t_us, c_event_id AS click_event_id,
      |       t_us - c_t_us AS lag_us
      |FROM m WHERE tag = 1 ORDER BY user_id, event_id""".stripMargin

  /** J12 — NEAREST-match as-of (j5 is backward-only): for each
    * purchase, the click minimizing |Δt| per user, looking BOTH
    * directions. Same union+ordered-window shape as j5, run twice over
    * ONE sort: a running `last(click)` carries the latest click
    * backward-looking, a `first(click)` over the FOLLOWING frame
    * carries the next click forward-looking — both windows share
    * partitioning and ordering, so Spark plans them in a single
    * WindowExec (one shuffle, one sort, one linear pass; O(n+m) where
    * the naive |Δt| join is O(n·m) per key). Ties (equal |Δt|) take
    * the backward click, equal-ts clicks sort before the purchase and
    * so count as backward with Δ=0 — both conventions stated in the
    * CASE, which the oracle repeats verbatim. LEFT semantics: a
    * purchase with no click on either side keeps NULLs (counted into
    * the hash). */
  private def asofNearest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("t_us"),
              when($"event_type" === "purchase", 1).otherwise(0).as("tag"),
              $"event_id")
    val order = Seq($"t_us", $"tag", $"event_id")
    val wBack = Window.partitionBy($"user_id").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy($"user_id").orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val clickStruct = when($"tag" === 0,
      struct($"t_us".as("c_t_us"), $"event_id".as("c_event_id")))
    ev.withColumn("bk", last(clickStruct, ignoreNulls = true).over(wBack))
      .withColumn("fw", first(clickStruct, ignoreNulls = true).over(wFwd))
      .where($"tag" === 1)
      .withColumn("bd", $"t_us" - $"bk.c_t_us")
      .withColumn("fd", $"fw.c_t_us" - $"t_us")
      .select($"user_id", $"event_id", $"t_us",
        when($"bk".isNotNull && ($"fw".isNull || $"bd" <= $"fd"),
             $"bk.c_event_id").otherwise($"fw.c_event_id")
          .as("near_event_id"),
        when($"bk".isNotNull && ($"fw".isNull || $"bd" <= $"fd"),
             -$"bd").otherwise($"fd").as("near_delta_us"))
      .orderBy($"user_id", $"event_id")
  }

  private val asofNearestSql =
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS t_us,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
      |         event_id
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |m AS (
      |  SELECT *,
      |    last_value(CASE WHEN tag = 0 THEN t_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_t,
      |    last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_id,
      |    first_value(CASE WHEN tag = 0 THEN t_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, tag, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_t,
      |    first_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, tag, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_id
      |  FROM u)
      |SELECT user_id, event_id, t_us,
      |  CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR t_us - b_t <= f_t - t_us)
      |       THEN b_id ELSE f_id END AS near_event_id,
      |  CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR t_us - b_t <= f_t - t_us)
      |       THEN -(t_us - b_t) ELSE f_t - t_us END AS near_delta_us
      |FROM m WHERE tag = 1 ORDER BY user_id, event_id""".stripMargin

  private val WinUs = 300000000L // 5 minutes

  /** For each error, how many clicks in the trailing 5 minutes per user.
    * Clicks land in one ⌊t/w⌋ bucket; each error probes its own bucket
    * and the previous one (the trailing interval spans at most 2), then
    * the exact (e−w, e] predicate filters inside the hash join. */
  private def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("c_us"))
      .withColumn("bucket", expr(s"c_us div $WinUs"))
    val errBase = ev.where($"event_type" === "error")
      .select($"user_id", $"event_id", unix_micros($"ts").as("e_us"))
    val counts = errBase
      .withColumn("bucket",
        explode(array(expr(s"(e_us div $WinUs) - 1"), expr(s"e_us div $WinUs"))))
      .join(clicks, Seq("user_id", "bucket"))
      .where($"c_us" > $"e_us" - lit(WinUs) && $"c_us" <= $"e_us")
      .groupBy($"event_id").agg(count(lit(1)).as("n_clicks"))
    errBase.join(counts, Seq("event_id"), "left")
      .select($"user_id", $"event_id", $"e_us",
              coalesce($"n_clicks", lit(0L)).as("n_clicks"))
      .orderBy($"event_id")
  }

  private val rangeJoinSql =
    s"""SELECT e.user_id, e.event_id, epoch_us(e.ts) AS e_us,
       |       count(c.ts) AS n_clicks
       |FROM events e LEFT JOIN events c
       |  ON c.user_id = e.user_id AND c.event_type = 'click'
       | AND epoch_us(c.ts) > epoch_us(e.ts) - $WinUs
       | AND epoch_us(c.ts) <= epoch_us(e.ts)
       |WHERE e.event_type = 'error'
       |GROUP BY 1, 2, 3 ORDER BY e.event_id""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j5_asof_join"  -> (asofJoin _),
    "j12_asof_nearest" -> (asofNearest _),
    "j6_range_join" -> (rangeJoin _))

  override val oracles: Map[String, String] = Map(
    "j5_asof_join"  -> asofJoinSql,
    "j12_asof_nearest" -> asofNearestSql,
    "j6_range_join" -> rangeJoinSql)
}
