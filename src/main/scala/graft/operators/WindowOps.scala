package graft.operators

import graft.{QueryModule, Tbl}
import graft.functions.GeoFunctions.{ecefX, ecefY, latOf, lonOf, rotDecode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation layer (SURVEY.md §2.6): the reference's sliding event-time
  * window agg (A1, `preprocess.py:78-88`), rolling frames (A4,
  * `README.md:98,123`), gap-fill interpolation (A5, `README.md:46`), plus
  * the extension-mandated multi-dimensional aggregates (rollup/cube) over
  * the star schema.
  *
  * Determinism: the reference's `last()` (nondeterministic over unsorted
  * groups) is rebuilt as `max_by(value, ts)` — legal because the driver
  * testdata has no (user_id, ts) ties at any SF (verified); money/metric
  * sums run on exactly-scaled longs (Tbl.cents).
  *
  * 100 TB posture: every aggregate shuffles once on its grouping key;
  * window frames are per-key (mmsi-cardinality parallelism); the sliding
  * window explodes each row into exactly width/slide = 2 windows before a
  * single hash aggregate — identical to what Spark's `window()` does
  * internally (see `TimeWindowing` rule in Catalyst).
  */
object WindowOps extends QueryModule {

  /** Derived kinematic columns over the events stand-in (lon/lat grid,
    * cog = event_id % 360, rot decoded from value): shared by the batch
    * (a1) and streaming (s1) sliding-window embodiments. Averaged
    * quantities are pre-scaled to exactly-summable values (cents /
    * integer-valued degrees / micro-rot longs) so aggregation order
    * can't perturb the oracle hash. */
  private[graft] def withKinematics(df: DataFrame): DataFrame =
    df.withColumn("lon", lonOf(col("user_id"), col("event_id")))
      .withColumn("lat", latOf(col("user_id"), col("event_id")))
      .withColumn("cog", (col("event_id") % 360).cast("double"))
      .withColumn("rot_u", round(rotDecode(col("value")) * 1000000.0).cast("long"))
      .withColumn("lx", round(ecefX(col("lon"), col("lat")), 2))
      .withColumn("ly", round(ecefY(col("lon"), col("lat")), 2))

  /** Total order for the `last()` rebuild: (event time, event_id) as one
    * composite key — deterministic even if two events of one key share a
    * timestamp (DuckDB's arg_max can't take a struct key, so a scalar
    * composite is encoded on both engines).
    *
    * The ORACLE side (Oracles.slidingWindow) encodes the composite as a
    * fixed-width zero-padded string, '%020d|%019d' of (epoch_us + 2⁶²,
    * event_id). The ENGINE side used the identical format_string until
    * round 15, when the plan audit showed the string key was what forced
    * the whole 7-agg kinematic aggregate into SortAggregate: a varlen
    * string in the max_by buffer makes the buffer non-fixed-width, which
    * disqualifies HashAggregate (UnsafeFixedWidthAggregationMap needs
    * mutable fixed-size fields), so every expanded row paid a full
    * (window, user_id) SORT — and the streaming sibling (s1) stored five
    * 40-char ordering strings per state row. The engine now encodes the
    * SAME total order as one DECIMAL(38,0): (epoch_us + 2⁶²)·10¹⁹ +
    * event_id. Order-isomorphism with the oracle's string on the data
    * domain: both fields are non-negative (the 2⁶² bias covers ±146k
    * years of timestamps; event_id ≥ 0 per TESTDATA and every generator
    * here), each fits its 19/20-digit width, so zero-padded-string
    * lexicographic order ≡ (ts, event_id) lexicographic order ≡ the
    * decimal's numeric order (event_id < 10¹⁹ can never borrow into the
    * ts digits; max value ≈ 9.2·10³⁷ < 10³⁸, no decimal overflow).
    * Decimals ARE UnsafeRow-mutable, so the aggregate plans as
    * HashAggregate again (guide §1.2 "per-task work" + §2.3 narrower
    * types: a1 SortAggregate → HashAggregate, s1 state rows shed the
    * 5 × ~40 B ordering strings for 5 × 16 B decimals). */
  private[graft] val TieBias = 4611686018427387904L // 2^62
  private[graft] val lastTieKey: Column =
    (unix_micros(col("ts")) + TieBias).cast("decimal(38,0)") *
      lit(java.math.BigDecimal.valueOf(10).pow(19)) +
      col("event_id").cast("decimal(38,0)")

  /** The reference's full 7-agg shape (`preprocess.py:80-86`): 3 moving
    * averages + 4 `last()`-rebuilt-as-max_by columns. */
  private[graft] val kinematicAggExprs: Seq[Column] = Seq(
    sum(Tbl.cents(col("value"))).as("v_c"),
    count(lit(1)).as("n"),
    sum(col("cog")).as("cog_sum"),
    sum(col("rot_u")).as("rot_u_sum"),
    max_by(col("value"), lastTieKey).as("last_value"),
    max_by(col("lon"), lastTieKey).as("last_lon"),
    max_by(col("lat"), lastTieKey).as("last_lat"),
    max_by(col("lx"), lastTieKey).as("last_x"),
    max_by(col("ly"), lastTieKey).as("last_y"))

  /** Post-agg finish: window bounds to epoch micros, scaled sums back to
    * averages — the same column names the shared oracle emits.
    *
    * The averages are integer-scaled floors ((sum·10⁶ scale) div n,
    * then one exact-integer-to-double division), NOT `round(x/n, 6)`:
    * `round` after a double division is a cross-engine hazard — Spark
    * rounds the exact decimal of the double half-up, DuckDB rounds via
    * ·10⁶ with its own FP error, and at an exact .5 boundary they split
    * (caught by the sf0.1 sweep: 2 of ~200k windows differed in the 6th
    * decimal of moving_avg_rot). Integer div is exact in both engines
    * (all summands non-negative, so truncate == floor), and dividing the
    * same integer by 10⁶ yields bit-identical doubles. */
  private[graft] def kinematicFinish(df: DataFrame): DataFrame =
    df.select(
      unix_micros(col("window.start")).as("ws_us"),
      unix_micros(col("window.end")).as("we_us"),
      col("user_id"),
      // scale multiplies in DECIMAL(38,0): long×10⁴/10⁶ would overflow
      // around 1e9-row hot windows while the oracle's HUGEINT doesn't
      (expr("CAST(v_c AS DECIMAL(38,0)) * 10000 div n").cast("double")
         / 1000000.0).as("moving_avg"),
      (expr("CAST(cog_sum AS DECIMAL(38,0)) * 1000000 div n").cast("double")
         / 1000000.0).as("moving_avg_cog"),
      (expr("rot_u_sum div n").cast("double") / 1000000.0).as("moving_avg_rot"),
      col("last_value"), col("last_lon"), col("last_lat"),
      col("last_x"), col("last_y"), col("n"))
      .orderBy(col("ws_us"), col("user_id"))

  /** A1: sliding 2-minute window, 1-minute slide, per key — the flagship
    * kinematic smoothing agg (`preprocess.py:78-88`), batch embodiment,
    * full 7-agg shape. */
  private def slidingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    kinematicFinish(
      withKinematics(Tbl.events(s, d))
        .groupBy(window($"ts", "2 minutes", "1 minute"), $"user_id")
        .agg(kinematicAggExprs.head, kinematicAggExprs.tail: _*))
  }

  /** Each event belongs to exactly width/slide = 2 windows: starts at
    * floor(t/60s)·60s and that minus 60s — Spark's `TimeWindowing`
    * expansion spelled out in ANSI SQL. */
  private val slidingWindowSql =
    graft.Oracles.slidingWindow

  /** A4: rolling 3-row average per key (row frame) — the "series of
    * rolling window aggregate functions on the kinematic features"
    * (`README.md:98`). */
  private val EwmaDepth = 16 // contributions beyond 2^-16 are sub-cent

  /** Exponential-decay smoothing (EWMA, α = 1/2) — the classic
    * kinematic smoother beside the boxcar (`a4_rolling_avg`): each
    * event's smoothed value halves every step into the past. The decayed
    * sum is Σ v_cents[t−k] div 2^k over a bounded 16-step history —
    * per-term integer floor division by a power of two, so every term
    * and the sum are exact longs on both engines (no float pow, no
    * geometric-series rounding), with the normalizing weight-sum emitted
    * beside it so the caller can finish the division at display time.
    *
    * Scale shape: one window spec, 16 lag() expressions over it — a
    * single shuffle on user_id and one in-partition pass, identical cost
    * class to the boxcar window. */
  private def ewmaDecay(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // arithmetic right shift = floor division by 2^k for either sign —
    // the same semantics as the oracle's `//` (Spark's long `/` is
    // double division and `div` truncates toward zero on negatives)
    val terms = (0 until EwmaDepth).map { k =>
      shiftright(coalesce(lag($"v_c", k).over(w), lit(0L)), k)
    }
    val weights = (0 until EwmaDepth).map { k =>
      when(lag($"v_c", k).over(w).isNotNull, lit(1000000L / (1L << k)))
        .otherwise(lit(0L))
    }
    Tbl.events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
              Tbl.cents($"value").as("v_c"), $"ts")
      .select($"user_id", $"event_id", $"ts_us",
              terms.reduce(_ + _).as("decayed_c"),
              weights.reduce(_ + _).as("weight_ppm"))
      .orderBy($"user_id", $"event_id")
  }

  private val ewmaDecaySql = {
    val w = "PARTITION BY user_id ORDER BY ts, event_id"
    val vc = "CAST(round(value*100) AS BIGINT)"
    val terms = (0 until EwmaDepth).map { k =>
      s"coalesce(lag($vc, $k) OVER ($w), 0) // ${1L << k}"
    }.mkString(" + ")
    val weights = (0 until EwmaDepth).map { k =>
      s"CASE WHEN lag($vc, $k) OVER ($w) IS NOT NULL THEN ${1000000L / (1L << k)} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |  CAST($terms AS BIGINT) AS decayed_c,
       |  CAST($weights AS BIGINT) AS weight_ppm
       |FROM events ORDER BY user_id, event_id""".stripMargin
  }

  private def rollingAvg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-2, Window.currentRow)
    // integer-scaled floor average (see kinematicFinish): no round-after-
    // double-division cross-engine boundary
    Tbl.events(s, d)
      .select($"user_id", $"event_id",
              sum(Tbl.cents($"value")).over(w).as("s_c"),
              count(lit(1)).over(w).as("wn"))
      .select($"user_id", $"event_id",
              (expr("CAST(s_c AS DECIMAL(38,0)) * 10000 div wn")
                .cast("double") / 1000000.0).as("rolling_avg"))
      .orderBy($"user_id", $"event_id")
  }

  private val rollingAvgSql =
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(round(value*100) AS BIGINT))
      |         OVER (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000
      |       // count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |       AS BIGINT) / 1000000.0 AS rolling_avg
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** A4b: event-time range frame — trailing 2 minutes of activity per key
    * (value-based frame, robust to irregular AIS cadence, `README.md:39`). */
  private def rangeWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-120000000L, Window.currentRow)
    Tbl.events(s, d)
      .select($"user_id", $"event_id",
              round(sum(Tbl.cents($"value")).over(w) / 100.0, 2).as("trail_sum"),
              count(lit(1)).over(w).as("trail_n"))
      .orderBy($"user_id", $"event_id")
  }

  private val rangeWindowSql =
    """SELECT user_id, event_id,
      |  round(sum(CAST(round(value*100) AS BIGINT))
      |          OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                RANGE BETWEEN 120000000 PRECEDING AND CURRENT ROW) / 100.0, 2)
      |    AS trail_sum,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                 RANGE BETWEEN 120000000 PRECEDING AND CURRENT ROW) AS trail_n
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** A5: gap-fill linear interpolation (`README.md:46`, Mao et al. 2016):
    * synthesize a point every 60 s inside any per-key gap > 60 s, value
    * linearly interpolated. Gaps ≥ 1 h are session breaks and are NOT
    * interpolated (unbounded gaps would synthesize 63M rows from 100k
    * events on this dataset — and arbitrarily many at 100 TB). Batch
    * twin of the streaming stateful version (graft.streaming);
    * `sequence`+`explode` keeps it fully distributed — no driver loop. */
  private def gapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t_us")
    val stepUs = 60000000L // 60 s
    Tbl.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t_us"), $"value")
      .withColumn("p_us", lag($"t_us", 1).over(w))
      .withColumn("p_v", lag($"value", 1).over(w))
      .where($"p_us".isNotNull && ($"t_us" - $"p_us") > stepUs &&
             ($"t_us" - $"p_us") < 3600000000L)
      .withColumn("gap_us", $"t_us" - $"p_us")
      .withColumn("k", explode(sequence(lit(1L), expr(s"(gap_us - 1) div $stepUs"))))
      .select($"user_id",
              ($"p_us" + $"k" * stepUs).as("syn_ts_us"),
              round($"p_v" + ($"value" - $"p_v") *
                    (($"k" * 60000000.0) / $"gap_us"), 6).as("syn_value"))
      .orderBy($"user_id", $"syn_ts_us")
  }

  private val gapFillSql =
    graft.Oracles.gapFill

  /** Extension: ROLLUP over region→nation revenue (multi-level agg in one
    * shuffle — at 100 TB this replaces 3 separate groupBy passes). */
  private def rollupRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = Tbl.cents($"l_extendedprice") * (lit(100) - Tbl.cents($"l_discount"))
    // fanOut: same single-task star-span rationale as j2_star_revenue
    Tbl.fanOut(Tbl.lineitem(s, d))
      .join(Tbl.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tbl.customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tbl.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tbl.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(sum(rev).as("rev_c4"), count(lit(1)).as("n_lines"))
      .select(coalesce($"r_name", lit("(all)")).as("region"),
              coalesce($"n_name", lit("(all)")).as("nation"),
              round($"rev_c4" / 10000.0, 4).as("revenue"),
              $"n_lines")
      .orderBy($"region", $"nation")
  }

  private val rollupRevenueSql =
    """SELECT coalesce(r_name, '(all)') AS region,
      |       coalesce(n_name, '(all)') AS nation,
      |  round(sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100-CAST(round(l_discount*100) AS BIGINT)))/10000.0, 4) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** Extension: CUBE over order status × priority. */
  private def cubeOrders(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
           sum(Tbl.cents($"o_totalprice")).as("tp_c"))
      .select(coalesce($"o_orderstatus", lit("(all)")).as("status"),
              coalesce($"o_orderpriority", lit("(all)")).as("priority"),
              $"n", round($"tp_c" / 100.0, 2).as("total_price"))
      .orderBy($"status", $"priority")
  }

  private val cubeOrdersSql =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |       coalesce(o_orderpriority, '(all)') AS priority,
      |       count(*) AS n,
      |  round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2) AS total_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Extension: per-segment analytic suite — lag/lead/first/rank in one
    * window pass (the reference imports exactly these, `preprocess.py:3`). */
  private def analyticsSuite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tbl.events(s, d)
      .select($"user_id", $"event_id",
              lag($"value", 1).over(w).as("prev_v"),
              lead($"value", 1).over(w).as("next_v"),
              first($"value").over(w).as("first_v"),
              rank().over(w).as("rnk"),
              round(($"value" - coalesce(lag($"value", 1).over(w), $"value")), 2)
                .as("delta"))
      .orderBy($"user_id", $"event_id")
  }

  private val analyticsSuiteSql =
    """SELECT user_id, event_id,
      |  lag(value) OVER w AS prev_v,
      |  lead(value) OVER w AS next_v,
      |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
      |  rank() OVER w AS rnk,
      |  round(value - coalesce(lag(value) OVER w, value), 2) AS delta
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Extension: sliding-window distinct cardinality — distinct users
    * per 2-minute window sliding 1 minute, exact + HLL sketch side by
    * side. The exact form costs a per-window distinct-aggregate (two
    * shuffle phases: dedup (window,user), then count); the sketch is
    * one partial-aggregable pass, THE form that survives 100 TB — so
    * the query emits the exact count as the oracle anchor plus the
    * sketch's within-5%-of-exact boolean, same contract as
    * x_approx_distinct. */
  private def windowDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Two-level aggregate instead of count_distinct+approx in ONE agg:
    // Spark's single-distinct rewrite groups phase 1 by (window,
    // user_id) and computes the non-distinct aggregates there — so the
    // approx_count_distinct partial, a FIXED 1639-long HLL++ register
    // buffer (~13 KB at rsd 0.01), was materialized and shuffled PER
    // (window, user) PAIR: millions of 13 KB rows through the first
    // exchange (plan audit r15: partial-agg Results list 1642 cols).
    // HLL register updates are idempotent in duplicates, so inserting
    // each (window, user) pair once yields bit-identical registers —
    // dedup first (count per pair), then aggregate per window:
    // users = one row per non-null user, n = sum of pair counts,
    // approx over the deduped pairs. Repartitioning by window FIRST
    // collapses the plan to ONE exchange: hash(window) satisfies the
    // clustered distribution of BOTH the (window, user) dedup and the
    // per-window aggregate, so the pair counts never re-shuffle, and
    // the phase-2 partial map holds each task's OWN windows' registers
    // (~windows/tasks × 13 KB), not every window seen in a
    // pair-partitioned input (guide §2.3/§2.4/§5; 2 Exchange → 1,
    // measured 8.3→2.9 s at sf0.1).
    // EXPLICIT partition count (r15 follow-up to the one-exchange
    // rewrite): a bare repartition($"window") is REPARTITION_BY_COL,
    // which AQE freely coalesces by BYTES — and this exchange is
    // byte-light (6 MB at sf0.1) but CPU-heavy above it (one 13 KB HLL
    // register set per window, ~560 MB of buffers at sf0.1), so AQE
    // collapsed the whole two-level aggregate onto 2 tasks (event-log
    // profiled: 4.2 s + 2.5 s two-task stages). REPARTITION_BY_NUM is
    // honored by AQE; defaultParallelism scales with the session/
    // cluster, not a local constant (guide §2.5 synthetic-keys note /
    // §1.2 measure-first).
    val perUser = Tbl.events(s, d)
      .select(window($"ts", "2 minutes", "1 minute").as("window"), $"user_id")
      .repartition(s.sparkContext.defaultParallelism, $"window")
      .groupBy($"window", $"user_id")
      .agg(count(lit(1)).as("c"))
    perUser
      .groupBy($"window")
      .agg(count($"user_id").as("users"),
           sum($"c").as("n"),
           approx_count_distinct($"user_id", 0.01).as("approx"))
      .select(unix_micros($"window.start").as("ws_us"),
              unix_micros($"window.end").as("we_us"),
              $"users", $"n",
              // relative band + absolute floor: Spark's HLL++ keeps no
              // sparse (exact) mode for tiny cardinalities, so a window
              // with 3 users can legitimately estimate 2 or 4 — a purely
              // relative 5% band fails there (19 of 42k windows, sf0.1)
              (abs($"approx" - $"users") <=
                 greatest($"users".cast("double") * 0.05, lit(4.0)))
                .as("approx_ok"))
      .orderBy($"ws_us")
  }

  // same expand-by-(VALUES k) sliding-window arithmetic as the shared
  // a1 oracle (each event lands in width/slide = 2 windows)
  private val windowDistinctSql =
    """SELECT (epoch_us(ts) // 60000000 - k) * 60000000 AS ws_us,
      |       (epoch_us(ts) // 60000000 - k) * 60000000 + 120000000 AS we_us,
      |       count(DISTINCT user_id) AS users,
      |       CAST(count(*) AS BIGINT) AS n,
      |       TRUE AS approx_ok
      |FROM events, (VALUES (0),(1)) offs(k)
      |GROUP BY 1, 2 ORDER BY ws_us""".stripMargin

  /** Extension: approximate distinct (HyperLogLog++) per event_type —
    * sketch-based cardinality for the 100 TB path. Sketches differ per
    * engine, so the oracled output is the exact distinct count plus a
    * boolean asserting the sketch landed within 5× its configured 1% rsd;
    * DuckDB states the exact count and literal TRUE. */
  private def approxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Same two-level shape as windowDistinct (see the note there): the
    // single-distinct rewrite was shuffling a 13 KB HLL++ register
    // buffer per (event_type, user_id) pair; dedup the pairs first,
    // then sketch once per pair — registers are bit-identical because
    // HLL inserts are duplicate-idempotent. No repartition needed:
    // only |event_type| = 5 groups, so the phase-2 partial map holds
    // at most 5 register buffers per task (measured 3.9→0.7 s sf0.1).
    val perUser = Tbl.events(s, d)
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("c"))
    perUser
      .groupBy($"event_type")
      .agg(count($"user_id").as("exact_users"),
           sum($"c").as("n"),
           approx_count_distinct($"user_id", 0.01).as("approx"))
      .select($"event_type", $"exact_users", $"n",
              (abs($"approx" - $"exact_users") <=
                 greatest($"exact_users".cast("double") * 0.05, lit(4.0)))
                .as("approx_ok"))
      .orderBy($"event_type")
  }

  private val approxDistinctSql =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS exact_users,
      |  CAST(count(*) AS BIGINT) AS n,
      |  TRUE AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-weighted average — the finance/IoT downsampling standard the
    * plain AVG silently gets wrong on irregular samples: a value that
    * HELD for an hour must weigh 3600× one that held a second. Per
    * event_type the timeline is segmented by lead() over the total
    * order (ts, event_id); each row's value is weighted by the
    * integer-millisecond duration to the NEXT row (the last row holds
    * nothing — standard left-continuous step integral). All sums are
    * exact BIGINTs (cents × ms; bounded ~1.5e15 at a year's span, far
    * under 2⁶³); the ratio surfaces as floor((num/den)·10⁶) — IEEE
    * division and multiply are correctly rounded, so identical integer
    * inputs give identical bits and floor is exact, no rounding-mode
    * coupling between engines.
    *
    * Scale shape — DAY-BLOCKED two-level integration, not one window
    * over the whole type: a `partitionBy(event_type)` total sort puts
    * the entire type's timeline in ONE task (measured 227 s at sf100p:
    * an external-sort spill of 200M rows/task with max parallelism
    * |types| = 5, leaving 27 of 32 cores idle — and at 1000 executors
    * STILL 5 tasks, the 100 TB failure mode). The integral decomposes
    * exactly by day: every consecutive event pair is either WITHIN one
    * integer-µs day bucket (a (type, day)-partitioned window — bounded
    * rows/partition at any corpus size, tens-of-thousands-way
    * parallelism) or spans the boundary between a day and the next
    * non-empty day (per-day first/last rows — a |days|-sized relation
    * — stitched by one tiny per-type window). Both the within-day
    * segment products AND the boundary info fold in the SAME
    * (type, day) aggregate, so the corpus shuffles exactly once. Each
    * pair lands in exactly one of the two sums with the same
    * per-segment `div 1000`, so the result is bit-identical to the
    * single-window form (the oracle still computes THAT form).
    * Measured: sf100p 227 s → 108.8 s on local[32] (shuffle-bound —
    * one 100M-row exchange either way — with the spill gone and
    * parallelism now corpus-independent); sf10p warm 6.3 → 2.3 s. */
  private def timeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .select($"event_type", unix_micros($"ts").as("t_us"), $"event_id",
              Tbl.cents($"value").as("v_c"))
      .withColumn("day", expr("t_us div 86400000000"))
    // ONE windowed pass over the events: within-day segment products
    // AND the day's first/last boundary info fold into the same
    // (type, day) aggregate, so the corpus is shuffled exactly once
    val wd = Window.partitionBy($"event_type", $"day")
      .orderBy($"t_us", $"event_id")
    val perDay = ev
      .withColumn("lead_t", lead($"t_us", 1).over(wd))
      .withColumn("dt_ms", expr("(lead_t - t_us) div 1000"))
      .groupBy($"event_type", $"day")
      .agg(count($"dt_ms").as("n1"),
           // coalesce: a single-event day has no within-day segments
           // (sum over empty = NULL would poison the stitched totals)
           coalesce(sum($"dt_ms"), lit(0L)).as("d1"),
           coalesce(sum($"v_c" * $"dt_ms"), lit(0L)).as("m1"),
           min(struct($"t_us", $"event_id")).getField("t_us").as("first_t"),
           max(struct($"t_us", $"event_id")).getField("t_us").as("last_t"),
           expr("max_by(v_c, struct(t_us, event_id))").as("last_v"))
    // boundary segments — last event of a day to the first event of
    // the NEXT non-empty day — over the |days|-sized relation only
    val wb = Window.partitionBy($"event_type").orderBy($"day")
    val stitched = perDay
      .withColumn("next_first_t", lead($"first_t", 1).over(wb))
      .withColumn("bd_ms", expr("(next_first_t - last_t) div 1000"))
      .groupBy($"event_type")
      .agg((sum($"n1") + count($"bd_ms")).as("n_seg"),
           (sum($"d1") + coalesce(sum($"bd_ms"), lit(0L))).as("den_ms"),
           (sum($"m1") + coalesce(sum($"last_v" * $"bd_ms"), lit(0L)))
             .as("num"))
    stitched
      // a type with ZERO segments (exactly one event) must surface as
      // NULL den/num, matching the oracle's empty-sum semantics — the
      // per-day coalesces above exist only so single-event DAYS don't
      // poison a multi-day type's totals, not to invent a 0 total
      .select($"event_type", $"n_seg",
              when($"n_seg" > 0, $"den_ms").as("den_ms"),
              when($"n_seg" > 0, $"num").as("num"))
      .select($"event_type", $"n_seg", $"den_ms", $"num",
              floor(($"num" / $"den_ms") * 1000000.0)
                .cast("long").as("twa_e6"))
      .orderBy($"event_type")
  }

  private val timeWeightedAvgSql =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS t_us, event_id,
      |         CAST(round(value*100) AS BIGINT) AS v_c
      |  FROM events),
      |seg AS (
      |  SELECT event_type, v_c,
      |         (lead(t_us) OVER (PARTITION BY event_type
      |                           ORDER BY t_us, event_id) - t_us) // 1000
      |           AS dt_ms
      |  FROM e)
      |SELECT event_type, count(dt_ms) AS n_seg,
      |  CAST(sum(dt_ms) AS BIGINT) AS den_ms,
      |  CAST(sum(v_c * dt_ms) AS BIGINT) AS num,
      |  CAST(floor((CAST(sum(v_c * dt_ms) AS BIGINT)
      |              / CAST(sum(dt_ms) AS BIGINT)) * 1000000.0) AS BIGINT)
      |    AS twa_e6
      |FROM seg GROUP BY event_type ORDER BY event_type""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_time_weighted_avg" -> (timeWeightedAvg _),
    "a1_sliding_window"  -> (slidingWindow _),
    "a7_ewma_decay"      -> (ewmaDecay _),
    "a4_rolling_avg"     -> (rollingAvg _),
    "a4_range_window"    -> (rangeWindow _),
    "a5_gap_fill"        -> (gapFill _),
    "x_rollup_revenue"   -> (rollupRevenue _),
    "x_cube_orders"      -> (cubeOrders _),
    "a6_analytics_suite" -> (analyticsSuite _),
    "x_window_distinct"  -> (windowDistinct _),
    "x_approx_distinct"  -> (approxDistinct _))

  override val oracles: Map[String, String] = Map(
    "x_time_weighted_avg" -> timeWeightedAvgSql,
    "a1_sliding_window"  -> slidingWindowSql,
    "a7_ewma_decay"      -> ewmaDecaySql,
    "a4_rolling_avg"     -> rollingAvgSql,
    "a4_range_window"    -> rangeWindowSql,
    "a5_gap_fill"        -> gapFillSql,
    "x_rollup_revenue"   -> rollupRevenueSql,
    "x_cube_orders"      -> cubeOrdersSql,
    "a6_analytics_suite" -> analyticsSuiteSql,
    "x_window_distinct"  -> windowDistinctSql,
    "x_approx_distinct"  -> approxDistinctSql)
}
