package graft.operators

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 SQL-surface batch: the built-in function families the
  * registry had not yet exercised as first-class oracled queries —
  * JSON-path extraction, the regexp_* family, data masking, bitwise
  * arithmetic/aggregates, width_bucket histograms, and the split_part/
  * translate/lpad string family — plus two SCALE-PATTERN demonstrations
  * (two-phase salted aggregation for skewed keys, broadcast min-max
  * feature scaling) whose outputs are pinned identical to their naive
  * single-phase forms.
  *
  * Oracle parity rules (Tables.scala): exact integer aggregation
  * everywhere (cents / per-mille integer scaling — no IEEE-order
  * dependence), total ordering on every output, and regex patterns kept
  * to anchored ASCII classes where java.util.regex and DuckDB's RE2
  * agree by construction.
  */
object SurfaceOps extends QueryModule {

  /** JSON path extraction — `get_json_object` (JsonPath over the raw
    * string) and `json_tuple`, the schemaless siblings of
    * p2_json_extract's from_json(schema): events.props is real JSON
    * (`{"k": NN}`), and a constructed nested envelope roundtrips
    * user_id/event_type through to_json → $.path extraction. The
    * aggregate uses ONLY values recovered from JSON text, so a wrong
    * extraction breaks the oracle. Scale shape: per-row projection +
    * one map-side-combinable aggregate — one fact scan, one 5-row
    * exchange. */
  private def jsonPath(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.events(s, d)
      .withColumn("js", to_json(struct($"user_id".as("u"),
        struct($"event_type".as("t")).as("m"))))
      .select(
        get_json_object($"js", "$.m.t").as("jt"),
        get_json_object($"js", "$.u").cast("long").as("u_ex"),
        json_tuple($"props", "k").as("k_ex"))
      .groupBy($"jt")
      .agg(count(lit(1)).as("n"),
           sum($"u_ex").as("sum_u"),
           sum($"k_ex".cast("long")).as("sum_k"))
      .orderBy($"jt")
  }

  // Net-effect oracle: the JSON envelope roundtrip must be the identity
  // on (event_type, user_id), and $.k of `{"k": NN}` is its digit run
  // (regexp, not a JSON engine — DuckDB's json extension may not be
  // loadable offline).
  private val jsonPathSql =
    """SELECT event_type AS jt, count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS sum_u,
      |  CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT))
      |    AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY jt""".stripMargin

  /** regexp_* function family over the patterned dimension strings
    * (c_name = 'Customer#NNNNNNNNN'): regexp_extract with a capture
    * group, regexp_extract_all run counting, regexp_replace run
    * collapsing, and an anchored rlike. Patterns are anchored ASCII
    * classes — the subset where java.util.regex and RE2 cannot
    * diverge. */
  private def regexpFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.customer(s, d)
      .select(
        regexp_extract($"c_name", "([0-9]+)", 1).cast("long").as("idn"),
        size(regexp_extract_all($"c_name", lit("[0-9]+"), lit(0)))
          .as("n_runs"),
        length(regexp_replace($"c_name", "[0-9]+", "#")).as("masked_len"),
        $"c_name".rlike("^Customer#[0-9]+$").as("canonical"))
      .groupBy($"n_runs", $"masked_len", $"canonical")
      .agg(count(lit(1)).as("n"), sum($"idn").as("sum_id"))
      .orderBy($"n_runs", $"masked_len", $"canonical")
  }

  private val regexpFuncsSql =
    """SELECT len(regexp_extract_all(c_name, '[0-9]+')) AS n_runs,
      |  length(regexp_replace(c_name, '[0-9]+', '#', 'g')) AS masked_len,
      |  regexp_matches(c_name, '^Customer#[0-9]+$') AS canonical,
      |  count(*) AS n,
      |  CAST(sum(CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT))
      |    AS BIGINT) AS sum_id
      |FROM customer GROUP BY 1, 2, 3 ORDER BY n_runs, masked_len, canonical""".stripMargin

  /** Data masking — `mask()` with default and custom replacement chars,
    * the PII-redaction primitive (upper→X, lower→x, digit→n, other
    * kept). Masked dimension strings collapse to a handful of shape
    * patterns, so the output is pattern-sized regardless of corpus
    * size. */
  private def masking(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.customer(s, d)
      .select(expr("mask(c_name)").as("name_shape"),
              expr("mask(c_mktsegment, '#', '*', '0', '-')").as("seg_shape"))
      .groupBy($"name_shape", $"seg_shape")
      .agg(count(lit(1)).as("n"))
      .orderBy($"name_shape", $"seg_shape")
  }

  private val maskingSql =
    """SELECT regexp_replace(regexp_replace(regexp_replace(c_name,
      |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
      |    AS name_shape,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    c_mktsegment,
      |    '[^A-Za-z0-9]', '-', 'g'),
      |    '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '0', 'g')
      |    AS seg_shape,
      |  count(*) AS n
      |FROM customer GROUP BY 1, 2 ORDER BY name_shape, seg_shape""".stripMargin

  /** Bitwise surface — the bit_and/bit_or/bit_xor AGGREGATES plus the
    * scalar operators (&, |, ^, shifts, bit_count) in one fact pass.
    * All integer arithmetic: bit-exact on both engines by
    * construction. */
  private def bitwiseOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.events(s, d)
      .withColumn("mix",
        (shiftleft($"user_id".bitwiseAND(lit(255L)), 3)
          .bitwiseOR($"event_id".bitwiseAND(lit(7L))))
          .bitwiseXOR(shiftright($"event_id", 8).bitwiseAND(lit(63L))))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           bit_and($"event_id").as("ba"),
           bit_or($"event_id").as("bo"),
           bit_xor($"event_id").as("bx"),
           sum(bit_count($"user_id").cast("long")).as("pop_bits"),
           sum($"mix").as("sum_mix"))
      .orderBy($"event_type")
  }

  private val bitwiseOpsSql =
    """SELECT event_type, count(*) AS n,
      |  bit_and(event_id) AS ba, bit_or(event_id) AS bo,
      |  bit_xor(event_id) AS bx,
      |  CAST(sum(bit_count(user_id)) AS BIGINT) AS pop_bits,
      |  CAST(sum(xor((user_id & 255) << 3 | (event_id & 7),
      |               (event_id >> 8) & 63)) AS BIGINT) AS sum_mix
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** width_bucket histogram — equi-width binning of the fact measure.
    * Bucketing runs on CENTS (integers carried in doubles), so the
    * bucket boundary arithmetic — floor(n·(v-lo)/(hi-lo))+1 — rounds
    * identically on both engines at every representable input: no IEEE
    * boundary straddle is possible at integer inputs with these bounds.
    * Out-of-range rows land in the 0 / n+1 overflow buckets per the
    * SQL-standard contract. */
  private def widthBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.events(s, d)
      .withColumn("vc", Tbl.cents($"value"))
      .withColumn("bucket",
        width_bucket($"vc".cast("double"), lit(0.0), lit(50000.0), lit(20L)))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
           min($"vc").as("vc_min"), max($"vc").as("vc_max"))
      .orderBy($"bucket")
  }

  private val widthBucketSql =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS vc FROM events)
      |SELECT CASE WHEN vc < 0 THEN 0
      |            WHEN vc >= 50000 THEN 21
      |            ELSE CAST(floor(20 * (CAST(vc AS DOUBLE) - 0.0)
      |                            / (50000.0 - 0.0)) AS BIGINT) + 1
      |       END AS bucket,
      |  count(*) AS n, min(vc) AS vc_min, max(vc) AS vc_max
      |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin

  private val SaltBuckets = 16

  /** Two-phase salted aggregation — THE skew pattern for low-cardinality
    * hot keys at 100 TB: events has 5 event types over the whole corpus,
    * so a direct groupBy(event_type) hash-partitions 100 TB into 5
    * reducers. Salting aggregates on (event_type, salt) first — 16×
    * the reducers, each salt slice map-side-combined — then re-folds
    * the 80-row grid on the bare key. Every aggregate here re-folds
    * associatively (count→sum, sum→sum, min→min, max→max), which is
    * the precondition for the rewrite; the oracle pins that the output
    * is IDENTICAL to the naive single-phase form. */
  private def saltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.events(s, d)
      .withColumn("salt", pmod($"event_id", lit(SaltBuckets.toLong)))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"),
           sum(Tbl.cents($"value")).as("pv"),
           min(unix_micros($"ts")).as("pmn"),
           max(unix_micros($"ts")).as("pmx"))
      .groupBy($"event_type")
      .agg(sum($"pn").as("n"), sum($"pv").as("v_c"),
           min($"pmn").as("first_us"), max($"pmx").as("last_us"))
      .orderBy($"event_type")
  }

  private val saltedAggSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_c,
      |  min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Broadcast min-max feature scaling — the normalization pass of every
    * feature pipeline: per-key min/max from one grid aggregate, JOINED
    * BACK by broadcast (the grid is |keys|-sized — the corpus never
    * re-shuffles), each value scaled to integer per-mille, then a
    * decile histogram. All integer arithmetic — scaled = (v-min)*1000
    * div (max-min) — so parity is exact. */
  private def minmaxScale(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tbl.events(s, d)
      .select($"event_type", Tbl.cents($"value").as("vc"))
    val grid = ev.groupBy($"event_type")
      .agg(min($"vc").as("mn"), max($"vc").as("mx"))
    ev.join(broadcast(grid), "event_type")
      .withColumn("pm",
        ($"vc" - $"mn") * 1000L / greatest($"mx" - $"mn", lit(1L)))
      .withColumn("pm", $"pm".cast("long"))
      .withColumn("decile", least($"pm" / lit(100L), lit(9L)).cast("long"))
      .groupBy($"event_type", $"decile")
      .agg(count(lit(1)).as("n"), min($"pm").as("pm_min"),
           max($"pm").as("pm_max"))
      .orderBy($"event_type", $"decile")
  }

  private val minmaxScaleSql =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
      |  FROM events),
      |g AS (
      |  SELECT event_type, min(vc) AS mn, max(vc) AS mx
      |  FROM v GROUP BY 1),
      |sc AS (
      |  SELECT v.event_type,
      |    (v.vc - g.mn) * 1000 // greatest(g.mx - g.mn, 1) AS pm
      |  FROM v JOIN g USING (event_type))
      |SELECT event_type, least(pm // 100, 9) AS decile, count(*) AS n,
      |  min(pm) AS pm_min, max(pm) AS pm_max
      |FROM sc GROUP BY 1, 2 ORDER BY event_type, decile""".stripMargin

  /** split_part / translate / lpad / repeat / reverse — the string
    * manipulation family over the patterned dimension strings. Pure
    * ASCII, so char semantics cannot diverge. */
  private def stringFuncs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tbl.customer(s, d)
      .select(
        split_part($"c_name", lit("#"), lit(2)).cast("long").as("idn"),
        translate($"c_mktsegment", "AEIOU", "12345").as("seg_t"),
        reverse($"c_mktsegment").as("seg_rev"),
        lpad($"c_nationkey".cast("string"), 4, "0").as("nk_pad"),
        repeat(substring($"c_mktsegment", 1, 1), 3).as("ini3"))
      .groupBy($"seg_t", $"seg_rev", $"ini3")
      .agg(count(lit(1)).as("n"), sum($"idn").as("sum_id"),
           min($"nk_pad").as("nk_min"))
      // order by ALL THREE group keys: total by construction, not by
      // the accident of translate() being injective over the current
      // segment values (a colliding seg_t would otherwise leave row
      // order engine-arbitrary vs the oracle)
      .orderBy($"seg_t", $"seg_rev", $"ini3")
  }

  private val stringFuncsSql =
    """SELECT translate(c_mktsegment, 'AEIOU', '12345') AS seg_t,
      |  reverse(c_mktsegment) AS seg_rev,
      |  repeat(substr(c_mktsegment, 1, 1), 3) AS ini3,
      |  count(*) AS n,
      |  CAST(sum(CAST(split_part(c_name, '#', 2) AS BIGINT)) AS BIGINT)
      |    AS sum_id,
      |  min(lpad(CAST(c_nationkey AS VARCHAR), 4, '0')) AS nk_min
      |FROM customer GROUP BY 1, 2, 3 ORDER BY seg_t, seg_rev, ini3""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_json_path"       -> (jsonPath _),
    "x_regexp_funcs"    -> (regexpFuncs _),
    "x_masking"         -> (masking _),
    "x_bitwise"         -> (bitwiseOps _),
    "x_width_bucket"    -> (widthBucket _),
    "x_salted_agg"      -> (saltedAgg _),
    "x_minmax_scale"    -> (minmaxScale _),
    "x_string_funcs"    -> (stringFuncs _))

  override val oracles: Map[String, String] = Map(
    "x_json_path"       -> jsonPathSql,
    "x_regexp_funcs"    -> regexpFuncsSql,
    "x_masking"         -> maskingSql,
    "x_bitwise"         -> bitwiseOpsSql,
    "x_width_bucket"    -> widthBucketSql,
    "x_salted_agg"      -> saltedAggSql,
    "x_minmax_scale"    -> minmaxScaleSql,
    "x_string_funcs"    -> stringFuncsSql)
}
