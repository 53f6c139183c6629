package graft

/** DuckDB oracle SQL shared by batch/streaming twins. Several operators
  * deliberately exist in two embodiments (batch window vs streaming
  * state; plain join vs salted join) that must check against the SAME
  * oracle — hoisting the text here makes that a compiler-enforced fact
  * instead of a copy-paste invariant.
  */
object Oracles {

  /** Latest-3-per-key ranking (a3_top3_per_key / s2_stream_last3 /
    * x_topk_aggregator). */
  val top3PerKey: String =
    """SELECT user_id, rn, event_id, epoch_us(ts) AS ts_us, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** 60s-step linear interpolation in (60s, 1h) gaps (a5_gap_fill /
    * s3_stream_gap_fill). */
  val gapFill: String =
    """SELECT user_id, p_us + k * 60000000 AS syn_ts_us,
      |  round(p_v + (value - p_v) * ((k * 60000000.0) / gap_us), 6) AS syn_value
      |FROM (
      |  SELECT *, t_us - p_us AS gap_us FROM (
      |    SELECT user_id, epoch_us(ts) AS t_us, value,
      |           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS p_us,
      |           lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS p_v
      |    FROM events)
      |  WHERE p_us IS NOT NULL AND t_us - p_us > 60000000
      |    AND t_us - p_us < 3600000000),
      |  LATERAL unnest(generate_series(1, (gap_us - 1) // 60000000)) t(k)
      |ORDER BY user_id, syn_ts_us""".stripMargin

  /** 2min/1min sliding window kinematics — each event lands in exactly 2
    * windows (a1_sliding_window / s1_stream_window_agg). */
  val slidingWindow: String =
    """SELECT (epoch_us(ts) // 60000000 - k) * 60000000 AS ws_us,
      |       (epoch_us(ts) // 60000000 - k) * 60000000 + 120000000 AS we_us,
      |       user_id,
      |       round(sum(CAST(round(value*100) AS BIGINT))/100.0/count(*), 6) AS moving_avg,
      |       arg_max(value, epoch_us(ts)) AS last_value,
      |       count(*) AS n
      |FROM events, (VALUES (0),(1)) offs(k)
      |GROUP BY 1, 2, 3 ORDER BY ws_us, user_id""".stripMargin

  /** 1-hour-gap sessionization, session end = last event + gap
    * (x_sessionize / s10_stream_session). */
  val sessionize: String =
    """SELECT user_id, min(t_us) AS ws_us, max(t_us) + 3600000000 AS we_us,
      |       count(*) AS n,
      |  round(sum(v_c) / 100.0, 2) AS sum_value
      |FROM (
      |  SELECT user_id, t_us, v_c,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY t_us) AS sid
      |  FROM (
      |    SELECT user_id, epoch_us(ts) AS t_us,
      |           CAST(round(value*100) AS BIGINT) AS v_c,
      |           CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 3600000000
      |                THEN 1 ELSE 0 END AS new_s
      |    FROM events))
      |GROUP BY user_id, sid ORDER BY user_id, ws_us""".stripMargin

  /** events ⋈ customer rollup by segment (x_salted_join /
    * s6_stream_static_join — the salted and broadcast variants must
    * equal the plain join). */
  val eventsBySegment: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
