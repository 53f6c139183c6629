package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{GroupState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Keyed cross-batch state done right (SURVEY.md §7.4.4): the reference
  * keeps "last 3 positions per vessel" in a driver-resident global temp
  * view mutated with invalid SQL per micro-batch (`predict_path.py:47-71`
  * — T1). Here the same intent is `flatMapGroupsWithState` with bounded
  * per-key state: distributed, checkpointable, and O(K) not O(driver).
  */
object StatefulOps {

  /** One event row for typed state handling (events table shape;
    * user_id ≈ mmsi, ts_us ≈ timestamp_utc, value ≈ speed_over_ground). */
  final case class Ev(event_id: Long, ts_us: Long, user_id: Long, value: Double)

  /** Emitted top-row: rank 1..3 of the latest events for a key. */
  final case class Ranked(user_id: Long, rn: Int, event_id: Long,
                          ts_us: Long, value: Double)

  /** State: at most 3 latest events (ts desc, event_id desc tiebreak). */
  final case class Top3State(rows: List[Ev])

  /** Per-batch group handler for "latest 3 per vessel": merge incoming
    * rows into the ≤3-row state, emit the refreshed ranking. The
    * reference's rank→filter→rewrite loop (`predict_path.py:60-69`),
    * minus the driver residency and the broken SQL dialect. */
  def last3PerKey(key: Long, it: Iterator[Ev],
                  st: GroupState[Top3State]): Iterator[Ranked] = {
    val merged = (st.getOption.map(_.rows).getOrElse(Nil) ++ it)
      .sortBy(e => (-e.ts_us, -e.event_id))
      .take(3)
    st.update(Top3State(merged))
    merged.iterator.zipWithIndex.map { case (e, i) =>
      Ranked(key, i + 1, e.event_id, e.ts_us, e.value)
    }
  }

  /** Synthetic interpolated point (A5 gap-fill, `README.md:46`). */
  final case class Synth(user_id: Long, syn_ts_us: Long, syn_value: Double)

  /** State: last seen event time/value for the key. */
  final case class LastSeen(ts_us: Long, value: Double)

  /** Spark's round(col, 6): HALF_UP on BigDecimal.valueOf(v) — i.e. on
    * the double's SHORTEST DECIMAL representation, not its exact binary
    * value (`RoundBase` uses valueOf; `new BigDecimal(0.1234565)` would
    * round the 7th decimal differently). Replicated exactly so
    * state-emitted values hash-match the batch twin and the oracle. */
  private def round6(v: Double): Double =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Per-batch gap-fill: for every >60 s (and <1 h — longer gaps are
    * session breaks) gap between consecutive events of a key, including
    * across batch boundaries via state, emit a linearly interpolated
    * point every 60 s. Streaming twin of the batch `sequence`+`explode`
    * version (WindowOps.gapFill) — identical arithmetic, same oracle. */
  def gapFill(key: Long, it: Iterator[Ev],
              st: GroupState[LastSeen]): Iterator[Synth] = {
    val evs = it.toList.sortBy(e => (e.ts_us, e.event_id))
    if (evs.isEmpty) return Iterator.empty
    val out = List.newBuilder[Synth]
    var prev = st.getOption
    for (e <- evs) {
      prev match {
        case Some(p) if e.ts_us - p.ts_us > 60000000L &&
                        e.ts_us - p.ts_us < 3600000000L =>
          val gap = e.ts_us - p.ts_us
          val n = (gap - 1) / 60000000L
          var k = 1L
          while (k <= n) {
            val frac = (k * 60000000.0) / gap
            out += Synth(key, p.ts_us + k * 60000000L,
                         round6(p.value + (e.value - p.value) * frac))
            k += 1
          }
        case _ =>
      }
      prev = Some(LastSeen(e.ts_us, e.value))
    }
    st.update(prev.get)
    out.result().iterator
  }

  /** Running per-key totals emitted per event. */
  final case class RunRow(user_id: Long, event_id: Long, ts_us: Long,
                          run_n: Long, run_sum_c: Long)

  /** State for [[RunningTotals]]: event count + exact cents sum so far. */
  final case class RunState(n: Long, sum_c: Long)

  /** `transformWithState` flavor of keyed state (the Spark 4 successor
    * to flatMapGroupsWithState: typed state handles, TTL, timers,
    * RocksDB-only). Functionally a running (count, sum) per key — the
    * state API differs, the determinism discipline doesn't: rows are
    * folded in (ts, event_id) order and sums are exact cents. */
  final class RunningTotals extends StatefulProcessor[Long, Ev, RunRow] {
    @transient private var state: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunState](
        "run", Encoders.product[RunState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[RunRow] = {
      var st = Option(state.get()).getOrElse(RunState(0L, 0L))
      val out = rows.toList.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        // HALF_UP like Tbl.cents / the oracle's round() — Math.round is
        // half-toward-+inf, which differs on negative half-cents
        val cents = JBigDecimal.valueOf(e.value * 100)
          .setScale(0, RoundingMode.HALF_UP).longValue()
        st = RunState(st.n + 1, st.sum_c + cents)
        RunRow(key, e.event_id, e.ts_us, st.n, st.sum_c)
      }
      state.update(st)
      out.iterator
    }
  }
}
