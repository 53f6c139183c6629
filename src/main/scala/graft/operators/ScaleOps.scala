package graft.operators

import graft.{QueryModule, Tbl}
import graft.plans.Top3Aggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique operators: the patterns that keep the 100 TB plan
  * healthy, each exercised as an oracle-checked query so the technique
  * itself is regression-tested.
  *
  *  - Salted join: the skew-mitigation rewrite (fact key + salt ⋈ dim ×
  *    salt-range) proven equal to the plain join.
  *  - Typed Aggregator top-K: bounded-buffer partial aggregation — the
  *    shuffle-light alternative to a ranking window (which must shuffle
  *    ALL rows per key before ranking).
  */
object ScaleOps extends QueryModule {

  private val NumSalts = 8

  /** Skew-safe join: fact rows carry salt = event_id % 8; the dim side
    * is exploded ×8 so each (key, salt) bucket joins independently — a
    * hot key spreads over 8 reducers instead of one. Result ≡ the
    * unsalted join (the oracle states the plain one). */
  private def saltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fact = Tbl.events(s, d)
      .select($"user_id", Tbl.cents($"value").as("v_c"),
              ($"event_id" % NumSalts).as("salt"))
    val dim = Tbl.customer(s, d)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("salt", explode_outer(sequence(lit(0L), lit(NumSalts - 1L))))
    fact.join(dim, fact("user_id") === dim("c_custkey") &&
                   fact("salt") === dim("salt"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"v_c").as("v_c"))
      .select($"c_mktsegment", $"n", round($"v_c" / 100.0, 2).as("sum_value"))
      .orderBy($"c_mktsegment")
  }

  private val saltedJoinSql =
    """SELECT c_mktsegment, count(*) AS n,
      |  round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** A3 via the typed Aggregator (bounded top-K buffer, map-side
    * combine) — same total order and oracle as the window-rank twin. */
  private def topkAggregator(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import Top3Aggregator.EvRow
    Tbl.events(s, d)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id", $"value")
      .as[EvRow]
      .groupByKey(_.user_id)
      .agg(Top3Aggregator.agg.toColumn.name("top"))
      .flatMap { case (uid, rows) =>
        rows.zipWithIndex.map { case (e, i) =>
          (uid, i + 1, e.event_id, e.ts_us, e.value)
        }
      }
      .toDF("user_id", "rn", "event_id", "ts_us", "value")
      .orderBy($"user_id", $"rn")
  }

  private val topkAggregatorSql =
    """SELECT user_id, rn, event_id, epoch_us(ts) AS ts_us, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_salted_join"     -> (saltedJoin _),
    "x_topk_aggregator" -> (topkAggregator _))

  override val oracles: Map[String, String] = Map(
    "x_salted_join"     -> saltedJoinSql,
    "x_topk_aggregator" -> topkAggregatorSql)
}
