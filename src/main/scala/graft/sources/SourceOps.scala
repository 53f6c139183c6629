package graft.sources

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-side surface (SURVEY.md §2.1): the reference's pipe-delimited
  * headerless CSV replay (S3, `server.py:47-49`), its fixed-width frame
  * padding (F8, `server.py:55` — 900-byte ljust frames), and the
  * in-memory seed relation (S4, `predict_path.py:47-51`).
  *
  * The CSV wire format is exercised in-memory (serialize → frame →
  * unframe → `from_csv` parse) so the round trip is oracle-checkable
  * without filesystem side effects; the file-based CSV source/sink pair
  * is covered by the streaming CSV sink query (s9) and unit tests.
  */
object SourceOps extends QueryModule {

  private[graft] val FrameLen = 200 // the reference uses 900 for its 17-col rows

  private[graft] val frameSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("v_c", LongType)))

  /** Stage the events table as fixed-width pipe frames (the reference's
    * wire layout) into a scratch dir; input for the pipecsv DSv2 reads. */
  private[graft] def stageFrames(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = Tbl.scratchDir("pipecsv_stage")
    Tbl.events(s, d)
      .select(rpad(concat_ws("|",
        $"event_id", $"user_id", $"event_type", Tbl.cents($"value")),
        FrameLen, " ").as("value"))
      .write.mode("overwrite").text(dir)
    dir
  }

  /** S3+F8: rows → pipe-CSV line → fixed-width frame → strip → parse
    * back via from_csv against a declared schema. Integer/string fields
    * only (double→text formatting differs across engines; the reference
    * wire carries text anyway). */
  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("v_c", LongType)))
    Tbl.events(s, d)
      .select(rpad(concat_ws("|",
        $"event_id", $"user_id", $"event_type", Tbl.cents($"value")),
        FrameLen, " ").as("frame"))
      .select(length($"frame").as("frame_len"),
              from_csv(rtrim($"frame"), schema,
                       Map("sep" -> "|")).as("m"))
      .select($"m.event_id", $"m.user_id", $"m.event_type", $"m.v_c",
              $"frame_len")
      .orderBy($"event_id")
  }

  private val csvRoundtripSql =
    s"""SELECT event_id, user_id, event_type,
       |  CAST(round(value*100) AS BIGINT) AS v_c, $FrameLen AS frame_len
       |FROM events ORDER BY event_id""".stripMargin

  /** S4+J1+W3: the sentinel seed relation unioned with the per-key
    * latest reading — the reference's state bootstrap (sentinel mmsi=-1,
    * `predict_path.py:47-53`) and its `where mmsi > -4` truncation
    * predicate (`predict_path.py:67`). */
  private def seedUnion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val seed = s.createDataFrame(Seq((-1L, 0L, 0.0)))
      .toDF("user_id", "ts_us", "value")
    val latest = Tbl.events(s, d)
      .groupBy($"user_id")
      .agg(max(unix_micros($"ts")).as("ts_us"),
           max_by($"value", unix_micros($"ts")).as("value"))
    seed.unionByName(latest)
      .where($"user_id" > -4)
      .orderBy($"user_id")
  }

  private val seedUnionSql =
    """SELECT * FROM (
      |  SELECT -1 AS user_id, 0 AS ts_us, 0.0 AS value
      |  UNION ALL
      |  SELECT user_id, max(epoch_us(ts)) AS ts_us,
      |         arg_max(value, epoch_us(ts)) AS value
      |  FROM events GROUP BY user_id)
      |WHERE user_id > -4 ORDER BY user_id""".stripMargin

  /** Frames in a staged directory — file-length arithmetic, the same
    * property the source's split planning uses. */
  private[graft] def frameCount(dir: String): Long = {
    val stride = FrameLen + 1L
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
                   !f.getName.startsWith("."))
      .map(_.length / stride).sum
  }

  /** S3+F8 as a first-class DataSource V2 (`format("pipecsv")`,
    * `PipeCsvDataSource.scala`): events staged to fixed-width frame files
    * (the reference's 900-byte-ljust wire, `server.py:47-55`), then read
    * back through the registered connector with a pruned 3-of-4-column
    * projection and two pushed predicates. `framesPerSplit` forces many
    * computed byte-range splits — the offset-splittable scan path a
    * 100 TB frame file would take; PlanSpec pins the pushdown/pruning. */
  private def dsv2Pipecsv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = stageFrames(s, d)
    s.read.format("pipecsv")
      .schema(frameSchema)
      .option("frameLen", FrameLen)
      .option("framesPerSplit", 512) // ~20 splits at sf0.01: exercise planning
      .load(dir)
      .where($"user_id" < 60 && $"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"v_c")
      .orderBy($"event_id")
  }

  private val dsv2PipecsvSql =
    """SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS v_c
      |FROM events
      |WHERE user_id < 60 AND event_type IN ('click', 'purchase')
      |ORDER BY event_id""".stripMargin

  /** K-class sink via the same connector: events written through the
    * DSv2 BATCH_WRITE path (per-task temp-file + atomic rename, frames
    * preserved offset-splittable) and read back through the DSv2 scan —
    * the full producer→consumer loop of the reference
    * (`client.py:24-33` → `server.py:47-55`) inside one engine. */
  private def dsv2WriteRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = Tbl.scratchDir("pipecsv_write")
    Tbl.events(s, d)
      .select($"event_id", $"user_id", $"event_type", Tbl.cents($"value").as("v_c"))
      .write.format("pipecsv").option("frameLen", FrameLen)
      .mode("append").save(dir)
    s.read.format("pipecsv").schema(frameSchema).option("frameLen", FrameLen)
      .load(dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"v_c").as("sum_v_c"),
           min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }

  private val dsv2WriteRoundtripSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v_c,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** JSON-lines source/sink round trip — the file-based form of the
    * reference's JSON envelope transport (its Kafka values are exactly
    * these objects): events written as ndjson, read back under an
    * EXPLICIT schema (schema inference over 100 TB of JSON is a full
    * extra scan — never at scale), aggregated against the parquet
    * truth. Values ride as exact cents so JSON double formatting can't
    * perturb the hash. */
  private def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = Tbl.scratchDir("jsonl")
    Tbl.events(s, d)
      .select($"event_id", $"user_id", $"event_type",
              Tbl.cents($"value").as("v_c"))
      .write.mode("overwrite").json(dir)
    s.read.schema(frameSchema).json(dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"v_c").as("sum_v_c"),
           min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }

  /** ORC source/sink round trip — the second columnar format Spark
    * ships natively; same scan/pushdown machinery class as parquet, so
    * a lake migrating between the two keeps every plan shape. The
    * filter proves predicate evaluation over the ORC scan. */
  private def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = Tbl.scratchDir("orc_rt")
    Tbl.events(s, d)
      .select($"event_id", $"user_id", $"event_type",
              Tbl.cents($"value").as("v_c"))
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .where($"user_id" % 2 === 0)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"v_c").as("sum_v_c"))
      .orderBy($"event_type")
  }

  private val jsonlRoundtripSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v_c,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private val orcRoundtripSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v_c
      |FROM events WHERE user_id % 2 = 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Text source + regex log-line parse — the classic "grep a server
    * log" ingestion that predates structured formats and still fronts
    * most scraped corpora. Events are formatted as syslog-ish lines
    * (`LEVEL [type] id=.. uid=.. cents=..`), written through the text
    * SINK, read back through the text SOURCE as raw `value` lines, and
    * re-structured with one `regexp_extract_all`-free pass (three
    * anchored `regexp_extract` calls — codegen'd, one scan). A parse
    * failure yields NULL/0 which would shift n or the sums, so the
    * oracle (aggregating the SOURCE columns, never touching text)
    * proves the format→parse chain lossless for every row. The level
    * derives from the id so it is recoverable by the oracle; lines are
    * newline-framed and the fields self-delimit, so the parse is
    * unambiguous at any scale. */
  private def textLogparse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = Tbl.scratchDir("textlog")
    Tbl.events(s, d)
      .select(concat(
        when($"event_id" % 7 === 0, "WARN").otherwise("INFO"),
        lit(" ["), $"event_type", lit("] id="), $"event_id",
        lit(" uid="), $"user_id",
        lit(" cents="), Tbl.cents($"value")).as("value"))
      .write.mode("overwrite").text(dir)
    s.read.text(dir)
      .select(
        regexp_extract($"value", "^(\\w+) \\[", 1).as("level"),
        regexp_extract($"value", "\\[([^\\]]+)\\]", 1).as("event_type"),
        regexp_extract($"value", "id=(-?\\d+)", 1).cast("long").as("event_id"),
        regexp_extract($"value", "cents=(-?\\d+)", 1).cast("long").as("v_c"))
      .groupBy($"level", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"v_c").as("sum_v_c"),
           min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"level", $"event_type")
  }

  private val textLogparseSql =
    """SELECT CASE WHEN event_id % 7 = 0 THEN 'WARN' ELSE 'INFO' END AS level,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v_c,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events GROUP BY 1, 2 ORDER BY level, event_type""".stripMargin

  /** PERMISSIVE malformed-record handling — the ingestion trap every
    * schema'd CSV feed hits: a fraction of rows carry an unparseable
    * field, and the contract (Spark's PERMISSIVE mode) is precise —
    * the malformed FIELD nulls out, the well-formed fields of the same
    * row survive, and the raw line lands in `_corrupt_record` for
    * quarantine. One in 13 staged rows carries a poisoned numeric
    * (`<cents>x`); the query aggregates per type counting quarantined
    * rows and summing the surviving values. The oracle derives the
    * same partition arithmetically from the SOURCE rows (id % 13), so
    * the hash pins all three semantics at once: poisoned rows counted
    * (not dropped), their v_c excluded from the sum, their event_type
    * still grouped. A silent DROPMALFORMED-style loss or a
    * whole-row-null would each shift different columns. */
  private def csvMalformed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = Tbl.scratchDir("csv_malformed")
    Tbl.events(s, d)
      .select(concat(
        $"event_id", lit(","), $"event_type", lit(","),
        Tbl.cents($"value"),
        when($"event_id" % 13 === 0, "x").otherwise("")).as("value"))
      .write.mode("overwrite").text(dir)
    s.read
      .schema("event_id LONG, event_type STRING, v_c LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           count($"_corrupt_record").as("n_bad"),
           sum($"v_c").as("sum_ok_v_c"))
      .orderBy($"event_type")
  }

  private val csvMalformedSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(count(*) FILTER (WHERE event_id % 13 = 0) AS BIGINT) AS n_bad,
      |  CAST(sum(CAST(round(value*100) AS BIGINT))
      |       FILTER (WHERE event_id % 13 <> 0) AS BIGINT) AS sum_ok_v_c
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_malformed" -> (csvMalformed _),
    "src_text_logparse" -> (textLogparse _),
    "src_csv_roundtrip" -> (csvRoundtrip _),
    "src_jsonl_roundtrip" -> (jsonlRoundtrip _),
    "src_orc_roundtrip" -> (orcRoundtrip _),
    "src_seed_union"    -> (seedUnion _),
    "src_dsv2_pipecsv"  -> (dsv2Pipecsv _),
    "src_dsv2_write"    -> (dsv2WriteRoundtrip _))

  override val oracles: Map[String, String] = Map(
    "src_csv_malformed" -> csvMalformedSql,
    "src_text_logparse" -> textLogparseSql,
    "src_csv_roundtrip" -> csvRoundtripSql,
    "src_jsonl_roundtrip" -> jsonlRoundtripSql,
    "src_orc_roundtrip" -> orcRoundtripSql,
    "src_seed_union"    -> seedUnionSql,
    "src_dsv2_pipecsv"  -> dsv2PipecsvSql,
    "src_dsv2_write"    -> dsv2WriteRoundtripSql)
}
