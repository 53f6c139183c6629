package graft.streaming

import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two stream jobs rebuilt as pure `DataFrame =>
  * DataFrame` transforms, composable under either `spark.read` or
  * `spark.readStream` — the reference hard-codes Kafka at both ends
  * (`preprocess.py:20,69-74`); we separate transform from transport so
  * the same logic runs on Kafka in production and file/memory sources in
  * tests (SURVEY.md §7.1).
  *
  * Both Python UDF crossings of the reference (`preprocess.py:51,58`)
  * are pure Catalyst column expressions here — the flagship structural
  * win: the whole parse→filter→derive pipeline is one WholeStageCodegen
  * span.
  */
object AisPipeline {

  /** The 17-column AIS position-report schema (`preprocess.py:22-39`,
    * FIXTURES.md §A1). */
  val aisSchema: StructType = StructType(Seq(
    StructField("timestamp_utc", StringType),
    StructField("mmsi", IntegerType),
    StructField("position", StringType),
    StructField("navigation_status", DoubleType),
    StructField("speed_over_ground", DoubleType),
    StructField("course_over_ground", DoubleType),
    StructField("message_type", IntegerType),
    StructField("source_identifier", StringType),
    StructField("position_verified", IntegerType),
    StructField("position_latency", IntegerType),
    StructField("raim_flag", IntegerType),
    StructField("vessel_name", StringType),
    StructField("vessel_type", StringType),
    StructField("timestamp_offset_seconds", IntegerType),
    StructField("true_heading", DoubleType),
    StructField("rate_of_turn", DoubleType),
    StructField("repeat_indicator", IntegerType)))

  /** Job #1 feature schema (`predict_path.py:23-32`, FIXTURES.md §A2). */
  val featureSchema: StructType = StructType(Seq(
    StructField("mmsi", IntegerType),
    StructField("timestamp_utc", TimestampType),
    StructField("speed_over_ground", DoubleType),
    StructField("course_over_ground", DoubleType),
    StructField("rate_of_turn", DoubleType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("cartesian_x", DoubleType),
    StructField("cartesian_y", DoubleType)))

  /** Stream job #1 (`preprocess.py:41-68`): Kafka JSON envelope →
    * parsed/filtered/derived kinematic features. Input: a DataFrame with
    * a binary/string `value` column (Kafka wire shape). */
  def preprocess(kafkaShaped: DataFrame): DataFrame = {
    val parsed = kafkaShaped
      .selectExpr("CAST(value AS STRING) AS value")         // P1
      .select(from_json(col("value"), aisSchema).alias("message")) // P2
      .select(col("message.timestamp_utc"), col("message.mmsi"),   // P3
              col("message.position"), col("message.speed_over_ground"),
              col("message.course_over_ground"), col("message.rate_of_turn"),
              col("message.message_type"))
      .where(col("message_type").isin(1, 2, 3, 18, 27))     // W4
      // F1 via split + per-element cast (no higher-order fn): the array
      // stays a codegen/CSE-friendly expression, unlike transform()
      // whose lambda would re-run the regex split per element access.
      .withColumn("coords",
        split(trim(regexp_replace(col("position"), "[a-zA-Z()]", "")), " "))
      .withColumn("longitude", col("coords").getItem(0).cast("double")) // P5
      .withColumn("latitude", col("coords").getItem(1).cast("double"))
      .where(col("latitude") > 7 && col("latitude") < 23 &&
             col("longitude") > 105 && col("longitude") < 123) // W1
      .withColumn("cartesian_x", ecefX(col("longitude"), col("latitude"))) // F2
      .withColumn("cartesian_y", ecefY(col("longitude"), col("latitude")))
      .withColumn("rate_of_turn", rotDecode(col("rate_of_turn")))  // F3
      .drop("coords", "position", "message_type")           // P6
      // try_to_timestamp, not to_timestamp: the reference runs Spark 3.1
      // (ANSI off) where a pattern miss yields null; Spark 4's ANSI
      // default would throw. Null-on-miss is the contract (§1.2).
      .withColumn("timestamp_utc",
        try_to_timestamp(col("timestamp_utc"), lit("yyyy-MM-dd HH:mm:ss'Z'"))) // P8
    parsed
  }

  /** The Kafka envelope re-serialization (`preprocess.py:68`): all
    * columns → one JSON string `value`. */
  def toJsonEnvelope(df: DataFrame): Column =
    to_json(struct(df.columns.map(col): _*)).as("value")

  /** ⚠-variant of job #1 (`preprocess.py:78-88`): watermarked sliding
    * window kinematic smoothing. `last()` of the reference is rebuilt as
    * max_by(_, timestamp) for determinism (SURVEY.md §7.4.3). */
  def kinematicAggs(features: DataFrame): DataFrame =
    features
      .withWatermark("timestamp_utc", "5 minutes")          // A2
      .groupBy(window(col("timestamp_utc"), "2 minutes", "1 minute"),
               col("mmsi"))                                  // A1
      .agg(avg("speed_over_ground").as("moving_avg_sog"),
           avg("course_over_ground").as("moving_avg_cog"),
           avg("rate_of_turn").as("moving_avg_rot"),
           max_by(col("longitude"), col("timestamp_utc")).as("longitude"),
           max_by(col("latitude"), col("timestamp_utc")).as("latitude"),
           max_by(col("cartesian_x"), col("timestamp_utc")).as("cartesian_x"),
           max_by(col("cartesian_y"), col("timestamp_utc")).as("cartesian_y"))

  /** Production transport (S1/K1): Kafka options as data, applied to
    * either read or write side. The connector jar ships with real
    * clusters; tests swap in file/memory sources (S3-S5). */
  final case class KafkaEndpoint(bootstrap: String, topic: String,
                                 checkpoint: String)

  def fromKafka(spark: org.apache.spark.sql.SparkSession,
                ep: KafkaEndpoint): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", ep.bootstrap)
      .option("subscribe", ep.topic)
      .load()

  def toKafka(df: DataFrame, ep: KafkaEndpoint):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(toJsonEnvelope(df))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", ep.bootstrap)
      .option("topic", ep.topic)
      .option("checkpointLocation", ep.checkpoint)          // K7
      .outputMode("update")                                  // K1
}
