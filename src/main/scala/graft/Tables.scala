package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet star schema (TESTDATA.md) plus
  * shared column helpers used across the query registry.
  *
  * Determinism discipline (SURVEY.md §7.1): the driver hash-compares our
  * results against a DuckDB oracle, so every aggregate over doubles is
  * computed on exactly-scaled integers (`cents`) — IEEE +,-,*,/ and integer
  * math are bit-identical across engines, while naive double summation is
  * order-dependent. libm-backed functions (sin/cos/...) are only ever
  * surfaced through coarse rounding.
  */
object Tbl {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's reader rejects;
    * read it as a long (legacy conf) and rebuild a proper TimestampType
    * column. Data is µs-precision, so `ns div 1000` is lossless and
    * matches DuckDB's epoch_us exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Exact integer representation of a 2-decimal double (money/metric). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** cents sum back to a rounded decimal — one final division, deterministic. */
  def fromCents(c: Column): Column = round(c / 100.0, 2)
}
