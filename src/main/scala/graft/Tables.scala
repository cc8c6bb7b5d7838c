package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table access (schemas: /root/repo/FIXTURES.md §B).
  *
  * Every loader is a plain distributed parquet scan — the reference's
  * driver-side `pd.read_csv` + `createDataFrame` ingest
  * (/root/reference/src/preprocessing_pipeline.py:258-264) caps input at
  * driver memory; here the scan is executor-side, so column pruning and
  * predicate pushdown reach the parquet reader and the pattern holds at
  * 100 TB unchanged.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The events fixture has carried `ts` in three physical forms across
    * driver testdata generations: parquet nanosecond timestamps (read as
    * LongType under spark.sql.legacy.parquet.nanosAsLong, set in
    * GraftSession), naive microsecond timestamps (read as TIMESTAMP_NTZ —
    * no UTC-adjusted annotation), and plain TimestampType. Normalize all
    * three to a microsecond TimestampType here so every downstream operator
    * sees a plain timestamp. The NTZ cast reinterprets the naive wall-clock
    * in the session timezone — pinned to UTC in GraftSession — which is
    * byte-identical to how the DuckDB oracle reads the same column.
    *
    * The nanos→micros step MUST be integer division (`div`): `/` promotes
    * to double, whose 53-bit mantissa cannot hold an epoch-nanos value, so
    * values within ~100 ns of a microsecond boundary round UP and drift off
    * DuckDB's truncation by 1 µs (observed: …731999935 ns → …732000 µs).
    */
  /** Integer-exact nanos→TimestampType(µs) conversion (`div`, not `/`). */
  def nanosToTimestamp(ns: Column): Column =
    timestamp_micros(call_function("div", ns, lit(1000L)))

  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", nanosToTimestamp(col("ts")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
}
