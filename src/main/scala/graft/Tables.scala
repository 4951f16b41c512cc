package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. At 100 TB each of
  * these would be a partitioned parquet dataset; nothing here assumes a
  * single file — `spark.read.parquet(path)` takes directories too.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright. Read nanos as a plain
    * long (legacy conf) and floor-divide to micros — integer `div`, not
    * `/`, because ~1.7e18 ns exceeds double's 2^53 exact-integer range.
    * Matches DuckDB, which truncates ns→µs on read.
    *
    * ⚠ The conf is SESSION-GLOBAL and must stay set through execution
    * (the vectorized reader checks it per batch), so it is not
    * restored here. Consequence: after the first `events` read, other
    * nanos-typed parquet columns in the session read as raw longs
    * instead of erroring — acceptable because this loader is the only
    * nanos consumer; route any new nanos table through a loader like
    * this one rather than bare `spark.read.parquet`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // Parquet TIMESTAMP with isAdjustedToUTC=false reads as NTZ; the
      // engine's contract is instants in UTC (SURVEY §7.4.2), and the
      // session timezone is pinned to UTC, so this cast is a pure type
      // re-tag — the underlying micros are unchanged.
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
