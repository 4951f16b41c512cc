package graft.operators

import graft.functions.Det._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** OHLCV resampling — interval aggregation into epoch-aligned buckets.
  *
  * Reference semantics: `api/api_handler.py:788-834` — bucket =
  * `(ts // n*60) * n*60` (epoch-aligned), open = value at earliest ts in
  * the bucket, close = value at latest ts, high = max, low = min,
  * volume = sum.
  *
  * Scale notes: one hash-aggregate with map-side partial combine and a
  * single shuffle on (symbol, bucket). No window functions, no sort.
  * `min_by` / `max_by` with a composite (ts, tieBreak) ordering key makes
  * first/last deterministic under duplicate timestamps (SURVEY §7.4.6).
  */
object Resample {

  /** Epoch-aligned bucket start (unix seconds), matching
    * `api/api_handler.py:806`. `pmod` = FLOOR semantics, like Python's
    * `//` in the reference — pre-1970 timestamps still bucket to the
    * floor boundary (SQL oracles must use `(x%n+n)%n`, not bare `%`,
    * which truncates toward zero). */
  def bucketStart(ts: Column, seconds: Int): Column =
    epochSec(ts) - pmod(epochSec(ts), lit(seconds.toLong))

  /** Build OHLCV candles from a tick stream (one price observation per
    * row, so price == high == low within the tick). `tieBreak`
    * disambiguates equal timestamps deterministically. */
  def ticksToCandles(
      ticks: DataFrame,
      symbol: Column,
      ts: Column,
      price: Column,
      vol: Column,
      tieBreak: Column,
      bucketSeconds: Int): DataFrame = {
    val ord = struct(ts, tieBreak)
    ticks
      .groupBy(
        symbol.as("symbol"),
        bucketStart(ts, bucketSeconds).as("bucket_start"))
      .agg(
        min_by(price, ord).as("open"),
        max(price).as("high"),
        min(price).as("low"),
        max_by(price, ord).as("close"),
        dsum(vol).as("volume"),
        count(lit(1)).as("n_ticks"))
  }

  /** Resample existing candles to a coarser interval
    * (`api/api_handler.py:788-834`): open of earliest, close of latest,
    * max high, min low, sum volume; epoch-aligned buckets.
    *
    * Expects columns: symbol, ts (timestamp), open, high, low, close,
    * volume; `tieBreak` orders duplicate timestamps. */
  def candles(df: DataFrame, bucketSeconds: Int, tieBreak: Column): DataFrame = {
    val ord = struct(col("ts"), tieBreak)
    df.groupBy(col("symbol"), bucketStart(col("ts"), bucketSeconds).as("bucket_start"))
      .agg(
        min_by(col("open"), ord).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), ord).as("close"),
        dsum(col("volume")).as("volume"),
        count(lit(1)).as("n_candles"))
  }
}
