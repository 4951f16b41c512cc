package graft.ohlcv

import graft.operators.{Analytics, Dedup, Resample}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Thin query façade mirroring the reference REST API
  * (api/api_handler.py) as pure functions over the canonical candle
  * frame (symbol, ts, open, high, low, close, volume,
  * fetch_timestamp). No HTTP — endpoints are library calls whose
  * `collect()` happens at the caller's boundary.
  */
object Api {

  /** P14: period token → days. `"3m"` ≈ 90 d, `"2y"` ≈ 730 d — the
    * reference's approximate arithmetic (m=30 d, y=365 d,
    * api/api_handler.py:746-769) reproduced exactly, NOT calendar
    * months. Unknown tokens → default 30 d (reference behavior). */
  def periodToDays(period: String): Int = {
    val p = period.trim.toLowerCase
    val num = p.dropRight(1)
    def n(default: Int): Int = num.toIntOption.getOrElse(default)
    p.lastOption match {
      case Some('d') => n(30)
      case Some('m') => n(1) * 30
      case Some('y') => n(1) * 365
      case _         => 30
    }
  }

  /** P15: interval token → minutes (`"5m"`, `"1h"`, `"1d"`;
    * api/api_handler.py:772-785). Unknown → 5 (reference default). */
  def intervalToMinutes(interval: String): Int = {
    val i = interval.trim.toLowerCase
    val num = i.dropRight(1)
    def n(default: Int): Int = num.toIntOption.getOrElse(default)
    i.lastOption match {
      case Some('m') => n(5)
      case Some('h') => n(1) * 60
      case Some('d') => n(1) * 1440
      case _         => 5
    }
  }

  /** GET /ohlcv core (api/api_handler.py:360-443): symbol filter (P7
    * applied upstream), inclusive date-range filter on epoch seconds
    * with end-of-day expansion (P13), dedup keep-latest-fetch (D2),
    * ascending time order, tail-limit = most-recent N still returned
    * ascending (O4). */
  def getOhlcv(
      candles: DataFrame,
      symbol: String,
      fromDate: Option[String],
      toDate: Option[String],
      limit: Option[Int]): DataFrame = {
    val bySymbol = candles.filter(col("symbol") === symbol)
    val fromTs = fromDate.map(d => unix_timestamp(to_timestamp(lit(d), "yyyy-MM-dd")))
    val toTs   = toDate.map(d => unix_timestamp(to_timestamp(lit(d), "yyyy-MM-dd")) + 86399L)
    val ranged = (fromTs, toTs) match {
      case (Some(f), Some(t)) => bySymbol.filter(unix_timestamp(col("ts")).between(f, t))
      case (Some(f), None)    => bySymbol.filter(unix_timestamp(col("ts")) >= f)
      case (None, Some(t))    => bySymbol.filter(unix_timestamp(col("ts")) <= t)
      case _                  => bySymbol
    }
    val deduped = Dedup.keepLatest(
      ranged,
      keys = Seq(col("symbol"), col("ts")),
      version = Seq(col("fetch_timestamp")))
    val tailed = limit match {
      case Some(n) => deduped.orderBy(desc("ts")).limit(n)
      case None    => deduped
    }
    tailed.orderBy(col("ts"))
  }

  /** /alfaquantz resample path (api/api_handler.py:718-727): getOhlcv
    * then interval aggregation (A6) at `interval` (token form). */
  def getOhlcvResampled(
      candles: DataFrame,
      symbol: String,
      fromDate: Option[String],
      toDate: Option[String],
      interval: String): DataFrame = {
    val base = getOhlcv(candles, symbol, fromDate, toDate, limit = None)
    Resample
      .candles(base, intervalToMinutes(interval) * 60, col("fetch_timestamp"))
      .orderBy(col("bucket_start"))
  }

  /** GET /latest (api/api_handler.py:479-514): latest candle per
    * symbol (O6/T5). */
  def latest(candles: DataFrame): DataFrame =
    Analytics.latestPerSymbol(candles, col("fetch_timestamp"))

  /** GET /symbols (D5): distinct symbols, sorted. */
  def symbols(candles: DataFrame): DataFrame =
    candles.select(col("symbol")).distinct().orderBy(col("symbol"))

  /** S12: render candles as the reference's CSV export lines
    * (api/api_handler.py:614-631):
    * symbol,timestamp,datetime,open,high,low,close,volume. */
  def toCsvRows(candles: DataFrame): DataFrame =
    candles.select(
      concat_ws(
        ",",
        col("symbol"),
        unix_timestamp(col("ts")).cast("string"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        col("open").cast("string"),
        col("high").cast("string"),
        col("low").cast("string"),
        col("close").cast("string"),
        col("volume").cast("long").cast("string")).as("csv_line"))
}
