package graft.operators

import graft.functions.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's analytics surface over a canonical candle frame.
  *
  * Canonical candle columns: `symbol` (string), `ts` (timestamp),
  * `open/high/low/close` (double), `volume` (double or long).
  *
  * Reference semantics:
  *  - symbol_stats (A1): `analytics/lambda_analytics.py:146-166`,
  *    `analytics/lambda_analytics_lightweight.py:113-148` — first open /
  *    last close in time order, max high, min low, sum volume, avg close,
  *    count; change = close-open; pct = change/open*100 (0-guarded per
  *    `lambda_analytics_lightweight.py:136`).
  *  - daily_summary (A2): A1 for all symbols, desc by pct
  *    (`analytics/lambda_analytics.py:174-271`).
  *  - date_range (A3): A1 per day for one symbol
  *    (`analytics/lambda_analytics.py:274-357`).
  *  - top_movers (A4): A2 then top-N desc / asc
  *    (`analytics/lambda_analytics.py:360-430`).
  *  - derived view (P16): `sql/athena_parquet_tables.sql:60-64`.
  *  - latest per symbol (O6/T5): `api/api_handler.py:479-514`.
  *
  * Scale notes: every rollup is a single hash-aggregate (map-side
  * partial combine, one shuffle on the group keys); first/last use
  * `min_by`/`max_by` on a composite order key rather than a window sort.
  * top_movers is `TakeOrderedAndProject` (no global sort materialized).
  */
object Analytics {

  private def ord(tieBreak: Column) = struct(col("ts"), tieBreak)

  /** A1/A2/A3 core: per-(symbol, day) OHLCV rollup. */
  def dailyStats(candles: DataFrame, tieBreak: Column): DataFrame =
    candles
      .groupBy(col("symbol"), to_date(col("ts")).as("trade_date"))
      .agg(
        min_by(col("open"), ord(tieBreak)).as("open"),
        max_by(col("close"), ord(tieBreak)).as("close"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        dsum(col("volume")).as("volume"),
        davg(col("close")).as("avg_price"),
        count(lit(1)).as("num_records"))
      .withColumn("price_change", col("close") - col("open"))
      .withColumn(
        "price_change_pct",
        when(col("open") =!= 0, (col("close") - col("open")) / col("open") * 100)
          .otherwise(lit(0.0)))

  /** A1: one symbol, one date. */
  def symbolStats(candles: DataFrame, symbol: String, date: String, tieBreak: Column): DataFrame =
    dailyStats(candles.filter(col("symbol") === symbol && to_date(col("ts")) === lit(date)), tieBreak)

  /** A2: all symbols on one date, sorted desc by pct change. */
  def dailySummary(candles: DataFrame, date: String, tieBreak: Column): DataFrame =
    dailyStats(candles.filter(to_date(col("ts")) === lit(date)), tieBreak)
      .orderBy(desc("price_change_pct"), col("symbol"))

  /** A3: one symbol over an inclusive date range, per-day stats. */
  def dateRange(candles: DataFrame, symbol: String, from: String, to: String, tieBreak: Column): DataFrame =
    dailyStats(
      candles.filter(
        col("symbol") === symbol &&
          to_date(col("ts")).between(lit(from), lit(to))),
      tieBreak)
      .orderBy(col("trade_date"))

  /** A4: top-N gainers (desc=true) or losers over a date range.
    * Deterministic tie-break on (symbol, trade_date). */
  def topMovers(candles: DataFrame, n: Int, gainers: Boolean, tieBreak: Column): DataFrame =
    topMoversFromDaily(dailyStats(candles, tieBreak), n, gainers)

  /** [[topMovers]] over an already-materialized daily rollup — the
    * share-the-rollup variant (one aggregation serves q22/q23/q81). */
  def topMoversFromDaily(daily: DataFrame, n: Int, gainers: Boolean): DataFrame = {
    val keys =
      if (gainers) Seq(desc("price_change_pct"), asc("symbol"), asc("trade_date"))
      else Seq(asc("price_change_pct"), asc("symbol"), asc("trade_date"))
    daily.orderBy(keys: _*).limit(n)
  }

  /** P16: derived analysis columns (sql/athena_parquet_tables.sql:60-64),
    * with the div-by-zero guard from lambda_analytics_lightweight.py:136. */
  def withDerivedColumns(candles: DataFrame): DataFrame =
    candles
      .withColumn("price_change", col("close") - col("open"))
      .withColumn(
        "price_change_percent",
        when(col("open") =!= 0, (col("close") - col("open")) / col("open") * 100)
          .otherwise(lit(0.0)))
      .withColumn("daily_range", col("high") - col("low"))
      .withColumn(
        "volatility_percent",
        when(col("open") =!= 0, (col("high") - col("low")) / col("open") * 100)
          .otherwise(lit(0.0)))

  /** O6/T5: latest candle per symbol — single aggregate, no global sort.
    * `max_by(struct(all), ord)` keeps it one shuffle. */
  def latestPerSymbol(candles: DataFrame, tieBreak: Column): DataFrame = {
    val payload = struct(col("ts"), col("open"), col("high"), col("low"), col("close"), col("volume"))
    candles
      .groupBy(col("symbol"))
      .agg(max_by(payload, ord(tieBreak)).as("latest"))
      .select(col("symbol"), col("latest.*"))
  }

  /** W1/W2/W3 + W4: the reference's CTE-with-window daily-return
    * comparison (`sql/athena_parquet_tables.sql:117-144`), kept in window
    * form (not rewritten to groupBy) to exercise the window operator. */
  def dailyReturnComparison(candles: DataFrame, tieBreak: Column): DataFrame = {
    val part = Window.partitionBy(col("symbol"), to_date(col("ts")))
    val w    = part.orderBy(col("ts").asc, tieBreak.asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    candles
      .withColumn("trade_date", to_date(col("ts")))
      .withColumn("day_open", first(col("open")).over(w))
      .withColumn("day_close", last(col("close")).over(full))
      .withColumn("day_volume", sum(col("volume").cast("decimal(28,4)")).over(part).cast("double"))
      .select(
        col("symbol"),
        col("trade_date"),
        col("day_open"),
        col("day_close"),
        ((col("day_close") - col("day_open")) / col("day_open") * 100).as("daily_return_percent"),
        col("day_volume"))
      // one row per (symbol, day): every column is constant within the
      // window partition, so deduping on the two KEY columns alone is
      // value-identical to a full-row distinct while keeping the
      // dedup aggregate key narrow (2 cols, not 6 incl. doubles)
      .dropDuplicates("symbol", "trade_date")
  }

  /** §2.8 extension: technical indicators the reference advertises but
    * never computes (`api_config.json:46-51`) — SMA, Bollinger bands,
    * RSI (simple-average variant) as window expressions over the
    * trailing n-row frame.
    *
    * All frame aggregates use exact decimal sums + moment-form stddev
    * (see [[graft.functions.Det]]) so the values are independent of
    * partitioning and bit-identical to the SQL oracle; only the final
    * scalar ops are (correctly-rounded) double arithmetic. */
  def withIndicators(candles: DataFrame, n: Int, tieBreak: Column): DataFrame =
    indicatorsOver(candles, n, Seq(col("symbol")), tieBreak)

  /** [[withIndicators]] de-skewed for the 100-TB shape: partition the
    * windows by (symbol, `chunk`) instead of symbol alone, so a symbol's
    * history spreads over as many reducers as it has chunks rather than
    * funneling one reducer per symbol (5 symbols = 5 reducers at ANY
    * scale is the skew funnel the plain form carries).
    *
    * Exactness: the trailing-frame aggregates look back ≤ n−1 rows and
    * `lag` 1 row, so each chunk borrows the previous non-empty chunk's
    * last n rows (n−1 to fill the frame + 1 so the oldest frame row's
    * gain/loss sees a real predecessor), computes the same window
    * expressions inside the augmented chunk, and drops the borrowed
    * rows — bit-identical to the global window (q29 stays on the same
    * oracle hash).
    *
    * Preconditions (caller contract): `chunk` is a non-decreasing
    * function of `ts` (e.g. `to_date(ts)`, an epoch-day/hour bucket),
    * and every chunk that precedes another non-empty chunk holds ≥ n
    * rows per symbol — pick the granularity from the data cadence
    * (intraday candles: daily chunks hold 75+ rows vs n=20).
    * `validate = true` spends one small aggregate job enforcing the
    * row-count precondition (throws instead of silently diverging). */
  def withIndicatorsChunked(
      candles: DataFrame,
      n: Int,
      tieBreak: Column,
      chunk: Column,
      validate: Boolean = false): DataFrame = {
    val base = candles.withColumn("__chunk", chunk)
    // successor of each non-empty (symbol, chunk): a window over the
    // DISTINCT chunk relation — one row per (symbol, chunk), tiny
    val nextChunk = base.select(col("symbol"), col("__chunk")).distinct()
      .withColumn(
        "__next",
        lead(col("__chunk"), 1).over(Window.partitionBy(col("symbol")).orderBy(col("__chunk"))))
    if (validate) {
      val bad = base.groupBy(col("symbol"), col("__chunk")).agg(count(lit(1)).as("__c"))
        .join(nextChunk.filter(col("__next").isNotNull), Seq("symbol", "__chunk"))
        .filter(col("__c") < n)
        .limit(1).collect()
      if (bad.nonEmpty)
        throw new IllegalArgumentException(
          s"withIndicatorsChunked: chunk ${bad.head.get(1)} of symbol ${bad.head.get(0)} has " +
            s"${bad.head.getLong(2)} < n=$n rows but precedes another chunk — coarsen the chunk")
    }
    // last n rows of each chunk, re-keyed to the successor chunk
    val wTail = Window.partitionBy(col("symbol"), col("__chunk"))
      .orderBy(col("ts").desc, tieBreak.desc)
    val borrowed = base
      .withColumn("__rn", row_number().over(wTail))
      .filter(col("__rn") <= n)
      .drop("__rn")
      .join(nextChunk.filter(col("__next").isNotNull), Seq("symbol", "__chunk"))
      .withColumn("__chunk", col("__next"))
      .drop("__next")
      .withColumn("__borrowed", lit(true))
    val aug = base.withColumn("__borrowed", lit(false)).unionByName(borrowed)
    indicatorsOver(aug, n, Seq(col("symbol"), col("__chunk")), tieBreak)
      .filter(!col("__borrowed"))
      .drop("__borrowed", "__chunk")
  }

  private def indicatorsOver(
      candles: DataFrame,
      n: Int,
      partCols: Seq[Column],
      tieBreak: Column): DataFrame = {
    val w     = Window.partitionBy(partCols: _*).orderBy(col("ts").asc, tieBreak.asc)
    val frame = w.rowsBetween(-(n - 1), 0)
    val delta = col("close") - lag(col("close"), 1).over(w)
    val gain  = when(delta > 0, delta).otherwise(lit(0.0))
    val loss  = when(delta < 0, -delta).otherwise(lit(0.0))
    def dsumF(c: Column, scale: Int) =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(30, scale))).over(frame).cast("double")
    val cnt = count(col("close")).over(frame)
    val df = candles
      .withColumn("__n", cnt)
      .withColumn("__s1", dsumF(col("close"), 6))
      .withColumn("__s2", dsumF(col("close") * col("close"), 8))
      .withColumn("__sg", dsumF(gain, 6))
      .withColumn("__sl", dsumF(loss, 6))
    val sma = col("__s1") / col("__n")
    val sd = when(col("__n") > 1,
      sqrt(greatest(lit(0.0), (col("__s2") - col("__s1") * col("__s1") / col("__n")) / (col("__n") - 1))))
    df.withColumn("sma", sma)
      .withColumn("bollinger_upper", col("sma") + lit(2.0) * sd)
      .withColumn("bollinger_lower", col("sma") - lit(2.0) * sd)
      .withColumn("avg_gain", col("__sg") / col("__n"))
      .withColumn("avg_loss", col("__sl") / col("__n"))
      .withColumn(
        "rsi",
        when(col("avg_loss") === 0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("avg_gain") / col("avg_loss"))))
      .drop("__n", "__s1", "__s2", "__sg", "__sl", "avg_gain", "avg_loss")
  }
}
