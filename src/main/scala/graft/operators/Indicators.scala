package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Extended technical-indicator pack beyond [[Analytics.withIndicators]]
  * (the reference advertises an indicator surface in `api_config.json:46-51`
  * but never computes it; SMA/Bollinger/RSI live in [[Analytics]], the
  * rest of the standard set lives here): VWAP, drawdown, ATR, EMA/MACD,
  * z-score anomalies, pairwise correlation, and an OHLCV integrity
  * report.
  *
  * Numeric contract: every aggregate/frame sum is an exact decimal
  * ([[graft.functions.Det]] rationale) and every remaining double op is
  * a single correctly-rounded IEEE operation in a fixed expression
  * order, so results are bit-identical across partitionings, cluster
  * sizes, and the DuckDB oracle. The one inherently sequential operator
  * (EMA) states its order contract explicitly and is computed by a
  * per-partition linear scan, not a window.
  */
object Indicators {

  private def dec(c: Column, scale: Int) = c.cast(DecimalType(30, scale))

  /** Cumulative intraday VWAP per (symbol, day): Σ(price·volume)/Σ(volume)
    * over the day so far, one output row per tick.
    *
    * Scale: the window partitions by (symbol, day) — a day of one
    * symbol is the unit of parallelism, so adding days or symbols adds
    * reducers instead of deepening one sort (no per-symbol funnel). */
  def withVwap(ticks: DataFrame, price: Column, volume: Column, tieBreak: Column): DataFrame = {
    val w = Window
      .partitionBy(col("symbol"), to_date(col("ts")))
      .orderBy(col("ts").asc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val num = sum(dec(price * volume, 8)).over(w).cast("double")
    val den = sum(dec(volume, 4)).over(w).cast("double")
    ticks.withColumn("vwap", when(den =!= 0, num / den))
  }

  /** Running peak and drawdown-from-peak percent per symbol, in two
    * passes so the prefix max never funnels a symbol's whole history
    * through one reducer:
    *
    *  1. running max WITHIN each (symbol, chunk) — parallel across
    *     chunks;
    *  2. prefix max of whole-chunk maxima across PRECEDING chunks — a
    *     window over the one-row-per-(symbol, chunk) rollup, thousands
    *     of times smaller than the data — joined back and combined with
    *     `greatest`.
    *
    * Max is order- and grouping-insensitive, so the two-pass result is
    * exactly the global running max (no borrowing needed, unlike the
    * trailing-frame indicators). `chunk` must be a non-decreasing
    * function of `order` (e.g. the epoch-day of a bucket timestamp). */
  def withDrawdown(candles: DataFrame, close: Column, order: Column, chunk: Column): DataFrame = {
    val base = candles.withColumn("__chunk", chunk)
    val wLocal = Window
      .partitionBy(col("symbol"), col("__chunk"))
      .orderBy(order.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window
      .partitionBy(col("symbol"))
      .orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkMax = base
      .groupBy(col("symbol"), col("__chunk"))
      .agg(max(close).as("__cmax"))
      .withColumn("__prev_peak", max(col("__cmax")).over(wPrev))
      .drop("__cmax")
    val peak = when(col("__prev_peak").isNull, col("__local"))
      .otherwise(greatest(col("__local"), col("__prev_peak")))
    base
      .withColumn("__local", max(close).over(wLocal))
      .join(chunkMax, Seq("symbol", "__chunk"))
      .withColumn("running_peak", peak)
      .withColumn(
        "drawdown_pct",
        when(col("running_peak") =!= 0, (close - col("running_peak")) / col("running_peak") * 100))
      .drop("__chunk", "__local", "__prev_peak")
  }

  /** True range and its n-candle simple average (the SMA-smoothed ATR
    * variant — Wilder's recursive smoothing is an EMA, see [[emaMacd]]
    * for the sequential machinery). First candle of a symbol has no
    * previous close: TR falls back to high−low (standard convention).
    *
    * Same trailing-frame shape as [[Analytics.withIndicators]]; for
    * tick-scale inputs partition by (symbol, chunk) via the borrowing
    * pattern there — candle inputs are already resampled/bounded. */
  def withAtr(candles: DataFrame, n: Int, order: Column): DataFrame = {
    val w     = Window.partitionBy(col("symbol")).orderBy(order.asc)
    val frame = w.rowsBetween(-(n - 1), 0)
    val prev  = lag(col("close"), 1).over(w)
    val tr = when(prev.isNull, col("high") - col("low"))
      .otherwise(
        greatest(
          col("high") - col("low"),
          abs(col("high") - prev),
          abs(col("low") - prev)))
    candles
      .withColumn("tr", tr)
      .withColumn(
        "atr",
        sum(dec(col("tr"), 6)).over(frame).cast("double") / count(col("tr")).over(frame))
  }

  /** Stochastic oscillator %K over the trailing n candles:
    * (close − lowest low) / (highest high − lowest low) · 100. Pure
    * frame min/max (exact selection) + one fixed-order double
    * expression; null when the range is degenerate. */
  def withStochastic(candles: DataFrame, n: Int, order: Column): DataFrame = {
    val frame = Window.partitionBy(col("symbol")).orderBy(order.asc).rowsBetween(-(n - 1), 0)
    val ll    = min(col("low")).over(frame)
    val hh    = max(col("high")).over(frame)
    candles
      .withColumn("lowest_low", ll)
      .withColumn("highest_high", hh)
      .withColumn(
        "stoch_k",
        when(col("highest_high") > col("lowest_low"),
          (col("close") - col("lowest_low"))
            / (col("highest_high") - col("lowest_low")) * 100))
  }

  /** On-balance volume: running sum of volume signed by the close
    * direction (exact decimal cumulative sum). First candle of a
    * symbol contributes 0 (no direction). */
  def withObv(candles: DataFrame, order: Column): DataFrame = {
    val w    = Window.partitionBy(col("symbol")).orderBy(order.asc)
    val prev = lag(col("close"), 1).over(w)
    val signed = when(prev.isNull, lit(0.0))
      .when(col("close") > prev, col("volume"))
      .when(col("close") < prev, -col("volume"))
      .otherwise(lit(0.0))
    candles.withColumn(
      "obv",
      sum(dec(signed, 4)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double"))
  }

  // NOT private: the codegen'd encoder projections must reach them.
  case class DailyClose(symbol: String, trade_date: java.sql.Date, close: Double)
  case class EmaRow(
      symbol: String,
      trade_date: java.sql.Date,
      close: Double,
      ema12: Double,
      ema26: Double,
      macd: Double,
      signal: Double,
      histogram: Double)

  /** EMA(12)/EMA(26)/MACD/signal(9) per symbol over a daily close
    * series — the one inherently SEQUENTIAL indicator (EMA_t depends on
    * EMA_{t−1}), done the honest distributed way: one shuffle on
    * symbol, a sort within partitions, then a streaming O(1)-state
    * linear scan per partition (`mapPartitions`, state reset on symbol
    * change). No window, no collect, no per-group materialization —
    * memory is constant regardless of history length.
    *
    * Seeding convention (stated, since conventions differ): EMA seeds
    * at the first close (so MACD starts at 0), signal seeds at the
    * first MACD. α = 2/(n+1). Each step is
    * `α·close + (1−α)·prev` — two multiplies and an add in fixed
    * order, bit-reproducible against the oracle's recursive CTE.
    *
    * Scale: parallelism = symbols. A daily series is ≤ a few thousand
    * rows per symbol-decade, so the scan is trivially cheap; the input
    * being the pre-aggregated DAILY relation (not ticks) is what makes
    * this shape right at 100 TB. */
  def emaMacd(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val a12 = 2.0 / 13.0
    val a26 = 2.0 / 27.0
    val a9  = 2.0 / 10.0
    daily
      .select(
        col("symbol").cast("string").as("symbol"),
        col("trade_date"),
        col("close").cast("double").as("close"))
      .as[DailyClose]
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("trade_date"))
      .mapPartitions { it =>
        var sym: String = null
        var e12, e26, sig = 0.0
        it.map { r =>
          if (r.symbol != sym) {
            sym = r.symbol
            e12 = r.close
            e26 = r.close
            sig = 0.0 // first macd is e12 - e26 = 0, and signal seeds at it
          } else {
            e12 = a12 * r.close + (1.0 - a12) * e12
            e26 = a26 * r.close + (1.0 - a26) * e26
            val macd = e12 - e26
            sig = a9 * macd + (1.0 - a9) * sig
          }
          val macd = e12 - e26
          EmaRow(r.symbol, r.trade_date, r.close, e12, e26, macd, sig, macd - sig)
        }
      }
      .toDF()
  }

  /** Per-symbol moments (exact decimal sums → deterministic mean and
    * sample stddev) — the reference relation for [[zScoreAgainst]].
    * One hash-aggregate; symbols × 3 columns, always broadcastable. */
  def valueStats(ticks: DataFrame, value: Column): DataFrame =
    ticks
      .groupBy(col("symbol"))
      .agg(
        graft.functions.Det.davg(value).as("__mean"),
        graft.functions.Det.dstddev(value).as("__sd"))

  /** Rows more than `k` sample standard deviations from their symbol's
    * PRECOMPUTED mean ([[valueStats]] output, broadcast): a map-only
    * gate that works identically on a batch frame or a STREAM
    * (stream-static broadcast join — the standard "score live data
    * against reference statistics" shape; no streaming state). */
  def zScoreAgainst(df: DataFrame, stats: DataFrame, value: Column, k: Double): DataFrame =
    df.join(broadcast(stats), "symbol")
      .withColumn("z", when(col("__sd") > 0, (value - col("__mean")) / col("__sd")))
      .filter(abs(col("z")) >= k)
      .drop("__mean", "__sd")

  /** Ticks more than `k` sample standard deviations from their
    * symbol's mean — the basic data-quality / outlier screen. One
    * hash-aggregate for the per-symbol moments, then the broadcast
    * gate: the tick relation is never shuffled. */
  def zScoreAnomalies(ticks: DataFrame, value: Column, k: Double): DataFrame =
    zScoreAgainst(ticks, valueStats(ticks, value), value, k)

  /** Pairwise Pearson correlation between symbols over an aligned
    * per-(symbol, key) series (e.g. daily price change): self-join on
    * the key (symbol_a < symbol_b), then one hash-aggregate of exact
    * integer moments; the closed-form correlation is evaluated in a
    * fixed double expression order. Pairs with zero variance on either
    * side yield null.
    *
    * The series is quantized to `round(x · scale)` integer ticks first
    * (scale = 100 ⇒ cents) — correlation is invariant to affine
    * scaling, and integer moments make the result bit-reproducible:
    * casting full-mantissa double PRODUCTS to scaled decimals rounds
    * differently across engines (measured: last-ulp corr drift vs
    * DuckDB), while integer sums are exact everywhere. Same trick as
    * [[graft.functions.Portable.quantize]] for embeddings.
    *
    * Scale: the input is a pre-aggregated (symbol, day) relation —
    * |days|·|symbols|² candidate rows through one shuffle on the key,
    * then a |symbols|²-row result. Never runs on ticks. */
  def correlationMatrix(series: DataFrame, key: Column, x: Column, scale: Long = 100L): DataFrame = {
    val s = series.select(
      col("symbol"), key.as("__k"), round(x * scale).cast("long").as("__x"))
    val joined = s.as("a")
      .join(s.as("b"), col("a.__k") === col("b.__k") && col("a.symbol") < col("b.symbol"))
      .select(
        col("a.symbol").as("sym_a"),
        col("b.symbol").as("sym_b"),
        col("a.__x").as("xa"),
        col("b.__x").as("xb"))
    // Operands cast to decimal BEFORE the product: a long*long product
    // wraps silently above ~3e9 per operand (where DuckDB's BIGINT
    // raises instead), so the products are computed in Decimal(38,0)
    // end-to-end — exact for any |x·scale| the quantization emits.
    def dec(c: Column)  = c.cast(DecimalType(38, 0))
    def isum(c: Column) = sum(c).cast("double")
    val agg = joined
      .groupBy(col("sym_a"), col("sym_b"))
      .agg(
        count(lit(1)).as("n"),
        isum(dec(col("xa"))).as("sx"),
        isum(dec(col("xb"))).as("sy"),
        isum(dec(col("xa")) * dec(col("xb"))).as("sxy"),
        isum(dec(col("xa")) * dec(col("xa"))).as("sxx"),
        isum(dec(col("xb")) * dec(col("xb"))).as("syy"))
    val vx = agg("n") * agg("sxx") - agg("sx") * agg("sx")
    val vy = agg("n") * agg("syy") - agg("sy") * agg("sy")
    agg.select(
      col("sym_a"),
      col("sym_b"),
      col("n"),
      when(vx > 0 && vy > 0, (agg("n") * agg("sxy") - agg("sx") * agg("sy")) / (sqrt(vx) * sqrt(vy)))
        .as("corr"))
  }

  /** OHLCV integrity report per symbol over a candle relation keyed by
    * `bucketStart` epoch seconds: inverted candles (high < low), range
    * violations (high below the body or low above it), non-positive
    * volume, and time-series gaps (consecutive buckets further apart
    * than `bucketSeconds`). One lag window + one hash-aggregate. */
  def qualityReport(candles: DataFrame, bucketStart: Column, bucketSeconds: Long): DataFrame = {
    val w   = Window.partitionBy(col("symbol")).orderBy(bucketStart.asc)
    val gap = bucketStart - lag(bucketStart, 1).over(w)
    candles
      .withColumn("__gap", gap)
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_candles"),
        count(when(col("high") < col("low"), 1)).as("n_inverted"),
        count(when(
          col("high") < greatest(col("open"), col("close")) ||
            col("low") > least(col("open"), col("close")), 1)).as("n_range_violations"),
        count(when(col("volume") <= 0, 1)).as("n_nonpos_volume"),
        count(when(col("__gap") > bucketSeconds, 1)).as("n_gaps"),
        max(col("__gap")).as("max_gap_seconds"))
  }

  /** Per-symbol risk summary over a daily-change relation: annualized
    * Sharpe ratio and beta against the MARKET COMPOSITE — defined as
    * the day's SUM of quantized per-symbol changes (an equal-dollar
    * composite index). Sum, not mean, deliberately: the mean would put
    * a per-day integer DIVISION inside the aggregation (floor error ×
    * engine-specific rounding), while beta against the sum is the same
    * economic quantity up to the constituent-count factor and keeps
    * every aggregated term an exact integer. Only the final
    * closed-form ratios are double — single correctly-rounded IEEE ops
    * from identical integers, bit-stable across partitionings and the
    * oracle ([[correlationMatrix]]'s contract).
    *
    * Scale shape: input is the pre-aggregated (symbol, day) relation;
    * one |days|-row composite aggregate joined back (broadcast-shaped
    * under AQE — days ≪ rows), one hash-agg to |symbols| rows.
    * Sharpe is null when n < 2 or the variance is 0; beta null when
    * the market variance is 0. */
  def riskStats(
      daily: DataFrame,
      key: Column,
      change: Column,
      scale: Long = 100L,
      annualization: Int = 252): DataFrame = {
    val s = daily.select(col("symbol"), key.as("__k"), round(change * scale).cast("long").as("__x"))
    val mkt = s.groupBy(col("__k")).agg(sum(col("__x")).as("__m"))
    def dec(c: Column)  = c.cast(DecimalType(38, 0))
    def isum(c: Column) = sum(c).cast("double")
    val agg = s
      .join(mkt, Seq("__k"))
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_days"),
        isum(dec(col("__x"))).as("sx"),
        isum(dec(col("__x")) * dec(col("__x"))).as("sxx"),
        isum(dec(col("__m"))).as("sm"),
        isum(dec(col("__m")) * dec(col("__m"))).as("smm"),
        isum(dec(col("__x")) * dec(col("__m"))).as("sxm"))
    val n    = col("n_days")
    val varX = n * col("sxx") - col("sx") * col("sx") // n²·(n−1)/n · sample var
    val varM = n * col("smm") - col("sm") * col("sm")
    agg.select(
      col("symbol"),
      n,
      (col("sx") / scale / n).as("mean_change"),
      when(n >= 2 && varX > 0, sqrt(varX / (n * (n - 1))) / scale).as("vol"),
      when(n >= 2 && varX > 0,
        (col("sx") / n) / sqrt(varX / (n * (n - 1))) * sqrt(lit(annualization.toDouble)))
        .as("sharpe_ann"),
      when(varM > 0, (n * col("sxm") - col("sx") * col("sm")) / varM).as("beta"))
  }

  /** Donchian channels over a candle relation: rolling `n`-bucket
    * highest high / lowest low (current bucket inclusive), the channel
    * midpoint, and breakout flags against the PREVIOUS bucket's
    * channel (close beyond yesterday's band — the classic turtle
    * entry; comparing against the current channel would be vacuous,
    * the close can never exceed a max that includes its own bucket).
    *
    * Exactness: rolling max/min and lag move values UNCHANGED (no
    * accumulation), the midpoint is one double add + halve — nothing
    * to quantize. Scale: both frames share one (symbol, order) sort —
    * a single window exchange; per-symbol sequential semantics are
    * inherent (the [[emaMacd]] contract note applies). */
  def withDonchian(candles: DataFrame, n: Int, order: Column): DataFrame = {
    require(n >= 1, s"channel length must be positive (got $n)")
    val wRoll = Window.partitionBy(col("symbol")).orderBy(order.asc).rowsBetween(-(n - 1), 0)
    val wLag  = Window.partitionBy(col("symbol")).orderBy(order.asc)
    candles
      .withColumn("dc_high", max(col("high")).over(wRoll))
      .withColumn("dc_low", min(col("low")).over(wRoll))
      .withColumn("dc_mid", (col("dc_high") + col("dc_low")) / 2)
      .withColumn("breakout_up", col("close") > lag(col("dc_high"), 1).over(wLag))
      .withColumn("breakout_down", col("close") < lag(col("dc_low"), 1).over(wLag))
  }
}
