package graft.queries

import graft.Tables
import graft.functions.Det._
import graft.operators.{Analytics, AsOfJoin, Behavior, Dedup, Indicators, Layout, Ranking, RangeJoin, Resample, Scd, Sessionize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's OHLCV analytics surface (SURVEY §2.3–§2.6) exercised
  * over the `events` table: symbol := event_type, price := value,
  * volume := value, tie-break := event_id. Same operators run over real
  * candle frames in the ScalaTest fixtures (graft.ohlcv).
  */
object TimeSeries {

  /** Ticks viewed as degenerate candles (open=high=low=close=value). */
  private def ticksAsCandles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_type").as("symbol"),
      col("ts"),
      col("value").as("open"),
      col("value").as("high"),
      col("value").as("low"),
      col("value").as("close"),
      col("value").as("volume"),
      col("event_id"))

  // The daily rollup is consumed three ways (q22 export, q23 top-k,
  // q81 deciles — where globalRank's bounds scalar would otherwise
  // re-aggregate the ticks): one materialized aggregate, shared.
  private val dailyCache = new DirCached("daily")
  private def sharedDaily(s: SparkSession, dir: String): DataFrame =
    dailyCache(s, dir)(Analytics.dailyStats(ticksAsCandles(s, dir), col("event_id")))

  /** Hourly candles built from ticks; time key = epoch-second bucket. */
  private def hourlyCandles(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    Resample.ticksToCandles(e, col("event_type"), col("ts"), col("value"), col("value"), col("event_id"), 3600)
  }

  // Oracle fragment: hourly candles from events (shared by several
  // oracles). Bucket uses FLOOR-mod ((x%n+n)%n) to match Spark's pmod
  // — DuckDB's bare % truncates toward zero, which would diverge for
  // pre-1970 timestamps (the reference's Python // floors too).
  private val hourlyCandlesSql =
    """WITH t AS (
         SELECT event_type AS symbol,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - ((CAST(floor(epoch(ts)) AS BIGINT) % 3600 + 3600) % 3600) AS bucket_start,
                value, ts, event_id
         FROM events
       ), r AS (
         SELECT *,
                row_number() OVER (PARTITION BY symbol, bucket_start ORDER BY ts, event_id) AS rn_a,
                row_number() OVER (PARTITION BY symbol, bucket_start ORDER BY ts DESC, event_id DESC) AS rn_d
         FROM t
       ), candles AS (
         SELECT symbol, bucket_start,
                MAX(CASE WHEN rn_a=1 THEN value END) AS open,
                MAX(value) AS high, MIN(value) AS low,
                MAX(CASE WHEN rn_d=1 THEN value END) AS close,
                CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS volume,
                COUNT(1) AS n_ticks
         FROM r GROUP BY symbol, bucket_start
       )"""

  // Oracle fragment: per-(symbol, day) stats over ticks-as-candles.
  private val dailyStatsSql =
    """WITH r AS (
         SELECT event_type AS symbol, CAST(ts AS DATE) AS trade_date, value, ts, event_id,
                row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn_a,
                row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn_d
         FROM events
       ), stats AS (
         SELECT symbol, trade_date,
                MAX(CASE WHEN rn_a=1 THEN value END) AS open,
                MAX(CASE WHEN rn_d=1 THEN value END) AS close,
                MAX(value) AS high, MIN(value) AS low,
                CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS volume,
                CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)/COUNT(value) AS avg_price,
                COUNT(1) AS num_records
         FROM r GROUP BY symbol, trade_date
       ), daily AS (
         SELECT symbol, trade_date, open, close, high, low, volume, avg_price, num_records,
                close - open AS price_change,
                CASE WHEN open <> 0 THEN (close - open) / open * 100 ELSE 0.0 END AS price_change_pct
         FROM stats
       )"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A6: epoch-aligned interval resample (api/api_handler.py:788-834).
    "q21_resample_1h" -> ((s, dir) => hourlyCandles(s, dir)),

    // A1/A2: per-(symbol, day) OHLCV rollup (lambda_analytics.py:146-166).
    "q22_daily_stats" -> ((s, dir) => sharedDaily(s, dir)),

    // A4: top-5 gainers by pct change (lambda_analytics.py:360-430).
    "q23_top_movers" -> ((s, dir) =>
      Analytics.topMoversFromDaily(sharedDaily(s, dir), 5, gainers = true)),

    // O6/T5: latest candle per symbol (api/api_handler.py:479-514).
    "q24_latest_per_symbol" -> ((s, dir) =>
      Analytics.latestPerSymbol(ticksAsCandles(s, dir), col("event_id"))),

    // P16: derived analysis columns over hourly candles
    // (sql/athena_parquet_tables.sql:60-64).
    "q25_derived_columns" -> ((s, dir) => {
      Analytics.withDerivedColumns(hourlyCandles(s, dir))
        .select(col("symbol"), col("bucket_start"), col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("price_change"), col("price_change_percent"), col("daily_range"),
          col("volatility_percent"))
    }),

    // W1–W4: the reference's CTE+window daily-return comparison
    // (sql/athena_parquet_tables.sql:117-144).
    "q26_daily_returns_window" -> ((s, dir) =>
      Analytics.dailyReturnComparison(ticksAsCandles(s, dir), col("event_id"))),

    // D2: dedup keep-latest-version (api/api_handler.py:418-425, engine
    // contract per SURVEY §7.4.1): one survivor per (user_id, event_type).
    "q27_dedup_keep_latest" -> ((s, dir) =>
      Dedup.keepLatest(
        Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")),
        keys = Seq(col("user_id"), col("event_type")),
        version = Seq(col("ts"), col("event_id")))),

    // §2.8 extension: technical indicators (SMA-20, Bollinger, RSI)
    // as deterministic decimal-frame window expressions. Chunked by
    // day so the window spreads over (symbol × day) reducers instead
    // of one per symbol — bit-identical to the global window (borrowed
    // trailing rows), proven by the unchanged oracle hash.
    "q29_indicators" -> ((s, dir) =>
      Analytics.withIndicatorsChunked(
        ticksAsCandles(s, dir), 20, col("event_id"), to_date(col("ts")), validate = true)
        .select(col("symbol"), col("ts"), col("event_id"), col("close"),
          col("sma"), col("bollinger_upper"), col("bollinger_lower"), col("rsi"))),

    // Extension (SURVEY §2.6): as-of backward join — each view event
    // picks up the user's most recent purchase at or before it.
    // Union-tag + window: one shuffle, linear, no per-key quadratics.
    "q42_asof_join" -> ((s, dir) => {
      val e     = Tables.events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val purch = Dedup.keepLatest(
        e.filter(col("event_type") === "purchase"),
        keys = Seq(col("user_id"), col("ts")),
        version = Seq(col("event_id")))
      AsOfJoin.backward(
        views, purch,
        key = col("user_id"),
        leftTime = col("ts"),
        rightTime = col("ts"),
        rightTieBreak = col("event_id"),
        payload = Seq("purchase_ts" -> col("ts"), "purchase_value" -> col("value")))
    }),

    // As-of with a freshness bound (pandas merge_asof tolerance): the
    // q42 join, but purchases older than 1h are nulled — same plan
    // plus one projection.
    "q77_asof_tolerance" -> ((s, dir) => {
      val e     = Tables.events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val purch = Dedup.keepLatest(
        e.filter(col("event_type") === "purchase"),
        keys = Seq(col("user_id"), col("ts")),
        version = Seq(col("event_id")))
      AsOfJoin.backward(
        views, purch,
        key = col("user_id"),
        leftTime = col("ts"),
        rightTime = col("ts"),
        rightTieBreak = col("event_id"),
        payload = Seq("purchase_ts" -> col("ts"), "purchase_value" -> col("value")),
        tolerance = Some(3600L))
    }),

    // Extension (T6): gap-based sessionization per user (1h gap),
    // exact-microsecond break rule, per-session rollup.
    "q46_sessionize" -> ((s, dir) =>
      Sessionize.sessions(
        Tables.events(s, dir),
        key = col("user_id"), ts = col("ts"), tieBreak = col("event_id"),
        gapSeconds = 3600L, value = col("value"))
        .withColumnRenamed("key", "user_id")),

    // Extension: sketch/approx aggregates (HLL distinct, t-digest
    // percentile) with a HARD oracle signal: sketch internals stay
    // engine-specific, so the raw estimates are not exported — instead
    // the exact aggregates run in the SAME single-pass groupBy and the
    // output carries deterministic in-bounds verdicts. users_ok:
    // |approx − exact| ≤ 10% of exact (HLL++ default rsd 5% ⇒ 2σ).
    // p50_ok: the approx median (an actual data element, rank error
    // ≤ n/1000) lies within the exact [p40, p60] value window — both
    // bounds computed Spark-side, so only the BOOLEAN crosses engines
    // and float interpolation drift cannot flake the hash. The oracle
    // asserts the exact columns and TRUE verdicts: a sketch gone out
    // of bounds turns the row red instead of "no_oracle".
    "q47_approx_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("__approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("__approx_p50"),
          expr("percentile(value, 0.4)").as("__p40"),
          expr("percentile(value, 0.6)").as("__p60"))
        .select(
          col("event_type"), col("n"), col("exact_users"),
          (abs(col("__approx_users") - col("exact_users")) <=
            col("exact_users").cast("double") * 0.1).as("users_ok"),
          (col("__approx_p50") >= col("__p40") &&
            col("__approx_p50") <= col("__p60")).as("p50_ok"))),

    // Extension: bucketized range join — views falling inside each
    // user's daily purchase-activity interval [first, last purchase].
    // Equi-join on (user, 6h bucket) + exact BETWEEN, never a per-key
    // cross product.
    "q50_range_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val intervals = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(min(col("ts")).as("iv_start"), max(col("ts")).as("iv_end"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val matched = RangeJoin.pointInInterval(
        views, col("ts"), intervals, col("iv_start"), col("iv_end"),
        key = "user_id", bucketSeconds = 6 * 3600L)
      val counts = matched
        .groupBy(col("user_id"), col("d"))
        .agg(count(lit(1)).as("n_views"), dsum(col("value")).as("views_value"))
      intervals
        .join(counts, Seq("user_id", "d"), "left")
        .select(col("user_id"), col("d"), col("iv_start"), col("iv_end"),
          coalesce(col("n_views"), lit(0L)).as("n_views"), col("views_value"))
    }),

    // A3: per-day stats for one symbol over a date range
    // (lambda_analytics.py:274-357).
    "q28_date_range" -> ((s, dir) =>
      Analytics.dateRange(ticksAsCandles(s, dir), "purchase", "2024-01-05", "2024-01-15", col("event_id"))
        .select(col("symbol"), col("trade_date"), col("open"), col("close"), col("high"), col("low"),
          col("volume"), col("avg_price"), col("num_records"), col("price_change"), col("price_change_pct"))),

    // Indicator-pack extensions (§2.8, the surface api_config.json
    // advertises): VWAP, drawdown, ATR, correlation, anomaly screen,
    // integrity report, EMA/MACD.

    // Cumulative intraday VWAP per (symbol, day) — one row per tick,
    // windows parallel across (symbol × day).
    "q65_vwap" -> ((s, dir) =>
      Indicators.withVwap(ticksAsCandles(s, dir), col("close"), col("volume"), col("event_id"))
        .select(col("symbol"), col("ts"), col("event_id"), col("close"), col("vwap"))),

    // Running peak + drawdown-from-peak over hourly candles, two-pass
    // (per-day local max ⊕ prefix max of prior day maxima) so no
    // symbol funnels its whole history through one reducer.
    "q66_drawdown" -> ((s, dir) =>
      Indicators.withDrawdown(
        hourlyCandles(s, dir), col("close"), col("bucket_start"),
        col("bucket_start") - pmod(col("bucket_start"), lit(86400L)))
        .select(col("symbol"), col("bucket_start"), col("close"),
          col("running_peak"), col("drawdown_pct"))),

    // True range + 14-candle average (SMA-smoothed ATR) over hourly
    // candles.
    "q67_atr" -> ((s, dir) =>
      Indicators.withAtr(hourlyCandles(s, dir), 14, col("bucket_start"))
        .select(col("symbol"), col("bucket_start"), col("tr"), col("atr"))),

    // Pairwise Pearson correlation of daily price CHANGE (close−open,
    // quantized to cents) between symbols — exact integer moments,
    // closed form.
    "q68_corr_matrix" -> ((s, dir) =>
      Indicators.correlationMatrix(
        Analytics.dailyStats(ticksAsCandles(s, dir), col("event_id"))
          .select(col("symbol"), col("trade_date"), col("price_change")),
        col("trade_date"), col("price_change"))),

    // Ticks ≥ 3 sample standard deviations from their symbol mean —
    // one moments aggregate, broadcast join back, map-only filter.
    "q69_anomalies" -> ((s, dir) =>
      Indicators.zScoreAnomalies(ticksAsCandles(s, dir), col("close"), 3.0)
        .select(col("symbol"), col("ts"), col("event_id"), col("close"), col("z"))),

    // OHLCV integrity report per symbol over hourly candles: inverted
    // candles, body-range violations, non-positive volume, time gaps.
    "q70_ohlcv_quality" -> ((s, dir) =>
      Indicators.qualityReport(hourlyCandles(s, dir), col("bucket_start"), 3600L)),

    // EMA(12)/EMA(26)/MACD/signal(9) over daily closes — the
    // inherently sequential indicator, as a per-symbol streaming scan
    // (one shuffle, O(1) state), never a collect.
    "q71_ema_macd" -> ((s, dir) =>
      Indicators.emaMacd(
        Analytics.dailyStats(ticksAsCandles(s, dir), col("event_id"))
          .select(col("symbol"), col("trade_date"), col("close")))),

    // Forward as-of: each view picks up the user's NEXT purchase at or
    // after it (conversion attribution) — q42 mirrored.
    "q78_asof_forward" -> ((s, dir) => {
      val e     = Tables.events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val purch = Dedup.keepFirst(
        e.filter(col("event_type") === "purchase"),
        keys = Seq(col("user_id"), col("ts")),
        version = Seq(col("event_id")))
      AsOfJoin.forward(
        views, purch,
        key = col("user_id"),
        leftTime = col("ts"),
        rightTime = col("ts"),
        rightTieBreak = col("event_id"),
        payload = Seq("purchase_ts" -> col("ts"), "purchase_value" -> col("value")))
    }),

    // GROUPING SETS beyond rollup/cube (q12/q18): the mixed-set form
    // with grouping() markers, via the SQL surface like q15.
    "q79_grouping_sets" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_gs")
      s.sql(
        """WITH t AS (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events_gs)
           SELECT event_type, d,
                  CAST(grouping(event_type) AS INT) AS g_type,
                  CAST(grouping(d) AS INT) AS g_d,
                  COUNT(1) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
           FROM t
           GROUP BY GROUPING SETS ((event_type, d), (event_type), ())""")
    }),

    // Fixed-bin value histogram per symbol: 20 bins of width 25,
    // clamped — exact integer bucket arithmetic, one hash-agg.
    "q80_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_type").as("symbol"),
          least(greatest(floor(col("value") / 25.0), lit(0.0)), lit(19.0)).cast("long").as("bin"))
        .groupBy(col("symbol"), col("bin"))
        .agg(count(lit(1)).as("n"))),

    // Cohort retention matrix over users: first-active epoch-week
    // cohorts × week offsets (exact integer week buckets).
    "q90_retention" -> ((s, dir) =>
      Behavior.cohortRetention(Tables.events(s, dir), col("user_id"), col("ts"))),

    // Two-step view→purchase funnel with a 7-day deadline, per cohort
    // week of the first view.
    "q91_funnel" -> ((s, dir) =>
      Behavior.twoStepFunnel(
        Tables.events(s, dir), col("user_id"), col("ts"),
        isFirst = col("event_type") === "view",
        isSecond = col("event_type") === "purchase",
        withinSeconds = 7L * 86400)),

    // Stochastic oscillator %K(14) over hourly candles — trailing
    // frame min/max, exact selection arithmetic.
    "q86_stochastic" -> ((s, dir) =>
      Indicators.withStochastic(hourlyCandles(s, dir), 14, col("bucket_start"))
        .select(col("symbol"), col("bucket_start"), col("close"),
          col("lowest_low"), col("highest_high"), col("stoch_k"))),

    // On-balance volume — direction-signed exact decimal cumsum.
    "q87_obv" -> ((s, dir) =>
      Indicators.withObv(hourlyCandles(s, dir), col("bucket_start"))
        .select(col("symbol"), col("bucket_start"), col("close"), col("obv"))),

    // Rolling exact median over the trailing 14 candles — `percentile`
    // as a WINDOW aggregate (bit-matches DuckDB quantile_cont, like
    // its grouped twin q16). Robust-center smoothing for noisy series.
    "q92_rolling_median" -> ((s, dir) => {
      val frame = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("bucket_start").asc)
        .rowsBetween(-13, 0)
      hourlyCandles(s, dir).select(
        col("symbol"), col("bucket_start"), col("close"),
        expr("percentile(close, 0.5)").over(frame).as("rolling_median"))
    }),

    // Unpivot/melt: the wide daily OHLC rollup to long (metric, value)
    // form — the inverse of q20's pivot, map-only (an Expand node).
    "q82_unpivot" -> ((s, dir) =>
      Analytics.dailyStats(ticksAsCandles(s, dir), col("event_id"))
        .select(col("symbol"), col("trade_date"), col("open"), col("close"), col("high"), col("low"))
        .unpivot(
          Array(col("symbol"), col("trade_date")),
          Array(col("open"), col("close"), col("high"), col("low")),
          "metric", "value")),

    // EXCEPT / INTERSECT cohorts: users who purchased but never
    // viewed vs users who did both — the set-op family beyond q06's
    // UNION.
    "q83_cohorts" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def ids(t: String) =
        e.filter(col("event_type") === t).select(col("user_id")).distinct()
      ids("purchase").except(ids("view")).withColumn("cohort", lit("purchase_only"))
        .unionByName(
          ids("purchase").intersect(ids("view")).withColumn("cohort", lit("both")))
    }),

    // Volume deciles over the per-(symbol, day) rollup via the
    // DISTRIBUTED ntile (Ranking.globalNtile): bit-identical to the
    // SQL window function, but the aggregated relation never funnels
    // through the one-reducer unpartitioned window — the only
    // unpartitioned window left is over the ≤ shards offsets rows.
    "q81_volume_deciles" -> ((s, dir) =>
      Ranking.globalNtile(
        sharedDaily(s, dir)
          .select(col("symbol"), col("trade_date"), col("volume")),
        leadKey = col("volume"),
        tieBreak = Seq(col("symbol"), col("trade_date")),
        buckets = 10,
        tileName = "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), dsum(col("volume")).as("sum_volume"))),

    // SCD2 historization of each user's event_type state: consecutive
    // unchanged rows collapse, each change opens a version with
    // [valid_from, valid_to) epoch-second bounds — the
    // dimension-history counterpart of keep-latest dedup.
    "q100_scd2_history" -> ((s, dir) =>
      Scd.historize(
        Tables.events(s, dir),
        key = col("user_id"),
        ts = graft.functions.Det.epochSec(col("ts")),
        tieBreak = col("event_id"),
        attrs = Seq("event_type" -> col("event_type")))),

    // Z-order (Morton) clustering key over (user bucket, value
    // bucket): the exact per-row interleave a layout pass sorts by so
    // BOTH dimensions prune at row-group level. Map-only — the write
    // path around it is Layout.zOrderWrite (LayoutSpec measures the
    // pruning-span claim directly).
    "q103_zvalue" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        Layout.zValue(Seq(
          pmod(col("user_id"), lit(65536L)),
          Layout.dimBucket(col("value"), 25.0, 20L)), bits = 16).as("z"))),

    // Annualized Sharpe + beta vs the day's equal-dollar composite —
    // exact integer moments end-to-end (correlationMatrix's numeric
    // contract), one |days|-row composite join, one |symbols|-row agg.
    "q122_risk_stats" -> ((s, dir) =>
      Indicators.riskStats(sharedDaily(s, dir), col("trade_date"), col("price_change"))),

    // Donchian channels + turtle breakout flags on hourly candles: two
    // frames over ONE (symbol, time) sort, values move unchanged.
    "q123_donchian" -> ((s, dir) =>
      Indicators.withDonchian(hourlyCandles(s, dir), 20, col("bucket_start"))
        .select(
          col("symbol"), col("bucket_start"), col("close"),
          col("dc_high"), col("dc_low"), col("dc_mid"),
          col("breakout_up"), col("breakout_down")))
  )

  val oracles: Map[String, String] = Map(
    "q21_resample_1h" -> (hourlyCandlesSql +
      " SELECT symbol, bucket_start, open, high, low, close, volume, n_ticks FROM candles"),
    "q22_daily_stats" -> (dailyStatsSql +
      " SELECT symbol, trade_date, open, close, high, low, volume, avg_price, num_records, price_change, price_change_pct FROM daily"),
    "q23_top_movers" -> (dailyStatsSql +
      """ SELECT symbol, trade_date, open, close, high, low, volume, avg_price, num_records, price_change, price_change_pct
          FROM daily ORDER BY price_change_pct DESC, symbol ASC, trade_date ASC LIMIT 5"""),
    "q24_latest_per_symbol" ->
      """WITH r AS (
           SELECT event_type AS symbol, ts, value, event_id,
                  row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
           FROM events
         )
         SELECT symbol, ts, value AS open, value AS high, value AS low, value AS close, value AS volume
         FROM r WHERE rn = 1""",
    "q25_derived_columns" -> (hourlyCandlesSql +
      """ SELECT symbol, bucket_start, open, high, low, close, volume,
            close - open AS price_change,
            CASE WHEN open <> 0 THEN (close - open) / open * 100 ELSE 0.0 END AS price_change_percent,
            high - low AS daily_range,
            CASE WHEN open <> 0 THEN (high - low) / open * 100 ELSE 0.0 END AS volatility_percent
          FROM candles"""),
    "q26_daily_returns_window" ->
      """WITH w AS (
           SELECT event_type AS symbol, CAST(ts AS DATE) AS trade_date,
                  first_value(value) OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts, event_id) AS day_open,
                  last_value(value) OVER (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS day_close,
                  CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS DOUBLE) AS day_volume
           FROM events
         )
         SELECT DISTINCT symbol, trade_date, day_open, day_close,
                (day_close - day_open) / day_open * 100 AS daily_return_percent, day_volume
         FROM w""",
    "q27_dedup_keep_latest" ->
      """WITH r AS (
           SELECT event_id, ts, user_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
           FROM events
         )
         SELECT event_id, ts, user_id, event_type, value FROM r WHERE rn = 1""",
    "q29_indicators" ->
      """WITH c AS (
           SELECT event_type AS symbol, ts, event_id, value AS close FROM events
         ),
         d AS (
           SELECT *, close - lag(close) OVER (PARTITION BY symbol ORDER BY ts, event_id) AS delta FROM c
         ),
         w AS (
           SELECT symbol, ts, event_id, close,
                  COUNT(close) OVER f AS n,
                  CAST(SUM(CAST(close AS DECIMAL(30,6))) OVER f AS DOUBLE) AS s1,
                  CAST(SUM(CAST(close*close AS DECIMAL(30,8))) OVER f AS DOUBLE) AS s2,
                  CAST(SUM(CAST(CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS DECIMAL(30,6))) OVER f AS DOUBLE) AS sg,
                  CAST(SUM(CAST(CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS DECIMAL(30,6))) OVER f AS DOUBLE) AS sl
           FROM d
           WINDOW f AS (PARTITION BY symbol ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         ),
         m AS (
           SELECT symbol, ts, event_id, close,
                  s1 / n AS sma,
                  CASE WHEN n > 1 THEN sqrt(greatest(0.0, (s2 - s1*s1/n) / (n-1))) END AS sd,
                  sg / n AS avg_gain, sl / n AS avg_loss
           FROM w
         )
         SELECT symbol, ts, event_id, close, sma,
                sma + 2.0 * sd AS bollinger_upper,
                sma - 2.0 * sd AS bollinger_lower,
                CASE WHEN avg_loss = 0 THEN 100.0
                     ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END AS rsi
         FROM m""",
    "q42_asof_join" ->
      """WITH v AS (
           SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'view'
         ),
         p0 AS (
           SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'purchase'
         ),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT v.event_id, v.ts, v.user_id, v.value, p.ts AS purchase_ts, p.value AS purchase_value
         FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts""",
    "q77_asof_tolerance" ->
      """WITH v AS (
           SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'view'
         ),
         p0 AS (
           SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'purchase'
         ),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1),
         j AS (
           SELECT v.event_id, v.ts, v.user_id, v.value, p.ts AS pts, p.value AS pvalue
           FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
         )
         SELECT event_id, ts, user_id, value,
                CASE WHEN epoch_us(ts) - epoch_us(pts) <= 3600000000 THEN pts END AS purchase_ts,
                CASE WHEN epoch_us(ts) - epoch_us(pts) <= 3600000000 THEN pvalue END AS purchase_value
         FROM j""",
    "q78_asof_forward" ->
      """WITH v AS (
           SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'view'
         ),
         p0 AS (
           SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
           FROM events WHERE event_type = 'purchase'
         ),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT v.event_id, v.ts, v.user_id, v.value, p.ts AS purchase_ts, p.value AS purchase_value
         FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts""",
    "q79_grouping_sets" ->
      """WITH t AS (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events)
         SELECT event_type, d,
                CAST(GROUPING(event_type) AS INT) AS g_type,
                CAST(GROUPING(d) AS INT) AS g_d,
                COUNT(1) AS n,
                CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM t
         GROUP BY GROUPING SETS ((event_type, d), (event_type), ())""",
    "q80_histogram" ->
      """SELECT event_type AS symbol,
                CAST(least(greatest(floor(value / 25.0), 0.0), 19.0) AS BIGINT) AS bin,
                COUNT(1) AS n
         FROM events GROUP BY 1, 2""",
    "q90_retention" ->
      """WITH e0 AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
         w AS (
           SELECT DISTINCT user_id,
                  CAST((e - ((e % 604800) + 604800) % 604800) / 604800 AS BIGINT) AS wk
           FROM e0
         ),
         c AS (SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY 1)
         SELECT c.cohort_week, w.wk - c.cohort_week AS week_offset, COUNT(1) AS n_users
         FROM w JOIN c USING (user_id) GROUP BY 1, 2""",
    "q91_funnel" ->
      """WITH f AS (
           SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t1
           FROM events WHERE event_type = 'view' GROUP BY 1
         ),
         s AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t2
           FROM events WHERE event_type = 'purchase'
         ),
         pu AS (
           SELECT f.user_id, f.t1, MIN(CASE WHEN s.t2 >= f.t1 THEN s.t2 END) AS t2_first
           FROM f LEFT JOIN s USING (user_id) GROUP BY 1, 2
         ),
         pc AS (
           SELECT user_id, t1, t2_first,
                  (t2_first IS NOT NULL AND t2_first - t1 <= 604800) AS conv
           FROM pu
         )
         SELECT CAST((t1 - ((t1 % 604800) + 604800) % 604800) / 604800 AS BIGINT) AS cohort_week,
                COUNT(1) AS n_entered,
                COUNT(CASE WHEN conv THEN 1 END) AS n_converted,
                CAST(SUM(CAST(CASE WHEN conv THEN t2_first - t1 END AS DECIMAL(28,6))) AS DOUBLE)
                  / COUNT(CASE WHEN conv THEN t2_first - t1 END) AS avg_delay_s
         FROM pc GROUP BY 1""",
    "q86_stochastic" -> (hourlyCandlesSql +
      """ SELECT symbol, bucket_start, close, lowest_low, highest_high,
                 CASE WHEN highest_high > lowest_low
                      THEN (close - lowest_low) / (highest_high - lowest_low) * 100 END AS stoch_k
          FROM (
            SELECT symbol, bucket_start, close,
                   MIN(low) OVER f AS lowest_low,
                   MAX(high) OVER f AS highest_high
            FROM candles
            WINDOW f AS (PARTITION BY symbol ORDER BY bucket_start
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))"""),
    "q87_obv" -> (hourlyCandlesSql +
      """, d AS (
           SELECT symbol, bucket_start, close, volume,
                  lag(close) OVER (PARTITION BY symbol ORDER BY bucket_start) AS pc
           FROM candles
         ),
         sgn AS (
           SELECT symbol, bucket_start, close,
                  CASE WHEN pc IS NULL THEN 0.0
                       WHEN close > pc THEN volume
                       WHEN close < pc THEN -volume
                       ELSE 0.0 END AS sv
           FROM d
         )
         SELECT symbol, bucket_start, close,
                CAST(SUM(CAST(sv AS DECIMAL(30,4))) OVER (PARTITION BY symbol ORDER BY bucket_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS obv
         FROM sgn"""),
    "q92_rolling_median" -> (hourlyCandlesSql +
      """ SELECT symbol, bucket_start, close,
                 quantile_cont(close, 0.5) OVER (PARTITION BY symbol ORDER BY bucket_start
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS rolling_median
          FROM candles"""),
    // UNION ALL form rather than UNPIVOT syntax — portable and
    // column-order-exact.
    "q82_unpivot" -> (dailyStatsSql +
      """ SELECT symbol, trade_date, 'open' AS metric, open AS value FROM daily
          UNION ALL SELECT symbol, trade_date, 'close', close FROM daily
          UNION ALL SELECT symbol, trade_date, 'high', high FROM daily
          UNION ALL SELECT symbol, trade_date, 'low', low FROM daily"""),
    "q83_cohorts" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
         SELECT user_id, 'purchase_only' AS cohort FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM v)
         UNION ALL
         SELECT user_id, 'both' AS cohort FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM v)""",
    "q81_volume_deciles" -> (dailyStatsSql +
      """, nt AS (
           SELECT volume,
                  ntile(10) OVER (ORDER BY volume ASC, symbol ASC, trade_date ASC) AS decile
           FROM daily
         )
         SELECT CAST(decile AS INT) AS decile, COUNT(1) AS n,
                CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS sum_volume
         FROM nt GROUP BY decile"""),
    // The approx-agg verdict oracle: exact aggregates recomputed in
    // DuckDB plus TRUE literals for the in-bounds verdicts — Spark's
    // sketches must land inside their documented error bars or the
    // hash mismatches.
    "q47_approx_agg" ->
      """SELECT event_type, COUNT(1) AS n,
                COUNT(DISTINCT user_id) AS exact_users,
                TRUE AS users_ok, TRUE AS p50_ok
         FROM events GROUP BY 1""",

    "q46_sessionize" ->
      """WITH o AS (
           SELECT user_id, ts, event_id, value,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events
         ),
         f AS (
           SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS brk
           FROM o
         ),
         sid AS (
           SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM f
         )
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                MIN(ts) AS session_start, MAX(ts) AS session_end,
                COUNT(1) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM sid GROUP BY user_id, session_idx""",
    "q50_range_join" ->
      """WITH iv AS (
           SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS iv_start, MAX(ts) AS iv_end
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
         ),
         v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
         m AS (
           SELECT iv.user_id, iv.d, COUNT(1) AS n_views,
                  CAST(SUM(CAST(v.value AS DECIMAL(28,4))) AS DOUBLE) AS views_value
           FROM iv JOIN v ON v.user_id = iv.user_id AND v.ts BETWEEN iv.iv_start AND iv.iv_end
           GROUP BY 1, 2
         )
         SELECT iv.user_id, iv.d, iv.iv_start, iv.iv_end,
                COALESCE(m.n_views, 0) AS n_views, m.views_value
         FROM iv LEFT JOIN m ON m.user_id = iv.user_id AND m.d = iv.d""",
    "q28_date_range" -> (dailyStatsSql +
      """ SELECT symbol, trade_date, open, close, high, low, volume, avg_price, num_records, price_change, price_change_pct
          FROM daily
          WHERE symbol = 'purchase' AND trade_date BETWEEN DATE '2024-01-05' AND DATE '2024-01-15'"""),
    "q65_vwap" ->
      """WITH t AS (
           SELECT event_type AS symbol, ts, event_id, value AS close, value AS volume FROM events
         ),
         w AS (
           SELECT symbol, ts, event_id, close,
                  CAST(SUM(CAST(close*volume AS DECIMAL(30,8))) OVER f AS DOUBLE) AS num,
                  CAST(SUM(CAST(volume AS DECIMAL(30,4))) OVER f AS DOUBLE) AS den
           FROM t
           WINDOW f AS (PARTITION BY symbol, CAST(ts AS DATE) ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )
         SELECT symbol, ts, event_id, close,
                CASE WHEN den <> 0 THEN num / den END AS vwap
         FROM w""",
    "q66_drawdown" -> (hourlyCandlesSql +
      """, p AS (
           SELECT symbol, bucket_start, close,
                  MAX(close) OVER (PARTITION BY symbol ORDER BY bucket_start
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_peak
           FROM candles
         )
         SELECT symbol, bucket_start, close, running_peak,
                CASE WHEN running_peak <> 0
                     THEN (close - running_peak) / running_peak * 100 END AS drawdown_pct
         FROM p"""),
    "q67_atr" -> (hourlyCandlesSql +
      """, d AS (
           SELECT symbol, bucket_start, open, high, low, close,
                  lag(close) OVER (PARTITION BY symbol ORDER BY bucket_start) AS pc
           FROM candles
         ),
         tr0 AS (
           SELECT symbol, bucket_start,
                  CASE WHEN pc IS NULL THEN high - low
                       ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
           FROM d
         )
         SELECT symbol, bucket_start, tr,
                CAST(SUM(CAST(tr AS DECIMAL(30,6))) OVER f AS DOUBLE) / COUNT(tr) OVER f AS atr
         FROM tr0
         WINDOW f AS (PARTITION BY symbol ORDER BY bucket_start
                      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"""),
    "q68_corr_matrix" -> (dailyStatsSql +
      """, j AS (
           SELECT a.symbol AS sym_a, b.symbol AS sym_b,
                  CAST(round(a.price_change * 100) AS BIGINT) AS xa,
                  CAST(round(b.price_change * 100) AS BIGINT) AS xb
           FROM daily a JOIN daily b
             ON a.trade_date = b.trade_date AND a.symbol < b.symbol
         ),
         g AS (
           SELECT sym_a, sym_b, COUNT(1) AS n,
                  CAST(SUM(CAST(xa AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(xb AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(xa*xb AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
                  CAST(SUM(CAST(xa*xa AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(xb*xb AS DECIMAL(38,0))) AS DOUBLE) AS syy
           FROM j GROUP BY sym_a, sym_b
         )
         SELECT sym_a, sym_b, n,
                CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                     THEN (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) END AS corr
         FROM g"""),
    "q69_anomalies" ->
      """WITH t AS (
           SELECT event_type AS symbol, ts, event_id, value AS close FROM events
         ),
         s AS (
           SELECT symbol, COUNT(close) AS n,
                  CAST(SUM(CAST(close AS DECIMAL(28,6))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(close*close AS DECIMAL(30,8))) AS DOUBLE) AS s2
           FROM t GROUP BY symbol
         ),
         m AS (
           SELECT symbol, s1 / n AS mean,
                  CASE WHEN n > 1 THEN sqrt(greatest(0.0, (s2 - s1*s1/n) / (n-1))) END AS sd
           FROM s
         ),
         z AS (
           SELECT t.symbol, t.ts, t.event_id, t.close,
                  CASE WHEN m.sd > 0 THEN (t.close - m.mean) / m.sd END AS z
           FROM t JOIN m USING (symbol)
         )
         SELECT symbol, ts, event_id, close, z FROM z WHERE abs(z) >= 3.0""",
    "q70_ohlcv_quality" -> (hourlyCandlesSql +
      """, d AS (
           SELECT *,
                  bucket_start - lag(bucket_start) OVER (PARTITION BY symbol ORDER BY bucket_start) AS gap
           FROM candles
         )
         SELECT symbol, COUNT(1) AS n_candles,
                COUNT(CASE WHEN high < low THEN 1 END) AS n_inverted,
                COUNT(CASE WHEN high < greatest(open, close) OR low > least(open, close) THEN 1 END)
                  AS n_range_violations,
                COUNT(CASE WHEN volume <= 0 THEN 1 END) AS n_nonpos_volume,
                COUNT(CASE WHEN gap > 3600 THEN 1 END) AS n_gaps,
                MAX(gap) AS max_gap_seconds
         FROM d GROUP BY symbol"""),
    // The oracle mirrors the engine's stated seeding convention (EMA
    // seeds at the first close, signal at the first MACD) and repeats
    // the ema12/ema26 update expressions inline for macd/signal so the
    // double op ORDER is identical to the Scala scan's.
    "q71_ema_macd" ->
      """WITH RECURSIVE d0 AS (
           SELECT event_type AS symbol, CAST(ts AS DATE) AS trade_date, value, ts, event_id,
                  row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                     ORDER BY ts DESC, event_id DESC) AS rn_d
           FROM events
         ),
         daily AS (
           SELECT symbol, trade_date, MAX(CASE WHEN rn_d = 1 THEN value END) AS close
           FROM d0 GROUP BY symbol, trade_date
         ),
         seq AS (
           SELECT symbol, trade_date, close,
                  row_number() OVER (PARTITION BY symbol ORDER BY trade_date) AS rn
           FROM daily
         ),
         r AS (
           SELECT symbol, trade_date, close, rn,
                  close AS ema12, close AS ema26,
                  CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS sig
           FROM seq WHERE rn = 1
           UNION ALL
           SELECT s.symbol, s.trade_date, s.close, s.rn,
                  (2.0/13.0)*s.close + (1 - 2.0/13.0)*r.ema12,
                  (2.0/27.0)*s.close + (1 - 2.0/27.0)*r.ema26,
                  ((2.0/13.0)*s.close + (1 - 2.0/13.0)*r.ema12)
                    - ((2.0/27.0)*s.close + (1 - 2.0/27.0)*r.ema26),
                  (2.0/10.0)*(((2.0/13.0)*s.close + (1 - 2.0/13.0)*r.ema12)
                              - ((2.0/27.0)*s.close + (1 - 2.0/27.0)*r.ema26))
                    + (1 - 2.0/10.0)*r.sig
           FROM r JOIN seq s ON s.symbol = r.symbol AND s.rn = r.rn + 1
         )
         SELECT symbol, trade_date, close, ema12, ema26, macd, sig AS signal,
                macd - sig AS histogram
         FROM r""",

    // SCD2: lag detects changes (IS DISTINCT FROM = the null-safe
    // comparison), lead over the surviving changes closes intervals.
    "q100_scd2_history" ->
      """WITH e AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id, event_type
           FROM events
         ),
         o AS (
           SELECT user_id, t, event_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
           FROM e
         ),
         ch AS (
           SELECT user_id, t, event_id, event_type
           FROM o WHERE event_type IS DISTINCT FROM prev
         )
         SELECT user_id AS key, event_type, t AS valid_from,
                lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to,
                lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL AS is_current,
                row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS version
         FROM ch""",

    // Morton interleave: bit i of dim d → position 2i+d; the SUM over
    // disjoint bit positions is carry-free, so it equals the OR.
    "q103_zvalue" ->
      """WITH d AS (
           SELECT event_id, user_id % 65536 AS a,
                  CAST(LEAST(GREATEST(floor(value / 25), 0), 19) AS BIGINT) AS b
           FROM events
         ),
         bits AS (SELECT unnest(generate_series(0, 15)) AS i)
         SELECT event_id,
                CAST(SUM((((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i + 1))) AS BIGINT) AS z
         FROM d, bits GROUP BY 1""",

    "q122_risk_stats" -> (dailyStatsSql +
      """, x AS (
           SELECT symbol, trade_date, CAST(round(price_change * 100) AS BIGINT) AS x FROM daily
         ),
         m AS (SELECT trade_date, CAST(SUM(x) AS BIGINT) AS mv FROM x GROUP BY 1),
         g AS (
           SELECT symbol, COUNT(1) AS n,
                  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(mv AS DECIMAL(38,0))) AS DOUBLE) AS sm,
                  CAST(SUM(CAST(mv AS DECIMAL(38,0)) * CAST(mv AS DECIMAL(38,0))) AS DOUBLE) AS smm,
                  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(mv AS DECIMAL(38,0))) AS DOUBLE) AS sxm
           FROM x JOIN m USING (trade_date) GROUP BY symbol
         )
         SELECT symbol,
                CAST(n AS BIGINT) AS n_days,
                sx / 100 / n AS mean_change,
                CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
                     THEN sqrt((n*sxx - sx*sx) / (n*(n-1))) / 100 END AS vol,
                CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
                     THEN (sx/n) / sqrt((n*sxx - sx*sx) / (n*(n-1))) * sqrt(252) END AS sharpe_ann,
                CASE WHEN n*smm - sm*sm > 0
                     THEN (n*sxm - sx*sm) / (n*smm - sm*sm) END AS beta
         FROM g"""),

    "q123_donchian" -> (hourlyCandlesSql +
      """, w AS (
           SELECT symbol, bucket_start, close,
                  MAX(high) OVER f AS dc_high,
                  MIN(low) OVER f AS dc_low
           FROM candles
           WINDOW f AS (PARTITION BY symbol ORDER BY bucket_start
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         ),
         l AS (
           SELECT *,
                  lag(dc_high) OVER (PARTITION BY symbol ORDER BY bucket_start) AS ph,
                  lag(dc_low) OVER (PARTITION BY symbol ORDER BY bucket_start) AS pl
           FROM w
         )
         SELECT symbol, bucket_start, close, dc_high, dc_low,
                (dc_high + dc_low) / 2 AS dc_mid,
                close > ph AS breakout_up, close < pl AS breakout_down
         FROM l""")
  )
}
