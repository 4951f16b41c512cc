package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * — the escape hatch for semantics windowed aggregation can't express
  * (SURVEY §2.7 T5/T6 extension).
  *
  * Semantics contract: `runningOhlc` is a running fold over the rows
  * it is FED — volume and n count every arriving row. Feed it
  * [[OhlcvStream.dedupedStream]] output when each candle must count
  * once (the T4 re-fetch pipeline); fed raw re-fetches it still keeps
  * `close` deterministic, because the state remembers the last
  * first/last (ts, fetch) pairs and a candle only takes over `open`/
  * `close` when its (ts, fetch) is older/newer respectively — across
  * trigger boundaries too. `high`/`low`/`volume`/`n` fold EVERY
  * arriving row including superseded re-fetches (deduplicate upstream
  * when that matters). Null fetch stamps sort/compare as empty
  * strings (oldest).
  */
object Stateful {

  /** Input row: one normalized candle. `fetch_timestamp` breaks
    * duplicate-timestamp ties (the T4 re-fetch scenario) exactly like
    * the batch D2 contract. */
  case class CandleIn(
      symbol_clean: String,
      timestamp_unix: Long,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      fetch_timestamp: String)

  /** Running per-symbol OHLC accumulator (the "live daily candle"):
    * open of the earliest candle by (ts, fetch), close of the latest,
    * running high/low/volume/count. `first_fetch`/`last_fetch` keep
    * both tie-breaks deterministic across trigger boundaries. */
  case class RunningOhlc(
      symbol: String,
      first_ts: Long,
      last_ts: Long,
      first_fetch: String,
      last_fetch: String,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      n: Long)

  private def fetchOf(r: CandleIn): String =
    if (r.fetch_timestamp == null) "" else r.fetch_timestamp

  private def fold(acc: RunningOhlc, r: CandleIn): RunningOhlc = {
    val f = fetchOf(r)
    val newerClose =
      r.timestamp_unix > acc.last_ts ||
        (r.timestamp_unix == acc.last_ts && f >= acc.last_fetch)
    // open mirrors close: latest fetch wins the earliest timestamp
    val olderOpen =
      r.timestamp_unix < acc.first_ts ||
        (r.timestamp_unix == acc.first_ts && f >= acc.first_fetch)
    RunningOhlc(
      symbol = acc.symbol,
      first_ts = math.min(acc.first_ts, r.timestamp_unix),
      last_ts = math.max(acc.last_ts, r.timestamp_unix),
      first_fetch = if (olderOpen) f else acc.first_fetch,
      last_fetch = if (newerClose) f else acc.last_fetch,
      open = if (olderOpen) r.open else acc.open,
      high = math.max(acc.high, r.high),
      low = math.min(acc.low, r.low),
      close = if (newerClose) r.close else acc.close,
      volume = acc.volume + r.volume,
      n = acc.n + 1)
  }

  /** Streaming (or batch) per-symbol running OHLC. Use with
    * `OutputMode.Update`: each trigger emits the refreshed accumulator
    * for symbols that received data. */
  def runningOhlc(spark: SparkSession, ds: Dataset[CandleIn]): Dataset[RunningOhlc] = {
    import spark.implicits._
    ds.groupByKey(_.symbol_clean)
      .mapGroupsWithState[RunningOhlc, RunningOhlc](GroupStateTimeout.NoTimeout) {
        (sym, rows, state: GroupState[RunningOhlc]) =>
          val init = state.getOption.getOrElse(
            RunningOhlc(sym, Long.MaxValue, Long.MinValue, "", "", 0.0,
              Double.NegativeInfinity, Double.PositiveInfinity, 0.0, 0L, 0L))
          // total order (ts, fetch): duplicate-timestamp re-fetches in
          // one trigger fold deterministically, latest fetch last
          val updated = rows.toSeq
            .sortBy(r => (r.timestamp_unix, fetchOf(r)))
            .foldLeft(init)(fold)
          state.update(updated)
          updated
      }
  }

  /** Output mode the accumulator requires. */
  val outputMode: OutputMode = OutputMode.Update()

  /** Streaming keep-latest dedup — the stream honoring the batch D2
    * engine contract (survivor of a duplicate (symbol, ts) key = row
    * with the max `fetch_timestamp`, [[graft.operators.Dedup.keepLatest]])
    * instead of [[OhlcvStream.dedupedStream]]'s first-arrival
    * approximation: a late re-fetch carrying a NEWER fetch stamp
    * replaces the earlier row, and the replacement is emitted as an
    * update. Run with `OutputMode.Update` and an upserting sink.
    *
    * Mechanics: `flatMapGroupsWithState` keyed on (symbol, ts); state
    * is the current survivor; a trigger's rows fold to their max-fetch
    * row, and the survivor is emitted ONLY when it changes (first
    * arrival, or a strictly newer fetch — equal stamps keep the
    * incumbent, the same arbitrary-among-full-ties outcome as the
    * batch row_number sort). State is bounded exactly like
    * `dropDuplicates` under a watermark: an event-time timeout at
    * event + `stateRetentionMs` removes the key once the watermark
    * passes it, and the watermark's late filter drops stragglers that
    * can no longer find their state. One key = one 8-field struct, the
    * same footprint as the built-in dedup's key set.
    *
    * `normalizedStream` must carry the normalized columns of
    * [[CandleIn]]; `stateRetentionMs` must be ≥ the watermark delay or
    * a key could time out while rows for it are still admissible. */
  def keepLatestDedup(
      spark: SparkSession,
      normalizedStream: DataFrame,
      watermarkDelay: String = "1 day",
      stateRetentionMs: Long = 24L * 3600 * 1000): Dataset[CandleIn] = {
    import spark.implicits._
    val withEt = normalizedStream
      .withColumn("event_time", to_timestamp(from_unixtime(col("timestamp_unix"))))
      .withWatermark("event_time", watermarkDelay)
      .select(
        col("symbol_clean"), col("timestamp_unix"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("fetch_timestamp"), col("event_time"))
      .as[CandleIn]
    withEt
      .groupByKey(r => (r.symbol_clean, r.timestamp_unix))
      .flatMapGroupsWithState[CandleIn, CandleIn](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state: GroupState[CandleIn]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val incoming = rows.reduceLeft((a, b) => if (fetchOf(b) > fetchOf(a)) b else a)
            val prior    = state.getOption
            val survivor = prior match {
              case Some(cur) if fetchOf(cur) >= fetchOf(incoming) => cur
              case _                                              => incoming
            }
            state.update(survivor)
            state.setTimeoutTimestamp(key._2 * 1000L + stateRetentionMs)
            if (prior.contains(survivor)) Iterator.empty else Iterator.single(survivor)
          }
      }
  }
}
