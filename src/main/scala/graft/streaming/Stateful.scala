package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

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
}
