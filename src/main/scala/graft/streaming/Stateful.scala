package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * — the escape hatch for semantics windowed aggregation can't express
  * (SURVEY §2.7 T5/T6 extension). State is one small case class per
  * symbol; batch arrival order inside a trigger is made irrelevant by
  * sorting each group's new rows on (ts, fetch) before folding.
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
    * open of the earliest candle ever seen, close of the latest,
    * running high/low/volume/count. */
  case class RunningOhlc(
      symbol: String,
      first_ts: Long,
      last_ts: Long,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Long,
      n: Long)

  private def fold(acc: RunningOhlc, r: CandleIn): RunningOhlc =
    RunningOhlc(
      symbol = acc.symbol,
      first_ts = math.min(acc.first_ts, r.timestamp_unix),
      last_ts = math.max(acc.last_ts, r.timestamp_unix),
      open = if (r.timestamp_unix < acc.first_ts) r.open else acc.open,
      high = math.max(acc.high, r.high),
      low = math.min(acc.low, r.low),
      close = if (r.timestamp_unix >= acc.last_ts) r.close else acc.close,
      volume = acc.volume + r.volume,
      n = acc.n + 1)

  /** Streaming (or batch) per-symbol running OHLC. Use with
    * `OutputMode.Update`: each trigger emits the refreshed accumulator
    * for symbols that received data. */
  def runningOhlc(spark: SparkSession, ds: Dataset[CandleIn]): Dataset[RunningOhlc] = {
    import spark.implicits._
    ds.groupByKey(_.symbol_clean)
      .mapGroupsWithState[RunningOhlc, RunningOhlc](GroupStateTimeout.NoTimeout) {
        (sym, rows, state: GroupState[RunningOhlc]) =>
          val init = state.getOption.getOrElse(
            RunningOhlc(sym, Long.MaxValue, Long.MinValue, 0.0, Double.NegativeInfinity,
              Double.PositiveInfinity, 0.0, 0L, 0L))
          // total order (ts, fetch): duplicate-timestamp re-fetches
          // fold deterministically, latest fetch winning close/high/low
          val updated = rows.toSeq
            .sortBy(r => (r.timestamp_unix, r.fetch_timestamp))
            .foldLeft(init)(fold)
          state.update(updated)
          updated
      }
  }

  /** Output mode the accumulator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
