package graft.operators

import graft.functions.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same key exceeds `gapSeconds`. The classic
  * lag → break-flag → running-sum shape: one shuffle + sort on
  * (key, time), linear thereafter. Gaps compare in integer
  * MICROSECONDS (`unix_micros`) — not floating seconds — so the break
  * decision is exact and engine-independent.
  *
  * Extension beyond the reference (SURVEY §2.7 T6 notes it has no
  * session windows); the batch analogue of Structured Streaming's
  * `session_window`.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key, in time order). */
  def withSessionIds(
      events: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      gapSeconds: Long): DataFrame = {
    val w      = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    val run    = w.rowsBetween(Window.unboundedPreceding, 0)
    val prevUs = lag(epochMicros(ts), 1).over(w)
    val brk = when(
      prevUs.isNull || epochMicros(ts) - prevUs > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__brk", brk)
      .withColumn("session_idx", sum(col("__brk")).over(run))
      .drop("__brk")
  }

  /** Per-session rollup: bounds, size, exact value sum. */
  def sessions(
      events: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      gapSeconds: Long,
      value: Column): DataFrame =
    withSessionIds(events, key, ts, tieBreak, gapSeconds)
      .groupBy(key.as("key"), col("session_idx"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(value).as("sum_value"))
}
