package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream–stream joins — the remaining piece of the
  * streaming algebra next to the windowed aggregations, stateful
  * dedup, and stream-static gates: correlate two LIVE event streams
  * (e.g. ticks with news/alert events on the same symbol) inside a
  * bounded time window.
  *
  * Scale/state contract: Spark buffers each side keyed by (join key,
  * event time); the watermark plus the explicit time-range predicate
  * let the state store EVICT rows older than
  * watermark + `maxDelaySeconds`, so state is bounded by the event
  * rate × window — never unbounded. Both inputs MUST carry event-time
  * columns (distinct names) for the range condition to bound state.
  */
object StreamJoins {

  /** Inner-join `left` rows to `right` rows with the same `key` whose
    * `rightTime` falls within [leftTime − maxDelaySeconds, leftTime] —
    * "each left event picks up the right events that preceded it by at
    * most the delay". Works identically on batch frames (same plan,
    * no state) for backfills.
    *
    * `leftTime` and `rightTime` must be differently-named event-time
    * (timestamp) columns; `watermark` is the lateness bound applied to
    * BOTH sides (e.g. "10 minutes"). */
  def joinWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      maxDelaySeconds: Long,
      watermark: String = "10 minutes"): DataFrame = {
    require(leftTime != rightTime, "event-time columns must have distinct names")
    require(right.columns.contains(key), s"right side is missing the join key '$key'")
    val overlap = right.columns.filter(c => c != key && left.columns.contains(c))
    require(
      overlap.isEmpty,
      s"sides may share ONLY the join key '$key' — rename overlapping " +
        s"columns ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(
      r,
      l(key) === r(key) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $maxDelaySeconds SECONDS") &&
        col(rightTime) <= col(leftTime))
      .drop(r(key))
  }
}
