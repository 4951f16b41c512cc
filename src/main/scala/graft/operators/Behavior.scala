package graft.operators

import graft.functions.Det.epochSec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Behavioral / product analytics over an event stream: cohort
  * retention and step-conversion funnels. Extension beyond the
  * reference (its analytics stop at per-symbol OHLC rollups) — the
  * other half of what an events table is for.
  *
  * Everything reduces to exact integer epoch arithmetic (epoch-week
  * buckets, second deltas) and count aggregates, so results are
  * bit-portable by construction. Scale shape: per-user aggregates are
  * one hash-agg each (map-side combined), joined on the user key —
  * the classic pre-aggregate-then-join analytics plan; nothing is
  * windowed over raw events.
  */
object Behavior {

  private def epochWeek(ts: Column): Column = {
    val e = epochSec(ts)
    (e - pmod(e, lit(604800L))) / 604800L
  }

  /** Classic cohort-retention matrix: users grouped by their FIRST
    * active epoch-week (the cohort), counted in each later week they
    * were active — (cohort_week, week_offset, n_users). Two hash-aggs
    * (distinct user-weeks, per-user min week) + one user-key join. */
  def cohortRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val weeks   = events.select(user.as("user_id"), epochWeek(ts).cast("long").as("wk")).distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    weeks
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Two-step conversion funnel with a deadline: per user, the first
    * `isFirst` event, then the first `isSecond` event AT OR AFTER it;
    * converted = within `withinSeconds`. Rolled up per cohort week of
    * the first step: entrants, converters, and exact-decimal mean
    * delay of the converted. */
  def twoStepFunnel(
      events: DataFrame,
      user: Column,
      ts: Column,
      isFirst: Column,
      isSecond: Column,
      withinSeconds: Long): DataFrame = {
    val firsts = events
      .filter(isFirst)
      .groupBy(user.as("user_id"))
      .agg(min(epochSec(ts)).as("t1"))
    val seconds = events
      .filter(isSecond)
      .select(user.as("user_id"), epochSec(ts).as("t2"))
    val perUser = firsts
      .join(seconds, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("t1"))
      .agg(min(when(col("t2") >= col("t1"), col("t2"))).as("t2_first"))
      .withColumn(
        "converted",
        col("t2_first").isNotNull && col("t2_first") - col("t1") <= withinSeconds)
    perUser
      .groupBy(epochWeek(timestamp_seconds(col("t1"))).cast("long").as("cohort_week"))
      .agg(
        count(lit(1)).as("n_entered"),
        count(when(col("converted"), 1)).as("n_converted"),
        graft.functions.Det.davg(when(col("converted"), col("t2_first") - col("t1")))
          .as("avg_delay_s"))
  }
}
