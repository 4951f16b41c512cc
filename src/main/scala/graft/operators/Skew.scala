package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation helpers. AQE's skew-join handling covers joins;
  * hot-KEY aggregation (one symbol with 10^9 candles, one token in
  * every document) still funnels a single reducer. `saltedAgg` runs
  * the classic two-stage shape: aggregate on (key, salt) first —
  * spreading a hot key over `buckets` reducers — then combine the
  * partials per key.
  *
  * Only algebraic aggregates decompose this way; the caller supplies
  * both the partial aggs and the matching combiners (e.g.
  * sum→sum, count→sum, min→min, max→max).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of a discriminator
    * column (NOT rand() — retries/speculative tasks must agree). */
  def salt(discriminator: Column, buckets: Int): Column =
    pmod(hash(discriminator), lit(buckets))

  /** Two-stage salted aggregation:
    * stage 1 groups by (keys…, salt(discriminator)) computing
    * `partials`; stage 2 groups by keys combining with `combiners`
    * (matched by output name). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      discriminator: Column,
      buckets: Int,
      partials: Seq[Column],
      combiners: Seq[Column]): DataFrame = {
    val stage1 = df
      .groupBy(keys :+ salt(discriminator, buckets).as("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    val keyNames = stage1.columns.toIndexedSeq.dropRight(partials.size + 1) // keys before __salt
    stage1
      .groupBy(keyNames.map(col): _*)
      .agg(combiners.head, combiners.tail: _*)
  }
}
