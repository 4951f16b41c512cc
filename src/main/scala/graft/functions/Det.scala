package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Deterministic (order-independent) numeric aggregation helpers.
  *
  * Plain `sum(double)` is order-dependent in the low bits, so the same
  * query on Spark (partial aggregation over shuffled partitions) and on
  * a single-threaded oracle (DuckDB) can differ in the last ulp — enough
  * to fail a hash-match. Summing exact decimals instead makes the result
  * bit-identical regardless of partitioning / parallelism, which also
  * means results are stable across cluster sizes (1 executor or 1000).
  *
  * The oracle-side equivalents are documented next to each helper.
  *
  * Cost note: decimals wider than 18 digits are not mutable-primitive
  * buffer types, so a HashAggregate containing these sums falls out of
  * whole-stage codegen (PlanSpec pins this). That is the deliberate
  * price of bit-exact cross-engine results; in pipelines where
  * last-ulp drift is acceptable, plain `sum(double)` keeps codegen and
  * is ~1.5-2× faster at the aggregate.
  */
object Det {
  /** Exact sum: `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Higher-precision exact sum for products/squares:
    * `CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)`. */
  def dsum8(c: Column): Column = sum(c.cast(DecimalType(30, 8))).cast("double")

  /** Deterministic mean: exact decimal sum, then one double division.
    * `CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double") / count(c)

  /** Deterministic sample stddev via exact decimal moments:
    * sqrt((S2 - S1*S1/n) / (n-1)) with S1, S2 exact decimal sums. Uses
    * s1*s1 (exact-rounded multiply) not pow() — java Math.pow is not
    * guaranteed correctly rounded, C pow may differ; sqrt IS correctly
    * rounded everywhere.
    * Oracle: CASE WHEN COUNT(x)>1 THEN sqrt(greatest(0,
    *   (CAST(SUM(CAST(x*x AS DECIMAL(30,8))) AS DOUBLE)
    *    - s1*s1/COUNT(x)) / (COUNT(x)-1))) END  with
    *   s1 = CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
    */
  def dstddev(c: Column): Column = {
    val n  = count(c)
    val s1 = sum(c.cast(DecimalType(28, 6))).cast("double")
    val s2 = sum((c * c).cast(DecimalType(30, 8))).cast("double")
    when(n > 1, sqrt(greatest(lit(0.0), (s2 - s1 * s1 / n) / (n - 1))))
  }

  /** Unix epoch seconds (floored), matching DuckDB
    * `CAST(floor(epoch(ts)) AS BIGINT)`. Spark's unix_timestamp floors. */
  def epochSec(ts: Column): Column = unix_timestamp(ts)

  /** Exact epoch microseconds, tolerant of BOTH `TIMESTAMP` and
    * `TIMESTAMP_NTZ` inputs. `unix_micros` rejects NTZ outright
    * (DATATYPE_MISMATCH), so cast first; with the engine's pinned UTC
    * session timezone the NTZ→TIMESTAMP cast is a pure type re-tag
    * (identical micros). Every operator doing timestamp arithmetic
    * (sessionize, range join, as-of tolerance) must use this instead of
    * bare `unix_micros` so a storage-layer type shift (parquet
    * isAdjustedToUTC flipping) cannot break them. */
  def epochMicros(ts: Column): Column = unix_micros(ts.cast(TimestampType))
}
