package graft.operators

import graft.functions.Det.epochMicros
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Point-in-interval range join, bucketized: the scalable alternative
  * to `a JOIN b ON key AND t BETWEEN s AND e`, which Spark would
  * execute as a key-equi join with a residual predicate — quadratic
  * per hot key when intervals are long or keys few. Extension beyond
  * the reference (no range join exists there).
  *
  * Both sides map onto fixed time buckets: a point has exactly ONE
  * bucket; an interval explodes over the buckets it covers. The join
  * becomes (key, bucket) equi-join + exact BETWEEN filter. Because a
  * point belongs to a single bucket, a (point, interval) match is
  * produced exactly once — no dedup pass. `bucketSeconds` tunes the
  * interval-explosion factor vs candidate volume (pick ≈ the typical
  * interval length).
  */
object RangeJoin {

  /** Exact integer bucket index: subtract the floor-mod first so the
    * division is over an exact multiple (no floating-point floor at
    * bucket boundaries), then divide as decimal→long. */
  private def bucketOf(ts: Column, bucketUs: Long): Column = {
    val us = epochMicros(ts)
    ((us - pmod(us, lit(bucketUs))).cast("decimal(28,0)") / lit(bucketUs)).cast("long")
  }

  /** Inner point-in-interval join. `points` and `intervals` must share
    * `key`; intervals carry [start, end] (inclusive). Returns one row
    * per matching (point, interval) with all columns of both sides. */
  def pointInInterval(
      points: DataFrame,
      pointTime: Column,
      intervals: DataFrame,
      start: Column,
      end: Column,
      key: String,
      bucketSeconds: Long): DataFrame = {
    val bucketUs = bucketSeconds * 1000000L
    val reserved = Seq("__pt", "__pb", "__s", "__e", "__ib", "__ik")
    require(
      !(points.columns ++ intervals.columns).exists(reserved.contains),
      s"RangeJoin reserves column names ${reserved.mkString(", ")}")
    // Bind each caller expression to ITS side before the join — the
    // BETWEEN columns would otherwise resolve against the joined plan
    // and hit AMBIGUOUS_REFERENCE whenever both sides share a name
    // (e.g. intervals derived from the same table carrying `ts`).
    val p = points
      .withColumn("__pt", pointTime)
      .withColumn("__pb", bucketOf(col("__pt"), bucketUs))
    // The interval-side key is renamed to a reserved column BEFORE the
    // join so the key predicate never references the same column name
    // on both sides: when points and intervals derive from one base
    // DataFrame, `p(key) === i(key)` would lean on Spark's dataset-id
    // disambiguation of ambiguous self-joins — correct today but
    // fragile across versions. With `__ik` the join condition is
    // unambiguous by construction and the output keeps exactly one
    // copy of the key (the points side).
    val i = intervals
      .withColumn("__s", start)
      .withColumn("__e", end)
      .withColumn("__ib", explode(sequence(bucketOf(col("__s"), bucketUs), bucketOf(col("__e"), bucketUs))))
      .withColumnRenamed(key, "__ik")
    p.join(i, col(key) === col("__ik") && col("__pb") === col("__ib"))
      .filter(col("__pt").between(col("__s"), col("__e")))
      .drop("__pt", "__pb", "__s", "__e", "__ib", "__ik")
  }
}
