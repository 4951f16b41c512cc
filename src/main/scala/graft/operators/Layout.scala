package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Physical data layout for multi-dimensional scan pruning: Z-order
  * (Morton) clustering. Parquet prunes row groups by min/max, and a
  * linearly-sorted 100 TB table is only tight on its LEAD sort key —
  * a predicate on the second dimension still reads everything.
  * Interleaving the bits of both dimensions and range-sorting by the
  * interleave gives every file/row-group a bounded span on EVERY
  * participating dimension, so either predicate prunes (the layout
  * Delta/Iceberg expose as `ZORDER BY` / `sort_order`, built here
  * from plain Spark primitives: an unrolled bit expression +
  * `repartitionByRange` + `sortWithinPartitions`).
  *
  * The z-value is a pure per-row expression — statically unrolled
  * shifts/masks, whole-stage-codegen friendly, no UDF — and exact
  * integer arithmetic, so it is oracle-portable like every other
  * deterministic key here. LayoutSpec measures the claim directly:
  * per-file min/max spans after a z-order write are bounded on BOTH
  * dimensions where a linear sort leaves the trailing one unpruned.
  */
object Layout {

  /** Morton code of `dims` values: bit `i` of dimension `d` lands at
    * interleaved position `i·D + d`. Inputs must already be
    * non-negative integers below 2^bits (bucket/clamp first —
    * [[dimBucket]] helps); `D·bits` must fit a signed long. Bit
    * positions are disjoint, so the sum is exact (no carries) and
    * equals the bitwise OR. */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    val d = dims.size
    require(d >= 1, "zValue needs at least one dimension")
    require(bits >= 1 && d * bits <= 63, s"$d dims × $bits bits must fit a signed long")
    val terms = for {
      (c, dd) <- dims.zipWithIndex
      i       <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + dd)
    terms.reduce(_ + _)
  }

  /** Clamp a value into `[0, buckets)` integer cells of width `width`
    * — the standard dimension preparation for [[zValue]] over
    * unbounded or floating columns. */
  def dimBucket(c: Column, width: Double, buckets: Long): Column =
    least(greatest(floor(c / width), lit(0.0)), lit((buckets - 1).toDouble)).cast("long")

  /** Write `df` z-ordered on `dims`: range-partition by z-value (so
    * files tile the curve without overlap), sort each partition by it
    * (so row groups inside a file tile too), write parquet. At 100 TB
    * this is the write-amortized index: one layout pass at ingest buys
    * min/max pruning for every later scan on any participating
    * dimension. */
  def zOrderWrite(
      df: DataFrame,
      path: String,
      dims: Seq[Column],
      bits: Int = 16,
      partitions: Int = 32): Unit = {
    val z = zValue(dims, bits)
    df.repartitionByRange(partitions, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
