package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed global ranking — `row_number`/`ntile` semantics over a
  * TOTAL order without the single-reducer window Spark's unpartitioned
  * `Window.orderBy` compiles to. Extension beyond the reference (its
  * pandas `rank`/`qcut` are single-process by construction).
  *
  * Same two-phase scan as [[Packing.packSequences]], generalized from
  * contiguous ids to an arbitrary numeric leading key:
  *
  *  1. shard rows by an arithmetic range split of the leading sort key
  *     (min/max from a one-row broadcast aggregate — a scalar, never a
  *     sample, so the split is deterministic). The split is MONOTONE:
  *     key(a) < key(b) ⇒ shard(a) ≤ shard(b), and equal keys land in
  *     the same shard, so concatenating shards in shard order is the
  *     global order.
  *  2. per-shard `row_number` via a window PARTITIONED by shard —
  *     `shards`-way parallel — plus an exclusive prefix sum of the
  *     per-shard counts (≤ `shards` rows, the only unpartitioned
  *     window, constant size at any data scale) broadcast back:
  *     global rank = shard offset + local row_number.
  *
  * Correctness is INVARIANT to the shard boundaries (any monotone
  * bucketing yields the same rank), so key skew only affects load
  * balance — the densest shard bounds the per-reducer sort, exactly
  * as in Packing. All arithmetic is exact int64.
  */
object Ranking {

  /** Global 1-based rank in ascending (leadKey, tieBreak…) order.
    * The combined order must be a total order (no duplicate keys) for
    * the rank to be well-defined. Ordering uses `leadKey` at its
    * ORIGINAL type — only the SHARD assignment truncates it to long,
    * and truncation is weakly monotone (a ≤ b ⇒ trunc(a) ≤ trunc(b),
    * equal keys share a shard), which is all sharding needs; sub-1.0
    * key differences stay shard-local and the in-shard sort settles
    * them exactly. NaN keys are rejected (NaN truncates to 0 but sorts
    * above +Inf in Spark — a monotonicity break); null keys too.
    * `keyBounds` = a-priori [lo, hi] of the TRUNCATED key (see
    * [[shardByKey]]): skips the min/max discovery branch, saving one
    * full evaluation of the input when its projection is expensive.
    * Output: input columns + `rank`. */
  def globalRank(
      df: DataFrame,
      leadKey: Column,
      tieBreak: Seq[Column],
      shards: Int = 256,
      keyBounds: Option[(Long, Long)] = None,
      shardKey: Option[Column] = None): DataFrame = {
    val (local, offsets, cols) = rankParts(df, leadKey, tieBreak, shards, keyBounds, shardKey)
    local
      .join(broadcast(offsets.select(col("__shard"), col("__offset"))), Seq("__shard"))
      .withColumn("rank", col("__offset") + col("__rn"))
      .select(cols.map(col) :+ col("rank"): _*)
  }

  /** Guarded, order-aligned range sharding shared by the two-phase
    * ops ([[rankParts]] and [[globalRunningSum]]): input + `__ord`
    * (original-type key, null/NaN rejected loud), `__lead` (long
    * truncation, non-castable rejected loud), `__shard` (contiguous
    * key range, weakly monotone in the key). With `keyBounds` the
    * min/max discovery aggregation disappears — one fewer evaluation
    * of the input subtree (column pruning defeats ReuseExchange
    * across the branches, so each one re-runs the caller's scorer) —
    * and a key outside the promised bounds raises rather than
    * mis-sharding. Bounds arithmetic is checked driver-side: a span
    * where hi − lo + shards overflows is rejected up front instead of
    * wrapping into a negative shard width. */
  private def shardByKey(
      df: DataFrame,
      leadKey: Column,
      shards: Int,
      keyBounds: Option[(Long, Long)],
      op: String,
      shardKey: Option[Column] = None): DataFrame = {
    require(shards >= 1, s"shards must be positive (got $shards)")
    val bad = leadKey.isNull || isnan(leadKey.cast("double"))
    // `shardKey`, when given, replaces the default long-truncation of
    // the ORDER key for SHARD ASSIGNMENT only (ordering stays on the
    // original key, so ranks are bit-identical to the default form).
    // Contract: it must be a weakly MONOTONE function of the lead key
    // (a < b ⇒ f(a) ≤ f(b); being a function of the key alone already
    // sends equal keys to one shard). Use it when the key's long
    // truncation collapses to a handful of values — a [0, 1] double
    // score truncates to {-1, 0}, turning the "parallel" per-shard
    // window into 1–2 corpus-sized partitions (the q143 r14 find); a
    // milli/ppm-scaled monotone shard key restores the spread.
    val keyed = df
      .withColumn(
        "__ord",
        when(bad, raise_error(lit(s"$op: null or NaN lead key"))).otherwise(leadKey))
      .withColumn(
        "__lead",
        // a non-numeric lead key casts to null long — fail loud, not
        // a silent row drop at the shard filter below
        when(shardKey.getOrElse(col("__ord")).cast("long").isNull,
          raise_error(lit(s"$op: lead key does not cast to long")))
          .otherwise(shardKey.getOrElse(col("__ord")).cast("long")))
    keyBounds match {
      case Some((lo, hi)) =>
        require(lo <= hi, s"$op: keyBounds lo must be <= hi (got $lo > $hi)")
        val width =
          try Math.addExact(Math.subtractExact(hi, lo), shards.toLong) / shards
          catch {
            case _: ArithmeticException => throw new IllegalArgumentException(
              s"$op: keyBounds span too wide — hi - lo + shards overflows a long ([$lo, $hi])")
          }
        keyed
          .withColumn(
            "__shard",
            when(col("__lead") < lo || col("__lead") > hi,
              raise_error(lit(s"$op: lead key outside keyBounds [$lo, $hi]")))
              .otherwise(expr(s"(__lead - ${lo}L) DIV ${width}L")))
          .filter(col("__shard").isNotNull) // no-op; canonical consumers (see Packing)
      case None =>
        val bounds =
          keyed.agg(min(col("__lead")).as("__min_k"), max(col("__lead")).as("__max_k"))
        keyed
          .crossJoin(broadcast(bounds))
          .withColumn(
            "__shard",
            expr(s"(__lead - __min_k) DIV ((__max_k - __min_k + $shards) DIV $shards)"))
          .drop("__min_k", "__max_k")
          .filter(col("__shard").isNotNull) // no-op; keeps both exchange consumers canonical (see Packing)
    }
  }

  /** Exact global running (prefix) sum of `weight` in ascending
    * (leadKey, tieBreak…) order — the distributed cumulative sum a
    * budget cutoff needs, WITHOUT the single-reducer global window (a
    * partition-less `Window.orderBy` moves the corpus to one task;
    * this is the [[globalRank]] two-phase shape instead: per-shard
    * windowed cumsum + a ≤`shards`-row offset relation broadcast
    * back). The combined (leadKey, tieBreak…) order must be total,
    * like [[globalRank]]'s. Weights must be non-negative longs —
    * raise_error otherwise, since a negative weight makes the running
    * total non-monotone and any downstream budget cutoff
    * ill-defined. Output: input columns + `running_total`
    * (inclusive).
    *
    * Cost note: each branch of the two-phase shape re-evaluates the
    * input's projection (column pruning makes the subtrees
    * non-identical, so ReuseExchange never fires — the q190 lesson),
    * so an expensive scorer upstream runs once per branch. Two
    * levers: (1) pass `keyBounds = Some((lo, hi))` when the lead-key
    * domain is known a priori (ppm/milli-bounded scores — the common
    * case) and the min/max discovery branch disappears entirely
    * (4 evaluations → 2; out-of-bounds keys raise, never mis-shard);
    * (2) pre-materialize the scored relation (the sign-once artifact
    * lifecycle) and feed the compact table here. */
  def globalRunningSum(
      df: DataFrame,
      leadKey: Column,
      tieBreak: Seq[Column],
      weight: Column,
      shards: Int = 256,
      keyBounds: Option[(Long, Long)] = None): DataFrame = {
    val cols = df.columns.toIndexedSeq
    require(
      !cols.exists(Set("running_total", "__ord", "__lead", "__shard", "__w", "__cum")),
      "columns running_total/__ord/__lead/__shard/__w/__cum are reserved by globalRunningSum")
    val sharded = shardByKey(
      df.withColumn(
        "__w",
        when(weight.cast("long").isNull || weight.cast("long") < 0L,
          raise_error(lit("globalRunningSum: weight must be a non-negative long")))
          .otherwise(weight.cast("long"))),
      leadKey, shards, keyBounds, "globalRunningSum")
    val wLocal = Window
      .partitionBy(col("__shard"))
      .orderBy(col("__ord").asc +: tieBreak.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn("__cum", sum(col("__w")).over(wLocal))
    // per-shard totals from the WINDOWED relation (max of the local
    // cumsum) so ReuseExchange serves both sides from one shuffle
    // partitionBy(lit(0)): same single-partition execution over the
    // <= shards-row offsets relation (bounded by construction), but
    // stated EXPLICITLY so WindowExec's "No Partition Defined" warning
    // stops burying real warnings in every rank query's logs (r15)
    val wOff = Window.partitionBy(lit(0))
      .orderBy(col("__shard")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__shard"))
      .agg(max(col("__cum")).cast("long").as("__tot"))
      .withColumn("__offset", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
    local
      .join(broadcast(offsets.select(col("__shard"), col("__offset"))), Seq("__shard"))
      .withColumn("running_total", col("__offset") + col("__cum"))
      .select(cols.map(col) :+ col("running_total"): _*)
  }

  /** The two-phase machinery shared by [[globalRank]] and
    * [[globalNtile]]: the per-shard-ranked relation, the per-shard
    * (offset, count) relation (≤ `shards` rows), and the caller's
    * original columns. */
  private def rankParts(
      df: DataFrame,
      leadKey: Column,
      tieBreak: Seq[Column],
      shards: Int,
      keyBounds: Option[(Long, Long)] = None,
      shardKey: Option[Column] = None): (DataFrame, DataFrame, IndexedSeq[String]) = {
    val cols = df.columns.toIndexedSeq
    require(!cols.exists(Set("rank", "__ord", "__lead", "__shard", "__rn")),
      "columns rank/__ord/__lead/__shard/__rn are reserved by globalRank")
    val sharded = shardByKey(df, leadKey, shards, keyBounds, "globalRank", shardKey)
    val wLocal = Window
      .partitionBy(col("__shard"))
      .orderBy(col("__ord").asc +: tieBreak.map(_.asc): _*)
    val local = sharded.withColumn("__rn", row_number().over(wLocal))
    // per-shard counts from the WINDOWED relation (max of the local
    // row_number) so ReuseExchange serves both sides from one shuffle
    // partitionBy(lit(0)): same single-partition execution over the
    // <= shards-row offsets relation (bounded by construction), but
    // stated EXPLICITLY so WindowExec's "No Partition Defined" warning
    // stops burying real warnings in every rank query's logs (r15)
    val wOff = Window.partitionBy(lit(0))
      .orderBy(col("__shard")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__shard"))
      .agg(max(col("__rn")).cast("long").as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
    (local, offsets, cols)
  }

  /** Exact `ntile(buckets)` over the same distributed rank: the first
    * `N mod buckets` tiles take `ceil(N/buckets)` rows, the rest
    * `floor(N/buckets)` — bit-identical to the SQL window function,
    * without its single-reducer plan. Output: input columns + the
    * 1-based tile in `tileName`. */
  def globalNtile(
      df: DataFrame,
      leadKey: Column,
      tieBreak: Seq[Column],
      buckets: Int,
      tileName: String = "tile",
      shards: Int = 256,
      keyBounds: Option[(Long, Long)] = None,
      shardKey: Option[Column] = None): DataFrame = {
    require(buckets >= 1, s"buckets must be positive (got $buckets)")
    require(!df.columns.contains("__n"), "column __n is reserved by globalNtile")
    val (local, offsets, cols) = rankParts(df, leadKey, tieBreak, shards, keyBounds, shardKey)
    // N = Σ per-shard counts, read off the ≤ shards-row offsets
    // relation — never a second pass over the data
    val total = offsets.agg(coalesce(max(col("__offset") + col("__cnt")), lit(0L)).as("__n"))
    val ranked = local
      .join(broadcast(offsets.select(col("__shard"), col("__offset"))), Seq("__shard"))
      .withColumn("rank", col("__offset") + col("__rn"))
      .select(cols.map(col) :+ col("rank"): _*)
    // ntile arithmetic on (rank, N): q = N div t, rem = N mod t; ranks
    // up to rem*(q+1) sit in the (q+1)-row tiles. Exact integer DIV
    // throughout. The q = 0 degenerate case (N < buckets) takes the
    // first branch for every row — tile = rank, matching SQL ntile —
    // and CASE laziness keeps the q-divisor branch unevaluated.
    ranked
      .crossJoin(broadcast(total))
      .withColumn(
        tileName,
        expr(s"""CAST(CASE
          WHEN rank <= (__n % $buckets) * (__n DIV $buckets + 1)
          THEN (rank - 1) DIV (__n DIV $buckets + 1)
          ELSE (__n % $buckets) + ((rank - 1) - (__n % $buckets) * (__n DIV $buckets + 1)) DIV (__n DIV $buckets)
        END AS INT) + 1"""))
      .drop("__n")
  }
}
