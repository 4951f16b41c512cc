package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing — laying documents end-to-end into fixed-capacity
  * token bins (training sequences) in a deterministic global order.
  * The write-side twin of tokenization in an LLM data pipeline: every
  * document gets its global token `start_offset`, its home `bin_id`,
  * and how many bins it spans. Extension beyond the reference.
  *
  * The core is a GLOBAL prefix sum, which naive Spark expresses as a
  * window with no partition — one reducer sorting the whole corpus.
  * This implementation is the classic two-phase scan instead:
  *
  *  1. shard rows into contiguous id blocks (block size from a
  *     one-row min/max aggregate, broadcast — a scalar, not data);
  *  2. per-shard running sum via a window PARTITIONED by shard —
  *     `shards`-way parallel, each reducer sorts only its block;
  *  3. prefix the per-shard totals (≤ `shards` rows — the only
  *     unpartitioned window, over a relation of constant size) and
  *     broadcast-join the shard offsets back.
  *
  * All arithmetic is exact int64 (running sums of longs; bin ids via
  * integer `DIV`), so the result is bit-identical on the DuckDB
  * oracle's single `SUM ... OVER (ORDER BY id)`.
  *
  * Ids need not be dense — sparse ids just make blocks uneven (the
  * per-shard sort is still bounded by the densest block). Documents
  * with zero weight occupy no tokens and get `n_bins = 1` (their
  * start bin) by convention.
  */
object Packing {

  /** Pack rows into `capacity`-token bins in ascending `id` order.
    * Output: (doc_id, n_tokens, start_offset, bin_id, n_bins) where
    * `start_offset` is the exclusive prefix sum of `weight`,
    * `bin_id = start_offset DIV capacity`, and `n_bins` counts the
    * bins the document touches (> 1 ⇒ split across a bin boundary). */
  def packSequences(
      df: DataFrame,
      id: Column,
      weight: Column,
      capacity: Long,
      shards: Int = 256): DataFrame = {
    require(capacity >= 1, s"capacity must be positive (got $capacity)")
    require(shards >= 1, s"shards must be positive (got $shards)")
    // preconditions made loud/total: a NULL id has no position in the
    // packing order — fail the job rather than silently dropping the
    // row; a NULL weight packs as 0 tokens (same as the empty doc)
    val idc = id.cast("long")
    val base = df.select(
      when(idc.isNull, raise_error(lit("packSequences: null id"))).otherwise(idc).as("doc_id"),
      coalesce(weight.cast("long"), lit(0L)).as("n_tokens"))

    // contiguous id blocks: block size = ceil(span / shards), from a
    // single-row bounds aggregate (broadcast scalar — the same shape
    // as the scalar-max broadcast in queries/Relational.scala)
    val bounds  = base.agg(min(col("doc_id")).as("__min_id"), max(col("doc_id")).as("__max_id"))
    // the trailing isNotNull is semantically a no-op (ids are non-null
    // past the precondition, so the arithmetic never yields null) but
    // keeps BOTH consumers of this subtree canonically identical: the
    // final broadcast join infers an isnotnull(__shard) filter on one
    // side only, which would otherwise defeat ReuseExchange below
    val sharded = base
      .crossJoin(broadcast(bounds))
      .withColumn("__shard", expr(s"(doc_id - __min_id) DIV ((__max_id - __min_id + $shards) DIV $shards)"))
      .drop("__min_id", "__max_id")
      .filter(col("__shard").isNotNull)

    // phase 1: per-shard inclusive running sum (shards-way parallel)
    val wLocal = Window
      .partitionBy(col("__shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn("__cum", sum(col("n_tokens")).over(wLocal))

    // phase 2: shard offsets = exclusive prefix over per-shard totals.
    // Totals come from the WINDOWED relation (max of the inclusive
    // running sum), not a second aggregate over the input: the subtree
    // below the shard exchange is then identical on both sides and
    // Spark's ReuseExchange serves both from ONE scan + shuffle. The
    // unpartitioned window is over ≤ `shards` rows — constant size
    // regardless of data scale — then broadcast back.
    // partitionBy(lit(0)): same single-partition execution over the
    // <= shards-row offsets relation (bounded by construction), but
    // stated EXPLICITLY so WindowExec's "No Partition Defined" warning
    // stops burying real warnings in every rank query's logs (r15)
    val wOff = Window.partitionBy(lit(0))
      .orderBy(col("__shard")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__shard"))
      .agg(max(col("__cum")).as("__tot"))
      .withColumn("__offset", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__shard"), col("__offset"))

    local
      .join(broadcast(offsets), Seq("__shard"))
      .withColumn("start_offset", col("__offset") + col("__cum") - col("n_tokens"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("start_offset"),
        expr(s"start_offset DIV $capacity").as("bin_id"),
        greatest(
          lit(1L),
          expr(s"(start_offset + n_tokens - 1) DIV $capacity") -
            expr(s"start_offset DIV $capacity") + lit(1L)).as("n_bins"))
  }

  /** Packing-vs-padding efficiency report — the number a pipeline
    * designer reads BEFORE choosing between pad-to-capacity (each doc
    * alone in ⌈n/C⌉ bins, remainder padded) and contiguous packing
    * ([[packSequences]] — docs laid end-to-end, ⌈Σn/C⌉ bins per
    * group): per group, both bin counts, both waste-token counts, and
    * the exact-ppm savings of packing over padding. A corpus of many
    * short documents wastes most of every padded bin; this quantifies
    * exactly how much compute packing buys back.
    *
    * All integer arithmetic over ONE map-side-combined hash-agg on the
    * group key — the corpus collapses to |groups| rows before any
    * division. */
  def packingEfficiency(
      df: DataFrame,
      group: Column,
      weight: Column,
      capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be positive (got $capacity)")
    df
      .select(group.as("source"), coalesce(weight.cast("long"), lit(0L)).as("__n"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"),
        sum(expr(s"(__n + $capacity - 1) DIV $capacity")).as("padded_bins"))
      .withColumn("packed_bins", expr(s"(total_tokens + $capacity - 1) DIV $capacity"))
      .withColumn("padded_waste", expr(s"padded_bins * $capacity - total_tokens"))
      .withColumn("packed_waste", expr(s"packed_bins * $capacity - total_tokens"))
      .withColumn(
        "savings_ppm",
        expr(s"((padded_bins - packed_bins) * 1000000L) div greatest(padded_bins, 1L)"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * a deterministic hash-gated `rateBps` share of documents is
    * rewritten in PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — with the two split
    * points drawn uniformly per document from the portable hash
    * (character positions p_lo ≤ p_hi in [0, n_chars]); the rest pass
    * through unchanged with fim = false. The classic augmentation
    * that teaches infilling "for free" alongside left-to-right LM
    * training.
    *
    * Everything is a pure per-row projection — no shuffle, no UDF:
    * one gate md5 per row plus two split-point md5s and three
    * substrings on FIM rows only (the untransformed share skips
    * them), at scan speed at any corpus size. Determinism: the same
    * (seed, doc_id) always yields
    * the same split, so re-runs, retries and the DuckDB oracle agree
    * bit-for-bit (`substring`/`length` count characters identically
    * on both engines). Output: doc_id, n_chars, fim, p_lo, p_hi,
    * fim_text. */
  def fimSplit(
      df: DataFrame,
      id: Column,
      text: Column,
      rateBps: Long = 5000L,
      seed: String = "fim"): DataFrame = {
    require(rateBps >= 0L && rateBps <= 10000L, s"rateBps in [0, 10000]: $rateBps")
    def h(tag: String): Column =
      graft.functions.Portable.hash60(concat(lit(s"${seed}${tag}_"), id.cast("string")))
    df
      .select(id.as("doc_id"), text.as("__t"))
      .withColumn("n_chars", length(col("__t")).cast("long"))
      .withColumn("fim", pmod(h(""), lit(10000L)) < rateBps)
      .withColumn("__c1", when(col("fim"), pmod(h("1"), col("n_chars") + 1L)))
      .withColumn("__c2", when(col("fim"), pmod(h("2"), col("n_chars") + 1L)))
      .withColumn("p_lo", when(col("fim"), least(col("__c1"), col("__c2"))))
      .withColumn("p_hi", when(col("fim"), greatest(col("__c1"), col("__c2"))))
      .withColumn(
        "fim_text",
        when(
          col("fim"),
          concat(
            lit("<PRE>"),
            expr("substring(__t, 1, CAST(p_lo AS INT))"),
            lit("<SUF>"),
            expr("substring(__t, CAST(p_hi AS INT) + 1)"),
            lit("<MID>"),
            expr("substring(__t, CAST(p_lo AS INT) + 1, CAST(p_hi - p_lo AS INT))")))
          .otherwise(col("__t")))
      .select(col("doc_id"), col("n_chars"), col("fim"), col("p_lo"), col("p_hi"), col("fim_text"))
  }
}
