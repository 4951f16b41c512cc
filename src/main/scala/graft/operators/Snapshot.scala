package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus SNAPSHOT lifecycle ops — the bookkeeping a pipeline that
  * re-crawls / re-curates runs between snapshot versions: what
  * changed, where coverage gaps are, how distributions drifted.
  * Extension beyond the reference (its ETL overwrites partitions in
  * place — `etl/lightweight_etl.py` re-fetch + overwrite — and answers
  * "what changed?" only implicitly; these make the delta a relation).
  *
  * Scale shape: every op here is one co-partitioned key join and/or
  * one map-side-combined hash-agg — linear in snapshot size, no
  * self-joins, nothing corpus-sized on the driver or in a broadcast.
  */
object Snapshot {

  /** Snapshot DIFF: classify every id across two snapshot versions as
    * `added` (new only), `removed` (old only), `changed` (both, but
    * payload differs) or `unchanged`. Payload comparison is null-safe
    * (`<=>`), so a NULL payload on both sides is `unchanged`, and a
    * NULL-vs-value flip is `changed`.
    *
    * One full-outer shuffle join on the id — both sides hash-partition
    * by the same key, so at 100 TB this is a single co-partitioned
    * exchange each, linear, skew-free for unique ids. The payload
    * column rides the join only to be compared and is dropped before
    * output: the result is id+status sized, never payload sized.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, id: Column, payload: Column): DataFrame = {
    val o = oldSnap.select(id.as("snap_id"), payload.as("__op"), lit(1).as("__in_old"))
    val n = newSnap.select(id.as("snap_id"), payload.as("__np"), lit(1).as("__in_new"))
    o.join(n, Seq("snap_id"), "full_outer")
      .select(
        col("snap_id"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__op") <=> col("__np"), lit("unchanged"))
          .otherwise(lit("changed"))
          .as("status"))
  }

  /** Distribution DRIFT between two snapshots over an integral bucket
    * expression: per bucket, each snapshot's share in exact ppm and
    * the absolute delta — the "did re-crawling shift the length /
    * quality / language mix" report, in integers so it is
    * engine-exact (no PSI logarithms; the delta ranks buckets the
    * same way and stays hash-comparable across engines).
    *
    * Two map-side-combined hash-aggs to |buckets| rows, totals joined
    * back via a broadcast of the (tiny) per-bucket relations —
    * nothing row-sized leaves the partial aggregates.
    */
  def distributionDrift(oldSnap: DataFrame, newSnap: DataFrame, bucket: Column): DataFrame = {
    def shares(df: DataFrame, ppmName: String): DataFrame = {
      val counts = df.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("__n"))
      // sum over ≤|buckets| rows: a scalar subquery-shaped cross join
      // of one broadcast row, not a corpus-sized exchange
      val total = counts.agg(sum(col("__n")).as("__t"))
      counts.crossJoin(broadcast(total))
        .select(
          col("bucket"),
          expr(s"(__n * 1000000) div __t").as(ppmName))
    }
    shares(oldSnap, "old_ppm")
      .join(shares(newSnap, "new_ppm"), Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("old_ppm"), lit(0L)).as("old_ppm"),
        coalesce(col("new_ppm"), lit(0L)).as("new_ppm"))
      .withColumn("delta_ppm", abs(col("new_ppm") - col("old_ppm")))
  }

  /** The incremental-recompute WORKLIST a re-crawl produces: the
    * `added` + `changed` rows of [[diff]] with their NEW payload
    * re-attached — the only rows that must re-enter the expensive
    * curation gates (dedup probes, quality scores, embedding
    * refresh). `removed`/`unchanged` rows never leave the diff.
    *
    * At 100 TB this is THE reason the diff exists: re-curation cost
    * becomes ∝ |delta|, not ∝ |corpus|. The payload re-attach is one
    * more co-partitioned join on the id against the new snapshot —
    * the diff side is id+status sized, so the join moves the delta's
    * payloads only.
    */
  def deltaWorklist(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      id: Column,
      payload: Column): DataFrame =
    diff(oldSnap, newSnap, id, payload)
      .filter(col("status").isin("added", "changed"))
      .join(
        newSnap.select(id.as("snap_id"), payload.as("payload")),
        Seq("snap_id"))

  /** COVERAGE audit: per group, how many base rows have at least one
    * cover row (e.g. documents with an embedding, images with a
    * caption) — the modality-completeness gate a multimodal training
    * set is admitted through. Exact ppm.
    *
    * The cover side is collapsed to DISTINCT keys first (a hash-agg
    * that also makes the subsequent join multiplicity-safe), then one
    * key join + one hash-agg to |groups| rows. AQE broadcasts the
    * distinct-key relation when it measures small; on a corpus-sized
    * cover set it stays a co-partitioned shuffle join — both are the
    * right plan at their scale, so the join is deliberately not
    * broadcast-pinned.
    */
  def coverage(
      base: DataFrame,
      baseId: Column,
      group: Column,
      cover: DataFrame,
      coverId: Column): DataFrame = {
    val ids = cover.select(coverId.as("__cid")).distinct()
    base.select(baseId.as("__bid"), group.as("grp"))
      .join(ids, col("__bid") === col("__cid"), "left")
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("__cid").isNotNull, 1L).otherwise(0L)).as("n_covered"))
      .withColumn("coverage_ppm", expr("(n_covered * 1000000) div n_rows"))
  }
}
