package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Slowly-changing-dimension (type 2) historization: turn an
  * append-only change log into versioned validity intervals — the
  * dimension-maintenance operator every warehouse load needs next to
  * the keep-latest dedup the reference's ETL performs
  * (`etl/glue_job.py` keeps only the newest row per key; SCD2 keeps
  * the newest row AND the history that led to it).
  *
  * Contract: rows are ordered per key by (ts, tieBreak) — tieBreak
  * (e.g. a unique event id) makes equal-timestamp logs deterministic.
  * Consecutive rows whose tracked attributes are unchanged collapse
  * into one version (null-safe comparison — null ⇒ null is NOT a
  * change); each change opens a new version stamped
  * `valid_from = its ts`, closed by the NEXT change's ts
  * (`valid_to`, null for the open current version), with a per-key
  * 1-based `version` counter and `is_current` flag.
  *
  * Scale shape: ONE exchange (hash by key) and one per-key sort feed
  * both window passes — the change test (lag over the full log) and
  * the interval close (lead over the surviving changes) share the
  * same partitioning and ordering, and the filter between them
  * preserves sort order, so the second window adds no exchange and no
  * sort. Nothing is windowed globally; parallelism = #keys, the same
  * contract as every per-key operator here.
  */
object Scd {

  /** @param attrs (output name, expression) pairs — the tracked
    *              attribute tuple; a version opens when ANY of them
    *              changes. */
  def historize(
      log: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      attrs: Seq[(String, Column)]): DataFrame = {
    require(attrs.nonEmpty, "SCD2 needs at least one tracked attribute")
    val reserved = Set("key", "valid_from", "valid_to", "is_current", "version", "__a", "__tie")
    require(
      !attrs.exists(a => reserved(a._1)),
      s"attribute names ${reserved.mkString("/")} are reserved SCD2 outputs")

    val w = Window.partitionBy(col("key")).orderBy(col("valid_from").asc, col("__tie").asc)
    val rows = log.select(
      key.as("key"),
      ts.as("valid_from"),
      tieBreak.as("__tie"),
      struct(attrs.map { case (n, c) => c.as(n) }: _*).as("__a"))
    val changes = rows
      // null-safe: first row per key has lag null → <=> false → change
      .withColumn("__same", col("__a") <=> lag(col("__a"), 1).over(w))
      .filter(!col("__same"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      // long: the cross-engine-portable integer type for counters
      .withColumn("version", row_number().over(w).cast("long"))
      .select(
        Seq(col("key")) ++
          attrs.map { case (n, _) => col(s"__a.$n").as(n) } ++
          Seq(
            col("valid_from"),
            col("valid_to"),
            col("valid_to").isNull.as("is_current"),
            col("version")): _*)
  }

  /** The "current dimension" view of a [[historize]] result — one row
    * per key, the open version. A plain filter: consumers that only
    * need latest state read this instead of re-deriving keep-latest. */
  def currentOf(history: DataFrame): DataFrame =
    history.filter(col("is_current"))
}
