package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** Dataset profiling + deterministic splitting — the bookkeeping ops
  * every training-data pipeline runs before and after the interesting
  * ones. Extension beyond the reference.
  */
object Profile {

  /** One-pass column profile: per column null count, approx-free
    * distinct count, and min/max (numerics as double, strings
    * lexicographic). Single aggregate job — at 100 TB this is ONE scan
    * regardless of column count (all aggregates fuse into one
    * HashAggregate), vs one job per column in naive profilers.
    * Output: one row per column (unpivoted driver-side from the single
    * aggregated row — constant-size, not a data collect). */
  def columnProfile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__distinct")) ++ (f.dataType match {
        case _: NumericType => Seq(
          min(c).cast(DoubleType).as(s"${f.name}__min"),
          max(c).cast(DoubleType).as(s"${f.name}__max"))
        case StringType => Seq(
          min(length(c)).cast(DoubleType).as(s"${f.name}__min"),
          max(length(c)).cast(DoubleType).as(s"${f.name}__max"))
        case _ => Seq(
          lit(null).cast(DoubleType).as(s"${f.name}__min"),
          lit(null).cast(DoubleType).as(s"${f.name}__max"))
      })
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n   = row.getAs[Long]("__n")
    cols.map { f =>
      (f.name, f.dataType.simpleString, n,
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        Option(row.getAs[Double](s"${f.name}__min")),
        Option(row.getAs[Double](s"${f.name}__max")))
    }.toSeq.toDF("col_name", "dtype", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
  }

  /** Deterministic split assignment from a portable hash of the id:
    * h = hash60(prefix ∥ id) mod 100 → train (< trainPct), val
    * (< trainPct+valPct), else test. Reproducible across runs,
    * engines, and partitionings — never `rand()`, whose per-row values
    * depend on partition layout and retries. */
  def withSplit(df: DataFrame, id: Column, trainPct: Int, valPct: Int, seed: String = "split"): DataFrame = {
    val h = pmod(Portable.hash60(concat(lit(seed), lit("_"), id.cast("string"))), lit(100L))
    df.withColumn(
      "split",
      when(h < trainPct, "train").when(h < trainPct + valPct, "val").otherwise("test"))
  }
}
