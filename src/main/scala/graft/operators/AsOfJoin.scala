package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (backward) join: for every left row, attach the payload of
  * the most recent right row with the same key and right.time ≤
  * left.time (inclusive). Extension beyond the reference (SURVEY §2.6
  * notes it has no as-of join) — the canonical time-series enrichment
  * join (trades→quotes, events→latest price).
  *
  * Implementation is the UNION-TAG + WINDOW form, not a range join:
  * tag right rows 0 and left rows 1, union, then per key take
  * `last(payload, ignoreNulls)` over (time, side) row order. One
  * shuffle + sort on (key, time) total, linear in |L|+|R| — the shape
  * that survives 100 TB, unlike per-key cross joins (quadratic on hot
  * keys) or point-lookup loops. Right rows sort BEFORE left rows at
  * equal time, making the join inclusive like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Right-side duplicates at the same (key, time) are resolved by
  * `rightTieBreak` (greatest wins) — make it unique for deterministic
  * output.
  *
  * `tolerance` (the pandas `merge_asof(tolerance=…)` / kdb `wj`
  * bound): when set, a match older than the bound is nulled — the
  * payload struct carries the matched right time internally, so the
  * bound is ONE more projection, not a different plan. Units: seconds
  * when the time columns are timestamps, the columns' native units
  * otherwise.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      key: Column,
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Column,
      payload: Seq[(String, Column)],
      tolerance: Option[Long] = None): DataFrame = {

    require(!payload.exists(_._1 == "__mt"), "payload name __mt is reserved")
    val lCols = left.columns.toIndexedSeq
    val r = right.select(
      key.as("__k"),
      rightTime.as("__t"),
      lit(0).as("__side"),
      rightTieBreak.as("__tie"),
      struct((payload :+ ("__mt" -> rightTime)).map { case (n, c) => c.as(n) }: _*).as("__p"))
    val l = left.select(
      (lCols.map(col) :+
        key.as("__k") :+
        leftTime.as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(r.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(r.schema("__p").dataType).as("__p")): _*)
    val unioned = l.unionByName(r.select(
      (lCols.map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__tie"), col("__p"))): _*))

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) :+ col("__asof"): _*)
    val inBound = tolerance match {
      case None => col("__asof").isNotNull
      case Some(tol) =>
        val isTs = r.schema("__t").dataType ==
          org.apache.spark.sql.types.TimestampType
        val (lv, rv, bound) =
          if (isTs) (unix_micros(leftTime), unix_micros(col("__asof.__mt")), tol * 1000000L)
          else (leftTime, col("__asof.__mt"), tol)
        col("__asof").isNotNull && lv - rv <= bound
    }
    matched.select(
      lCols.map(col) ++
        payload.map { case (n, _) => when(inBound, col(s"__asof.$n")).as(n) }: _*)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * the same key and right.time ≥ left.time (inclusive) — the
    * "next upcoming event" enrichment (pandas `direction='forward'`).
    * Same union-tag shape as [[backward]], mirrored: left rows sort
    * BEFORE right rows at equal time and `first(payload, ignoreNulls)`
    * scans the [current, ∞) frame. Right duplicates at the same
    * (key, time) resolve by `rightTieBreak` (LEAST wins — the mirror
    * of backward's greatest). One shuffle + sort on (key, time). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: Column,
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Column,
      payload: Seq[(String, Column)]): DataFrame = {

    require(!payload.exists(_._1 == "__mt"), "payload name __mt is reserved")
    val lCols = left.columns.toIndexedSeq
    val r = right.select(
      key.as("__k"),
      rightTime.as("__t"),
      lit(1).as("__side"),
      rightTieBreak.as("__tie"),
      struct((payload :+ ("__mt" -> rightTime)).map { case (n, c) => c.as(n) }: _*).as("__p"))
    val l = left.select(
      (lCols.map(col) :+
        key.as("__k") :+
        leftTime.as("__t") :+
        lit(0).as("__side") :+
        lit(null).cast(r.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(r.schema("__p").dataType).as("__p")): _*)
    val unioned = l.unionByName(r.select(
      (lCols.map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__tie"), col("__p"))): _*))

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(0, Window.unboundedFollowing)
    unioned
      .withColumn("__asof", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(lCols.map(col) :+ col("__asof"): _*)
      .select(
        lCols.map(col) ++
          payload.map { case (n, _) => col(s"__asof.$n").as(n) }: _*)
  }
}
