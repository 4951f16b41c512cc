package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of joins: for every left row, attach the payload of the nearest
  * right row with the same key at or before ([[backward]]) / at or
  * after ([[forward]]) the left time. Extension beyond the reference
  * (SURVEY §2.6 notes it has no as-of join) — the canonical
  * time-series enrichment join (trades→quotes, events→latest price,
  * views→next purchase).
  *
  * Implementation is the UNION-TAG + WINDOW form, not a range join:
  * tag the sides, union, then per key take the nearest non-null
  * payload over (time, side, tie) row order. One shuffle + sort on
  * (key, time) total, linear in |L|+|R| — the shape that survives
  * 100 TB, unlike per-key cross joins (quadratic on hot keys) or
  * point-lookup loops. The side tag orders right rows into the frame
  * at equal times, making both directions INCLUSIVE like DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t` / `<=`.
  *
  * Right-side duplicates at the same (key, time) resolve by
  * `rightTieBreak` — greatest wins backward, least wins forward (the
  * natural mirror); make it unique for deterministic output.
  *
  * `tolerance` (the pandas `merge_asof(tolerance=…)` / kdb `wj`
  * bound): when set, a match farther than the bound is nulled — the
  * payload struct carries the matched right time internally, so the
  * bound is ONE more projection, not a different plan. Units: seconds
  * when the time columns are timestamps, the columns' native units
  * otherwise.
  */
object AsOfJoin {

  /** Most recent right row with right.time ≤ left.time (inclusive). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: Column,
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Column,
      payload: Seq[(String, Column)],
      tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, key, leftTime, rightTime, rightTieBreak, payload, tolerance, isForward = false)

  /** Earliest right row with right.time ≥ left.time (inclusive) —
    * pandas `direction='forward'`, the "next upcoming event" join. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: Column,
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Column,
      payload: Seq[(String, Column)],
      tolerance: Option[Long] = None): DataFrame =
    asOf(left, right, key, leftTime, rightTime, rightTieBreak, payload, tolerance, isForward = true)

  /** The shared directional core. Backward: left rows tag AFTER right
    * rows (right at equal time is in the trailing frame) and
    * `last(payload)` over (−∞, current] picks the latest right — tie
    * order asc ⇒ greatest tieBreak wins. Forward is the exact mirror:
    * left rows tag BEFORE right rows, `first(payload)` over
    * [current, ∞) picks the earliest right — tie order asc ⇒ least
    * tieBreak wins. */
  private def asOf(
      left: DataFrame,
      right: DataFrame,
      key: Column,
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Column,
      payload: Seq[(String, Column)],
      tolerance: Option[Long],
      isForward: Boolean): DataFrame = {

    val reserved = Set("__asof", "__k", "__t", "__side", "__tie", "__p", "__mt")
    require(
      !payload.exists(p => reserved(p._1)),
      s"payload names ${reserved.mkString("/")} are reserved as-of internals")
    require(
      !left.columns.exists(reserved),
      s"left columns ${left.columns.filter(reserved).mkString(", ")} collide with " +
        s"reserved as-of internals (${reserved.mkString("/")})")
    require(
      !payload.exists(p => left.columns.contains(p._1)),
      s"payload names ${payload.map(_._1).filter(left.columns.contains).mkString(", ")} " +
        "duplicate left columns — alias the payload")
    val (rightTag, leftTag) = if (isForward) (1, 0) else (0, 1)
    val lCols = left.columns.toIndexedSeq
    val r = right.select(
      key.as("__k"),
      rightTime.as("__t"),
      lit(rightTag).as("__side"),
      rightTieBreak.as("__tie"),
      struct((payload :+ ("__mt" -> rightTime)).map { case (n, c) => c.as(n) }: _*).as("__p"))
    val l = left.select(
      (lCols.map(col) :+
        key.as("__k") :+
        leftTime.as("__t") :+
        lit(leftTag).as("__side") :+
        lit(null).cast(r.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(r.schema("__p").dataType).as("__p")): _*)
    // The tolerance unit (micros vs native) is decided from the time
    // TYPE; mixed-type sides would silently compare micros to raw
    // numbers, so tolerance requires both sides in the same type.
    // Checked BEFORE the union so the caller gets this message, not a
    // union type-mismatch AnalysisException.
    if (tolerance.isDefined) require(
      l.schema("__t").dataType == r.schema("__t").dataType,
      s"as-of tolerance requires matching time column types; " +
        s"left=${l.schema("__t").dataType} right=${r.schema("__t").dataType}")
    val unioned = l.unionByName(r.select(
      (lCols.map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__tie"), col("__p"))): _*))

    val ordered = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
    val pick =
      if (isForward) first(col("__p"), ignoreNulls = true)
        .over(ordered.rowsBetween(0, Window.unboundedFollowing))
      else last(col("__p"), ignoreNulls = true)
        .over(ordered.rowsBetween(Window.unboundedPreceding, 0))
    val matched = unioned
      .withColumn("__asof", pick)
      .filter(col("__side") === leftTag)
      .select(lCols.map(col) :+ col("__asof"): _*)
    val inBound = tolerance match {
      case None => col("__asof").isNotNull
      case Some(tol) =>
        // Both timestamp flavors take the epoch-micros path; bare
        // `unix_micros` rejects TIMESTAMP_NTZ, and the numeric branch
        // would produce an INTERVAL from ts subtraction.
        val isTs = r.schema("__t").dataType match {
          case org.apache.spark.sql.types.TimestampType    => true
          case org.apache.spark.sql.types.TimestampNTZType => true
          case _                                           => false
        }
        val (lv, rv, bound) =
          if (isTs) (graft.functions.Det.epochMicros(leftTime),
            graft.functions.Det.epochMicros(col("__asof.__mt")), tol * 1000000L)
          else (leftTime, col("__asof.__mt"), tol)
        val age = if (isForward) rv - lv else lv - rv
        col("__asof").isNotNull && age <= bound
    }
    matched.select(
      lCols.map(col) ++
        payload.map { case (n, _) => when(inBound, col(s"__asof.$n")).as(n) }: _*)
  }
}
