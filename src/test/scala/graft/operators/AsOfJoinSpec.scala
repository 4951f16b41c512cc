package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  private def fixture = {
    val s = spark; import s.implicits._
    val trades = Seq(
      (1L, "A", 100L), (2L, "A", 105L), (3L, "A", 99L), (4L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 99L, 10.0), ("A", 100L, 11.0), ("A", 103L, 12.0),
      ("B", 60L, 20.0)) // B's only quote is AFTER the trade
      .toDF("sym", "t", "px")
    (trades, quotes)
  }

  test("backward as-of: latest right row with rt <= lt, inclusive; no match -> null") {
    val (trades, quotes) = fixture
    val out = AsOfJoin.backward(
      trades, quotes,
      key = col("sym"), leftTime = col("t"), rightTime = col("t"),
      rightTieBreak = col("px"),
      payload = Seq("quote_t" -> col("t"), "px" -> col("px")))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[Any]("quote_t")), Option(r.getAs[Any]("px")))).toMap
    assert(out(1L) === (Some(100L), Some(11.0))) // inclusive tie at t=100
    assert(out(2L) === (Some(103L), Some(12.0)))
    assert(out(3L) === (Some(99L), Some(10.0)))
    assert(out(4L) === (None, None)) // quote is in the future
  }

  test("right-side duplicates at the same time resolve by tieBreak (greatest wins)") {
    val s = spark; import s.implicits._
    val left  = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val right = Seq(("A", 10L, 1.0, 1L), ("A", 10L, 2.0, 2L)).toDF("k", "t", "v", "ver")
    val out = AsOfJoin.backward(
      left, right, col("k"), col("t"), col("t"), col("ver"),
      payload = Seq("v" -> col("v"))).collect().head
    assert(out.getAs[Double]("v") === 2.0)
  }

  test("tolerance nulls matches older than the bound, keeps fresh ones") {
    val (trades, quotes) = fixture
    def run(tol: Long) = AsOfJoin.backward(
      trades, quotes,
      key = col("sym"), leftTime = col("t"), rightTime = col("t"),
      rightTieBreak = col("px"),
      payload = Seq("quote_t" -> col("t"), "px" -> col("px")),
      tolerance = Some(tol)) // native units (long time column)
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("quote_t"))).toMap
    val tight = run(1L)
    assert(tight(1L) === Some(100L)) // age 0
    assert(tight(2L) === None)       // match t=103, age 2 > 1 → nulled
    assert(tight(3L) === Some(99L))  // age 0
    assert(tight(4L) === None)       // no match at all (future quote)
    val loose = run(2L)
    assert(loose(2L) === Some(103L)) // age 2 ≤ 2 → kept
  }

  test("forward as-of: earliest right row with rt >= lt, inclusive; no future -> null") {
    val (trades, quotes) = fixture
    val out = AsOfJoin.forward(
      trades, quotes,
      key = col("sym"), leftTime = col("t"), rightTime = col("t"),
      rightTieBreak = col("px"),
      payload = Seq("quote_t" -> col("t"), "px" -> col("px")))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[Any]("quote_t")), Option(r.getAs[Any]("px")))).toMap
    assert(out(1L) === (Some(100L), Some(11.0))) // inclusive tie at t=100
    assert(out(2L) === (None, None))             // no quote at/after 105
    assert(out(3L) === (Some(99L), Some(10.0)))
    assert(out(4L) === (Some(60L), Some(20.0)))  // future quote now matches
  }

  test("forward: right duplicates at the same time resolve by tieBreak (least wins)") {
    val s = spark; import s.implicits._
    val left  = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val right = Seq(("A", 10L, 1.0, 1L), ("A", 10L, 2.0, 2L)).toDF("k", "t", "v", "ver")
    val out = AsOfJoin.forward(
      left, right, col("k"), col("t"), col("t"), col("ver"),
      payload = Seq("v" -> col("v"))).collect().head
    assert(out.getAs[Double]("v") === 1.0)
  }

  test("left columns pass through untouched") {
    val (trades, quotes) = fixture
    val out = AsOfJoin.backward(
      trades, quotes, col("sym"), col("t"), col("t"), col("px"),
      payload = Seq("px" -> col("px")))
    assert(out.columns.toSeq === Seq("trade_id", "sym", "t", "px"))
    assert(out.count() === 4)
  }

  test("guards: reserved/colliding names and mixed-unit tolerance are rejected, not silent") {
    val s = spark; import s.implicits._
    val (trades, quotes) = fixture

    // left frame carrying a reserved internal name would be corrupted
    val badLeft = trades.withColumnRenamed("trade_id", "__t")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(badLeft, quotes, col("sym"), col("t"), col("t"), col("px"),
        payload = Seq("px" -> col("px")))
    }
    assert(e1.getMessage.contains("reserved"))

    // payload named like a left column would duplicate output columns
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes, col("sym"), col("t"), col("t"), col("px"),
        payload = Seq("t" -> col("px")))
    }
    assert(e2.getMessage.contains("duplicate left columns"))

    // tolerance across timestamp-left / numeric-right would silently
    // compare micros to raw longs — must throw instead
    val tsTrades = trades.select(col("trade_id"), col("sym"), timestamp_seconds(col("t")).as("ts"))
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(tsTrades, quotes, col("sym"), col("ts"), col("t"), col("px"),
        payload = Seq("px" -> col("px")), tolerance = Some(1L))
    }
    assert(e3.getMessage.contains("matching time column types"))
  }
}
