package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IndicatorsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("withVwap: cumulative Σpv/Σv, resets per (symbol, day)") {
    val s = spark; import s.implicits._
    val ticks = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 10.0, 100.0),
      ("A", ts("2024-01-01 11:00:00"), 2L, 20.0, 300.0),
      ("A", ts("2024-01-02 09:00:00"), 3L, 50.0, 10.0), // new day → reset
      ("B", ts("2024-01-01 10:30:00"), 4L, 7.0, 2.0)
    ).toDF("symbol", "ts", "event_id", "close", "volume")
    val out = Indicators.withVwap(ticks, col("close"), col("volume"), col("event_id"))
      .select("event_id", "vwap").as[(Long, Double)].collect().toMap
    assert(out(1L) === 10.0)
    assert(out(2L) === (10.0 * 100 + 20.0 * 300) / 400.0)
    assert(out(3L) === 50.0)
    assert(out(4L) === 7.0)
  }

  test("withDrawdown: two-pass chunked peak equals the global running max") {
    val s = spark; import s.implicits._
    val candles = (0 until 200).map { i =>
      // price wanders deterministically; chunk = groups of 24 buckets
      val px = 100.0 + (i * 37 % 17) - (i * 11 % 13)
      ("S" + (i % 2), i.toLong * 3600, px)
    }.toDF("symbol", "bucket_start", "close")
    val two = Indicators.withDrawdown(
      candles, col("close"), col("bucket_start"),
      col("bucket_start") - pmod(col("bucket_start"), lit(86400L)))
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = candles.withColumn("expect_peak", max(col("close")).over(w))
    val joined = two.join(ref, Seq("symbol", "bucket_start", "close"))
    assert(joined.filter(col("running_peak") =!= col("expect_peak")).count() === 0)
    // drawdown is ≤ 0 and 0 exactly at the peaks
    assert(two.filter(col("drawdown_pct") > 0).count() === 0)
    assert(two.filter(col("close") === col("running_peak") && col("drawdown_pct") =!= 0).count() === 0)
  }

  test("withAtr: first candle falls back to high−low; gaps beat the bar range") {
    val s = spark; import s.implicits._
    val candles = Seq(
      ("A", 0L, 10.0, 11.0, 9.0, 10.5),
      ("A", 3600L, 20.0, 21.0, 19.5, 20.0) // gap up: TR = |21 − 10.5| = 10.5
    ).toDF("symbol", "bucket_start", "open", "high", "low", "close")
    val out = Indicators.withAtr(candles, 14, col("bucket_start"))
      .select("bucket_start", "tr", "atr").as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L)._1 === 2.0)
    assert(out(3600L)._1 === 10.5)
    assert(out(3600L)._2 === (2.0 + 10.5) / 2)
  }

  test("emaMacd: hand-checked recursion, per-symbol reset, partition-invariant") {
    val s = spark; import s.implicits._
    def d(n: Int) = java.sql.Date.valueOf(f"2024-01-${n}%02d")
    val daily = Seq(
      ("A", d(1), 10.0), ("A", d(2), 13.0), ("A", d(3), 11.0),
      ("B", d(1), 5.0), ("B", d(2), 5.0)
    ).toDF("symbol", "trade_date", "close")
    val out = Indicators.emaMacd(daily)
    val rows = out.orderBy("symbol", "trade_date")
      .select("symbol", "ema12", "ema26", "macd", "signal")
      .as[(String, Double, Double, Double, Double)].collect()
    val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0; val a9 = 2.0 / 10.0
    // A day1: seeds
    assert(rows(0) === ("A", 10.0, 10.0, 0.0, 0.0))
    // A day2: one recursive step
    val e12 = a12 * 13.0 + (1 - a12) * 10.0
    val e26 = a26 * 13.0 + (1 - a26) * 10.0
    val macd = e12 - e26
    assert(rows(1)._2 === e12 && rows(1)._3 === e26)
    assert(rows(1)._5 === a9 * macd + (1 - a9) * 0.0)
    // B resets cleanly (constant series → macd 0)
    assert(rows(3) === ("B", 5.0, 5.0, 0.0, 0.0))
    assert(rows(4)._4 === 0.0)
    // partition invariance: same result from 1 input partition
    val one = Indicators.emaMacd(daily.coalesce(1))
      .orderBy("symbol", "trade_date")
      .select("symbol", "ema12", "ema26", "macd", "signal")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(one.toSeq === rows.toSeq)
  }

  test("zScoreAnomalies: planted outlier flagged, bulk not") {
    val s = spark; import s.implicits._
    val ticks = ((1 to 99).map(i => ("A", ts("2024-01-01 00:00:00"), i.toLong, 10.0 + (i % 3)))
      :+ (("A", ts("2024-01-01 01:00:00"), 100L, 1000.0)))
      .toDF("symbol", "ts", "event_id", "close")
    val out = Indicators.zScoreAnomalies(ticks, col("close"), 3.0)
    assert(out.select("event_id").as[Long].collect().toSeq === Seq(100L))
  }

  test("zScoreAgainst gates a STREAM against static reference stats (stream-static join)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stats = Seq(("A", 10.0, 1.0), ("B", 5.0, 0.5)).toDF("symbol", "__mean", "__sd")
    val in = MemoryStream[(String, Long, Double)]
    in.addData(("A", 1L, 10.5), ("A", 2L, 99.0), ("B", 3L, 5.1), ("B", 4L, -20.0))
    val gated = Indicators.zScoreAgainst(
      in.toDF.toDF("symbol", "event_id", "close"), stats, col("close"), 3.0)
    val q = gated.writeStream.format("memory").queryName("anomaly_out").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("anomaly_out").select("event_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(2L, 4L))
  }

  test("correlationMatrix: ±1 for perfectly (anti)correlated series, null for constants") {
    val s = spark; import s.implicits._
    def d(n: Int) = java.sql.Date.valueOf(f"2024-01-${n}%02d")
    val series = (1 to 10).flatMap { i =>
      Seq(("A", d(i), i.toDouble), ("B", d(i), 2.0 * i + 1), ("C", d(i), -3.0 * i), ("D", d(i), 7.0))
    }.toDF("symbol", "trade_date", "x")
    val out = Indicators.correlationMatrix(series, col("trade_date"), col("x"))
      .select("sym_a", "sym_b", "corr").collect()
      .map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(math.abs(out(("A", "B")).get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(out(("A", "C")).get.asInstanceOf[Double] + 1.0) < 1e-12)
    assert(out(("A", "D")) === None) // zero variance side → null
    assert(out.size === 6)
  }

  test("qualityReport: planted violations and gaps are counted") {
    val s = spark; import s.implicits._
    val candles = Seq(
      ("A", 0L, 10.0, 11.0, 9.0, 10.5, 100.0),    // clean
      ("A", 3600L, 10.0, 9.5, 9.8, 9.6, 50.0),    // inverted (high<low) + range violation
      ("A", 14400L, 10.0, 11.0, 9.0, 10.0, 0.0),  // 3h gap + zero volume
      ("B", 0L, 5.0, 6.0, 4.0, 5.5, 10.0)
    ).toDF("symbol", "bucket_start", "open", "high", "low", "close", "volume")
    val out = Indicators.qualityReport(candles, col("bucket_start"), 3600L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(a.fieldIndex("n_candles")) === 3)
    assert(a.getLong(a.fieldIndex("n_inverted")) === 1)
    assert(a.getLong(a.fieldIndex("n_range_violations")) === 1)
    assert(a.getLong(a.fieldIndex("n_nonpos_volume")) === 1)
    assert(a.getLong(a.fieldIndex("n_gaps")) === 1)
    assert(a.getLong(a.fieldIndex("max_gap_seconds")) === 10800L)
    val b = out("B")
    assert(b.getLong(b.fieldIndex("n_gaps")) === 0)
    assert(b.isNullAt(b.fieldIndex("max_gap_seconds")))
  }
}
