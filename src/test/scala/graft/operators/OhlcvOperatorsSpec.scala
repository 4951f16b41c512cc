package graft.operators

import graft.SparkSpec
import graft.functions.Det
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** Candle fixtures replaying the reference's own data scenarios —
  * notably the duplicate-timestamp-across-fetches pattern demonstrated
  * by infra/reliance.csv.gz rows 2-3 (same timestamp_unix, different
  * fetch_timestamp), the de-facto dedup fixture (SURVEY §5).
  */
trait CandleFixture { self: SparkSpec =>
  import java.sql.Timestamp

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (symbol, ts, open, high, low, close, volume, fetch_timestamp) */
  lazy val candles: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      // RELIANCE day 1: 3 real candles, candle@09:20 fetched TWICE
      // with a revised close (the reliance.csv.gz scenario)
      ("RELIANCE", "2025-10-08 09:15:00", 100.0, 105.0, 99.0, 104.0, 1000L, "f1"),
      ("RELIANCE", "2025-10-08 09:20:00", 104.0, 106.0, 103.0, 105.0, 1100L, "f1"),
      ("RELIANCE", "2025-10-08 09:20:00", 104.0, 106.5, 103.0, 105.5, 1150L, "f2"),
      ("RELIANCE", "2025-10-08 09:25:00", 105.5, 107.0, 104.0, 106.0, 900L, "f2"),
      // TCS day 1: falling
      ("TCS", "2025-10-08 09:15:00", 50.0, 50.5, 48.0, 48.5, 500L, "f1"),
      ("TCS", "2025-10-08 09:20:00", 48.5, 49.0, 47.0, 47.5, 600L, "f1"),
      // RELIANCE day 2
      ("RELIANCE", "2025-10-09 09:15:00", 106.0, 108.0, 105.0, 107.5, 800L, "f3"))
      .toDF("symbol", "tss", "open", "high", "low", "close", "volume", "fetch_timestamp")
      .withColumn("ts", to_timestamp(col("tss")))
      .drop("tss")
  }
}

class DedupSpec extends SparkSpec with CandleFixture {
  private val keys    = Seq(col("symbol"), col("ts"))
  private val version = Seq(col("fetch_timestamp"))

  test("keepLatest keeps the max-fetch_timestamp row per key (D2 contract)") {
    val out = Dedup.keepLatest(candles, keys, version)
    assert(out.count() === 6)
    val dup = out.filter(col("symbol") === "RELIANCE" && hour(col("ts")) === 9 && minute(col("ts")) === 20)
      .select("close", "fetch_timestamp").collect()
    assert(dup.toSeq === Seq(Row(105.5, "f2")))
  }

  test("keepFirst keeps the min-version row (api_handler_csv.py parity)") {
    val out = Dedup.keepFirst(candles, keys, version)
    val dup = out.filter(col("symbol") === "RELIANCE" && minute(col("ts")) === 20)
      .select("fetch_timestamp").collect()
    assert(dup.toSeq === Seq(Row("f1")))
  }

  test("dedup is idempotent") {
    val once  = Dedup.keepLatest(candles, keys, version)
    val twice = Dedup.keepLatest(once, keys, version)
    assert(once.count() === twice.count())
    assert(once.exceptAll(twice).count() === 0)
  }
}

class ResampleSpec extends SparkSpec with CandleFixture {
  test("bucketStart is epoch-aligned (api/api_handler.py:806 semantics)") {
    val out = Resample.candles(candles, 900, col("fetch_timestamp"))
      .select("bucket_start").distinct().collect().map(_.getLong(0))
    assert(out.nonEmpty)
    assert(out.forall(_ % 900 === 0))
  }

  test("resample: open of earliest, close of latest, max high, min low, sum volume") {
    // 15-min bucket 09:15-09:30 for RELIANCE day1 contains all 4 rows
    // (including the duplicate) — resample is defined over its input
    // as-is; dedup-before-resample is the caller's contract
    val day1 = candles.filter(col("symbol") === "RELIANCE" && to_date(col("ts")) === "2025-10-08")
    val out = Resample.candles(day1, 900, col("fetch_timestamp")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("open") === 100.0)   // earliest ts, tie-broken
    assert(r.getAs[Double]("close") === 106.0)  // latest ts
    assert(r.getAs[Double]("high") === 107.0)
    assert(r.getAs[Double]("low") === 99.0)
    assert(r.getAs[Double]("volume") === 4150.0)
  }

  test("ticksToCandles OHLC invariants: high >= max(o,c), low <= min(o,c)") {
    val ticks = graft.Tables.events(spark, sf())
    val out = Resample.ticksToCandles(
      ticks, col("event_type"), col("ts"), col("value"), col("value"), col("event_id"), 3600)
    val bad = out.filter(
      col("high") < greatest(col("open"), col("close")) ||
        col("low") > least(col("open"), col("close")))
    assert(bad.count() === 0)
  }

  test("duplicate-timestamp ties broken deterministically by tieBreak") {
    val dups = candles.filter(col("symbol") === "RELIANCE" && minute(col("ts")) === 20)
    val out  = Resample.candles(dups, 300, col("fetch_timestamp")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("open") === 104.0)
    assert(out.head.getAs[Double]("close") === 105.5) // f2 wins the tie
  }
}

class AnalyticsSpec extends SparkSpec with CandleFixture {
  private val tb = col("fetch_timestamp")

  test("dailyStats: first open / last close in time order, change & pct") {
    val out = Analytics.dailyStats(candles.filter(col("symbol") === "RELIANCE"), tb)
      .filter(col("trade_date") === "2025-10-08").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("open") === 100.0)
    assert(r.getAs[Double]("close") === 106.0)
    assert(r.getAs[Double]("high") === 107.0)
    assert(r.getAs[Double]("low") === 99.0)
    assert(r.getAs[Long]("num_records") === 4)
    assert(r.getAs[Double]("price_change") === 6.0)
    assert(math.abs(r.getAs[Double]("price_change_pct") - 6.0) < 1e-12)
  }

  test("dailySummary sorts desc by pct; topMovers takes gainers/losers") {
    val sum = Analytics.dailySummary(candles, "2025-10-08", tb).collect()
    assert(sum.map(_.getAs[String]("symbol")).toSeq === Seq("RELIANCE", "TCS"))
    val gain = Analytics.topMovers(candles, 1, gainers = true, tb).collect()
    assert(gain.head.getAs[String]("symbol") === "RELIANCE")
    val lose = Analytics.topMovers(candles, 1, gainers = false, tb).collect()
    assert(lose.head.getAs[String]("symbol") === "TCS")
  }

  test("latestPerSymbol returns the max-(ts, tieBreak) candle") {
    val out = Analytics.latestPerSymbol(candles, tb).collect()
      .map(r => r.getAs[String]("symbol") -> r.getAs[Double]("close")).toMap
    assert(out === Map("RELIANCE" -> 107.5, "TCS" -> 47.5))
  }

  test("withIndicators: SMA over n=2 matches hand-rolled average") {
    val out = Analytics.withIndicators(candles.filter(col("symbol") === "TCS"), 2, tb)
      .orderBy("ts").select("sma").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(48.5, (48.5 + 47.5) / 2))
  }

  test("withIndicatorsChunked: bit-identical to the global window, partitions by (symbol, chunk)") {
    val s = spark; import s.implicits._
    // 2 symbols × 4 days × 30 intraday rows, deterministic wobbly closes
    val df = (for {
      sym <- Seq("A", "B"); d <- 0 until 4; i <- 0 until 30
    } yield {
      val px = 100.0 + (if (sym == "A") 1 else -1) * ((d * 30 + i) % 7) * 1.5 + i * 0.25
      (sym, java.sql.Timestamp.valueOf(f"2025-10-${8 + d}%02d 09:${15 + i}%02d:00"),
        px, px + 1, px - 1, px + ((i % 3) - 1) * 0.75, 100L + i, s"f$d")
    }).toDF("symbol", "ts", "open", "high", "low", "close", "volume", "fetch_timestamp")
    val tb      = col("fetch_timestamp")
    val plain   = Analytics.withIndicators(df, 10, tb)
    val chunked = Analytics.withIndicatorsChunked(df, 10, tb, to_date(col("ts")), validate = true)
    val key     = Seq("symbol", "ts", "close")
    assert(chunked.columns.toSeq === plain.columns.toSeq)
    val p = plain.orderBy(key.map(col): _*).collect()
    val c = chunked.orderBy(key.map(col): _*).collect()
    assert(c.length === p.length)
    // exact equality row-by-row — borrowed-row trick must be bit-identical
    assert(c.toSeq === p.toSeq)
    // de-skew: the window exchange hashes on (symbol, __chunk), not symbol alone
    val plan = chunked.queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"), plan.take(2000))
  }

  test("withIndicatorsChunked: validate rejects chunks thinner than n") {
    val s = spark; import s.implicits._
    val df = (for { d <- 0 until 3; i <- 0 until 5 } yield
      ("A", java.sql.Timestamp.valueOf(f"2025-10-${8 + d}%02d 09:${15 + i}%02d:00"),
        1.0, 1.0, 1.0, 1.0, 1L, "f"))
      .toDF("symbol", "ts", "open", "high", "low", "close", "volume", "fetch_timestamp")
    intercept[IllegalArgumentException] {
      Analytics.withIndicatorsChunked(df, 10, col("fetch_timestamp"), to_date(col("ts")), validate = true)
    }
  }

  test("div-by-zero guards: zero open yields 0 pct, not null/Inf") {
    val s = spark; import s.implicits._
    val z = Seq(("Z", "2025-10-08 09:15:00", 0.0, 1.0, 0.0, 1.0, 1L, "f1"))
      .toDF("symbol", "tss", "open", "high", "low", "close", "volume", "fetch_timestamp")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = Analytics.dailyStats(z, col("fetch_timestamp")).collect().head
    assert(r.getAs[Double]("price_change_pct") === 0.0)
  }
}

class DetSpec extends SparkSpec {
  test("dsum/davg are partitioning-invariant (bit-identical)") {
    val df = graft.Tables.lineitem(spark, sf())
    def run(parts: Int): Row =
      df.repartition(parts)
        .agg(Det.dsum(col("l_extendedprice")).as("s"), Det.davg(col("l_quantity")).as("a"))
        .collect().head
    assert(run(1) === run(7))
  }

  test("dstddev matches stddev_samp to double precision") {
    val df = graft.Tables.events(spark, sf())
    val r = df.agg(
      Det.dstddev(col("value")).as("d"),
      stddev_samp(col("value")).as("s")).collect().head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
  }
}
