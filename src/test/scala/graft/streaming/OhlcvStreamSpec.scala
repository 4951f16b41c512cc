package graft.streaming

import graft.SparkSpec
import graft.ohlcv.MockData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming semantics (T1-T5): file-source micro-batches over a raw
  * landing dir, watermarked dedup of overlapping fetches, latest-price
  * view. Runs with Trigger.AvailableNow against a temp dir — the same
  * plan a ProcessingTime("5 minutes") deployment would run.
  */
class OhlcvStreamSpec extends SparkSpec {
  private lazy val tmp = Files.createTempDirectory("graft-stream").toString
  private val symbols  = Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ")
  private val t0       = 1759895100L

  private def land(): Unit = {
    // two overlapping fetches: second re-downloads the same candles
    // plus one new one (the T4 duplicate scenario)
    val c1 = MockData.candles(spark, symbols, n = 5, startUnix = t0)
    val c2 = MockData.candles(spark, symbols, n = 6, startUnix = t0)
    MockData.envelope(c1, "2025-10-08T04:00:00Z").coalesce(1).write.json(s"$tmp/land/f1")
    MockData.envelope(c2, "2025-10-08T04:05:00Z").coalesce(1).write.json(s"$tmp/land/f2")
  }

  test("stream: normalize + watermark dedup collapses overlapping fetches") {
    land()
    val raw  = OhlcvStream.readRawStream(spark, s"$tmp/land/*")
    val norm = OhlcvStream.normalized(raw, processedAt = "p")
    val dd   = OhlcvStream.dedupedStream(norm)
    val q = dd.writeStream
      .format("memory")
      .queryName("dedup_out")
      .option("checkpointLocation", s"$tmp/ckpt1")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_out")
    // 2 symbols × 6 distinct timestamps — duplicates dropped
    assert(out.count() === 12)
    assert(out.groupBy("symbol_clean", "timestamp_unix").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("stream: latest-per-symbol update-mode aggregation") {
    val raw  = OhlcvStream.readRawStream(spark, s"$tmp/land/*")
    val norm = OhlcvStream.normalized(raw, processedAt = "p")
    val q = OhlcvStream.latestPerSymbol(norm).writeStream
      .format("memory")
      .queryName("latest_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$tmp/ckpt2")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("latest_out").collect()
      .map(r => r.getAs[String]("symbol_clean") -> r.getAs[Long]("timestamp_unix")).toMap
    assert(out.keySet === Set("RELIANCE", "TCS"))
    // the latest candle is the 6th of the second fetch
    assert(out.values.toSet === Set(t0 + 5 * 300L))
  }

  test("stream: watermarked windowed OHLCV aggregation (1h tumbling)") {
    val raw  = OhlcvStream.readRawStream(spark, s"$tmp/land/*")
    val norm = OhlcvStream.normalized(raw, processedAt = "p")
    val q = OhlcvStream.windowedCandles(norm, "1 hour").writeStream
      .format("memory")
      .queryName("windowed_out")
      .outputMode("update") // observe windows before watermark expiry
      .option("checkpointLocation", s"$tmp/ckpt3")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("windowed_out")
    // candles at 03:45..04:10 UTC → windows 03:00 and 04:00, 2 symbols
    assert(out.select("symbol_clean", "window_start").distinct().count() === 4)
    val rel = out.filter(col("symbol_clean") === "RELIANCE" &&
      col("window_start") === "2025-10-08 03:00:00").collect().head
    assert(rel.getAs[Long]("n_candles") === 6L) // 3 distinct ts × 2 fetches
    assert(rel.getAs[Double]("high") >= rel.getAs[Double]("low"))
  }

  test("stream: keep-latest dedup — newer re-fetch replaces the earlier row (D2 contract)") {
    // dedicated landing dir with FORCED distinct mod-times so the file
    // source is guaranteed to process f1 and f2 in separate triggers
    // (maxFilesPerTrigger=1 batches in mod-time order)
    val c1 = MockData.candles(spark, symbols, n = 5, startUnix = t0)
    val c2 = MockData.candles(spark, symbols, n = 6, startUnix = t0)
    MockData.envelope(c1, "2025-10-08T04:00:00Z").coalesce(1).write.json(s"$tmp/kland/f1")
    MockData.envelope(c2, "2025-10-08T04:05:00Z").coalesce(1).write.json(s"$tmp/kland/f2")
    val now = System.currentTimeMillis()
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/kland")).forEach { p =>
      val bump = if (p.toString.contains("/f2/")) 60000L else 0L
      java.nio.file.Files.setLastModifiedTime(
        p, java.nio.file.attribute.FileTime.fromMillis(now + bump))
    }
    val raw  = OhlcvStream.readRawStream(spark, s"$tmp/kland/*", maxFilesPerTrigger = 1)
    val norm = OhlcvStream.normalized(raw, processedAt = "p")
    val q = Stateful.keepLatestDedup(spark, norm).toDF().writeStream
      .format("memory")
      .queryName("kl_out")
      .outputMode("update")
      .option("checkpointLocation", s"$tmp/ckpt_kl")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("kl_out")
    // 2 symbols × 6 distinct timestamps survive
    assert(out.select("symbol_clean", "timestamp_unix").distinct().count() === 12)
    // every key's FINAL survivor carries the newest fetch stamp: the
    // 04:05 re-fetch replaced the 04:00 originals
    val finals = out.groupBy("symbol_clean", "timestamp_unix")
      .agg(max_by(col("fetch_timestamp"), col("fetch_timestamp")).as("f"),
        count(lit(1)).as("emissions"))
    assert(finals.filter(col("f") =!= "2025-10-08T04:05:00Z").count() === 0)
    // replacement EMITTED: the 10 overlapping keys emit twice (first
    // arrival + update), the one new candle per symbol emits once
    assert(finals.filter(col("emissions") === 2).count() === 10)
    assert(finals.filter(col("emissions") === 1).count() === 2)
  }

  test("stream: parquetSink restart from checkpoint keeps the dedup contract (no dupes, no loss)") {
    // Kill-and-resume semantics: run the sink over the first fetch,
    // STOP the query, land an overlapping re-fetch, restart the SAME
    // sink from the SAME checkpoint. The restored state must (a) not
    // re-emit the first fetch's committed rows (sink exactly-once),
    // (b) still drop the overlap keys first seen before the restart
    // (dedup state restored), (c) keep the genuinely new candle.
    val land = s"$tmp/rland"
    val out  = s"$tmp/rout"
    val ckpt = s"$tmp/ckpt_restart"
    def runOnce(): Unit = {
      val raw  = OhlcvStream.readRawStream(spark, s"$land/*")
      val norm = OhlcvStream.normalized(raw, processedAt = "p")
      val q = OhlcvStream.parquetSink(OhlcvStream.dedupedStream(norm), out, ckpt)
        .trigger(Trigger.AvailableNow()) // test trigger; same plan
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    val c1 = MockData.candles(spark, symbols, n = 5, startUnix = t0)
    MockData.envelope(c1, "2025-10-08T04:00:00Z").coalesce(1).write.json(s"$land/f1")
    runOnce() // first incarnation, then the query is stopped
    assert(spark.read.parquet(out).count() === 10) // 2 symbols × 5 candles

    val c2 = MockData.candles(spark, symbols, n = 6, startUnix = t0) // 5 dups + 1 new
    MockData.envelope(c2, "2025-10-08T04:05:00Z").coalesce(1).write.json(s"$land/f2")
    runOnce() // resumed incarnation from the same checkpoint
    val rows = spark.read.parquet(out)
    assert(rows.count() === 12, "restart re-emitted committed rows or dropped the new candle")
    assert(rows.select("symbol_clean", "timestamp_unix").distinct().count() === 12)
    // the overlap keys kept their FIRST-arrival fetch stamp (state
    // survived the restart; the re-fetch did not replace them)
    assert(rows.filter(col("timestamp_unix") <= t0 + 4 * 300L &&
      col("fetch_timestamp") =!= "2025-10-08T04:00:00Z").count() === 0)
  }

  test("trading-hours predicate keeps IST 09:15-15:30 Mon-Fri only") {
    val s = spark; import s.implicits._
    val rows = Seq(
      1759895100L, // Wed 2025-10-08 09:15 IST → keep
      1759916700L, // Wed 15:15 IST → keep
      1759917600L, // Wed 15:30 IST → keep (inclusive)
      1759917660L, // Wed 15:31 IST → drop
      1759863600L, // Wed 00:30 IST → drop
      1760175900L  // Sat 2025-10-11 ~09:15 IST → drop (weekend)
    ).toDF("tsu")
    val kept = OhlcvStream.tradingHours(col("tsu"))(rows).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1759895100L, 1759916700L, 1759917600L))
  }
}
