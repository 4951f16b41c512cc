package graft.ohlcv

import graft.operators.Analytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the FULL reference lifecycle (SURVEY
  * §3.2 + `examples/query_analytics.py:67-90` + the dashboard/REST
  * surface): mock fetch → raw JSON landing → schema'd ingest →
  * normalize → dedup contract → partitioned parquet → the four
  * canonical analytics queries → REST serving (symbols / resampled
  * OHLCV / latest / file inventory) against the same table.
  *
  * Usage: `sbt "runMain graft.ohlcv.EtlDemo [workdir]"` — no external
  * services; the REST step runs a real loopback HTTP server and
  * queries it like a dashboard would.
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-etl-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val symbols = Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ", "NSE:INFY-EQ")
    val t0      = 1759895100L // 2025-10-08 09:15 IST

    // 1. ingest: two overlapping 5-min fetches (the T4 duplicate
    //    scenario) land as raw JSON envelopes
    MockData.envelope(MockData.candles(spark, symbols, 20, t0), "2025-10-08T04:00:00Z")
      .coalesce(1).write.mode("overwrite").json(s"$work/raw/f1")
    MockData.envelope(MockData.candles(spark, symbols, 25, t0), "2025-10-08T04:05:00Z")
      .coalesce(1).write.mode("overwrite").json(s"$work/raw/f2")

    // 2. ETL: schema'd raw scan → normalize → dedup → partitioned parquet
    val raw  = RawIngest.readRaw(spark, s"$work/raw/*")
    val norm = Normalize.normalize(RawIngest.blocks(raw), processedAt = "2025-10-08T10:30:00Z")
    Storage.writeParquet(Storage.dedupContract(norm), s"$work/table", mode = "overwrite")

    val table   = Storage.readParquet(spark, s"$work/table")
    val candles = Normalize.asCandles(table)
    println(s"DEMO normalized_rows=${norm.count()} deduped_rows=${table.count()}")

    // 3. the reference's four canonical analytics queries
    //    (query_analytics.py examples 1-4)
    println("DEMO symbol_stats RELIANCE 2025-10-08:")
    Analytics.symbolStats(candles, "RELIANCE", "2025-10-08", col("fetch_timestamp"))
      .show(truncate = false)
    println("DEMO daily_summary:")
    Analytics.dailySummary(candles, "2025-10-08", col("fetch_timestamp"))
      .show(truncate = false)
    println("DEMO date_range RELIANCE:")
    Analytics.dateRange(candles, "RELIANCE", "2025-10-08", "2025-10-08", col("fetch_timestamp"))
      .show(truncate = false)
    println("DEMO top_movers (gainers, n=2):")
    Analytics.topMovers(candles, 2, gainers = true, col("fetch_timestamp"))
      .show(truncate = false)
    println("DEMO resampled_15m:")
    Api.getOhlcvResampled(candles, "RELIANCE", None, None, "15m").show(truncate = false)
    println("DEMO latest:")
    Api.latest(candles).show(truncate = false)

    // 4. REST serving over the SAME partitioned table (predicate
    //    pushdown on /ohlcv) + the dashboard's /files inventory over
    //    the raw landing dir — a real loopback HTTP round-trip
    val server = graft.serving.ApiServer.startFromTable(
      spark, s"$work/table",
      graft.serving.ApiServer.Config(filesDir = Some(s"$work/raw")))
    try {
      def get(path: String): String = {
        val u = java.net.URI.create(s"http://127.0.0.1:${server.port}$path").toURL
        val c = u.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val in = scala.io.Source.fromInputStream(
          if (c.getResponseCode < 400) c.getInputStream else c.getErrorStream, "UTF-8")
        try in.mkString finally { in.close(); c.disconnect() }
      }
      println(s"DEMO GET /symbols -> ${get("/symbols")}")
      val ohlcv = get("/ohlcv/RELIANCE?interval=15m&limit=3")
      println(s"DEMO GET /ohlcv/RELIANCE?interval=15m&limit=3 -> ${ohlcv.take(400)}")
      println(s"DEMO GET /latest?symbols=RELIANCE -> ${get("/latest?symbols=RELIANCE").take(400)}")
      println(s"DEMO GET /files?limit=2 -> ${get("/files?limit=2")}")
    } finally server.stop()

    println(s"DEMO workdir=$work")
    spark.stop()
  }
}
