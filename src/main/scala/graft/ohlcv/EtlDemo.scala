package graft.ohlcv

import graft.operators.Analytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the OHLCV pipeline (the reference's
  * canonical flow, SURVEY §3.2): mock fetch → raw JSON landing →
  * schema'd ingest → normalize → partitioned parquet → dedup contract
  * → analytics queries. Usage: `runMain graft.ohlcv.EtlDemo [workdir]`.
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

    // two overlapping 5-min fetches (the T4 duplicate scenario)
    MockData.envelope(MockData.candles(spark, symbols, 20, t0), "2025-10-08T04:00:00Z")
      .coalesce(1).write.mode("overwrite").json(s"$work/raw/f1")
    MockData.envelope(MockData.candles(spark, symbols, 25, t0), "2025-10-08T04:05:00Z")
      .coalesce(1).write.mode("overwrite").json(s"$work/raw/f2")

    val raw  = RawIngest.readRaw(spark, s"$work/raw/*")
    val norm = Normalize.normalize(RawIngest.blocks(raw), processedAt = "2025-10-08T10:30:00Z")
    Storage.writeParquet(Storage.dedupContract(norm), s"$work/table", mode = "overwrite")

    val table   = Storage.readParquet(spark, s"$work/table")
    val candles = Normalize.asCandles(table)
    println(s"DEMO normalized_rows=${norm.count()} deduped_rows=${table.count()}")
    println("DEMO daily_summary:")
    Analytics.dailySummary(candles, "2025-10-08", col("fetch_timestamp"))
      .show(truncate = false)
    println("DEMO resampled_15m:")
    Api.getOhlcvResampled(candles, "RELIANCE", None, None, "15m").show(truncate = false)
    println("DEMO latest:")
    Api.latest(candles).show(truncate = false)
    println(s"DEMO workdir=$work")
    spark.stop()
  }
}
