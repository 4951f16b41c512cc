package graft.sources

import graft.SparkSpec
import graft.ohlcv.{MockData, Normalize, RawIngest, Storage}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CatalogSpec extends SparkSpec {

  test("registerAll exposes the testdata tables to spark.sql") {
    Catalog.registerAll(spark, sf())
    assert(spark.sql("SELECT count(*) FROM lineitem").collect().head.getLong(0) > 0)
    // events went through the ns→µs conversion
    assert(spark.sql("SELECT typeof(ts) FROM events LIMIT 1").collect()
      .head.getString(0) === "timestamp")
  }

  test("ohlcv_view + Athena query pack run over a normalized table") {
    val tmp = Files.createTempDirectory("graft-catalog").toString
    val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 10, 1759895100L)
    MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "p")
    Storage.writeParquet(norm, s"$tmp/table", "overwrite")

    Catalog.registerOhlcv(spark, s"$tmp/table")
    val results = Catalog.runOhlcvPack(spark).map { case (k, df) => k -> df.collect() }
    assert(results("latest_100").length === 20)
    assert(results("volume_leaders").nonEmpty)
    assert(results("daily_bars").length === 2)   // 2 symbols × 1 day
    assert(results("volatility").length === 2)
    val ret = results("daily_returns")
    assert(ret.length === 2)
    // derived view column sanity: daily_range = high - low on a raw row
    val row = spark.sql(
      "SELECT daily_range, high - low AS d FROM ohlcv_view LIMIT 1").collect().head
    assert(row.getDouble(0) === row.getDouble(1))
  }
}
