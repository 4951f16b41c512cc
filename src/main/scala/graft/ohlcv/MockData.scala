package graft.ohlcv

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic mock raw-snapshot generator, the engine's analogue of
  * the reference's mock candle source (ingestion/lambda_ingestion.py:
  * 476-524): N candles per symbol at a 5-minute cadence with realistic
  * O/H/L/C ordering (high ≥ max(open, close), low ≤ min(open, close)).
  *
  * Distributed by construction: `spark.range(symbols × candles)` is
  * generated partition-parallel on executors — at 100 TB-scale fixture
  * sizes nothing funnels through the driver. Pseudo-randomness is
  * hash-seeded per row id, so output is independent of partitioning.
  */
object MockData {

  /** Candle rows for `symbols`, `n` candles each, 5-min cadence
    * starting at `startUnix` (epoch seconds). */
  def candles(spark: SparkSession, symbols: Seq[String], n: Int, startUnix: Long): DataFrame = {
    val syms = symbols.toArray
    val base = spark.range(symbols.size.toLong * n)
      .select(
        element_at(typedlit(syms), (col("id") / n).cast("int") + 1).as("symbol"),
        (col("id") % n).as("i"),
        // deterministic per-row noise in [0,1): md5-derived like Portable
        (conv(substring(md5(concat(lit("mock_"), col("id"))), 1, 8), 16, 10).cast("long") % 10000L / 10000.0).as("u1"),
        (conv(substring(md5(concat(lit("mokk_"), col("id"))), 1, 8), 16, 10).cast("long") % 10000L / 10000.0).as("u2"))
    val open  = lit(1000.0) + col("u1") * 100.0
    val close = open + (col("u2") - 0.5) * 20.0
    base.select(
      col("symbol"),
      (lit(startUnix) + col("i") * 300L).as("timestamp_unix"),
      open.as("open"),
      (greatest(open, close) + col("u2") * 5.0).as("high"),
      (least(open, close) - col("u1") * 5.0).as("low"),
      close.as("close"),
      (lit(1000L) + (col("u1") * 100000).cast("long")).as("volume"))
  }

  /** Assemble candle rows into raw snapshot envelopes (old `data`-map
    * format), one JSON document per fetch, and return the envelope
    * DataFrame ready for `.write.json(...)` / `toJSON`.
    * `fetchTs` stamps `metadata.fetch_timestamp`. */
  def envelope(candleRows: DataFrame, fetchTs: String): DataFrame = {
    val asArray = candleRows.select(
      col("symbol"),
      array(
        col("timestamp_unix").cast("double"), col("open"), col("high"),
        col("low"), col("close"), col("volume").cast("double")).as("candle"),
      col("timestamp_unix"))
    val blocks = asArray
      .groupBy(col("symbol"))
      .agg(sort_array(collect_list(struct(col("timestamp_unix"), col("candle")))).as("tc"))
      .select(
        col("symbol"),
        struct(
          col("symbol"),
          lit("5").as("resolution"),
          expr("transform(tc, x -> x.candle)").as("candles"),
          lit(fetchTs).as("timestamp"),
          size(col("tc")).cast("long").as("total_records")).as("block"))
    blocks
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("symbol"), col("block")))).as("data"))
      .select(
        col("data"),
        struct(
          lit(fetchTs).as("fetch_timestamp"),
          size(map_keys(col("data"))).cast("long").as("total_symbols"),
          lit("mock").as("source")).as("metadata"))
  }
}
