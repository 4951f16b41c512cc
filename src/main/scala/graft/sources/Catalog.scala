package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface registration (S13): the engine analogue of the
  * reference's Athena external tables + views
  * (sql/athena_parquet_tables.sql, sql/athena_lightweight_csv.sql).
  * Spark's file index + partition discovery replace Athena's partition
  * projection templates (SURVEY §4) — nothing to configure.
  */
object Catalog {

  /** Register the testdata tables as temp views so the whole §2 SQL
    * pack (`spark.sql(...)`) can run against them by name. */
  def registerTestTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    } // events needs its nanos-timestamp conversion:
  // (registered separately to keep the ns→µs cast)
  def registerAll(spark: SparkSession, dir: String): Unit = {
    registerTestTables(spark, dir)
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Register a normalized OHLCV parquet table plus the reference's
    * derived-column view (`ohlcv_view`,
    * sql/athena_parquet_tables.sql:43-66). */
  def registerOhlcv(spark: SparkSession, path: String): Unit = {
    spark.read.parquet(path).createOrReplaceTempView("ohlcv")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY VIEW ohlcv_view AS
      SELECT *,
             close - open AS price_change,
             CASE WHEN open <> 0 THEN (close - open) / open * 100 ELSE 0.0 END AS price_change_percent,
             high - low AS daily_range,
             CASE WHEN open <> 0 THEN (high - low) / open * 100 ELSE 0.0 END AS volatility_percent
      FROM ohlcv""")
  }

  /** The reference's Athena analytic query pack (A8/A9/W1-W4),
    * re-expressed over `ohlcv_view` — run after [[registerOhlcv]]. */
  val ohlcvQueryPack: Map[String, String] = Map(
    // sql/athena_parquet_tables.sql:70-75 — latest rows
    "latest_100" ->
      "SELECT * FROM ohlcv_view ORDER BY timestamp_unix DESC LIMIT 100",
    // :77-88 — top volume by symbol/day
    "volume_leaders" ->
      """SELECT symbol_clean, year, month, day,
         SUM(volume) AS total_volume, COUNT(1) AS n_candles
         FROM ohlcv_view GROUP BY symbol_clean, year, month, day
         ORDER BY total_volume DESC LIMIT 10""",
    // :90-102 — daily bars
    "daily_bars" ->
      """SELECT symbol_clean, year, month, day,
         MIN(low) AS day_low, MAX(high) AS day_high,
         AVG(close) AS avg_close, SUM(volume) AS total_volume
         FROM ohlcv_view GROUP BY symbol_clean, year, month, day""",
    // :104-114 — stddev volatility (A9)
    "volatility" ->
      """SELECT symbol_clean, STDDEV(price_change_percent) AS volatility,
         COUNT(1) AS n FROM ohlcv_view GROUP BY symbol_clean""",
    // :117-144 — CTE + windowed daily returns (W1-W4)
    "daily_returns" ->
      """WITH w AS (
           SELECT symbol_clean, year, month, day,
                  first_value(open) OVER (PARTITION BY symbol_clean, year, month, day
                    ORDER BY timestamp_unix) AS day_open,
                  last_value(close) OVER (PARTITION BY symbol_clean, year, month, day
                    ORDER BY timestamp_unix
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS day_close,
                  SUM(volume) OVER (PARTITION BY symbol_clean, year, month, day) AS day_volume
           FROM ohlcv_view)
         SELECT DISTINCT symbol_clean, year, month, day, day_open, day_close,
                (day_close - day_open) / day_open * 100 AS daily_return_percent, day_volume
         FROM w""")

  /** Run the whole pack, returning name → DataFrame. */
  def runOhlcvPack(spark: SparkSession): Map[String, DataFrame] =
    ohlcvQueryPack.map { case (k, sql) => k -> spark.sql(sql) }
}
