package graft.ohlcv

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** OHLCV × `security_master` enrichment — the join SURVEY §2.6 declares
  * as an extension: the reference defines the reference table
  * (`sql/rds_schema.sql:22-41`: symbol, exchange, isin, company, sector,
  * industry, lot/face value, listing date) and writes it from its ETL,
  * but never joins it in code; an analytics engine should.
  *
  * Scale shape: security masters are thousands of rows (KB–MB) against
  * a fact table of billions — the textbook broadcast dimension. The
  * join key is the CLEANED symbol + exchange so `NSE:TCS-EQ` candles
  * meet a `(TCS, NSE)` master row; the fact side is never shuffled
  * (PlanSpec-pinned BroadcastHashJoin).
  */
object Enrichment {

  /** Deterministic mock of `security_master` for the given exchange
    * symbols (`NSE:X-EQ` form) — schema follows rds_schema.sql:22-41. */
  def mockSecurityMaster(spark: SparkSession, symbols: Seq[String]): DataFrame = {
    import spark.implicits._
    symbols.zipWithIndex.map { case (s, i) =>
      val clean    = s.toUpperCase.replaceAll("^[A-Z]+:|-EQ$", "")
      val exchange = if (s.contains(":")) s.split(":")(0).toUpperCase else "NSE"
      (clean, exchange, f"INE${i}%03dA01001", s"$clean Ltd",
        Seq("IT", "FINANCIALS", "ENERGY")(i % 3),
        Seq("Software", "Banking", "Oil & Gas")(i % 3),
        1, 10.0, "EQUITY", true)
    }.toDF("symbol", "exchange", "isin_code", "company_name", "sector",
      "industry", "market_lot", "face_value", "instrument_type", "is_active")
  }

  /** Left-join master attributes onto the canonical candle frame.
    * Left join: a candle for an unlisted/unknown symbol survives with
    * null attributes (enrichment must never drop fact rows). */
  def enrich(candles: DataFrame, master: DataFrame): DataFrame = {
    val m = master.select(
      col("symbol").as("__msym"), col("exchange").as("__mex"),
      col("isin_code"), col("company_name"), col("sector"), col("industry"))
    // generic exchange strip (not P6's NSE-only cleanSymbol): a BSE:X
    // candle must meet its (X, BSE) master row too
    val cleanKey = regexp_replace(upper(col("symbol")), "^[A-Z]+:|-EQ$", "")
    candles
      .join(
        broadcast(m),
        cleanKey === col("__msym") &&
          when(upper(col("symbol")).contains(":"),
            split(upper(col("symbol")), ":").getItem(0)).otherwise(lit("NSE")) === col("__mex"),
        "left")
      .drop("__msym", "__mex")
  }
}
