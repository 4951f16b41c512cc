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

  /** Deterministic mock of the share-capital side of
    * `marketcap_snapshot` (rds_schema.sql:74-87): per master symbol,
    * shares outstanding and the free-float share (bps) — the inputs a
    * cap table provides. */
  def mockShareCapital(spark: SparkSession, symbols: Seq[String]): DataFrame = {
    import spark.implicits._
    symbols.zipWithIndex.map { case (s, i) =>
      val clean    = s.toUpperCase.replaceAll("^[A-Z]+:|-EQ$", "")
      val exchange = if (s.contains(":")) s.split(":")(0).toUpperCase else "NSE"
      (clean, exchange, (i + 1) * 100000000L, 2500 + 1500 * (i % 4)) // 25–70% free float
    }.toDF("symbol", "exchange", "shares_outstanding", "free_float_bps")
  }

  /** Build the `marketcap_snapshot` reference table
    * (rds_schema.sql:74-87) for one trading day — the derived table
    * the reference's DDL declares but its code never computes: per
    * (symbol, exchange), the day's CLOSING price (last candle of the
    * snapshot date), market cap and free-float market cap in crores
    * (₹ 10⁷), and the day's ranks by both (row_number, ties broken by
    * symbol — a deterministic TOTAL order, which a reference table
    * with a uniqueness key wants; equal caps after the 2-decimal crore
    * rounding still rank distinctly) — the column surface exactly as
    * the DDL lays it out.
    *
    * Scale shape: the fact side collapses to ONE row per symbol in a
    * slim max_by hash-agg (map-side combined) before anything joins;
    * the share-capital side is a broadcast dimension; the rank windows
    * run over the |symbols|-sized snapshot partitioned by exchange —
    * never over candles. */
  def marketcapSnapshot(
      candles: DataFrame,
      shareCapital: DataFrame,
      snapshotDate: String): DataFrame = {
    val cleanKey = regexp_replace(upper(col("symbol")), "^[A-Z]+:|-EQ$", "")
    val exchOf = when(upper(col("symbol")).contains(":"),
      split(upper(col("symbol")), ":").getItem(0)).otherwise(lit("NSE"))
    val dayClose = candles
      .filter(to_date(col("ts")) === to_date(lit(snapshotDate)))
      .select(cleanKey.as("symbol"), exchOf.as("exchange"), col("ts"), col("close"))
      .groupBy(col("symbol"), col("exchange"))
      .agg(max_by(col("close"), col("ts")).as("close_price"))
    val sc = shareCapital.select(
      col("symbol"), col("exchange"),
      col("shares_outstanding"), col("free_float_bps"))
    val snap = dayClose
      .join(broadcast(sc), Seq("symbol", "exchange"))
      .withColumn("snapshot_date", to_date(lit(snapshotDate)))
      .withColumn("market_cap_cr",
        round(col("close_price") * col("shares_outstanding") / 1e7, 2))
      .withColumn("free_float_market_cap_cr",
        round(col("market_cap_cr") * col("free_float_bps") / 10000.0, 2))
    val byCap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("exchange"))
      .orderBy(desc("market_cap_cr"), asc("symbol"))
    val byFf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("exchange"))
      .orderBy(desc("free_float_market_cap_cr"), asc("symbol"))
    snap
      .withColumn("rank_by_market_cap", row_number().over(byCap))
      .withColumn("rank_by_free_float", row_number().over(byFf))
      .select(
        col("symbol"), col("exchange"), col("snapshot_date"),
        col("market_cap_cr"), col("shares_outstanding"), col("close_price"),
        col("free_float_market_cap_cr"),
        col("rank_by_market_cap"), col("rank_by_free_float"))
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
