package graft.ohlcv

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def candles = Seq(
    ("NSE:TCS-EQ", "2025-10-08 09:15:00", 1.0),
    ("NSE:TCS-EQ", "2025-10-08 09:20:00", 1.1),
    ("NSE:RELIANCE-EQ", "2025-10-08 09:15:00", 2.0),
    ("NSE:UNKNOWN-EQ", "2025-10-08 09:15:00", 3.0) // not in master
  ).toDF("symbol", "tss", "close")
    .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("enrich: broadcast join on cleaned symbol+exchange, unmatched facts survive") {
    val master = Enrichment.mockSecurityMaster(spark, Seq("NSE:TCS-EQ", "NSE:RELIANCE-EQ"))
    val out = Enrichment.enrich(candles, master)
    assert(out.count() === 4) // left join: no fact row dropped
    val tcs = out.filter(col("symbol") === "NSE:TCS-EQ").select("company_name", "sector")
      .distinct().collect()
    assert(tcs.length === 1 && tcs.head.getString(0) === "TCS Ltd")
    val unknown = out.filter(col("symbol") === "NSE:UNKNOWN-EQ").collect()
    assert(unknown.length === 1 && unknown.head.isNullAt(unknown.head.fieldIndex("sector")))
    // the dimension broadcasts; the fact side never shuffles
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange hashpartitioning"),
      "fact side must not shuffle for a dimension join:\n" + plan.take(1500))
  }

  test("mockSecurityMaster: rds_schema.sql column surface and exchange parse") {
    val m = Enrichment.mockSecurityMaster(spark, Seq("NSE:TCS-EQ", "BSE:X"))
    assert(m.columns.toSeq === Seq("symbol", "exchange", "isin_code", "company_name",
      "sector", "industry", "market_lot", "face_value", "instrument_type", "is_active"))
    val rows = m.orderBy("symbol").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("TCS", "NSE"), ("X", "BSE")))
  }

  test("marketcapSnapshot: rds_schema.sql:74-87 surface — day close, crore caps, per-exchange dual ranks") {
    // TCS closes at 1.1 (last candle of the day wins), RELIANCE at 2.0;
    // a candle on ANOTHER day must not leak into the snapshot
    val withOtherDay = candles.unionByName(
      Seq(("NSE:TCS-EQ", "2025-10-09 09:15:00", 9.9)).toDF("symbol", "tss", "close")
        .withColumn("ts", to_timestamp(col("tss"))).drop("tss"))
    val sc = Enrichment.mockShareCapital(spark, Seq("NSE:TCS-EQ", "NSE:RELIANCE-EQ"))
    val out = Enrichment.marketcapSnapshot(withOtherDay, sc, "2025-10-08")
    assert(out.columns.toSeq === Seq("symbol", "exchange", "snapshot_date",
      "market_cap_cr", "shares_outstanding", "close_price", "free_float_market_cap_cr",
      "rank_by_market_cap", "rank_by_free_float"))
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("TCS", "RELIANCE")) // UNKNOWN has no cap table row
    val tcs = rows("TCS")
    assert(tcs.getAs[Double]("close_price") === 1.1)
    // 1.1 × 1e8 shares / 1e7 = 11 cr; free float 25% → 2.75 cr
    assert(tcs.getAs[Double]("market_cap_cr") === 11.0)
    assert(tcs.getAs[Double]("free_float_market_cap_cr") === 2.75)
    val rel = rows("RELIANCE")
    // 2.0 × 2e8 / 1e7 = 40 cr; free float 40% → 16 cr
    assert(rel.getAs[Double]("market_cap_cr") === 40.0)
    assert(rel.getAs[Double]("free_float_market_cap_cr") === 16.0)
    // dual ranks: RELIANCE leads both
    assert(rel.getAs[Int]("rank_by_market_cap") === 1 && tcs.getAs[Int]("rank_by_market_cap") === 2)
    assert(rel.getAs[Int]("rank_by_free_float") === 1 && tcs.getAs[Int]("rank_by_free_float") === 2)
    // the snapshot key is unique per (symbol, exchange, snapshot_date)
    assert(out.select("symbol", "exchange", "snapshot_date").distinct().count() === out.count())
    // cap table broadcasts; candles collapse in a hash-agg first
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }
}
