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
}
