package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamJoinsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("joinWithin: ticks pick up same-symbol events within the delay window; state-bounded plan") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ticks  = MemoryStream[(String, java.sql.Timestamp, Double)]
    val events = MemoryStream[(String, java.sql.Timestamp, String)]
    ticks.addData(
      ("A", ts("2024-01-01 10:30:00"), 101.0), // after ev1 (30 min) → match
      ("A", ts("2024-01-01 12:00:00"), 99.0),  // 2h after ev1 → no match
      ("B", ts("2024-01-01 10:30:00"), 5.0))   // other symbol → no match
    events.addData(
      ("A", ts("2024-01-01 10:00:00"), "earnings"),
      ("B", ts("2024-01-01 11:00:00"), "split")) // AFTER B's tick → no match
    val joined = StreamJoins.joinWithin(
      ticks.toDF.toDF("symbol", "tick_ts", "price"),
      events.toDF.toDF("symbol", "event_ts", "headline"),
      key = "symbol", leftTime = "tick_ts", rightTime = "event_ts",
      maxDelaySeconds = 3600L)
    val q = joined.writeStream.format("memory").queryName("ss_join_out").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("ss_join_out")
      .select("symbol", "price", "headline").as[(String, Double, String)].collect().toSet
    assert(out === Set(("A", 101.0, "earnings")))
  }

  test("joinWithin: same plan runs on batch frames (backfill path)") {
    val s = spark; import s.implicits._
    val l = Seq(("A", ts("2024-01-01 10:30:00"), 1L)).toDF("symbol", "tick_ts", "id")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), "x"), ("A", ts("2024-01-01 09:00:00"), "old"))
      .toDF("symbol", "event_ts", "tag")
    val out = StreamJoins.joinWithin(l, r, "symbol", "tick_ts", "event_ts", 3600L)
    assert(out.select("tag").as[String].collect().toSeq === Seq("x"))
  }

  test("sessionizedStream: gap-separated bursts close as distinct sessions") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    in.addData(
      (7L, ts("2024-01-01 10:00:00"), 1.0),
      (7L, ts("2024-01-01 10:20:00"), 2.0), // same session (< 1h gap)
      (7L, ts("2024-01-01 14:00:00"), 5.0), // new session (> 1h gap)
      (9L, ts("2024-01-01 10:05:00"), 4.0))
    // watermark must pass the sessions for append mode to emit them
    in.addData((7L, ts("2024-01-03 00:00:00"), 0.0))
    val sessions = OhlcvStream.sessionizedStream(
      in.toDF.toDF("user_id", "ts", "value"),
      key = col("user_id"), eventTime = col("ts"), value = col("value"), gap = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("session_out")
      .select("key", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(out.contains((7L, 2L, 3.0))) // the 10:00 burst
    assert(out.contains((7L, 1L, 5.0))) // the 14:00 burst
    assert(out.contains((9L, 1L, 4.0)))
  }

  test("joinWithin: overlapping non-key columns are rejected loudly") {
    val s = spark; import s.implicits._
    val l = Seq(("A", ts("2024-01-01 10:30:00"), 1.0)).toDF("symbol", "tick_ts", "v")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 2.0)).toDF("symbol", "event_ts", "v")
    val e = intercept[IllegalArgumentException] {
      StreamJoins.joinWithin(l, r, "symbol", "tick_ts", "event_ts", 3600L)
    }
    assert(e.getMessage.contains("rename overlapping"))
  }

  test("joinWithin: a right side missing the key gets the missing-key error, not the overlap one") {
    val s = spark; import s.implicits._
    val l = Seq(("A", ts("2024-01-01 10:30:00"), 1.0)).toDF("symbol", "tick_ts", "v")
    val r = Seq((ts("2024-01-01 10:00:00"), 2.0)).toDF("event_ts", "ev")
    val e = intercept[IllegalArgumentException] {
      StreamJoins.joinWithin(l, r, "symbol", "tick_ts", "event_ts", 3600L)
    }
    assert(e.getMessage.contains("missing the join key"))
  }
}
