package graft.sinks

import graft.SparkSpec
import graft.ohlcv.{MockData, Normalize, RawIngest, Storage}
import graft.sinks.Notify._

class NotifySpec extends SparkSpec {
  private def notifications(dir: String): Seq[String] = {
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(d)) return Seq.empty
    val it = java.nio.file.Files.list(d).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) out += new String(java.nio.file.Files.readAllBytes(it.next()), "UTF-8")
    out.toSeq
  }

  test("success notification carries the run stats from the SAME normalized relation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-notify").toString
    MockData.envelope(
      MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), n = 3, startUnix = 1759895100L),
      "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
    val raw = RawIngest.readRaw(spark, s"$tmp/raw")
    val out = withCompletionNotify(
      new FileNotifier(s"$tmp/notif"),
      statsOf = (df: org.apache.spark.sql.DataFrame) => Storage.runMetadata(df, "graft-etl"),
      resolution = "5",
      nowIso = "2025-10-08T04:05:00Z") {
      Normalize.normalize(RawIngest.blocks(raw), processedAt = "p")
    }
    assert(out.count() === 6)
    val msgs = notifications(s"$tmp/notif")
    assert(msgs.size === 1)
    assert(msgs.head.contains("Success"))
    assert(msgs.head.contains("Total records processed: 6"))
    assert(msgs.head.contains("Symbols processed: 2"))
    assert(msgs.head.contains("Resolution: 5"))
  }

  test("failure notification fires and the job error still propagates; publish errors never mask it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-notify").toString
    val boom = intercept[RuntimeException] {
      withCompletionNotify(
        new FileNotifier(tmp),
        statsOf = (df: org.apache.spark.sql.DataFrame) => df,
        resolution = "5",
        nowIso = "t") {
        if (true) throw new RuntimeException("etl exploded")
        spark.emptyDataFrame
      }
    }
    assert(boom.getMessage === "etl exploded")
    val msgs = notifications(tmp)
    assert(msgs.size === 1 && msgs.head.contains("FAILURE") && msgs.head.contains("etl exploded"))

    // a throwing transport is swallowed — the job outcome wins
    val broken = new Notifier {
      override def publish(s: String, m: String): Unit = throw new IllegalStateException("sns down")
    }
    val boom2 = intercept[RuntimeException] {
      withCompletionNotify(broken, (df: org.apache.spark.sql.DataFrame) => df, "5", "t") {
        if (true) throw new RuntimeException("real error")
        spark.emptyDataFrame
      }
    }
    assert(boom2.getMessage === "real error")
  }
}
