package graft.streaming

import graft.SparkSpec
import graft.streaming.Stateful.{CandleIn, RunningOhlc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSpec extends SparkSpec {

  test("runningOhlc carries state across micro-batches (mapGroupsWithState)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[CandleIn]
    val q = Stateful.runningOhlc(s, in.toDS())
      .writeStream
      .format("memory")
      .queryName("running_ohlc")
      .outputMode(Stateful.outputMode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-state").toString)
      .start()

    // batch 1: out-of-order arrivals within the trigger, including a
    // duplicate-timestamp re-fetch (f2 revises the t=200 close)
    in.addData(
      CandleIn("REL", 200L, 10.5, 11.0, 10.0, 10.2, 60L, "f1"),
      CandleIn("REL", 200L, 10.5, 11.0, 10.0, 10.8, 40L, "f2"),
      CandleIn("REL", 100L, 10.0, 10.6, 9.9, 10.5, 50L, "f1"))
    q.processAllAvailable()
    val b1 = s.table("running_ohlc").as[RunningOhlc].collect().last
    assert(b1.open === 10.0)   // earliest ts wins open despite arrival order
    assert(b1.close === 10.8)  // latest (ts, fetch) wins the duplicate tie
    assert(b1.volume === 150L && b1.n === 3)

    // batch 2: a STALE re-fetch of t=200 (f0 < f2) arrives late —
    // close must NOT regress to it across the trigger boundary
    in.addData(CandleIn("REL", 200L, 10.5, 11.0, 10.0, 9.9, 10L, "f0"))
    q.processAllAvailable()
    val b2 = s.table("running_ohlc").as[RunningOhlc].collect().last
    assert(b2.close === 10.8)  // f2 still wins; stale f0 ignored for close
    assert(b2.n === 4)         // but counted as an arrival (documented)

    // batch 3: a later candle updates close/high, earlier open persists
    in.addData(CandleIn("REL", 300L, 10.8, 12.0, 10.7, 11.9, 30L, "f3"))
    q.processAllAvailable()
    val b3 = s.table("running_ohlc").as[RunningOhlc].collect().last
    assert(b3.open === 10.0)   // state survived the batch boundaries
    assert(b3.close === 11.9)
    assert(b3.high === 12.0)
    assert(b3.volume === 190L && b3.n === 5)
    q.stop()
  }
}
