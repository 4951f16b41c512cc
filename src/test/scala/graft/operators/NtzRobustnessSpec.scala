package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Round-3 regression guard: the testdata refresh flipped `events.ts`
  * from TIMESTAMP to TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) and
  * silently broke every operator doing bare `unix_micros` arithmetic
  * (sessionize, range join, as-of tolerance). This suite runs each
  * ts-arithmetic operator over BOTH timestamp flavors of the same
  * instants and asserts identical results, so the next storage-layer
  * type shift fails HERE, not three queries deep in the driver gate.
  * (With the session timezone pinned to UTC the NTZ→TZ cast is a pure
  * type re-tag, so equality is exact, not approximate.)
  */
class NtzRobustnessSpec extends SparkSpec {
  import spark.implicits._

  /** Same instants, chosen so sessionize splits (gap > 60 s between
    * t=100 and t=400) and as-of tolerance both hits and misses. */
  private val times = Seq(0L, 30L, 100L, 400L, 460L, 1000L)

  private def events(t: org.apache.spark.sql.types.DataType): DataFrame =
    times.zipWithIndex
      .map { case (s, i) => (i.toLong, "k", s, 1.0 + i) }
      .toDF("id", "key", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")).cast(t))
      .drop("sec")

  /** Collected rows with any timestamp column re-tagged to TIMESTAMP so
    * the two flavors compare value-wise. */
  private def rows(df: DataFrame): Seq[String] = {
    val normed = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
    normed.collect().map(_.toString).toSeq.sorted
  }

  private def bothFlavors(name: String)(run: DataFrame => DataFrame): Unit = {
    val tz  = rows(run(events(TimestampType)))
    val ntz = rows(run(events(TimestampNTZType)))
    assert(tz.nonEmpty, s"$name produced no rows — the fixture no longer exercises it")
    assert(tz === ntz, s"$name diverges between TIMESTAMP and TIMESTAMP_NTZ")
  }

  test("sessionize: identical sessions over TIMESTAMP and TIMESTAMP_NTZ") {
    bothFlavors("sessionize") { e =>
      Sessionize.sessions(e, col("key"), col("ts"), col("id"), gapSeconds = 60, col("value"))
    }
  }

  test("range join: identical point-in-interval matches over both flavors") {
    bothFlavors("rangeJoin") { e =>
      val intervals = e.select(
        col("key"), col("ts").as("start"),
        (col("ts") + expr("INTERVAL 90 SECONDS")).as("end"), col("id").as("iid"))
      RangeJoin.pointInInterval(
        e.select(col("key"), col("ts"), col("id")), col("ts"),
        intervals, col("start"), col("end"), "key", bucketSeconds = 60)
    }
  }

  test("as-of join with tolerance: identical matches over both flavors") {
    bothFlavors("asOfTolerance") { e =>
      val quotes = e.select(col("key"), col("ts").as("qts"), col("value").as("px"), col("id").as("qid"))
      AsOfJoin.backward(
        e.select(col("key"), col("ts"), col("id")), quotes,
        col("key"), col("ts"), col("qts"), col("qid"),
        payload = Seq("px" -> col("px")),
        tolerance = Some(60L))
    }
  }

  test("resample: identical candles over both flavors") {
    bothFlavors("resample") { e =>
      Resample.ticksToCandles(
        e.withColumn("symbol", col("key")),
        col("symbol"), col("ts"), col("value"), lit(1.0), col("id"),
        bucketSeconds = 300)
    }
  }
}
