package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("pointInInterval: bucketized join equals the naive BETWEEN join") {
    val s = spark; import s.implicits._
    val points = (0 until 200).map(i => ("u" + i % 5, s"2025-10-08 0${i % 10 / 2}:0${i % 6}:0${i % 10}", i))
      .toDF("user", "tss", "pid")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val intervals = Seq(
      ("u0", "2025-10-08 00:00:00", "2025-10-08 01:00:00", 1L),
      ("u1", "2025-10-08 02:00:00", "2025-10-08 04:30:00", 2L), // crosses bucket borders
      ("u2", "2025-10-08 03:00:00", "2025-10-08 03:00:00", 3L), // degenerate point interval
      ("u9", "2025-10-08 00:00:00", "2025-10-08 23:00:00", 4L)) // no points for key
      .toDF("user", "ss", "es", "iid")
      .withColumn("iv_start", to_timestamp(col("ss")))
      .withColumn("iv_end", to_timestamp(col("es"))).drop("ss", "es")

    val bucketized = RangeJoin.pointInInterval(
      points, col("ts"), intervals, col("iv_start"), col("iv_end"),
      key = "user", bucketSeconds = 1800L)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getLong(1))).toSet

    val naive = points.as("p").join(intervals.as("i"),
      col("p.user") === col("i.user") && col("p.ts").between(col("iv_start"), col("iv_end")))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getLong(1))).toSet

    assert(bucketized === naive)
    assert(naive.nonEmpty)
    // each matching pair appears exactly once (point has one bucket)
    val rows = RangeJoin.pointInInterval(
      points, col("ts"), intervals, col("iv_start"), col("iv_end"), "user", 1800L)
      .select("pid", "iid").collect()
    assert(rows.length === rows.distinct.length)
  }
}
