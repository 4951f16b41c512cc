package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {

  private def sample(n: Int) = {
    val s = spark; import s.implicits._
    // seeded, with heavy ties (x repeats every 7 values), negatives,
    // and fractional parts so trunc-sharding differs from the order
    (1 to n).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      (i.toLong, (r.nextInt(7) - 3) + r.nextInt(100) / 100.0)
    }.toDF("id", "x")
  }

  test("globalRank matches row_number over the unpartitioned window (ties, negatives, fractions)") {
    val df = sample(500)
    val expected = df
      .withColumn("rank", row_number().over(Window.orderBy(col("x").asc, col("id").asc)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Ranking.globalRank(df, col("x"), Seq(col("id")), shards = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rank")).toMap
    assert(got === expected)
  }

  test("globalNtile matches SQL ntile for several bucket counts, including N < buckets") {
    for ((n, buckets) <- Seq((500, 10), (500, 7), (23, 4), (3, 10))) {
      val df = sample(n)
      val expected = df
        .withColumn("tile", ntile(buckets).over(Window.orderBy(col("x").asc, col("id").asc)))
        .collect().map(r => r.getLong(0) -> r.getAs[Int]("tile")).toMap
      val got = Ranking.globalNtile(df, col("x"), Seq(col("id")), buckets, shards = 8)
        .collect().map(r => r.getLong(0) -> r.getAs[Int]("tile")).toMap
      assert(got === expected, s"n=$n buckets=$buckets")
    }
  }

  test("globalRank is shard-count invariant") {
    val df = sample(200)
    val one = Ranking.globalRank(df, col("x"), Seq(col("id")), shards = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rank")).toMap
    val many = Ranking.globalRank(df, col("x"), Seq(col("id")), shards = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rank")).toMap
    assert(one === many)
  }

  test("globalRank rejects null and NaN lead keys loudly") {
    val s = spark; import s.implicits._
    val withNull = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "x")
    val eNull = intercept[Exception] {
      Ranking.globalRank(withNull, col("x"), Seq(col("id"))).collect()
    }
    assert(eNull.getMessage.contains("null or NaN") ||
      eNull.getCause != null && eNull.getCause.getMessage.contains("null or NaN"))
    val withNan = Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "x")
    val eNan = intercept[Exception] {
      Ranking.globalRank(withNan, col("x"), Seq(col("id"))).collect()
    }
    assert(eNan.getMessage.contains("null or NaN") ||
      eNan.getCause != null && eNan.getCause.getMessage.contains("null or NaN"))
  }

  test("globalRank rejects reserved column names") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1.0, 2)).toDF("id", "x", "rank")
    val e = intercept[IllegalArgumentException] {
      Ranking.globalRank(df, col("x"), Seq(col("id")))
    }
    assert(e.getMessage.contains("reserved"))
  }
}
