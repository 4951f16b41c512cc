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

  test("globalNtile shardKey override: a monotone shard key yields bit-identical tiles") {
    // the ADVICE r14 guard: the shardKey contract (weakly monotone in
    // the lead key) is comment-only in shardByKey — this pins that the
    // curriculumSchedule-style milli-scale override produces EXACTLY
    // the default-truncation tiles, so a future non-monotone shard key
    // fails loudly here instead of silently mis-ranking
    val s = spark; import s.implicits._
    // [0, 1] scores — the domain whose default long truncation
    // collapses to {-1, 0} (the q143 r14 find)
    val df = (1 to 400).map { i =>
      val r = new scala.util.Random(i * 40503L)
      (i.toLong, r.nextInt(1001) / 1000.0)
    }.toDF("id", "score")
    val lead = -col("score")
    val milliKey = greatest(least((-col("score") * 1000).cast("long"), lit(0L)), lit(-1000L))
    val default = Ranking.globalNtile(df, lead, Seq(col("id")), buckets = 5, shards = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("tile")).toMap
    val sharded = Ranking.globalNtile(df, lead, Seq(col("id")), buckets = 5, shards = 16,
        keyBounds = Some((-1000L, 0L)), shardKey = Some(milliKey))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("tile")).toMap
    assert(sharded === default)
    // and a deliberately NON-monotone shard key must NOT sneak through
    // this test's assertion style: it produces different tiles
    val broken = Ranking.globalNtile(df, lead, Seq(col("id")), buckets = 5, shards = 16,
        keyBounds = Some((-1000L, 0L)),
        shardKey = Some(-milliKey - 1000L)) // reverses shard order vs the lead key
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("tile")).toMap
    assert(broken !== default)
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

  test("globalRunningSum matches the unpartitioned window cumsum (ties, negatives) and is shard-invariant") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i =>
      (i, (rnd.nextInt(41) - 20).toLong, rnd.nextInt(30).toLong + 1L))
    val df = rows.toDF("id", "score", "w").repartition(13)
    val expected = rows
      .sortBy { case (id, sc, _) => (sc, id) }
      .scanLeft(0L -> 0L) { case ((_, acc), (id, _, w)) => id -> (acc + w) }
      .drop(1).toMap
    Seq(1, 7, 256).foreach { shards =>
      val got = Ranking.globalRunningSum(df, col("score"), Seq(col("id")), col("w"), shards)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("running_total")).toMap
      assert(got === expected, s"shards=$shards")
    }
    // a-priori keyBounds path: same totals, no discovery branch
    val bounded = Ranking.globalRunningSum(
      df, col("score"), Seq(col("id")), col("w"), keyBounds = Some((-20L, 20L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("running_total")).toMap
    assert(bounded === expected)
  }

  test("globalRunningSum keyBounds: an out-of-bounds lead key fails loud, never mis-shards") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 5L, 1L), (2L, 99L, 1L)).toDF("id", "score", "w")
    val e = intercept[Exception] {
      Ranking.globalRunningSum(
        df, col("score"), Seq(col("id")), col("w"), keyBounds = Some((0L, 10L))).collect()
    }
    assert(e.getMessage.contains("outside keyBounds") ||
      e.getCause != null && e.getCause.getMessage.contains("outside keyBounds"))
  }

  test("globalRunningSum rejects negative and null weights loudly") {
    val s = spark; import s.implicits._
    val neg = Seq((1L, 1L, 5L), (2L, 2L, -1L)).toDF("id", "score", "w")
    val eNeg = intercept[Exception] {
      Ranking.globalRunningSum(neg, col("score"), Seq(col("id")), col("w")).collect()
    }
    assert(eNeg.getMessage.contains("non-negative") ||
      eNeg.getCause != null && eNeg.getCause.getMessage.contains("non-negative"))
    val withNull = Seq((1L, 1L, Some(5L)), (2L, 2L, None)).toDF("id", "score", "w")
    val eNull = intercept[Exception] {
      Ranking.globalRunningSum(withNull, col("score"), Seq(col("id")), col("w")).collect()
    }
    assert(eNull.getMessage.contains("non-negative") ||
      eNull.getCause != null && eNull.getCause.getMessage.contains("non-negative"))
  }
}
