package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("columnProfile: counts, distincts, typed bounds") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "aa", Some(2.0)),
      (2L, "bbbb", None),
      (3L, "aa", Some(5.5))).toDF("id", "tag", "score")
    val out = Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("id").getAs[Long]("n_rows") === 3)
    assert(out("id").getAs[Long]("n_nulls") === 0)
    assert(out("id").getAs[Long]("n_distinct") === 3)
    assert(out("id").getAs[Double]("min_val") === 1.0)
    assert(out("score").getAs[Long]("n_nulls") === 1)
    assert(out("score").getAs[Double]("max_val") === 5.5)
    // string bounds are LENGTH bounds
    assert(out("tag").getAs[Double]("min_val") === 2.0)
    assert(out("tag").getAs[Double]("max_val") === 4.0)
  }

  test("columnProfile: all-null and unorderable columns yield null, not fabricated 0") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("id", "m")
      .withColumn("empty_d", lit(null).cast("double"))
    val out = Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // map column: distinct skipped (unorderable), bounds null — no crash
    assert(out("m").isNullAt(out("m").fieldIndex("n_distinct")))
    assert(out("m").isNullAt(out("m").fieldIndex("min_val")))
    // all-null double column: bounds null, NOT 0.0
    assert(out("empty_d").getAs[Long]("n_nulls") === 2)
    assert(out("empty_d").isNullAt(out("empty_d").fieldIndex("min_val")))
  }

  test("columnProfile approx mode: same shape, near-exact distincts at test scale") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "aa", Some(2.0)),
      (2L, "bbbb", None),
      (3L, "aa", Some(5.5))).toDF("id", "tag", "score")
    val out = Profile.columnProfile(df, exact = false).collect()
      .map(r => r.getString(0) -> r).toMap
    // HLL++ is exact at tiny cardinalities; nulls/bounds identical
    assert(out("id").getAs[Long]("n_distinct") === 3)
    assert(out("tag").getAs[Long]("n_distinct") === 2)
    assert(out("score").getAs[Long]("n_nulls") === 1)
    assert(out("score").getAs[Double]("max_val") === 5.5)
  }

  test("withSplit: deterministic, partition-invariant, roughly proportioned") {
    val s = spark; import s.implicits._
    val df = (0L until 1000L).toDF("doc_id")
    val a = Profile.withSplit(df, col("doc_id"), 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Profile.withSplit(df.repartition(13), col("doc_id"), 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a("train") > 700 && a("train") < 900)
    assert(a("val") > 50 && a("val") < 170)
    assert(a.values.sum === 1000L)
    // per-row assignment stable too (not just the counts)
    val r1 = Profile.withSplit(df, col("doc_id"), 80, 10).orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    val r2 = Profile.withSplit(df.repartition(7), col("doc_id"), 80, 10).orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    assert(r1 === r2)
  }

  test("groupCap: at most k per group, deterministic across partitionings, ranks dense from 1") {
    val s = spark; import s.implicits._
    val df = (0L until 100L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val capped = Profile.groupCap(df, col("g"), col("id"), k = 5)
    val out = capped.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    // ≤ k per group, ranks exactly 1..k
    out.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.length === 5, g)
      assert(rows.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4, 5), g)
    }
    // partition-invariant: same survivors regardless of layout
    val repart = Profile.groupCap(df.repartition(17), col("g"), col("id"), k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    assert(repart === out.toSet)
    // groups smaller than k keep everything
    val small = Profile.groupCap(df.filter(col("id") < 4), col("g"), col("id"), k = 5)
    assert(small.count() === 4)
  }

  test("stratifiedSample: rate endpoints, nesting, partition invariance") {
    val s = spark; import s.implicits._
    val df = (0L until 600L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("doc_id", "lang")
    def ids(rates: Map[String, Double]) =
      Profile.stratifiedSample(df, col("lang"), col("doc_id"), rates)
        .collect().map(_.getLong(0)).toSet
    // rate 1.0 keeps the whole stratum, 0.0 (and the default) drop it
    val all = ids(Map("en" -> 1.0, "de" -> 0.0))
    assert(all === (0L until 600L by 3).toSet)
    // nesting: a 0.2 sample is a subset of the 0.6 sample (same seed)
    val lo = ids(Map("en" -> 0.2)); val hi = ids(Map("en" -> 0.6))
    assert(lo.subsetOf(hi))
    assert(lo.size > 10 && lo.size < hi.size)
    // partition layout must not change the decision
    val repart = Profile.stratifiedSample(df.repartition(13), col("lang"), col("doc_id"), Map("en" -> 0.2))
      .collect().map(_.getLong(0)).toSet
    assert(repart === lo)
  }
}

class SessionizeSpec extends SparkSpec {
  test("sessions split exactly at the gap, µs-precision; rollups per session") {
    val s = spark; import s.implicits._
    val rows = Seq(
      // user 1: two sessions, gap of exactly 3600s between e3/e4 (NOT > gap → same session)
      (1L, "2025-10-08 10:00:00", 1L, 1.0),
      (1L, "2025-10-08 10:30:00", 2L, 2.0),
      (1L, "2025-10-08 11:30:00", 3L, 3.0),  // 3600s after e2 → same session
      (1L, "2025-10-08 12:30:01", 4L, 4.0),  // 3601s after e3 → NEW session
      // user 2: single event
      (2L, "2025-10-08 09:00:00", 5L, 9.0))
      .toDF("user_id", "tss", "event_id", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Sessionize.sessions(rows, col("user_id"), col("ts"), col("event_id"), 3600L, col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.keySet === Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(out((1L, 1L)).getAs[Long]("n_events") === 3)
    assert(out((1L, 1L)).getAs[Double]("sum_value") === 6.0)
    assert(out((1L, 2L)).getAs[Long]("n_events") === 1)
    assert(out((2L, 1L)).getAs[Long]("n_events") === 1)
  }
}
