package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {

  private def log = {
    val s = spark; import s.implicits._
    Seq(
      // user 1: view → view (collapse) → purchase → view
      (1L, 10L, 100L, "view"),
      (1L, 20L, 101L, "view"),
      (1L, 30L, 102L, "purchase"),
      (1L, 40L, 103L, "view"),
      // user 2: single state
      (2L, 15L, 200L, "view"),
      // user 3: same-ts change, event_id breaks the tie
      (3L, 50L, 301L, "view"),
      (3L, 50L, 302L, "purchase"))
      .toDF("user_id", "t", "event_id", "event_type")
  }

  private def history = Scd.historize(
    log, col("user_id"), col("t"), col("event_id"),
    Seq("state" -> col("event_type")))

  test("historize: consecutive duplicates collapse; intervals chain; last version open") {
    val u1 = history.filter(col("key") === 1L).orderBy("version").collect()
      .map(r => (r.getAs[String]("state"), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current"), r.getAs[Long]("version")))
    assert(u1.toSeq === Seq(
      ("view", 10L, Some(30L), false, 1L),      // 20L collapsed into v1
      ("purchase", 30L, Some(40L), false, 2L),
      ("view", 40L, None, true, 3L)))           // reopened state is a NEW version
  }

  test("historize: single-state key yields one open version; same-ts change ordered by tie-break") {
    val u2 = history.filter(col("key") === 2L).collect()
    assert(u2.length === 1 && u2.head.getAs[Boolean]("is_current"))
    val u3 = history.filter(col("key") === 3L).orderBy("version").collect()
      .map(r => (r.getAs[String]("state"), r.getAs[Long]("valid_from"), r.getAs[Long]("version")))
    assert(u3.toSeq === Seq(("view", 50L, 1L), ("purchase", 50L, 2L)))
  }

  test("historize: null attribute values are versions, not changes on every row") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, 10L, 1L, Option("a")),
      (1L, 20L, 2L, Option.empty[String]), // a → null: change
      (1L, 30L, 3L, Option.empty[String]), // null → null: NOT a change
      (1L, 40L, 4L, Option("a")))
      .toDF("k", "t", "id", "v")
    val out = Scd.historize(d, col("k"), col("t"), col("id"), Seq("v" -> col("v")))
      .orderBy("version").collect()
      .map(r => (Option(r.getAs[String]("v")), r.getAs[Long]("valid_from")))
    assert(out.toSeq === Seq((Some("a"), 10L), (None, 20L), (Some("a"), 40L)))
  }

  test("historize: multi-attribute — any tracked attribute change opens a version") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, 10L, 1L, "a", 1),
      (1L, 20L, 2L, "a", 2), // second attr changes
      (1L, 30L, 3L, "a", 2)) // unchanged pair collapses
      .toDF("k", "t", "id", "x", "y")
    val out = Scd.historize(d, col("k"), col("t"), col("id"),
      Seq("x" -> col("x"), "y" -> col("y")))
    assert(out.count() === 2)
  }

  test("historize: one exchange total — change-lag and interval-lead share the sort") {
    val plan = history.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan.take(3000))
    // the second window must not re-sort the filtered changes
    assert("Sort ".r.findAllIn(plan).size <= 1, plan.take(3000))
  }

  test("currentOf: exactly one open row per key") {
    val cur = Scd.currentOf(history)
    assert(cur.count() === 3)
    assert(cur.filter(col("valid_to").isNotNull).count() === 0)
  }

  test("historize: reserved output names rejected") {
    intercept[IllegalArgumentException] {
      Scd.historize(log, col("user_id"), col("t"), col("event_id"),
        Seq("valid_from" -> col("event_type")))
    }
  }
}
