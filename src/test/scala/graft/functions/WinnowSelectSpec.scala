package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSelectSpec extends SparkSpec {

  /** Reference implementation: the explicit per-window rightmost-min,
    * O(m·w) — the semantics WinnowSelect must reproduce exactly. */
  private def reference(hs: Seq[Long], w: Int): Seq[Int] = {
    if (hs.isEmpty) return Seq.empty
    val m = hs.length
    (1 to math.max(m - w + 1, 1)).map { j =>
      val win = hs.slice(j - 1, j - 1 + w)
      j + win.lastIndexOf(win.min) // 1-based j + 0-based rightmost argmin
    }.distinct
  }

  test("matches the per-window reference on adversarial shapes") {
    val s = spark; import s.implicits._
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty,
      Seq(5L),
      Seq(3L, 3L, 3L),                      // all ties, shorter than w
      Seq(9L, 1L, 1L, 9L, 1L, 2L),          // interior ties
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),      // increasing: min pinned left
      Seq(7L, 6L, 5L, 4L, 3L, 2L, 1L),      // decreasing: min always incoming
      (0 until 64).map(i => ((i * 2654435761L) % 97): Long), // pseudo-random
      (0 until 64).map(i => (i % 3): Long))  // dense ties
    val df = cases.zipWithIndex.map { case (a, i) => (i, a) }.toDF("i", "hs")
    val out = df.select(col("i"), WinnowSelect(col("hs"), 4).as("sel"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    cases.zipWithIndex.foreach { case (a, i) =>
      assert(out(i) === reference(a, 4), s"case $i: $a")
    }
  }

  test("null-safe, type-checked, and every window covered") {
    val s = spark; import s.implicits._
    val df = Seq(Option.empty[Array[Long]]).toDF("hs")
    assert(df.select(WinnowSelect(col("hs"), 4)).collect().head.isNullAt(0))
    // a null ELEMENT must fail loud, not be read as hash 0 (the
    // strongest possible minimum)
    val nullEl = intercept[Exception] {
      Seq(Tuple1(Array(Some(1L), None, Some(3L)))).toDF("hs")
        .select(WinnowSelect(col("hs"), 2)).collect()
    }
    assert(nullEl.getMessage.contains("null element") ||
      Option(nullEl.getCause).exists(_.getMessage.contains("null element")))
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(WinnowSelect(col("x"), 4)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("winnow_select") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
    // winnowing guarantee on a longer array: consecutive selections ≤ w apart
    val hs = (0 until 500).map(i => ((i * 48271L) % 30011L): Long)
    val sel = Seq(Tuple1(hs)).toDF("hs")
      .select(WinnowSelect(col("hs"), 4)).collect().head.getSeq[Int](0)
    assert(sel === reference(hs, 4))
    assert(sel.sliding(2).forall(p => p.length < 2 || p(1) - p(0) <= 4))
  }

  test("runs inside whole-stage codegen (not CodegenFallback)") {
    val df = spark.range(3)
      .select(array(col("id") + 2, col("id"), col("id") + 1, col("id"), col("id") + 3).as("hs"))
      .select(WinnowSelect(col("hs"), 3).as("sel"))
    // [x+2, x, x+1, x, x+3], w=3 → windows: min@2, min@4(rightmost tie), min@4
    assert(df.collect().map(_.getSeq[Int](0)).toSeq === Seq(Seq(2, 4), Seq(2, 4), Seq(2, 4)))
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      df.queryExecution.executedPlan.toString)
  }

  test("GraftExtensions registers winnow_select for SQL (literal window only)") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    // getOrCreate may return the existing session — register explicitly then
    try s2.sql("SELECT winnow_select(array(9L,1L,1L,9L), 2) AS p").collect()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        s2.sessionState.functionRegistry.createOrReplaceTempFunction(
          "winnow_select",
          exprs => WinnowSelect(
            exprs(0),
            exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
              .value.asInstanceOf[Int]),
          "internal")
    }
    val r = s2.sql("SELECT winnow_select(array(9L,1L,1L,9L), 2) AS p").collect().head
    // windows of 2: min@2, min@3 (rightmost tie), min@3
    assert(r.getSeq[Int](0) === Seq(2, 3))
  }
}
