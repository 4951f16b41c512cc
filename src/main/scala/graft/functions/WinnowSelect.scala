package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Winnowing selection over an array of gram hashes — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Given `hs: array<bigint>` and window size `w`, returns the 1-based
  * positions of the RIGHTMOST minimum of every length-`w` sliding
  * window (clamped: an array shorter than `w` is one window), distinct,
  * ascending — exactly the per-window
  * `slice → reverse → array_min → array_position` higher-order
  * formulation, but O(m) instead of O(m·w): higher-order functions are
  * interpreted (CodegenFallback) and that form allocates FOUR
  * intermediate arrays per window, which profiling showed was ~15× the
  * cost of the md5 gram-hashing it post-processes. Here a monotonic
  * deque (pop-back on `≥` so later ties win) yields each window's
  * rightmost argmin in amortized O(1) with two scratch int arrays per
  * row.
  *
  * Consecutive-dedup equals global distinct because the rightmost
  * argmin of a sliding window is non-decreasing in the window start:
  * the previous selection either stays in the window (still the
  * rightmost min unless the incoming element ties or beats it — both
  * move the selection right) or drops off the left edge (the new
  * argmin lies right of it).
  *
  * Oracle SQL (DuckDB) stays the explicit per-window form — see
  * `queries/Documents.scala` q54.
  *
  * Null ELEMENTS are rejected with an error (the schema may say
  * containsNull — `transform` lambdas infer nullable — but a null
  * hash has no ordering and `getLong` would silently read it as 0,
  * the strongest possible minimum).
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window size must be positive (got $w)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m  = hs.numElements()
    val dq   = new Array[Int](math.max(m, 1))
    val outp = new Array[Int](math.max(m, 1))
    var head = 0; var tail = 0; var no = 0; var last = -1
    var e = 0
    while (e < m) {
      // getLong on a null slot reads 0, which beats every real hash —
      // fail loud instead of silently selecting garbage positions
      if (hs.isNullAt(e))
        throw new IllegalArgumentException(s"winnow_select: null element at position $e")
      val v = hs.getLong(e)
      while (tail > head && hs.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = e; tail += 1
      val ws = math.max(e - w + 1, 0)
      while (dq(head) < ws) head += 1
      if (e >= w - 1 || e == m - 1) {
        val p = dq(head)
        if (p != last) { outp(no) = p + 1; no += 1; last = p }
      }
      e += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(outp, no))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m    = ctx.freshName("m")
      val dq   = ctx.freshName("dq")
      val outp = ctx.freshName("outp")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val no   = ctx.freshName("no")
      val last = ctx.freshName("last")
      val e    = ctx.freshName("e")
      val v    = ctx.freshName("v")
      val ws   = ctx.freshName("ws")
      val p    = ctx.freshName("p")
      s"""
         |int $m = $a.numElements();
         |int[] $dq = new int[$m > 0 ? $m : 1];
         |int[] $outp = new int[$m > 0 ? $m : 1];
         |int $head = 0, $tail = 0, $no = 0, $last = -1;
         |for (int $e = 0; $e < $m; $e++) {
         |  if ($a.isNullAt($e)) {
         |    throw new IllegalArgumentException("winnow_select: null element at position " + $e);
         |  }
         |  long $v = $a.getLong($e);
         |  while ($tail > $head && $a.getLong($dq[$tail - 1]) >= $v) $tail--;
         |  $dq[$tail++] = $e;
         |  int $ws = $e - $w + 1; if ($ws < 0) $ws = 0;
         |  while ($dq[$head] < $ws) $head++;
         |  if ($e >= $w - 1 || $e == $m - 1) {
         |    int $p = $dq[$head];
         |    if ($p != $last) { $outp[$no++] = $p + 1; $last = $p; }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($outp, $no));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  /** Column-level entry point. */
  def apply(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(hashes), w))
}
