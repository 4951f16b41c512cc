package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character statistics — a native Catalyst
  * expression with whole-stage codegen (same pattern as
  * [[WinnowSelect]]): map-only, no explode, no shuffle.
  *
  * Returns `struct(n_chars, distinct_chars, char_coll_ppm)` over the
  * UNICODE CODE POINTS of the input string:
  *   - `n_chars`        — total code points (long)
  *   - `distinct_chars` — distinct code points (int)
  *   - `char_coll_ppm`  — character collision probability in exact
  *     integer ppm: `⌊Σ cᵢ(cᵢ−1) · 10⁶ / (n(n−1))⌋` — the chance two
  *     random DISTINCT positions hold the same character (Simpson
  *     index, unbiased form). Null when `n < 2`.
  *
  * Why this signal: char-level concentration is the cheapest garbage
  * detector in a quality pipeline — `"aaaa…"` scores ~10⁶ ppm while
  * natural English sits near ~60–80k — and it is orthogonal to the
  * token/bigram repetition family ([[graft.operators.TextAnalysis.repetitionMetrics]]),
  * which tokenizes first and so never sees intra-token degeneracy.
  *
  * Determinism: all counts are exact integers; the single division is
  * integer floor-division, so the DuckDB oracle
  * (`SUM(k*(k−1))*1000000 // (n*(n−1))` over `string_split(text,'')`)
  * hash-matches bit-for-bit. The numerator is computed in 128-bit
  * (`Math.multiplyHigh` guard → BigInteger fallback) because
  * Σ cᵢ(cᵢ−1)·10⁶ can exceed int64 for documents past ~3 M chars;
  * DuckDB's HUGEINT does the same on the oracle side.
  *
  * The explode-free shape is the scale point: the higher-order /
  * explode formulation shuffles one row per CHARACTER (a 100 TB corpus
  * becomes a ~100 T-row exchange); here the histogram lives in one
  * int[128] (ASCII fast path, map fallback) per row inside codegen.
  */
case class CharSimpson(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("char_coll_ppm", LongType, nullable = true)))

  override def prettyName: String = "char_simpson"

  override protected def nullSafeEval(input: Any): Any =
    CharSimpson.compute(input.asInstanceOf[UTF8String])

  // The whole loop lives in a static helper: the per-row work is a
  // hash-map histogram (not unrollable), so codegen's win is staying
  // inside the WholeStageCodegen pipeline (no interpreted-projection
  // fallback for the rows around it), not inlining the loop body.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharSimpson.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharSimpson =
    copy(child = newChild)
}

object CharSimpson {
  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(CharSimpson(ColumnBridge.expression(text)))

  /** One pass over the code points; exact integer arithmetic only. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, java.lang.Long] = null
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, java.lang.Long]()
        val k: Integer = cp
        other.put(k, other.getOrDefault(k, 0L) + 1L)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    var distinct = 0
    var coll = java.math.BigInteger.ZERO
    var collSmall = 0L
    var smallOk = true
    def add(k: Long): Unit = {
      distinct += 1
      val term = k * (k - 1L)
      if (smallOk && collSmall <= Long.MaxValue - term) collSmall += term
      else {
        if (smallOk) { coll = java.math.BigInteger.valueOf(collSmall); smallOk = false }
        coll = coll.add(java.math.BigInteger.valueOf(term))
      }
    }
    var a = 0
    while (a < 128) { if (ascii(a) > 0L) add(ascii(a)); a += 1 }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) add(it.next())
    }
    val ppm: Any =
      if (n < 2L) null
      else {
        val num =
          (if (smallOk) java.math.BigInteger.valueOf(collSmall) else coll)
            .multiply(java.math.BigInteger.valueOf(1000000L))
        val den = java.math.BigInteger.valueOf(n).multiply(java.math.BigInteger.valueOf(n - 1L))
        java.lang.Long.valueOf(num.divide(den).longValueExact())
      }
    new GenericInternalRow(Array[Any](n, distinct, ppm))
  }
}
