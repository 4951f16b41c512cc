package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact int64 dot product of two `array<bigint>` columns — a native
  * Catalyst expression with whole-stage codegen.
  *
  * This is the one hot-path computation the built-ins can't express
  * efficiently: `aggregate(zip_with(a, b, _*_), 0L, _+_)` is correct
  * but higher-order functions are interpreted (CodegenFallback) and
  * allocate a zipped intermediate array per row. In the ANN/near-dup
  * operators this runs once per candidate pair — millions of times per
  * query — so it gets the tight generated loop instead. Preference
  * order honored: built-ins where they express the semantics
  * (everywhere else), native `Expression` with `doGenCode` here, no
  * UDFs anywhere.
  *
  * Equivalent SQL (for the DuckDB oracle):
  * `list_aggregate(list_transform(list_zip(a, b), p -> p[1]*p[2]), 'sum')`.
  * Mismatched lengths use the common prefix (like `list_zip` with
  * truncation; quantized vectors are always equal-length here).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Session extension registering the native expressions for the SQL
  * surface: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Expose a Column-composed library function to SQL: the builder
    * converts the call's child expressions to Columns, applies the
    * library combinator, and hands Catalyst back the composed
    * expression tree — so the SQL name gets the EXACT tree the Scala
    * API builds (codegen, pushdown, and the determinism contracts all
    * included), with zero duplicated logic. */
  private def columnFn(
      name: String,
      f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[GraftExtensions].getName, name),
    (children: Seq[Expression]) =>
      org.apache.spark.sql.graft.ColumnBridge.expression(
        f(children.map(org.apache.spark.sql.graft.ColumnBridge.column))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
      (children: Seq[Expression]) => LongDotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (children: Seq[Expression]) => {
        val w = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_select: window size must be an integer literal, got $other")
        }
        WinnowSelect(children(0), w)
      }))
    // Column-composed library functions, SQL-callable.
    ext.injectFunction(columnFn("graft_quality", cs => graft.operators.TextAnalysis.qualityScore(cs.head)))
    ext.injectFunction(columnFn("graft_fingerprint", cs => graft.operators.TextAnalysis.fingerprint(cs.head)))
    ext.injectFunction(columnFn("graft_redact_pii", cs => graft.operators.TextAnalysis.redactPii(cs.head)))
    ext.injectFunction(columnFn("graft_hash60", cs => Portable.hash60(cs.head)))
    ext.injectFunction(columnFn("graft_quantize", cs => Portable.quantize(cs.head)))
  }
}
