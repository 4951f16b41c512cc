package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

class GraftExtensionsSpec extends SparkSpec {

  private lazy val s2: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    // getOrCreate may return the shared extension-less test session —
    // register the same builders explicitly then (the production path
    // is exercised whenever this suite runs first).
    try s.sql("SELECT graft_hash60('probe')").collect()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        def reg(name: String, f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
          s.sessionState.functionRegistry.createOrReplaceTempFunction(
            name,
            exprs => ColumnBridge.expression(f(exprs.map(ColumnBridge.column))),
            "internal")
        reg("graft_hash60", cs => Portable.hash60(cs.head))
        reg("graft_quality", cs => graft.operators.TextAnalysis.qualityScore(cs.head))
        reg("graft_fingerprint", cs => graft.operators.TextAnalysis.fingerprint(cs.head))
        reg("graft_redact_pii", cs => graft.operators.TextAnalysis.redactPii(cs.head))
        reg("graft_quantize", cs => Portable.quantize(cs.head))
    }
    s
  }

  test("SQL graft_hash60 equals the plan-time hash60Local") {
    val v = s2.sql("SELECT graft_hash60('abc') AS h").collect().head.getLong(0)
    assert(v === Portable.hash60Local("abc"))
  }

  test("SQL graft_quality / graft_fingerprint / graft_redact_pii equal the Column API") {
    import s2.implicits._
    val txt = "Reach me at bob@example.com. This is a normal sentence, with words."
    val df  = Seq(txt).toDF("text")
    df.createOrReplaceTempView("one_doc")
    val sqlRow = s2.sql(
      """SELECT graft_quality(text) AS q, graft_fingerprint(text) AS fp,
                graft_redact_pii(text) AS red FROM one_doc""").collect().head
    val apiRow = df.select(
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.operators.TextAnalysis.redactPii(col("text")).as("red")).collect().head
    assert(sqlRow === apiRow)
    assert(sqlRow.getAs[String]("red").contains("<EMAIL>"))
  }

  test("SQL graft_quantize matches Portable.quantize") {
    import s2.implicits._
    Seq(Seq(0.123f, -0.5f)).toDF("v").createOrReplaceTempView("one_vec")
    val q = s2.sql("SELECT graft_quantize(v) AS q FROM one_vec").collect().head.getSeq[Long](0)
    assert(q === Seq(1230000L, -5000000L))
  }
}
