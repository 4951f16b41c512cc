package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line.
  * Each query runs three times and reports the BEST of the two warm
  * passes — the first pass absorbs JVM/codegen/file-cache warmup
  * (which at this data scale otherwise dominates whichever query runs
  * first), and min-of-warm damps GC/scheduler noise that was measured
  * at ±15% run-to-run on the steady total. `value` is the steady-state
  * total; `total_cold` includes warmup for reference.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = once(fn)
      val warm = if (cold >= 0) math.min(once(fn), once(fn)) else -1.0
      (name, cold, warm)
    }
    val qs = results.map { case (k, _, w) => s""""$k":$w""" }.mkString("{", ",", "}")
    val total     = results.map(_._3).filter(_ >= 0).sum
    val totalCold = results.map(_._2).filter(_ >= 0).sum
    // A crashed query is recorded as -1 and excluded from `value`, which
    // would otherwise make a regression LOOK faster; n_failed makes that
    // impossible to miss.
    val nFailed = results.count(_._3 < 0)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""total_cold":$totalCold,"n_queries":${results.size},"n_failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
