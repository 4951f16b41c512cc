package graft

/** Measurement tool (optimization rounds): dumps `.explain("formatted")`
  * for the named queries to `<outDir>/<name>.txt` — the plan evidence
  * the round's OPTIMIZATION_r*.md cites (plans/r14/<q>_before.txt /
  * _after.txt). Not part of the driver contract; touches no query.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query>...
  * (suffix = "before" | "after"; empty query list = all queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names  = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(
        n, throw new IllegalArgumentException(s"unknown query $n"))
      val df = fn(spark, sfDir)
      // queryExecution.explainString == explain("formatted") output
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[plandump] $n -> ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
