package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults (mains, demos, tests):
  * local[N] with shuffle parallelism = N (not the 200 default — at
  * local scale AQE would coalesce anyway, but the explicit setting
  * keeps plans comparable), UTC session time zone (the engine's
  * timestamp contract, SURVEY §7.4.2), UI off for batch runs.
  * `GraftExtensions` registers the native `long_dot` SQL function.
  */
object GraftSession {
  def local(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
