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
    // Shuffle parallelism defaults to the core count (sf0.1-scale
    // plans stay comparable; AQE coalesces further when small), but a
    // SCALE run must size partitions to fit task memory at the target
    // SF — SPARK_GRAFT_SHUFFLE_PARTITIONS raises the initial count
    // (e.g. 256 at ×100: the same shuffle bytes over 8× more, smaller
    // sort/agg buffers; AQE only ever coalesces DOWN, so the override
    // is the ceiling, not a fixed fan-out).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString)
    require(shufflePartitions.toInt > 0,
      s"SPARK_GRAFT_SHUFFLE_PARTITIONS must be positive (got $shufflePartitions)")
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
