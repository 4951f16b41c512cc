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

  /** The shuffle-partition dial, parsed once with a descriptive
    * failure for BOTH malformed and non-positive values (a raw
    * NumberFormatException out of an env var names neither the var
    * nor the fix). Read order: -Dgraft.shufflePartitions (test /
    * in-process seam — env vars can't be set on a running JVM) then
    * SPARK_GRAFT_SHUFFLE_PARTITIONS, else the core count. */
  private[graft] def parseShufflePartitions(raw: Option[String], default: Int): Int = {
    val v = raw.map(_.trim).filter(_.nonEmpty)
    v.fold(default) { s =>
      s.toIntOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_SHUFFLE_PARTITIONS must be a positive integer (got '$s')"))
    }
  }

  def local(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    // Shuffle parallelism defaults to the core count (sf0.1-scale
    // plans stay comparable; AQE coalesces further when small), but a
    // SCALE run must size partitions to fit task memory at the target
    // SF — SPARK_GRAFT_SHUFFLE_PARTITIONS raises the initial count
    // (e.g. 256 at ×100: the same shuffle bytes over 8× more, smaller
    // sort/agg buffers; AQE only ever coalesces DOWN, so the override
    // is the ceiling, not a fixed fan-out). GraftSessionSpec pins both
    // the parse contract and the plan-fingerprint invariance of the
    // dial at small SF.
    val shufflePartitions = parseShufflePartitions(
      sys.props.get("graft.shufflePartitions")
        .orElse(sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")),
      default = cores)
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
