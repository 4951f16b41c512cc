package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared read of a growing-index table by the gated batch sinks.
  * ONLY the first-batch case — the index directory not existing yet —
  * is recoverable as an empty index. Every other failure (object-store
  * throttle, corrupt footer, permissions) PROPAGATES and fails the
  * batch: a dedup gate that silently falls back to an empty index
  * admits near-duplicates of already-admitted content forever, with
  * no error anywhere. (Replaced the original swallow-everything
  * `Try { read }.getOrElse(empty)` in all three sinks.) */
private[streaming] object IndexRead {
  def parquetIfExists(spark: SparkSession, dir: String)(empty: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (exists) spark.read.parquet(dir) else empty
  }
}
