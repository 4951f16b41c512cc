package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared read/commit protocol for the growing-index tables the gated
  * batch sinks maintain (`historyDir` laid out as `batch_id=N`
  * partitions of parquet).
  *
  * EXACTLY-ONCE-VISIBLE appends: a parquet write into `batch_id=N` is
  * not atomic on an object store — a reader racing the write (or
  * scanning after a mid-batch kill) would see a PARTIAL partition and,
  * worse, the NEXT batch would gate against it and admit content that
  * the completed partition would have rejected. So each sink, after
  * its partition write succeeds, PUTs a single marker object
  * `_commits/batch-N` (one small object — atomic visibility, the
  * manifest pattern every table format uses), and every reader
  * resolves the index as "partitions WITH a marker": an uncommitted
  * partition — mid-write or orphaned by a kill — is invisible
  * everywhere until the stream's checkpoint replays the batch, whose
  * dynamic overwrite rewrites it in place and re-commits. The
  * `isin(committed)` filter lands on the `batch_id` PARTITION column,
  * so visibility costs one `_commits/` listing (metadata-only), never
  * a data scan.
  *
  * ONLY the first-batch case — the index directory not existing yet —
  * is recoverable as an empty index. Every other failure (object-store
  * throttle, corrupt footer, permissions) PROPAGATES and fails the
  * batch: a dedup gate that silently falls back to an empty index
  * admits near-duplicates of already-admitted content forever, with
  * no error anywhere. A data directory WITHOUT any `_commits/` is a
  * legacy (pre-manifest) index: every partition is treated as
  * committed, with a stderr note — failing those reads would turn an
  * upgrade into a silent empty-index gate, the exact bug above. */
private[streaming] object IndexRead {
  private val CommitsDir = "_commits"

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsPath(dir: String) =
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(dir), CommitsDir)

  /** Mark `batchId`'s partition COMMITTED (call strictly after the
    * partition write returns). One object PUT — idempotent under
    * replay (the marker is rewritten with the same content). */
  def commit(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val p   = new org.apache.hadoop.fs.Path(commitsPath(dir), s"batch-$batchId")
    val out = fs(spark, p).create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** The committed batch ids — one metadata listing of `_commits/`.
    * None = no manifest at all (legacy index or first batch). */
  def committedIds(spark: SparkSession, dir: String): Option[Set[Long]] = {
    val d = commitsPath(dir)
    if (!fs(spark, d).exists(d)) None
    else Some(
      fs(spark, d).listStatus(d).toSeq
        .flatMap(s => s.getPath.getName.stripPrefix("batch-").toLongOption)
        .toSet)
  }

  /** Committed-only view of the index, with `excludeBatchId`'s own
    * partition removed (the replay rule): what every gate — and any
    * external reader — must resolve instead of a raw directory scan. */
  def committedParquet(spark: SparkSession, dir: String, excludeBatchId: Long)(
      empty: => DataFrame): DataFrame = {
    val p      = new org.apache.hadoop.fs.Path(dir)
    val exists = fs(spark, p).exists(p)
    if (!exists) empty
    else committedIds(spark, dir) match {
      case Some(ids) =>
        val visible = (ids - excludeBatchId).toSeq
        if (visible.isEmpty) empty
        else spark.read.parquet(dir) // isin on the PARTITION column → pruned
          .filter(col("batch_id").isin(visible: _*))
      case None =>
        System.err.println(
          s"[index] $dir has data but no $CommitsDir manifest — legacy index, " +
            "treating every partition as committed")
        spark.read.parquet(dir).filter(col("batch_id") =!= excludeBatchId)
    }
  }

  /** Raw dir-exists read (no manifest resolution) — kept for monitors
    * that want the whole directory, not the gate-visible view. */
  def parquetIfExists(spark: SparkSession, dir: String)(empty: => DataFrame): DataFrame = {
    val p      = new org.apache.hadoop.fs.Path(dir)
    val exists = fs(spark, p).exists(p)
    if (exists) spark.read.parquet(dir) else empty
  }
}
