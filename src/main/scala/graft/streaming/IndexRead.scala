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

  /** The committed batch ids — one metadata listing of `_commits/`
    * (per-batch markers ∪ the checkpoint's folded ranges).
    * None = no manifest at all (legacy index or first batch). */
  def committedIds(spark: SparkSession, dir: String): Option[Set[Long]] = {
    val d = commitsPath(dir)
    if (!fs(spark, d).exists(d)) None
    else {
      val entries = fs(spark, d).listStatus(d).toSeq
      val markers = entries
        .flatMap(s => s.getPath.getName.stripPrefix("batch-").toLongOption)
        .toSet
      val fromCheckpoint = entries.find(_.getPath.getName == CheckpointName) match {
        case None => Set.empty[Long]
        case Some(cp) =>
          val in = fs(spark, cp.getPath).open(cp.getPath)
          val txt =
            try new String(in.readAllBytes(), "UTF-8").trim
            finally in.close()
          parseRanges(txt)
      }
      Some(markers ++ fromCheckpoint)
    }
  }

  private val CheckpointName = "checkpoint"

  /** "0-1523,1525" ⇄ Set — batch ids are contiguous in normal
    * operation (foreachBatch is sequential), so the checkpoint is
    * usually ONE range; gaps from never-committed batches stay gaps. */
  private def parseRanges(txt: String): Set[Long] =
    if (txt.isEmpty) Set.empty
    else txt.split(",").iterator.flatMap { part =>
      part.split("-", 2) match {
        case Array(a, b) => (a.trim.toLong to b.trim.toLong).iterator
        case Array(a)    => Iterator(a.trim.toLong)
      }
    }.toSet

  private[streaming] def formatRanges(ids: Seq[Long]): String =
    compressRanges(ids)
      .map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }
      .mkString(",")

  /** Sorted ids → maximal contiguous (lo, hi) runs. */
  private[streaming] def compressRanges(sorted: Seq[Long]): Seq[(Long, Long)] =
    sorted.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ ((a, b)), id) if id == b + 1 => acc :+ (a, id)
      case (acc, id)                            => acc :+ (id, id)
    }

  /** Fold every committed id into ONE `_commits/checkpoint` object and
    * delete the per-batch markers it covers — the manifest's own
    * compaction. Years of 5-minute batches are ~10⁵ markers; without
    * this, every gate read pays a 10⁵-object listing for what is one
    * contiguous range. Write order makes the maintenance race-free
    * against readers: the checkpoint lands (covering the ids) BEFORE
    * any marker is deleted, and a reader unions checkpoint ∪ markers,
    * so every interleaving sees a superset of the committed set —
    * never an uncommitted id, never a lost one. Single-writer, like
    * [[graft.operators.Maintenance.compactPartitions]]. Returns the
    * number of marker objects deleted. */
  def compactCommits(spark: SparkSession, dir: String): Int =
    committedIds(spark, dir).filter(_.nonEmpty) match {
      case None => 0
      case Some(ids) =>
        val d  = commitsPath(dir)
        val cp = new org.apache.hadoop.fs.Path(d, CheckpointName)
        val out = fs(spark, cp).create(cp, true)
        try out.write(formatRanges(ids.toSeq.sorted).getBytes("UTF-8"))
        finally out.close()
        val markers = fs(spark, d).listStatus(d).toSeq
          .filter(s => s.getPath.getName.stripPrefix("batch-").toLongOption
            .exists(ids.contains))
        markers.foreach(m => fs(spark, d).delete(m.getPath, false))
        markers.size
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
        val visible = (ids - excludeBatchId).toSeq.sorted
        if (visible.isEmpty) empty
        else {
          // contiguous ids collapse to BETWEEN ranges — the predicate
          // stays a handful of terms after years of batches, where an
          // isin would carry one literal per batch; still lands on the
          // PARTITION column, so directories prune either way
          val pred = compressRanges(visible)
            .map { case (a, b) =>
              if (a == b) col("batch_id") === a else col("batch_id").between(a, b)
            }
            .reduce(_ || _)
          spark.read.parquet(dir).filter(pred)
        }
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
