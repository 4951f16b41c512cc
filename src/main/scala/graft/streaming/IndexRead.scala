package graft.streaming

import org.apache.spark.sql.functions.{col, lit}
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
  * visibility filter lands on the `batch_id` PARTITION column, so it
  * costs one `_commits/` listing (metadata-only), never a data scan.
  *
  * TWO compactions keep years of 5-minute batches (~10⁵/year) cheap:
  *  - [[compactCommits]] folds the marker OBJECTS into one
  *    `_commits/checkpoint` of contiguous ranges (bounds the manifest
  *    listing);
  *  - [[compactIndex]] folds the DATA partitions themselves into a
  *    generational BASE partition (`batch_id = -G`) — 10⁵ tiny
  *    directories become one, with crash-consistent visibility: the
  *    new base is written to a FRESH generation (never a
  *    self-overwrite), becomes visible only when the checkpoint's
  *    `gen` pointer flips, and the superseded partitions are deleted
  *    last (pure GC — readers already ignore them). A crash between
  *    any two steps leaves every reader on exactly one consistent
  *    generation.
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
private[graft] object IndexRead {
  private val CommitsDir     = "_commits"
  private val CheckpointName = "checkpoint"
  private val LeaseName      = "fold-lease"

  /** A fold found another writer's live lease — the caller aborts and
    * retries at the next cadence tick instead of racing the
    * generational overwrite + GC (two concurrent folds with different
    * `upToBatch` would both write `batch_id=-(gen+1)` and whichever
    * checkpoint PUT lands last could GC partitions the other fold's
    * base never absorbed — silent index row loss). */
  final class ConcurrentFoldException(msg: String) extends RuntimeException(msg)

  /** Single-writer guard shared by [[compactCommits]]/[[compactIndex]]:
    * an exclusive lease object under `_commits`, acquired with
    * `create(overwrite=false)` — atomic on HDFS/local (two racers
    * cannot both win the create; the loser gets
    * FileAlreadyExistsException → [[ConcurrentFoldException]]). A lease
    * older than `ttlMs` is a crashed fold's leftover (the fold body is
    * minutes, not hours) and is broken with a loud note — folds are
    * idempotent up to their checkpoint flip, so a re-run after a crash
    * is always safe. */
  private def withFoldLease[A](
      spark: SparkSession, dir: String, ttlMs: Long = 30L * 60 * 1000)(body: => A): A = {
    val lease = new org.apache.hadoop.fs.Path(commitsPath(dir), LeaseName)
    val f     = fs(spark, lease)
    if (f.exists(lease)) {
      val age = System.currentTimeMillis() - f.getFileStatus(lease).getModificationTime
      if (age <= ttlMs)
        throw new ConcurrentFoldException(
          s"another fold holds $lease (age ${age} ms ≤ ttl ${ttlMs} ms) — aborting instead of racing")
      System.err.println(s"[index] breaking STALE fold lease at $lease (age ${age} ms > ttl)")
      f.delete(lease, false)
    }
    val out =
      try f.create(lease, false)
      catch {
        case e: java.io.IOException => // FileAlreadyExists and kin: lost the create race
          throw new ConcurrentFoldException(
            s"lost the fold-lease create race at $lease: ${e.getMessage}")
      }
    try out.write(java.lang.Long.toString(System.currentTimeMillis()).getBytes("UTF-8"))
    finally out.close()
    try body
    finally f.delete(lease, false)
  }

  /** Manifest state: committed batch ids (markers ∪ checkpoint
    * ranges), the fold watermark (ids ≤ it live in the base
    * partition; Long.MinValue = nothing folded) and the base
    * GENERATION (base partition = `batch_id = -gen`; 0 = no base). */
  private[streaming] final case class Manifest(
      ids: Set[Long], foldedUpTo: Long, gen: Long)

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsPath(dir: String) =
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(dir), CommitsDir)

  /** Mark `batchId`'s partition COMMITTED (call strictly after the
    * partition write returns). One object PUT — idempotent under
    * replay (the marker is rewritten with the same content).
    *
    * FIRST commit on a pre-manifest (legacy) index ADOPTS the existing
    * partitions: without this, the moment one marker exists the
    * manifest branch takes over and every unmarked legacy partition —
    * the whole pre-upgrade history — silently vanishes from the gate,
    * which is exactly the re-admit-forever failure this object exists
    * to prevent. Legacy partitions were all visible under the old
    * semantics, so adoption preserves behavior bit-for-bit (including
    * any pre-manifest orphan, which had no protection then either). */
  def commit(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val cdir = commitsPath(dir)
    if (!fs(spark, cdir).exists(cdir)) {
      val root = new org.apache.hadoop.fs.Path(dir)
      val legacy =
        if (!fs(spark, root).exists(root)) Seq.empty
        else fs(spark, root).listStatus(root).toSeq
          .flatMap(_.getPath.getName.stripPrefix("batch_id=").toLongOption)
          .filter(id => id >= 0 && id != batchId)
      if (legacy.nonEmpty) {
        System.err.println(
          s"[index] adopting ${legacy.size} legacy pre-manifest partition(s) at $dir")
        writeCheckpoint(spark, dir,
          Manifest(legacy.toSet, Long.MinValue, 0L))
      }
    }
    val p   = new org.apache.hadoop.fs.Path(cdir, s"batch-$batchId")
    val out = fs(spark, p).create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** None = no manifest at all (legacy index or first batch). */
  private[streaming] def readManifest(spark: SparkSession, dir: String): Option[Manifest] = {
    val d = commitsPath(dir)
    if (!fs(spark, d).exists(d)) None
    else {
      val entries = fs(spark, d).listStatus(d).toSeq
      val markers = entries
        .flatMap(s => s.getPath.getName.stripPrefix("batch-").toLongOption)
        .toSet
      entries.find(_.getPath.getName == CheckpointName) match {
        case None => Some(Manifest(markers, Long.MinValue, 0L))
        case Some(cp) =>
          val in = fs(spark, cp.getPath).open(cp.getPath)
          val txt =
            try new String(in.readAllBytes(), "UTF-8").trim
            finally in.close()
          // current format: "ranges=…\nfolded=…\ngen=…"; a plain
          // ranges line (the pre-fold checkpoint format) still parses
          val lines = txt.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
          val kv = lines.flatMap { l =>
            l.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
          }.toMap
          val ranges =
            if (kv.contains("ranges")) parseRanges(kv("ranges"))
            else if (lines.nonEmpty && !lines.head.contains("=")) parseRanges(lines.head)
            else Set.empty[Long]
          Some(Manifest(
            markers ++ ranges,
            kv.get("folded").map(_.toLong).getOrElse(Long.MinValue),
            kv.get("gen").map(_.toLong).getOrElse(0L)))
      }
    }
  }

  /** The committed batch ids — the manifest's id set. */
  def committedIds(spark: SparkSession, dir: String): Option[Set[Long]] =
    readManifest(spark, dir).map(_.ids)

  private def writeCheckpoint(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val cp  = new org.apache.hadoop.fs.Path(commitsPath(dir), CheckpointName)
    val txt = s"ranges=${formatRanges(m.ids.toSeq.sorted)}\n" +
      (if (m.gen > 0) s"folded=${m.foldedUpTo}\ngen=${m.gen}\n" else "")
    val out = fs(spark, cp).create(cp, true)
    try out.write(txt.getBytes("UTF-8"))
    finally out.close()
  }

  /** "0-1523,1525" ⇄ Set — batch ids are contiguous in normal
    * operation (foreachBatch is sequential), so the checkpoint is
    * usually ONE range; gaps from never-committed batches stay gaps. */
  private def parseRanges(txt: String): Set[Long] =
    if (txt.isEmpty) Set.empty
    else txt.split(",").iterator.flatMap { part =>
      part.split("-", 2) match {
        // a leading '-' would be a negative id, which commit() never
        // writes — ranges are non-negative by construction
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

  /** Fold every committed id into the `_commits/checkpoint` object and
    * delete the per-batch markers it covers — the MANIFEST's
    * compaction (the data partitions are [[compactIndex]]'s job).
    * Write order makes it race-free against readers: the checkpoint
    * lands (covering the ids) BEFORE any marker is deleted, and a
    * reader unions checkpoint ∪ markers, so every interleaving sees a
    * superset of the committed set — never an uncommitted id, never a
    * lost one. Single-writer, ENFORCED by the fold lease (a concurrent
    * fold aborts with [[ConcurrentFoldException]] instead of racing).
    * Returns the markers deleted. */
  def compactCommits(spark: SparkSession, dir: String): Int =
    readManifest(spark, dir).filter(_.ids.nonEmpty) match {
      case None => 0
      case Some(_) => withFoldLease(spark, dir) {
        // re-read INSIDE the lease — a fold that finished between our
        // first read and the acquire may have moved the manifest
        val m = readManifest(spark, dir).get
        writeCheckpoint(spark, dir, m)
        val d = commitsPath(dir)
        val markers = fs(spark, d).listStatus(d).toSeq
          .filter(s => s.getPath.getName.stripPrefix("batch-").toLongOption
            .exists(m.ids.contains))
        markers.foreach(mk => fs(spark, d).delete(mk.getPath, false))
        markers.size
      }
    }

  /** Fold the committed DATA partitions with id ≤ `upToBatch` into a
    * fresh base GENERATION — 10⁵ micro-batch directories become one
    * `batch_id=-G` partition. Crash-consistent on an object store
    * with no atomic rename:
    *
    *   1. the new base (old base ∪ folded partitions) is written to
    *      `batch_id = -(gen+1)` — a FRESH partition, so the read side
    *      (old base) is never the write target (no self-overwrite),
    *      and it is INVISIBLE until step 2 (readers resolve the base
    *      through the checkpoint's `gen` pointer);
    *   2. the checkpoint flips atomically (one object PUT) to
    *      `folded=upToBatch, gen=gen+1` — every reader moves to the
    *      new generation in one step;
    *   3. the superseded partitions (folded ids + the old base) are
    *      deleted — pure GC, readers already ignore them; the sweep
    *      also collects leftovers from any previously crashed fold.
    *
    * A crash after 1 leaves an invisible orphan the next fold
    * overwrites (gen+1 is recomputed identically); a crash after 2
    * leaves garbage that the next fold's sweep removes. Rows carry no
    * batch lineage into the base (gates consume (id, fingerprint)
    * membership only — transient duplication or lost lineage cannot
    * change a verdict).
    *
    * `upToBatch` MUST trail the stream's newest committed batch by at
    * least the replay horizon (a foreachBatch stream can only replay
    * its LAST batch) — folding a batch that later replays would make
    * the replay gate against its own folded rows and self-suppress.
    * [[committedParquet]] fails loudly if asked to exclude a folded
    * id. Cost: O(index size) rewrite per fold — run it at the
    * partition-compaction cadence, not per batch. Single-writer,
    * ENFORCED: the fold lease makes a concurrent fold abort
    * ([[ConcurrentFoldException]]) instead of racing, and a CAS on
    * the checkpoint gen guards the GC even if a lease was wrongly
    * broken. Returns the number of data partitions folded. */
  def compactIndex(spark: SparkSession, dir: String, upToBatch: Long): Int =
    readManifest(spark, dir) match {
      case None => 0
      case Some(m0) if m0.ids.isEmpty => 0 // manifest dir exists, nothing committed
      case Some(_) => withFoldLease(spark, dir) {
        // re-read inside the lease: the manifest we saw before the
        // acquire may predate a fold that just released
        val m = readManifest(spark, dir).get
        val maxCommitted = m.ids.max
        require(upToBatch < maxCommitted,
          s"upToBatch=$upToBatch must trail the newest committed batch " +
            s"($maxCommitted) by the replay horizon")
        val toFold = m.ids.filter(id => id > m.foldedUpTo && id <= upToBatch).toSeq.sorted
        if (toFold.isEmpty) 0
        else {
          val newGen = m.gen + 1
          // 1. fresh-generation base: old base ∪ folded partitions
          val srcPred = compressRanges(toFold)
            .map { case (a, b) =>
              if (a == b) col("batch_id") === a else col("batch_id").between(a, b)
            }
            .reduce(_ || _)
          val src =
            if (m.gen > 0) srcPred || (col("batch_id") === -m.gen) else srcPred
          // per-write dynamic option below — the global session conf
          // is NOT touched (a leaked 'dynamic' would silently change
          // unrelated static-overwrite writes for the rest of the job)
          spark.read.parquet(dir)
            .filter(src)
            .withColumn("batch_id", lit(-newGen))
            .write
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(dir)
          // 2. one PUT flips every reader to the new generation
          writeCheckpoint(spark, dir, m.copy(foldedUpTo = upToBatch, gen = newGen))
          // CAS guard before the destructive step (belt-and-braces on
          // top of the lease — e.g. a lease wrongly broken as stale):
          // if the checkpoint we just wrote is not the one on disk,
          // another fold is interleaved — its base may not absorb what
          // our GC would delete, so ABORT the GC; the orphan partitions
          // stay invisible (readers resolve through the checkpoint) and
          // the next fold's sweep collects them
          val onDisk = readManifest(spark, dir).get
          if (onDisk.gen != newGen || onDisk.foldedUpTo != upToBatch)
            throw new ConcurrentFoldException(
              s"checkpoint moved under the fold (gen=${onDisk.gen} folded=${onDisk.foldedUpTo}, " +
                s"expected gen=$newGen folded=$upToBatch) — GC aborted, no data deleted")
          // 3. GC: anything superseded — folded ids, prior bases,
          // leftovers of previously crashed folds — plus their markers
          val root = new org.apache.hadoop.fs.Path(dir)
          fs(spark, root).listStatus(root).toSeq
            .filter(_.getPath.getName.startsWith("batch_id="))
            .filter { st =>
              st.getPath.getName.stripPrefix("batch_id=").toLongOption.exists(id =>
                (id >= 0 && id <= upToBatch) || (id < 0 && id != -newGen))
            }
            .foreach(st => fs(spark, root).delete(st.getPath, true))
          val d = commitsPath(dir)
          fs(spark, d).listStatus(d).toSeq
            .filter(_.getPath.getName.stripPrefix("batch-").toLongOption
              .exists(_ <= upToBatch))
            .foreach(mk => fs(spark, d).delete(mk.getPath, false))
          toFold.size
        }
      }
    }

  /** Scheduled in-band maintenance cadence for a gate index — the
    * knobs [[maintainAfterCommit]] fires on. The reference's ops story
    * is fully scheduled (`infra/main-mvp.tf:464-515` — EventBridge
    * crons driving every maintenance Lambda); ours rides the batch
    * cadence itself so a year of 5-minute micro-batches (~10⁵) never
    * needs a manual pass.
    *
    *  - `commitsEvery`: fold commit MARKERS into the checkpoint every
    *    N committed batches — metadata-only, cheap, keeps the
    *    `_commits/` listing bounded at ≤ commitsEvery objects.
    *  - `foldEvery`: fold DATA partitions into the base generation
    *    every N batches — an O(index) rewrite, so the cadence is
    *    coarse; keeps the partition-directory count bounded at
    *    ≤ foldEvery + 1. Production tables fold daily (288 five-minute
    *    batches), not at the spec-friendly default.
    *  - `replayHorizon`: how many newest batches stay UNFOLDED — a
    *    foreachBatch stream can only replay its last batch, but the
    *    horizon is the safety margin the compactIndex contract
    *    requires (folding a batch that later replays would make the
    *    replay gate against its own rows and self-suppress).
    *
    * A field ≤ 0 disables that dimension. */
  final case class Cadence(
      commitsEvery: Long = 16L,
      foldEvery: Long = 64L,
      replayHorizon: Long = 2L) {
    require(replayHorizon >= 1, s"replayHorizon must be >= 1 (got $replayHorizon)")
  }
  object Cadence {
    /** No in-band maintenance — for callers that schedule their own. */
    val Off: Cadence = Cadence(commitsEvery = 0L, foldEvery = 0L)
  }

  /** The maintenance tick every gated sink fires right after its
    * [[commit]]: folds markers/partitions when the cadence says so,
    * and NEVER fails the batch over housekeeping —
    *  - [[ConcurrentFoldException]] (another writer holds the fold
    *    lease) is EXPECTED under multi-stream contention: skip the
    *    tick, the next one retries;
    *  - any other failure is logged loudly and also skipped: the fold
    *    is crash-consistent by construction (fresh generation →
    *    checkpoint flip → GC last), so a half-died fold cannot corrupt
    *    the index, and the batch's own data is already committed. A
    *    persistent failure re-logs on every due tick — visible, not
    *    silent. */
  def maintainAfterCommit(
      spark: SparkSession, dir: String, batchId: Long, cadence: Cadence): Unit = {
    def due(every: Long): Boolean = every > 0 && batchId > 0 && batchId % every == 0
    try {
      if (due(cadence.foldEvery)) {
        compactIndex(spark, dir, upToBatch = batchId - cadence.replayHorizon)
        compactCommits(spark, dir) // absorb the marker tail in the same tick
      } else if (due(cadence.commitsEvery)) {
        compactCommits(spark, dir); ()
      }
    } catch {
      case e: ConcurrentFoldException =>
        System.err.println(
          s"[index] maintenance tick skipped at batch $batchId ($dir): ${e.getMessage}")
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[index] maintenance FAILED at batch $batchId ($dir) — batch unaffected, " +
            s"next tick retries: $e")
    }
  }

  /** Committed-only view of the index, with `excludeBatchId`'s own
    * partition removed (the replay rule): what every gate — and any
    * external reader — must resolve instead of a raw directory scan. */
  def committedParquet(spark: SparkSession, dir: String, excludeBatchId: Long)(
      empty: => DataFrame): DataFrame = {
    val p      = new org.apache.hadoop.fs.Path(dir)
    val exists = fs(spark, p).exists(p)
    if (!exists) empty
    else readManifest(spark, dir) match {
      case Some(m) =>
        // excluding a FOLDED batch is the self-suppression hazard the
        // compactIndex contract exists to prevent — fail, don't guess
        require(!(m.ids.contains(excludeBatchId) && excludeBatchId <= m.foldedUpTo),
          s"batch $excludeBatchId is folded into the base generation — " +
            "a replay this old cannot be excluded (raise the fold's replay horizon)")
        val unfolded = (m.ids - excludeBatchId).filter(_ > m.foldedUpTo).toSeq.sorted
        // contiguous ids collapse to BETWEEN ranges — the predicate
        // stays a handful of terms after years of batches; it lands on
        // the PARTITION column, so directories prune either way
        val preds =
          (if (m.gen > 0) Seq(col("batch_id") === -m.gen) else Seq.empty) ++
            compressRanges(unfolded).map { case (a, b) =>
              if (a == b) col("batch_id") === a else col("batch_id").between(a, b)
            }
        if (preds.isEmpty) empty
        else spark.read.parquet(dir).filter(preds.reduce(_ || _))
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
