package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis
import graft.testfs.S3LikeFileSystem
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Exactly-once-VISIBLE index appends for the streaming gates, under
  * object-store semantics: a `batch_id=N` partition is invisible to
  * every reader — external scans and the next batch's gate alike —
  * until its `_commits/batch-N` marker lands, so a reader racing a
  * mid-batch write (or scanning after a mid-batch KILL) never observes
  * a partial partition. The checkpoint's replay of the dead batch
  * rewrites the partition in place and commits it, at which point it
  * becomes visible exactly once. */
class IndexVisibilitySpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.s3x.impl", classOf[S3LikeFileSystem].getName)

  private def s3dir(tag: String): String =
    "s3x://" + Files.createTempDirectory(s"graft-s3x-$tag").toString

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("mid-batch kill: the orphaned partition is invisible to readers AND the next gate until its batch replays") {
    val hist = s3dir("idxvis") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)

    // batch 0 lands and COMMITS
    sink(docs(1L -> "alpha", 2L -> "beta"), 0L)
    def visibleIds(exclude: Long = -999L): Set[Long] =
      IndexRead.committedParquet(spark, hist, exclude)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(visibleIds() === Set(1L, 2L))

    // CHAOS: batch 1 dies MID-WRITE — its data objects land (here,
    // written directly, bypassing the sink) but the commit marker
    // never does. On S3 the partial objects are immediately listable.
    docs(3L -> "gamma")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id").mode("append").parquet(hist)

    // a RAW directory scan sees the partial rows — which is exactly
    // why readers must resolve the manifest instead
    assert(spark.read.parquet(hist).count() === 3)
    // the committed view does NOT
    assert(visibleIds() === Set(1L, 2L))

    // the REPLAY (stream restart re-delivers batch 1): dynamic
    // overwrite rewrites the orphaned partition in place, then the
    // marker lands — visible exactly once
    sink(docs(3L -> "gamma"), 1L)
    assert(visibleIds() === Set(1L, 2L, 3L))
    assert(spark.read.parquet(hist).count() === 3) // no double rows

    // and the NOW-committed content gates batch 2: a duplicate of
    // gamma is rejected, a novel doc admitted
    sink(docs(30L -> "gamma", 31L -> "delta"), 2L)
    assert(visibleIds() === Set(1L, 2L, 3L, 31L))

    // the manifest itself: one marker object per committed batch
    val fs = new org.apache.hadoop.fs.Path(hist)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markers = fs
      .listStatus(new org.apache.hadoop.fs.Path(hist, "_commits"))
      .map(_.getPath.getName).toSet
    assert(markers === Set("batch-0", "batch-1", "batch-2"))
  }

  test("gate semantics under the manifest: had the partial been visible, the dup would have been wrongly rejected") {
    // the inverse experiment — proves the committed view is what
    // changes the admit decision, not an accident of the data
    val hist = s3dir("idxvis2") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    sink(docs(1L -> "alpha"), 0L)
    // orphaned partial for batch 1 carrying "omega"
    docs(9L -> "omega")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id").mode("append").parquet(hist)
    // batch 2 brings its own "omega": the orphan is invisible, so the
    // gate ADMITS it — the stream's contract is that batch 1 either
    // replays (overwriting the orphan) or never existed; gating
    // against unreplayed ghosts would drop content that no committed
    // index contains
    sink(docs(20L -> "omega"), 2L)
    val committed = IndexRead.committedParquet(spark, hist, -999L)(
        Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(committed === Set(1L, 20L))
  }

  test("compactCommits folds markers into one checkpoint: visibility unchanged, orphans stay invisible, new batches keep committing") {
    val hist = s3dir("idxcp") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    sink(docs(1L -> "alpha"), 0L)
    sink(docs(2L -> "beta"), 1L)
    sink(docs(3L -> "gamma"), 2L)
    // an orphaned partial (batch 3 died mid-write, no marker)
    docs(9L -> "omega")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("batch_id", lit(3L))
      .write.partitionBy("batch_id").mode("append").parquet(hist)

    val fs = new org.apache.hadoop.fs.Path(hist)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitEntries(): Set[String] = fs
      .listStatus(new org.apache.hadoop.fs.Path(hist, "_commits"))
      .map(_.getPath.getName).toSet
    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(commitEntries() === Set("batch-0", "batch-1", "batch-2"))
    assert(visibleIds() === Set(1L, 2L, 3L))

    // fold: three markers → ONE checkpoint object holding "0-2"
    // (versioned: checkpoint-<seq>, the CAS commit point); the orphan
    // is NOT folded in (it was never committed)
    assert(IndexRead.compactCommits(spark, hist) === 3)
    assert(commitEntries().forall(_.startsWith("checkpoint")), commitEntries())
    assert(commitEntries().exists(_.startsWith("checkpoint-")))
    assert(visibleIds() === Set(1L, 2L, 3L)) // unchanged, orphan still invisible

    // the stream keeps going: batch 3 replays through the sink
    // (overwriting the orphan + marker), then batch 4 lands — readers
    // union checkpoint ∪ new markers
    sink(docs(9L -> "omega"), 3L)
    sink(docs(4L -> "delta", 40L -> "omega"), 4L) // 40 is a dup of committed 9
    assert(commitEntries().filter(_.startsWith("batch-")) === Set("batch-3", "batch-4"))
    assert(visibleIds() === Set(1L, 2L, 3L, 9L, 4L))

    // a second fold absorbs the new markers into the single range
    // (retention keeps the immediately superseded checkpoint file)
    assert(IndexRead.compactCommits(spark, hist) === 2)
    assert(commitEntries().forall(_.startsWith("checkpoint")), commitEntries())
    assert(commitEntries().size <= 2)
    assert(visibleIds() === Set(1L, 2L, 3L, 9L, 4L))
    // idempotent when there is nothing to fold
    assert(IndexRead.compactCommits(spark, hist) === 0)
  }

  test("compactIndex: micro-batch partitions fold into a generational base — same visible rows, gates keep working, GC sweeps") {
    val hist = s3dir("idxfold") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    sink(docs(1L -> "alpha"), 0L)
    sink(docs(2L -> "beta"), 1L)
    sink(docs(3L -> "gamma"), 2L)
    sink(docs(4L -> "delta"), 3L)

    val fs = new org.apache.hadoop.fs.Path(hist)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Set[String] = fs
      .listStatus(new org.apache.hadoop.fs.Path(hist))
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName).toSet
    def visibleIds(exclude: Long = -999L): Set[Long] =
      IndexRead.committedParquet(spark, hist, exclude)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dataDirs().size === 4)
    assert(visibleIds() === Set(1L, 2L, 3L, 4L))

    // fold batches 0-2 into a base generation (an attempt-unique
    // negative id); batch 3 stays live (the replay horizon)
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 2L) === 3)
    assert(dataDirs().count(_.startsWith("batch_id=-")) === 1, dataDirs())
    assert(dataDirs().filterNot(_.startsWith("batch_id=-")) === Set("batch_id=3"))
    assert(visibleIds() === Set(1L, 2L, 3L, 4L)) // identical view

    // the gate still rejects a dup of a FOLDED doc and admits novelty
    sink(docs(40L -> "beta", 5L -> "epsilon"), 4L)
    assert(visibleIds() === Set(1L, 2L, 3L, 4L, 5L))

    // second fold: a FRESH attempt generation absorbs the old base
    // and the newly folded partitions; the old base is GC'd
    val firstBase = dataDirs().find(_.startsWith("batch_id=-")).get
    sink(docs(6L -> "zeta"), 5L)
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 4L) === 2)
    assert(dataDirs().count(_.startsWith("batch_id=-")) === 1, dataDirs())
    assert(!dataDirs().contains(firstBase)) // old generation swept
    assert(dataDirs().filterNot(_.startsWith("batch_id=-")) === Set("batch_id=5"))
    assert(visibleIds() === Set(1L, 2L, 3L, 4L, 5L, 6L))

    // the contract rails: folding up to the newest committed batch is
    // refused (it could replay), and excluding a folded id fails
    // loudly instead of self-suppressing silently
    intercept[IllegalArgumentException] {
      IndexRead.compactIndex(spark, hist, upToBatch = 5L)
    }
    intercept[IllegalArgumentException] { visibleIds(exclude = 1L) }
    // while excluding a LIVE batch still works
    assert(visibleIds(exclude = 5L) === Set(1L, 2L, 3L, 4L, 5L))

    // replay of the newest (unfolded) batch after a fold: in-place
    // overwrite, same admit set, no double rows
    sink(docs(6L -> "zeta"), 5L)
    assert(visibleIds() === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(spark.read.parquet(hist).count() === 6)
  }

  test("auto-maintenance cadence: a long batch run keeps _commits and partition dirs BOUNDED with no manual pass; due-tick contention and mid-fold kills never fail a batch") {
    val hist = s3dir("idxauto") + "/index"
    // spec-speed cadence (production would fold daily): markers fold
    // every 3 batches, data partitions every 6, newest 2 stay live
    val cad  = IndexRead.Cadence(commitsEvery = 3L, foldEvery = 6L, replayHorizon = 2L)
    val sink = DocStream.bloomGatedBatchSink(hist, cadence = cad)

    val root = new org.apache.hadoop.fs.Path(hist)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitEntries(): Set[String] = fs
      .listStatus(new org.apache.hadoop.fs.Path(hist, "_commits"))
      .map(_.getPath.getName).toSet
    def dataDirs(): Set[String] = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName).toSet
    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // a simulated long ingest: 14 batches, one novel doc per batch,
    // plus a dup of the FIRST (long-folded) doc late in the run
    for (b <- 0L to 13L) {
      val rows =
        if (b == 12L) docs(120L -> "doc-0", 12L -> s"doc-$b") // 120 dups folded doc 0
        else docs(b -> s"doc-$b")
      sink(rows, b)
    }
    // every novel doc visible, the dup of the folded doc rejected
    assert(visibleIds() === (0L to 13L).toSet)
    // bounded metadata: ≤ foldEvery live markers + checkpoint + lease
    // residue-free (the last fold tick was at batch 12)
    val entries = commitEntries()
    assert(entries.exists(_.startsWith("checkpoint")), entries)
    assert(!entries.contains("fold-lease"))
    assert(entries.size <= 5, s"unbounded _commits listing: $entries")
    // bounded data dirs: one base generation + the unfolded tail
    val dirs = dataDirs()
    assert(dirs.count(_.startsWith("batch_id=-")) === 1, s"multiple bases: $dirs")
    assert(dirs.size <= 5, s"unbounded partition dirs: $dirs")

    // CONTENTION on a due tick: another writer holds the lease at the
    // next fold boundary — the batch must still commit (tick skipped)
    val lease = new org.apache.hadoop.fs.Path(hist, "_commits/fold-lease")
    val out   = fs.create(lease, false); out.write("held".getBytes("UTF-8")); out.close()
    for (b <- 14L to 18L) sink(docs(b -> s"doc-$b"), b) // 15 and 18 are due ticks
    assert(visibleIds() === (0L to 18L).toSet) // every batch landed
    fs.delete(lease, false)

    // KILL MID-AUTO-FOLD, crash state A (base written, checkpoint NOT
    // flipped): an orphan next-generation partition appears — it must
    // be invisible, and the next due tick must fold THROUGH it.
    // (The orphan minted below carries a fresh attempt-gen timestamp,
    // so foldGc's age gate — which protects a CONCURRENT attempt's
    // base mid-commit — must be zeroed for the sweep to run in-test;
    // the gate itself has its own test.)
    // try/finally: a failed assert below must not leak the zeroed age
    // gate into later tests in this JVM (it would silently disable
    // guard 3 everywhere)
    sys.props("graft.foldGcMinAgeMs") = "0"
    try {
    val manifest = IndexRead.committedIds(spark, hist).get
    val gens = dataDirs().filter(_.startsWith("batch_id=-"))
      .map(_.stripPrefix("batch_id=-").toLong)
    val nextGen = gens.max + 1
    docs(999L -> "garbage-from-dead-fold")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("batch_id", lit(-nextGen))
      .write.partitionBy("batch_id").mode("append").parquet(hist)
    assert(visibleIds() === (0L to 18L).toSet) // orphan invisible
    // drive to the next fold tick (batch 24): the winner's sweep GCs
    // every negative partition that is not ITS base — the orphan too
    for (b <- 19L to 24L) sink(docs(b -> s"doc-$b"), b)
    assert(visibleIds() === (0L to 24L).toSet)
    assert(!visibleIds().contains(999L))
    assert(dataDirs().count(_.startsWith("batch_id=-")) === 1)
    assert(IndexRead.committedIds(spark, hist).get.size >= manifest.size)

    // KILL MID-AUTO-FOLD, crash state B (checkpoint flipped, GC never
    // ran): superseded partitions linger — invisible (their ids are ≤
    // foldedUpTo), swept by the next fold
    docs(888L -> "stale-partition-left-by-dead-gc")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("batch_id", lit(1L)) // id 1 is long folded
      .write.partitionBy("batch_id").mode("append").parquet(hist)
    assert(visibleIds() === (0L to 24L).toSet) // leftover invisible
    for (b <- 25L to 30L) sink(docs(b -> s"doc-$b"), b)
    assert(visibleIds() === (0L to 30L).toSet)
    assert(!dataDirs().contains("batch_id=1")) // swept
    } finally sys.props.remove("graft.foldGcMinAgeMs")
  }

  test("fold lease: a concurrent fold ABORTS (ConcurrentFoldException) instead of racing; a stale lease from a crashed fold is broken") {
    val hist = s3dir("idxlease") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    sink(docs(1L -> "alpha"), 0L)
    sink(docs(2L -> "beta"), 1L)
    sink(docs(3L -> "gamma"), 2L)

    val root = new org.apache.hadoop.fs.Path(hist)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    def dataDirs(): Set[String] = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName).toSet

    // another writer holds the lease: BOTH folds must abort — and
    // leave the index byte-identical (no checkpoint move, no GC)
    val lease = new org.apache.hadoop.fs.Path(hist, "_commits/fold-lease")
    val out   = fs.create(lease, false)
    out.write("held".getBytes("UTF-8")); out.close()
    intercept[IndexRead.ConcurrentFoldException] {
      IndexRead.compactIndex(spark, hist, upToBatch = 1L)
    }
    intercept[IndexRead.ConcurrentFoldException] {
      IndexRead.compactCommits(spark, hist)
    }
    assert(fs.exists(lease)) // the loser never deletes the holder's lease
    assert(dataDirs() === Set("batch_id=0", "batch_id=1", "batch_id=2"))
    assert(visibleIds() === Set(1L, 2L, 3L))

    // a lease older than the TTL is a crashed fold's leftover: broken
    // with a note, and the fold proceeds (folds are idempotent up to
    // their checkpoint flip, so the re-run is safe)
    fs.setTimes(lease, System.currentTimeMillis() - 31L * 60 * 1000, -1)
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 1L) === 2)
    assert(!fs.exists(lease)) // released on the way out
    assert(dataDirs().count(_.startsWith("batch_id=-")) === 1, dataDirs())
    assert(dataDirs().filterNot(_.startsWith("batch_id=-")) === Set("batch_id=2"))
    assert(visibleIds() === Set(1L, 2L, 3L))

    // the gate still works after a lease-broken fold: dup of a folded
    // doc rejected, novelty admitted
    sink(docs(40L -> "alpha", 5L -> "epsilon"), 3L)
    assert(visibleIds() === Set(1L, 2L, 3L, 5L))
  }

  test("ZOMBIE fold resuming its GC after a later fold committed cannot delete the LIVE base — the checkpoint never points at a deleted partition") {
    val hist = s3dir("idxzombie") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    for (b <- 0L to 4L) sink(docs(b -> s"doc-$b"), b)
    val root = new org.apache.hadoop.fs.Path(hist)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Set[String] = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName).toSet
    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // fold W wins its CAS (seq sW, gen gW)… then "stalls" before its
    // GC would matter; fold Z later commits seq sW+1 with gen gZ
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 2L) === 3)
    val mW = IndexRead.readManifest(spark, hist).get
    sink(docs(5L -> "doc-5"), 5L)
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 4L) === 2)
    val mZ = IndexRead.readManifest(spark, hist).get
    assert(mZ.seq === mW.seq + 1)
    assert(mZ.gen !== mW.gen)
    assert(dataDirs().contains(s"batch_id=${-mZ.gen}"))

    // W resumes at step 3 with its STALE (written, newGen): the
    // unguarded sweep would delete every negative partition except
    // -gW — including the LIVE base -gZ. Guard 1 (checkpoint moved)
    // must skip the stale-base sweep entirely.
    IndexRead.foldGc(spark, hist,
      written = mW.seq, newGen = mW.gen, absorbedGen = 0L, upToBatch = 2L)
    assert(dataDirs().contains(s"batch_id=${-mZ.gen}"),
      s"zombie GC deleted the live base: ${dataDirs()}")
    assert(visibleIds() === (0L to 5L).toSet) // nothing vanished
    // and Z's checkpoint survives W's checkpoint GC
    assert(IndexRead.readManifest(spark, hist).get.seq === mZ.seq)
  }

  test("orphan age gate: a foreign base YOUNGER than the gate survives the sweep (a concurrent attempt mid-commit); an epoch-old one is swept") {
    val hist = s3dir("idxage") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    for (b <- 0L to 3L) sink(docs(b -> s"doc-$b"), b)
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 2L) === 3)
    val m    = IndexRead.readManifest(spark, hist).get
    val root = new org.apache.hadoop.fs.Path(hist)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Set[String] = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName).toSet
    def fakeBase(gen: Long): Unit =
      docs(777L -> "foreign-attempt")
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("batch_id", lit(-gen))
        .write.partitionBy("batch_id").mode("append").parquet(hist)
    // a YOUNG foreign attempt-gen (fresh mint time) and an OLD one
    // (small id ⇒ ~epoch-0 mint time, i.e. a long-dead fold's orphan)
    val youngGen = (System.currentTimeMillis() << 20) | 123L
    val oldGen   = 7L
    fakeBase(youngGen); fakeBase(oldGen)
    IndexRead.foldGc(spark, hist,
      written = m.seq, newGen = m.gen, absorbedGen = 0L, upToBatch = 2L)
    val dirs = dataDirs()
    assert(dirs.contains(s"batch_id=${-youngGen}"),
      s"age gate failed — a mid-commit concurrent base was swept: $dirs")
    assert(!dirs.contains(s"batch_id=${-oldGen}"), s"stale orphan not swept: $dirs")
    assert(dirs.contains(s"batch_id=${-m.gen}")) // live base untouched
  }

  test("RESIDUAL ZOMBIE WINDOW: a concurrent fold's CAS landing between the sweep's liveness re-read and its delete fires the named hard-down throw — and replaying the retained batches onto the retained snapshot restores the index") {
    // The foldGc docstring's residual window, constructed
    // deterministically via the foldGcBeforeDelete seam: fold W commits
    // (sW, gW) and stalls past the age gate before its sweep; a
    // concurrent fold Z reads W's checkpoint, writes its base -gZ, and
    // stalls equally long. W's sweep then sees -gZ as an old-enough
    // foreign orphan, passes the per-candidate liveness re-read
    // (manifest still at sW) — and Z's CAS lands EXACTLY here, making
    // -gZ live one instant before W deletes it. The post-delete
    // re-read must fail AT THE CAUSE with the named repair, never
    // return and let every folded row silently vanish from the gate.
    val hist = s3dir("idxzombiecas") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    for (b <- 0L to 4L) sink(docs(b -> s"doc-$b"), b)
    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // fold W commits (sW, gW, foldedUpTo=2)… then stalls pre-sweep
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 2L) === 3)
    val mW = IndexRead.readManifest(spark, hist).get
    // fold Z, mid-commit: base written (old base ∪ batches 3,4 —
    // compactIndex step 1), CAS not yet attempted
    val gZ = (System.currentTimeMillis() << 20) | 321L
    spark.read.parquet(hist)
      .filter(col("batch_id").isin(3L, 4L) || col("batch_id") === -mW.gen)
      .withColumn("batch_id", lit(-gZ))
      .write.partitionBy("batch_id").mode("append").parquet(hist)

    sys.props("graft.foldGcMinAgeMs") = "0"
    var casFired = false
    IndexRead.foldGcBeforeDelete = gen =>
      if (gen == gZ) {
        // Z wins the next seq INSIDE W's check-then-act window
        IndexRead.casCheckpoint(spark, hist, mW.copy(foldedUpTo = 4L, gen = gZ))
        casFired = true
      }
    try {
      Thread.sleep(5) // gZ's mint time must clear the (zeroed) age gate
      val e = intercept[IllegalStateException] {
        IndexRead.foldGc(spark, hist,
          written = mW.seq, newGen = mW.gen, absorbedGen = 0L, upToBatch = 2L)
      }
      assert(casFired, "seam never fired — the window was not constructed")
      assert(e.getMessage.contains("zombie CAS"), e.getMessage)
      assert(e.getMessage.contains("replay batches"), e.getMessage)
    } finally {
      IndexRead.foldGcBeforeDelete = _ => ()
      sys.props.remove("graft.foldGcMinAgeMs")
    }
    // hard-down is REAL: the live checkpoint (Z's) points at the swept
    // base, and the reader-side require refuses to gate on a partial
    // index
    val mZ = IndexRead.readManifest(spark, hist).get
    assert(mZ.seq === mW.seq + 1 && mZ.gen === gZ)
    val down = intercept[IllegalArgumentException](visibleIds())
    assert(down.getMessage.contains("base partition"), down.getMessage)

    // …and the promised REPAIR works with what the guards retained:
    // W's throw aborted its sweep BEFORE marker/raw cleanup, and a
    // sweep never deletes its own newGen base — so the -gW snapshot
    // and the raw batch-3/4 partitions (> W's foldedUpTo=2) are all
    // still on disk. Replaying them onto the snapshot rebuilds Z's
    // base partition; the index comes back complete.
    spark.read.parquet(hist)
      .filter(col("batch_id").isin(3L, 4L) || col("batch_id") === -mW.gen)
      .withColumn("batch_id", lit(-gZ))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(hist)
    assert(visibleIds() === (0L to 4L).toSet, "repair did not restore the index")
    // and the gate works again: dup of a folded doc rejected, novelty admitted
    sink(docs(50L -> "doc-1", 5L -> "doc-5"), 5L)
    assert(visibleIds() === (0L to 5L).toSet)
  }

  test("committedParquet FAILS LOUDLY when the checkpoint's base partition is missing — never a silent partial-index gate") {
    val hist = s3dir("idxbase") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    for (b <- 0L to 3L) sink(docs(b -> s"doc-$b"), b)
    assert(IndexRead.compactIndex(spark, hist, upToBatch = 2L) === 3)
    val m    = IndexRead.readManifest(spark, hist).get
    val root = new org.apache.hadoop.fs.Path(hist)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, s"batch_id=${-m.gen}"), true)
    val e = intercept[IllegalArgumentException] {
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .count()
    }
    assert(e.getMessage.contains("base partition"), e.getMessage)
  }

  test("checkpoint CAS is the linearization point: of two folds that read the same sequence, exactly one commits; the loser changes nothing visible") {
    val hist = s3dir("idxcas") + "/index"
    val sink = DocStream.bloomGatedBatchSink(hist)
    sink(docs(1L -> "alpha"), 0L)
    sink(docs(2L -> "beta"), 1L)
    sink(docs(3L -> "gamma"), 2L)

    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // two writers read the SAME manifest sequence — both target seq+1
    val m = IndexRead.readManifest(spark, hist).get
    assert(IndexRead.casCheckpoint(spark, hist, m) === m.seq + 1) // winner
    val lost = intercept[IndexRead.ConcurrentFoldException] {
      IndexRead.casCheckpoint(spark, hist, m.copy(ids = Set(999L))) // loser's view
    }
    assert(lost.getMessage.contains("CAS"))
    // the loser's divergent state never became visible
    assert(IndexRead.readManifest(spark, hist).get.ids === m.ids)
    assert(visibleIds() === Set(1L, 2L, 3L))

    // a writer that read the WINNER's sequence commits normally
    val m2 = IndexRead.readManifest(spark, hist).get
    assert(m2.seq === m.seq + 1)
    assert(IndexRead.casCheckpoint(spark, hist, m2) === m2.seq + 1)
    assert(visibleIds() === Set(1L, 2L, 3L))
  }

  test("legacy pre-manifest index: the first commit ADOPTS existing partitions — history never silently vanishes") {
    val hist = s3dir("idxlegacy") + "/index"
    // a pre-upgrade index: two batch partitions, NO _commits at all
    for ((id, b) <- Seq((1L, 0L), (2L, 1L)))
      docs(id -> s"legacy$id")
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("batch_id", lit(b))
        .write.partitionBy("batch_id").mode("append").parquet(hist)

    // first post-upgrade batch: its commit adopts batches 0 and 1
    val sink = DocStream.bloomGatedBatchSink(hist)
    sink(docs(3L -> "gamma"), 2L)
    def visibleIds(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[Long].toDF("doc_id").withColumn("batch_id", lit(-1L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(visibleIds() === Set(1L, 2L, 3L)) // legacy history still visible

    // and the gate still rejects a dup of a LEGACY doc
    sink(docs(10L -> "legacy1", 11L -> "delta"), 3L)
    assert(visibleIds() === Set(1L, 2L, 3L, 11L))
  }

  test("range compression: contiguous ids become one BETWEEN, gaps split") {
    assert(IndexRead.formatRanges(Seq(0L, 1L, 2L, 3L)) === "0-3")
    assert(IndexRead.formatRanges(Seq(0L, 1L, 3L, 4L, 7L)) === "0-1,3-4,7")
    assert(IndexRead.formatRanges(Seq(5L)) === "5")
    assert(IndexRead.formatRanges(Seq.empty) === "")
  }

  test("vector gate commits its partitions too (marker per batch, replay idempotent)") {
    import graft.operators.Similarity
    def vec(x: Float, y: Float) = Array(x, y) ++ Array.fill(6)(0f)
    val train = Seq(
      (0L, vec(1f, 0f)), (1L, vec(0f, 1f)),
      (2L, vec(0.95f, 0.05f)), (3L, vec(0.05f, 0.95f))).toDF("vec_id", "embedding")
    val codebook = Similarity.kmeansCentroids(train, 2)
    val hist = s3dir("idxvis3") + "/index"
    val sink = VecStream.semDedupGatedBatchSink(hist, codebook, tau = 0.95)
    sink(Seq(10L -> vec(1f, 0f)).toDF("vec_id", "embedding"), 0L)
    sink(Seq(20L -> vec(0f, 1f)).toDF("vec_id", "embedding"), 1L)
    sink(Seq(20L -> vec(0f, 1f)).toDF("vec_id", "embedding"), 1L) // replay
    val fs = new org.apache.hadoop.fs.Path(hist)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markers = fs
      .listStatus(new org.apache.hadoop.fs.Path(hist, "_commits"))
      .map(_.getPath.getName).toSet
    assert(markers === Set("batch-0", "batch-1"))
    assert(spark.read.parquet(hist).count() === 2)
  }
}
