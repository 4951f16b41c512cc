package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Int, perturb: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 24, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 32) {
      val base = (x * 37 + y * 11 + seed * 97) % 256
      val v = if (perturb && x == 5 && y == 5) 255 else base
      img.getRaster.setSample(x, y, 0, v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def media(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "payload")
      .withColumn("ingest_ts", to_timestamp(lit("2025-10-08 10:00:00")))

  private def indexIds(hist: String): Set[Long] =
    spark.read.parquet(hist).select("doc_id").collect().map(_.getLong(0)).toSet

  test("aHashGatedBatchSink: within-batch near-dup collapses, growing cross-run gate, replay-safe") {
    val dir  = Files.createTempDirectory("mediastream").toString
    val hist = s"$dir/index"
    val sink = MediaStream.aHashGatedBatchSink(hist, maxHamming = 3)

    // batch 0: two distinct images + a perturbed copy of the first —
    // the copy collapses WITHIN the batch (keep-lowest-id)
    sink(media(Seq(
      10L -> png(1),
      11L -> png(2),
      12L -> png(1, perturb = true))), 0L)
    assert(indexIds(hist) === Set(10L, 11L))

    // batch 1: perturbed copy of an INDEX member (dropped) + novel
    sink(media(Seq(
      20L -> png(2, perturb = true), // near-dup of 11 → dropped
      21L -> png(3))), 1L)
    assert(indexIds(hist) === Set(10L, 11L, 21L))

    // REPLAY of batch 1: own partition invisible to the gate,
    // overwritten in place — same admit set, no double rows
    sink(media(Seq(
      20L -> png(2, perturb = true),
      21L -> png(3))), 1L)
    assert(indexIds(hist) === Set(10L, 11L, 21L))
    assert(spark.read.parquet(hist).count() === 3)

    // batch 2 gates against batch 1's admit too (the GROWING contract)
    sink(media(Seq(
      30L -> png(3, perturb = true), // near-dup of 21 → dropped
      31L -> png(4))), 2L)
    assert(spark.read.parquet(hist).filter(col("batch_id") === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(31L))
  }

  test("audioGatedBatchSink: real WAV decode, exact dups collapse, hamming-1 clip gated across batches, replay-safe") {
    import graft.operators.Multimodal
    // clip payloads from the closed-form manifest; landed id may
    // differ from the manifest id (an exact-dup scenario). Barcode
    // distances precomputed from the manifest: clips 3↔59 are hamming
    // 1; clips 7 and 8 are ≥13 from everything here.
    def audio(rows: Seq[(Long, Long)]) = {
      val payloads = Multimodal
        .syntheticAudio(rows.map(_._2).distinct.toDF("id"), col("id"))
        .withColumnRenamed("doc_id", "mid")
      rows.toDF("doc_id", "mid").join(payloads, "mid").select("doc_id", "payload")
    }
    val dir  = Files.createTempDirectory("audiostream").toString
    val hist = s"$dir/index"
    val sink = MediaStream.audioGatedBatchSink(hist, maxHamming = 1)

    // batch 0: clip 3, a byte-identical copy of it under id 100
    // (exact layer: keep-min wins), and the far clip 7
    sink(audio(Seq(3L -> 3L, 100L -> 3L, 7L -> 7L)), 0L)
    assert(indexIds(hist) === Set(3L, 7L))

    // batch 1: clip 59 (hamming 1 from admitted 3 → dropped by the
    // index probe) + far clip 8 (admitted)
    sink(audio(Seq(59L -> 59L, 8L -> 8L)), 1L)
    assert(indexIds(hist) === Set(3L, 7L, 8L))

    // replay of batch 1: same admit set, no double rows
    sink(audio(Seq(59L -> 59L, 8L -> 8L)), 1L)
    assert(indexIds(hist) === Set(3L, 7L, 8L))
    assert(spark.read.parquet(hist).count() === 3)

    // the commit markers landed (the exactly-once-visible contract)
    val fs = new org.apache.hadoop.fs.Path(hist)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(hist, "_commits"))
      .map(_.getPath.getName).toSet === Set("batch-0", "batch-1"))
  }

  test("videoGatedBatchSink: real AVI decode, exact dups collapse, hamming-1 clip gated, replay-safe") {
    import graft.operators.Multimodal
    // AVI payloads from the closed-form manifest; landed id may differ
    // from the manifest id. Barcode distances precomputed: clips 0↔52
    // are hamming 1; clips 4 and 5 are ≥8 from both and 16 apart.
    def video(rows: Seq[(Long, Long)]) = {
      val payloads = Multimodal
        .syntheticVideo(rows.map(_._2).distinct.toDF("id"), col("id"))
        .withColumnRenamed("doc_id", "mid")
      rows.toDF("doc_id", "mid").join(payloads, "mid").select("doc_id", "payload")
    }
    val dir  = Files.createTempDirectory("videostream").toString
    val hist = s"$dir/index"
    val sink = MediaStream.videoGatedBatchSink(hist, maxHamming = 1)

    // batch 0: clip 0, a byte-identical copy under id 100, far clip 4
    sink(video(Seq(0L -> 0L, 100L -> 0L, 4L -> 4L)), 0L)
    assert(indexIds(hist) === Set(0L, 4L))
    // batch 1: clip 52 (hamming 1 from admitted 0 → dropped) + far clip 5
    sink(video(Seq(52L -> 52L, 5L -> 5L)), 1L)
    assert(indexIds(hist) === Set(0L, 4L, 5L))
    // replay: same admit set, no double rows
    sink(video(Seq(52L -> 52L, 5L -> 5L)), 1L)
    assert(indexIds(hist) === Set(0L, 4L, 5L))
    assert(spark.read.parquet(hist).count() === 3)
  }

  test("keyframeVetoGatedBatchSink: clips are vetoed by the FOREIGN image index, the own growing clip index, and the within-batch keep-lowest rule; replay-safe") {
    import graft.operators.Multimodal
    // pre-simulated hamming distances at maxHamming=3 (everyK=4):
    //  - clip 6's frame-4 still planted in the image index → clip 6
    //    image-vetoed; clip 7 is ≥ 21 bits from everything planted;
    //  - clip 40's keyframes are 2 bits from admitted clip 7's →
    //    own-index veto; clip 8 is ≥ 8 bits from every admitted thing;
    //  - clip 9 is ≥ 8 from the whole admitted set, so a batch with
    //    TWO landed copies of it exercises only the within-batch rule.
    def video(rows: Seq[(Long, Long)]) = {
      val payloads = Multimodal
        .syntheticVideo(rows.map(_._2).distinct.toDF("id"), col("id"))
        .withColumnRenamed("doc_id", "mid")
      rows.toDF("doc_id", "mid").join(payloads, "mid").select("doc_id", "payload")
    }
    val dir    = Files.createTempDirectory("kfveto").toString
    val imgIdx = s"$dir/imgindex"
    val hist   = s"$dir/clipindex"
    // the admitted-image corpus through the REAL image gate
    val planted = Multimodal.videoKeyframes(
        Multimodal.syntheticVideo(Seq(6L).toDF("doc_id"), col("doc_id")), everyK = 4)
      .filter(col("frame_idx") === 4L)
      .select(lit(1000L).as("doc_id"), col("payload"))
    val otherImg = Multimodal.syntheticImages(Seq(7L).toDF("doc_id"), col("doc_id"))
      .select(lit(2000L).as("doc_id"), col("payload"))
    MediaStream.aHashGatedBatchSink(imgIdx, maxHamming = 3)(
      planted.unionByName(otherImg), 0L)

    val sink = MediaStream.keyframeVetoGatedBatchSink(hist, imgIdx, maxHamming = 3)
    def admittedVideos(): Set[Long] =
      IndexRead.committedParquet(spark, hist, -999L)(
          Seq.empty[(Long, Long)].toDF("doc_id", "sh").withColumn("batch_id", lit(-1L)))
        .select(Multimodal.keyframeVideoId(col("doc_id")).as("v"))
        .distinct().collect().map(_.getLong(0)).toSet

    // batch 0: clip 6 vetoed by the IMAGE index, clip 7 admitted
    sink(video(Seq(6L -> 6L, 7L -> 7L)), 0L)
    assert(admittedVideos() === Set(7L))

    // batch 1: clip 40 vetoed by the OWN index (2 bits from clip 7's
    // keyframes), clip 8 admitted
    sink(video(Seq(40L -> 40L, 8L -> 8L)), 1L)
    assert(admittedVideos() === Set(7L, 8L))

    // batch 2: two landed copies of clip 9 — within-batch keep-lowest
    // admits 300, drops 301
    sink(video(Seq(300L -> 9L, 301L -> 9L)), 2L)
    assert(admittedVideos() === Set(7L, 8L, 300L))

    // replay of batch 2: identical admit set, no duplicate rows
    val before = spark.read.parquet(hist).count()
    sink(video(Seq(300L -> 9L, 301L -> 9L)), 2L)
    assert(admittedVideos() === Set(7L, 8L, 300L))
    assert(spark.read.parquet(hist).count() === before)

    // a missing FOREIGN image index fails the batch LOUDLY (a typo'd
    // path must never silently disable the cross-modal veto)
    val broken = MediaStream.keyframeVetoGatedBatchSink(
      s"$dir/clipindex2", s"$dir/no-such-index", maxHamming = 3)
    val e = intercept[IllegalArgumentException] { broken(video(Seq(8L -> 8L)), 0L) }
    assert(e.getMessage.contains("image index not found"))

    // EMPTY FIRST BATCH: every clip of a fresh stream's batch 0 is
    // image-vetoed → zero rows land but the batch still commits, and
    // the NEXT batch must read an empty committed view (not wedge on
    // schema inference over a data-less directory)
    val hist2 = s"$dir/clipindex3"
    val sink2 = MediaStream.keyframeVetoGatedBatchSink(hist2, imgIdx, maxHamming = 3)
    sink2(video(Seq(6L -> 6L)), 0L) // clip 6 is the planted near-dup
    assert(IndexRead.committedIds(spark, hist2).get === Set(0L))
    sink2(video(Seq(8L -> 8L)), 1L) // the stream keeps going
    val admitted2 = IndexRead.committedParquet(spark, hist2, -999L)(
        Seq.empty[(Long, Long)].toDF("doc_id", "sh").withColumn("batch_id", lit(-1L)))
      .select(graft.operators.Multimodal.keyframeVideoId(col("doc_id")).as("v"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(admitted2 === Set(8L))
  }

  test("CHAOS: batch dies AFTER its index append; restart redelivers it — no duplicate admits, no self-suppression") {
    val dir = Files.createTempDirectory("mediastream-chaos").toString
    def land(rows: Seq[(Long, Array[Byte])], sub: String, bumpMs: Long): Unit = {
      media(rows).coalesce(1).write.parquet(s"$dir/land/$sub")
      val now = System.currentTimeMillis()
      Files.walk(java.nio.file.Paths.get(s"$dir/land/$sub")).forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs))
      }
    }
    land(Seq(50L -> png(1), 51L -> png(2)), "f1", 0L)
    land(Seq(52L -> png(1, perturb = true), 53L -> png(5)), "f2", 60000L)
    val hist = s"$dir/index"
    val ckpt = s"$dir/ckpt"

    // first delivery of batch 0: index append completes, then the
    // query dies BEFORE the batch commits — torn crash state
    val real = MediaStream.aHashGatedBatchSink(hist, maxHamming = 3)
    @volatile var crashed = false
    val chaotic: (org.apache.spark.sql.DataFrame, Long) => Unit = { (b, id) =>
      real(b, id)
      if (id == 0L && !crashed) { crashed = true; throw new RuntimeException("injected: died after index append") }
    }
    val q1 = MediaStream.readMediaStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(chaotic)
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()

    // restart from the same checkpoint: batch 0 redelivers, its own
    // partition is invisible to the gate (no self-suppression) and is
    // overwritten in place (no duplicate admits); batch 1 then drops
    // the cross-batch near-dup 52 and admits 53
    val q2 = MediaStream.startAHashIngest(
      MediaStream.readMediaStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1),
      hist, ckpt, maxHamming = 3)
    q2.processAllAvailable(); q2.stop()
    assert(indexIds(hist) === Set(50L, 51L, 53L))
    assert(spark.read.parquet(hist).count() === 3)
  }

  test("CHAOS cross-sink: the veto gate reads the FOREIGN image index through every fold crash state — orphan base invisible, stale-raw leftovers invisible, folded stills still veto, a zombie fold's GC cannot unveto") {
    import graft.operators.Multimodal
    val dir    = Files.createTempDirectory("kfveto-fold").toString
    val imgIdx = s"$dir/imgindex"
    def video(rows: Seq[(Long, Long)]) = {
      val payloads = Multimodal
        .syntheticVideo(rows.map(_._2).distinct.toDF("id"), col("id"))
        .withColumnRenamed("doc_id", "mid")
      rows.toDF("doc_id", "mid").join(payloads, "mid").select("doc_id", "payload")
    }
    // the POISON: clip 8's own keyframe fingerprints — if any invisible
    // copy of these ever reaches the gate, clip 8 gets vetoed; if the
    // committed planted still (clip 6's frame 4) is ever LOST, clip 6
    // gets admitted. Each state probes with a FRESH own index, so the
    // foreign image index is the only veto in play.
    val poison = Multimodal.aHash64(
        Multimodal.videoKeyframes(
            Multimodal.syntheticVideo(Seq(8L).toDF("doc_id"), col("doc_id")), everyK = 4)
          .select(
            Multimodal.keyframeId(col("doc_id"), col("frame_idx")).as("doc_id"),
            col("payload")))
      .select(lit(9999L).as("doc_id"), col("sh"))
    def gateSaysCleanView(tag: String): Unit = {
      val sink = MediaStream.keyframeVetoGatedBatchSink(s"$dir/clip-$tag", imgIdx, maxHamming = 3)
      sink(video(Seq(6L -> 6L, 8L -> 8L)), 0L)
      val admitted = IndexRead.committedParquet(spark, s"$dir/clip-$tag", -999L)(
          Seq.empty[(Long, Long)].toDF("doc_id", "sh").withColumn("batch_id", lit(-1L)))
        .select(Multimodal.keyframeVideoId(col("doc_id")).as("v"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(admitted === Set(8L),
        s"state $tag: expected clip 6 vetoed (committed still) and clip 8 admitted " +
          s"(poison invisible), got $admitted")
    }

    // committed image corpus: the planted clip-6 still + one real
    // image, then two dedup-emptied batches (committed, zero rows) so
    // folds have a marker tail to move through
    val planted = Multimodal.videoKeyframes(
        Multimodal.syntheticVideo(Seq(6L).toDF("doc_id"), col("doc_id")), everyK = 4)
      .filter(col("frame_idx") === 4L)
      .select(lit(1000L).as("doc_id"), col("payload"))
    val otherImg = Multimodal.syntheticImages(Seq(7L).toDF("doc_id"), col("doc_id"))
      .select(lit(2000L).as("doc_id"), col("payload"))
    val imgSink = MediaStream.aHashGatedBatchSink(imgIdx, maxHamming = 3)
    imgSink(planted.unionByName(otherImg), 0L)
    imgSink(otherImg, 1L) // exact dup → committed EMPTY partition
    imgSink(otherImg, 2L)
    gateSaysCleanView("base") // sanity before any chaos

    // state A — mid-fold KILL (base written, checkpoint never flipped):
    // a dead fold's orphan base carries the poison; it has no live gen
    val orphanGen = (System.currentTimeMillis() << 20) | 7L
    poison.withColumn("batch_id", lit(-orphanGen))
      .write.partitionBy("batch_id").mode("append").parquet(imgIdx)
    gateSaysCleanView("orphan")

    // state B — a REAL fold moves the planted still into a base
    // generation (the gate must follow the gen pointer), then a
    // post-flip-kill leftover: the poison re-appears as a STALE raw
    // partition at an id ≤ foldedUpTo
    assert(IndexRead.compactIndex(spark, imgIdx, upToBatch = 1L) >= 1)
    gateSaysCleanView("folded")
    poison.withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id").mode("append").parquet(imgIdx)
    gateSaysCleanView("staleraw")

    // state C — ZOMBIE RESUME: a second fold commits gen g2; the FIRST
    // fold's GC then resumes with its stale (seq, gen) — it must not
    // delete the live base out from under the gate
    val m1 = IndexRead.readManifest(spark, imgIdx).get
    imgSink(otherImg, 3L) // keep a live tail so upToBatch=2 is legal
    assert(IndexRead.compactIndex(spark, imgIdx, upToBatch = 2L) >= 1)
    val m2 = IndexRead.readManifest(spark, imgIdx).get
    assert(m2.gen !== m1.gen)
    IndexRead.foldGc(spark, imgIdx,
      written = m1.seq, newGen = m1.gen, absorbedGen = 0L, upToBatch = 1L)
    assert(IndexRead.readManifest(spark, imgIdx).get.gen === m2.gen)
    gateSaysCleanView("zombie")
  }
}
