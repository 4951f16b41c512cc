package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The cross-modal streaming curation walkthrough: three concurrent
  * gated ingests (text / embedding / image) over one corpus, composed
  * by id conjunction into a single curated set + dataset card. */
class CurationDemoSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("cross-modal admit sets compose: conjunction semantics, per-modality veto, replay-stable") {
    val work = Files.createTempDirectory("graft-curation").toString
    val r = CurationDemo.run(spark, sf(), work, nBatches = 3)

    val text  = ids(r.textAdmitted)
    val vec   = ids(r.vecAdmitted)
    val media = ids(r.mediaAdmitted)
    val cur   = ids(r.curated)

    // conjunction: curated is EXACTLY the three-way intersection
    assert(cur === (text & vec & media))
    assert(cur.nonEmpty, "fixture must leave a non-empty curated set")

    // each modality actually vetoes: some id passes the other two
    // gates but not this one (the fixture is built so every gate bites)
    assert((text & vec).diff(media).nonEmpty, "image gate never vetoed")
    assert((text & media).diff(vec).nonEmpty, "embedding gate never vetoed")

    // the card counts the curated corpus
    val card = r.card.collect().head
    assert(card.getAs[Long]("n_docs") === cur.size.toLong)

    // REPLAY STABILITY: re-deliver batch 1 of each modality straight
    // into its gate (same batchId — the crash/redelivery path). Every
    // index must end bit-stable, so the composed curated set is too.
    val mediaBatch1 = spark.read.parquet(s"$work/land/media/f1")
    MediaStream.aHashGatedBatchSink(s"$work/index/media", maxHamming = 3)(mediaBatch1, 1L)
    val vecBatch1 = spark.read
      .schema(VecStream.vecSchema).json(s"$work/land/vecs/f1")
    VecStream.semDedupGatedBatchSink(
      s"$work/index/vecs",
      graft.operators.Similarity.kmeansCentroids(
        graft.Tables.embeddings(spark, sf()), 8),
      tau = 0.2)(vecBatch1, 1L)
    val r2 = CurationDemo.compose(spark, sf(), work)
    assert(ids(r2.curated) === cur, "replayed batches changed the curated set")
    assert(ids(r2.mediaAdmitted) === media)
    assert(ids(r2.vecAdmitted) === vec)
  }

  test("cross-modal keyframe veto: a clip whose sampled STILL near-dups an admitted image is vetoed; unrelated clips pass (q209's machinery)") {
    val s = spark; import s.implicits._
    import graft.operators.{Multimodal, TextDedup}
    val work     = Files.createTempDirectory("graft-kfveto").toString
    val imgIndex = s"$work/index/images"
    // admitted image corpus through the REAL gate: clip 6's frame-4
    // still (re-ingested as a plain image, id 1000) + manifest image 7
    // (id 2000) — the pre-simulated distances make exactly one veto
    // fire (kf(6,4) hits the planted still at hamming 0; clip 7's only
    // keyframe is ≥ 21 bits from everything admitted)
    val planted = Multimodal.videoKeyframes(
        Multimodal.syntheticVideo(Seq(6L).toDF("doc_id"), col("doc_id")), everyK = 4)
      .filter(col("frame_idx") === 4L)
      .select(lit(1000L).as("doc_id"), col("payload"))
    val other = Multimodal.syntheticImages(Seq(7L).toDF("doc_id"), col("doc_id"))
      .select(lit(2000L).as("doc_id"), col("payload"))
    MediaStream.aHashGatedBatchSink(imgIndex, maxHamming = 3)(
      planted.unionByName(other), 0L)

    // arriving VIDEO batch: clips 6 and 7 — extract keyframes (no
    // transcode), hash with the image corpus's own aHash, probe the
    // COMMITTED index view; a clip is vetoed iff ANY still hits
    val kf = Multimodal.videoKeyframes(
      Multimodal.syntheticVideo(Seq(6L, 7L).toDF("doc_id"), col("doc_id")), everyK = 4)
    val kfHashes = Multimodal.aHash64(
      kf.select(Multimodal.keyframeId(col("doc_id"), col("frame_idx")).as("doc_id"), col("payload")))
    val index = IndexRead.committedParquet(spark, imgIndex, -999L)(
        Seq.empty[(Long, Long)].toDF("doc_id", "sh").withColumn("batch_id", lit(-1L)))
      .select(col("doc_id"), col("sh"))
    val vetoed = TextDedup.simhashProbeIndex(kfHashes, index, maxHamming = 3, bands = 8)
      .select(Multimodal.keyframeVideoId(col("doc_id")).as("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(vetoed === Set(6L), "exactly the still-duplicated clip is vetoed")
  }
}
