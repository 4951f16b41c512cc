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
}
