package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental paired-dataset miner ([[PairStream]]) — q210's
  * streaming twin. Pins the convergence contract: the union of both
  * sides' landed pairs equals the BATCH capped candidate relation
  * ([[Similarity.cappedCandidatePairs]]) over the full corpora, at
  * every step equal to the batch relation restricted to what both
  * sides have committed; replays are superset-safe; the maintenance
  * cadence keeps index/pairs directories bounded without changing the
  * relation. */
class PairStreamSpec extends SparkSpec {

  private def work(tag: String): String =
    Files.createTempDirectory(s"graft-pairstream-$tag").toString

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental pair mining converges on the batch capped relation across 12 alternating batches with maintenance folds; every intermediate step equals the committed-restricted relation; a replay changes nothing") {
    val dir  = sf("sf0.001")
    val w    = work("conv")
    val embs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val caps = embs.filter(col("vec_id") % 2 === 0) // captions: even ids
    val imgs = embs.filter(col("vec_id") % 2 === 1) // images: odd ids
    val codebook = Similarity.kmeansCentroids(Tables.embeddings(spark, dir), 8)
    val cap = 2L
    val nB  = 6
    // spec-speed cadence: marker folds every 2 batches, data folds
    // every 4 (newest 1 stays live) — the miner must keep converging
    // through generational folds of BOTH index and pairs tables
    val cadence = IndexRead.Cadence(commitsEvery = 2L, foldEvery = 4L, replayHorizon = 1L)
    val cSink = PairStream.captionPairBatchSink(
      s"$w/cidx", s"$w/iidx", s"$w/cpairs", codebook, Some(cap), cadence)
    val iSink = PairStream.imagePairBatchSink(
      s"$w/iidx", s"$w/cidx", s"$w/ipairs", codebook, Some(cap), cadence)

    // ascending-id RANGE batches — the mint-order landing contract the
    // cap equivalence requires (documented in PairStream)
    def lo(b: Int): Long = b.toLong * 500L / nB
    def slice(side: DataFrame, b: Int): DataFrame =
      side.filter(col("vec_id") >= lo(b) && col("vec_id") < lo(b + 1))

    // the batch-mode truth this run must converge on
    val expected = pairSet(
      Similarity.cappedCandidatePairs(caps, imgs, codebook, Some(cap)))
    assert(expected.nonEmpty, "fixture produced no candidate pairs — the test is vacuous")
    def batchOf(id: Long): Int =
      (0 until nB).find(b => id >= lo(b) && id < lo(b + 1)).get
    def mined(): Set[(Long, Long, Long)] =
      pairSet(PairStream.minedPairs(spark, s"$w/cpairs", s"$w/ipairs"))

    // interleave c0, i0, c1, i1, … — after every sink call the mined
    // union must equal the batch relation restricted to the pairs
    // whose BOTH sides are committed (each pair discovered by the side
    // that lands later)
    for (b <- 0 until nB) {
      cSink(slice(caps, b), b.toLong)
      val afterC = expected.filter { case (a, i, _) => batchOf(a) <= b && batchOf(i) < b }
      assert(mined() === afterC, s"after caption batch $b")
      iSink(slice(imgs, b), b.toLong)
      val afterI = expected.filter { case (a, i, _) => batchOf(a) <= b && batchOf(i) <= b }
      assert(mined() === afterI, s"after image batch $b")
    }
    assert(mined() === expected) // full convergence

    // REPLAY of the newest caption batch (unfolded — the replay
    // horizon): recomputes against the now-complete image index, a
    // per-partition superset; the deduped view is unchanged
    cSink(slice(caps, nB - 1), (nB - 1).toLong)
    assert(mined() === expected)

    // maintenance actually ran: bounded partition dirs on a folded
    // index (folds hit at batch 4: <= foldEvery live + 1 base)
    val fs = new org.apache.hadoop.fs.Path(w)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(d: String): Seq[String] = fs
      .listStatus(new org.apache.hadoop.fs.Path(d))
      .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq
    for (d <- Seq(s"$w/cidx", s"$w/iidx", s"$w/cpairs", s"$w/ipairs")) {
      assert(dataDirs(d).count(_.startsWith("batch_id=-")) === 1, s"$d: ${dataDirs(d)}")
      assert(dataDirs(d).size <= 4, s"unbounded partitions at $d: ${dataDirs(d)}")
    }
  }

  test("uncapped mining converges too, and the first batch against an absent other-modality index lands zero pairs and still commits") {
    val dir  = sf("sf0.001")
    val w    = work("uncap")
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 100L) // small corpus, uncapped mass fine
    val caps = embs.filter(col("vec_id") % 2 === 0)
    val imgs = embs.filter(col("vec_id") % 2 === 1)
    val codebook = Similarity.kmeansCentroids(embs, 4)
    val cSink = PairStream.captionPairBatchSink(
      s"$w/cidx", s"$w/iidx", s"$w/cpairs", codebook, None, IndexRead.Cadence.Off)
    val iSink = PairStream.imagePairBatchSink(
      s"$w/iidx", s"$w/cidx", s"$w/ipairs", codebook, None, IndexRead.Cadence.Off)
    // image batch FIRST: no caption index exists yet — zero pairs, but
    // the batch must land and commit (the recoverable-absence case)
    iSink(imgs.filter(col("vec_id") < 50L), 0L)
    assert(PairStream.minedPairs(spark, s"$w/cpairs", s"$w/ipairs").count() === 0L)
    assert(IndexRead.committedIds(spark, s"$w/iidx").get === Set(0L))
    cSink(caps.filter(col("vec_id") < 50L), 0L)
    iSink(imgs.filter(col("vec_id") >= 50L), 1L)
    cSink(caps.filter(col("vec_id") >= 50L), 1L)
    val expected = pairSet(Similarity.cappedCandidatePairs(caps, imgs, codebook, None))
    assert(pairSet(PairStream.minedPairs(spark, s"$w/cpairs", s"$w/ipairs")) === expected)
  }
}
