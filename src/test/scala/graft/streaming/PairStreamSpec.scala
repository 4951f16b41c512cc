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

  /** CHAOS cross-sink, parameterized by WHICH modality's index is
    * folded under the other side's probe. Both directions ride the
    * same committed-read path (`committedVectors` → `committedParquet`)
    * but from DIFFERENT sinks — the caption sink probes the image
    * index uncapped-batch × committed, the image sink ranks its batch
    * within committed ∪ batch — so the symmetry is a contract, not a
    * given. The POISON: an alien vec_id carrying a LANDED vector's
    * embedding, planted in every invisible state — if any copy reaches
    * the probe it mints false pairs (and on the image side can steal a
    * legitimate vector's cap slot); truth is recomputed host-side from
    * the raw slices, independent of the path under test. */
  private def crossSinkChaos(foldImages: Boolean): Unit = {
    val dir  = sf("sf0.001")
    val side = if (foldImages) "img" else "cap"
    val w    = work(s"chaos-$side")
    val embs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val caps = embs.filter(col("vec_id") % 2 === 0)
    val imgs = embs.filter(col("vec_id") % 2 === 1)
    val codebook = Similarity.kmeansCentroids(Tables.embeddings(spark, dir), 8)
    val cap = 2L
    // the LANDING sink builds the folded index (its own foreign index
    // is absent: it lands vectors, mints no pairs)
    val (landed, landIdx) = if (foldImages) (imgs, s"$w/iidx") else (caps, s"$w/cidx")
    val landSink =
      if (foldImages)
        PairStream.imagePairBatchSink(
          landIdx, s"$w/none", s"$w/lpairs", codebook, Some(cap), IndexRead.Cadence.Off)
      else
        PairStream.captionPairBatchSink(
          landIdx, s"$w/none", s"$w/lpairs", codebook, Some(cap), IndexRead.Cadence.Off)
    // alien id in the folded side's modality (ids are odd = image,
    // even = caption; the alien keeps the parity)
    val poisonId = if (foldImages) 100001L else 100002L
    def poison = landed.filter(col("vec_id") === (if (foldImages) 1L else 0L))
      .select(lit(poisonId).as("vec_id"), col("embedding"))

    val landedHi = scala.collection.mutable.ArrayBuffer.empty[Long]
    def land(b: Long, hi: Long): Unit = {
      val lo = landedHi.lastOption.getOrElse(0L)
      landSink(landed.filter(col("vec_id") >= lo && col("vec_id") < hi), b)
      landedHi += hi
    }
    def probeSeesTruth(tag: String): Unit = {
      val (probeSink, pairsDir) =
        if (foldImages)
          (PairStream.captionPairBatchSink(
            s"$w/probe-$tag/cidx", landIdx, s"$w/probe-$tag/cpairs",
            codebook, Some(cap), IndexRead.Cadence.Off), s"$w/probe-$tag/cpairs")
        else
          (PairStream.imagePairBatchSink(
            s"$w/probe-$tag/iidx", landIdx, s"$w/probe-$tag/ipairs",
            codebook, Some(cap), IndexRead.Cadence.Off), s"$w/probe-$tag/ipairs")
      probeSink(if (foldImages) caps else imgs, 0L)
      val landedNow = landed.filter(col("vec_id") < landedHi.last)
      val truth = pairSet(
        if (foldImages)
          Similarity.cappedCandidatePairs(caps, landedNow, codebook, Some(cap))
        else
          Similarity.cappedCandidatePairs(landedNow, imgs, codebook, Some(cap)))
      val mined = pairSet(PairStream.minedPairs(spark, pairsDir, pairsDir))
      assert(mined === truth, s"state $tag/$side: probed relation diverged from committed truth")
      val poisonSide: ((Long, Long, Long)) => Long = if (foldImages) _._2 else _._1
      assert(!mined.exists(p => poisonSide(p) == poisonId), s"state $tag/$side: poison pair leaked")
      assert(truth.nonEmpty, s"state $tag/$side: vacuous fixture")
    }

    land(0L, 120L); land(1L, 240L); land(2L, 360L)
    probeSeesTruth("base")

    // state A — mid-fold KILL in the landing sink (base written,
    // checkpoint never flipped): the orphan base carries the poison
    val orphanGen = (System.currentTimeMillis() << 20) | 7L
    poison.withColumn("batch_id", lit(-orphanGen))
      .write.partitionBy("batch_id").mode("append").parquet(landIdx)
    probeSeesTruth("orphan")

    // state B — a REAL fold moves the landed vectors into a base
    // generation mid-stream of the pairing (the probe must follow the
    // gen pointer), then a post-flip-kill leftover: poison re-appears
    // as a STALE raw partition at an id <= foldedUpTo
    assert(IndexRead.compactIndex(spark, landIdx, upToBatch = 1L) >= 1)
    probeSeesTruth("folded")
    poison.withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id").mode("append").parquet(landIdx)
    probeSeesTruth("staleraw")

    // state C — ZOMBIE RESUME: a second fold commits a newer gen; the
    // first fold's GC resumes with its stale (seq, gen) — it must not
    // delete the live base out from under the pairing gate
    val m1 = IndexRead.readManifest(spark, landIdx).get
    land(3L, 500L) // live tail so upToBatch = 2 is legal
    assert(IndexRead.compactIndex(spark, landIdx, upToBatch = 2L) >= 1)
    val m2 = IndexRead.readManifest(spark, landIdx).get
    assert(m2.gen !== m1.gen)
    IndexRead.foldGc(spark, landIdx,
      written = m1.seq, newGen = m1.gen, absorbedGen = 0L, upToBatch = 1L)
    assert(IndexRead.readManifest(spark, landIdx).get.gen === m2.gen)
    probeSeesTruth("zombie")
  }

  test("CHAOS cross-sink: the pairing gate probes the FOREIGN image index through every fold crash state — orphan base invisible, folded vectors still pair, stale-raw leftovers invisible, a zombie fold's GC cannot unpair") {
    crossSinkChaos(foldImages = true)
  }

  test("CHAOS cross-sink, mirrored: the IMAGE sink probes a folding CAPTION index through the same crash states — the symmetry is pinned, not assumed") {
    crossSinkChaos(foldImages = false)
  }
}
