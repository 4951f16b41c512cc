package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 additions: perceptual image hashing (aHash) and the
  * generalized band guarantee of the shared hamming pair join —
  * semantic properties the DuckDB oracle (q163/q164, closed-form
  * manifest) cannot express because it never touches a real codec. */
class Round7OperatorsSpec extends SparkSpec {
  import spark.implicits._

  /** Encode a grayscale PNG from an explicit pixel function. */
  private def png(w: Int, h: Int, p: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, p(x, y) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Same pixels as RGB — every channel carries the gray value. */
  private def pngRgb(w: Int, h: Int, p: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = p(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def base(x: Int, y: Int): Int = (x * 37 + y * 11) % 256

  private def hashOf(rows: (Long, Array[Byte])*): Map[Long, Long] =
    Multimodal.aHash64(rows.toSeq.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("aHash64: brightness shift is hash-invariant; single-pixel edit lands within a few bits; gray == RGB of the same pixels") {
    val hs = hashOf(
      0L -> png(32, 24, base),
      1L -> png(32, 24, (x, y) => math.min(255, base(x, y) + 1)), // +1 everywhere
      2L -> png(32, 24, (x, y) => if (x == 5 && y == 5) 255 else base(x, y)),
      3L -> pngRgb(32, 24, base),
      4L -> png(32, 24, (x, y) => 255 - base(x, y))) // inverted
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // +1 on every pixel shifts every cell mean and the grid mean by
    // the same amount (exact ints, no saturation below 255) — the
    // strict-> comparisons are unchanged, so the hash is IDENTICAL
    assert(hs(1L) === hs(0L))
    // one edited pixel perturbs one block mean — at most a couple bits
    assert(ham(hs(2L), hs(0L)) <= 2)
    // luma = band mean, so gray and equal-channel RGB agree exactly
    assert(hs(3L) === hs(0L))
    // inversion flips essentially every threshold decision
    assert(ham(hs(4L), hs(0L)) >= 32)
  }

  test("aHash64: images smaller than the 8x8 grid nearest-neighbor without error, deterministically") {
    val a = hashOf(0L -> png(3, 5, base))
    val b = hashOf(0L -> png(3, 5, base))
    assert(a === b)
  }

  test("imageNearDupPairs: finds the perturbed copy, not the unrelated image") {
    val media = Seq(
      0L -> png(32, 24, base),
      1L -> png(32, 24, (x, y) => if (x == 5 && y == 5) 255 else base(x, y)),
      2L -> png(32, 24, (x, y) => 255 - base(x, y))
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("knnLabelAudit: planted mislabel is a suspect, consistent vectors are not, singleton cell has no evidence") {
    // cell 0 = x-direction (label 0, one vector PLANTED as label 1),
    // cell 1 = y-direction (label 1), cell 2 = a lone diagonal vector
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 1),
      (2L, Array(0.0f, 0.0f, 1.0f), 7), // singleton cell — no neighbors
      (3L, Array(0.95f, 0.05f, 0.0f), 0),
      (4L, Array(0.9f, 0.1f, 0.0f), 0),
      (5L, Array(0.85f, 0.15f, 0.0f), 1), // planted noise in cell 0
      (6L, Array(0.1f, 0.9f, 0.0f), 1),
      (7L, Array(0.05f, 0.95f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cb  = Similarity.seedCentroids(embs, 3) // cells = vecs 0, 1, 2
    val out = Similarity.knnLabelAudit(embs, cb, col("label"), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(5L)._3, "planted mislabel must be a suspect")
    assert(out(5L)._2 === 0L) // all 3 neighbors in cell 0 carry label 0
    Seq(0L, 3L, 4L).foreach(i => assert(!out(i)._3, s"vec $i wrongly suspected"))
    Seq(6L, 7L).foreach(i => assert(!out(i)._3, s"vec $i wrongly suspected"))
    assert(out(2L) === ((0L, 0L, false))) // singleton: zero neighbors, never a suspect
    // consistent vectors in cell 0 see the planted '1' among neighbors
    // but keep majority agreement
    assert(out(3L)._1 === 3L && out(3L)._2 >= 2L)

    // hot-cell cap: neighbors drawn from each cell's 2 LOWEST ids
    // (the headCapped contract) — cell 0's cap set is {0, 3}, both
    // label 0, so the planted vec 5 still shows 0-of-2 agreement
    val capped = Similarity.knnLabelAudit(
      embs, cb, col("label"), k = 3, maxCellCompare = Some(2L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(capped(5L) === ((2L, 0L, true)))
    assert(capped(0L) === ((1L, 1L, false))) // own id excluded from its cap set
  }

  test("edge cases: empty media hashes to empty; empty index means everything is novel") {
    val empty = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(Multimodal.aHash64(empty).count() === 0L)
    val fps = Seq((1L, 42L)).toDF("doc_id", "sh")
    val emptyFps = Seq.empty[(Long, Long)].toDF("doc_id", "sh")
    assert(TextDedup.simhashProbeIndex(fps, emptyFps, maxHamming = 3, bands = 8).count() === 0L)
    // and a probe against itself is a full match at hamming 0
    assert(TextDedup.simhashProbeIndex(fps, fps, maxHamming = 0, bands = 8).count() === 1L)
  }

  test("simhashPairsFromHashes band guarantee: diffs spread one-per-low-band are missed at 4 bands, found at 8") {
    // hashes differ in bits 0, 8, 16, 24 — one per low byte-band, so
    // every 4-band blocking key differs; bands 4..7 (high bytes) agree
    val a = 0x0123456789abcdefL
    val b = a ^ 0x0000000001010101L
    val fps = Seq((1L, a), (2L, b)).toDF("doc_id", "sh")
    val four = TextDedup.simhashPairsFromHashes(fps, maxHamming = 4, bands = 4).count()
    val eight = TextDedup.simhashPairsFromHashes(fps, maxHamming = 4, bands = 8).count()
    assert(four === 0L) // documented recall limit of 32-bit blocking
    assert(eight === 1L) // 8 bands pigeonhole 64 bits up to hamming 7
  }
}
