package graft.operators

import graft.functions.Portable
import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-14 operator invariants: the TWO-SIDED sampled audit
  * (prefixJaccardPairsSampledBoth / lshRescoredPairsSampledBoth) must
  * produce EXACTLY the double post-filter relation — both gates moved
  * below the pair-forming joins, the semantics must not. PlanSpec pins
  * the plan shape (each gate on its own join side); this pins the
  * relation, including that the two gates are genuinely INDEPENDENT
  * (different seeds ⇒ the pair universe is not the one-sided sample
  * squared). */
class Round14OperatorsSpec extends SparkSpec {

  private def shingles(dir: String) =
    TextDedup.shingleRows(
      graft.Tables.documents(spark, dir), col("doc_id"), col("text"), 3)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val gateA = Portable.sampleGate(col("doc_a"), 5000, "audit")
  private val gateB = Portable.sampleGate(col("doc_b"), 5000, "partner")

  test("prefixJaccardPairsSampledBoth ≡ prefixJaccardPairs post-filtered on BOTH gates — a strict subset of the one-sided sample") {
    val sh       = shingles(sf("sf0.01"))
    val full     = TextDedup.prefixJaccardPairs(sh, 0.8)
    val expected = pairSet(full.filter(gateA && gateB))
    val got = pairSet(
      TextDedup.prefixJaccardPairsSampledBoth(sh, 0.8, 5000, 5000))
    assert(got === expected)
    // both gates bite on this fixture: two-sided ⊂ one-sided ⊂ full
    val oneSided = pairSet(TextDedup.prefixJaccardPairsSampled(sh, 0.8, 5000, "audit"))
    assert(got.nonEmpty && got.size < oneSided.size && oneSided.size < pairSet(full).size)
  }

  test("lshRescoredPairsSampledBoth ≡ lshRescoredPairs post-filtered on BOTH gates — with and without the band-df cap") {
    val sh = shingles(sf("sf0.01"))
    for (cap <- Seq(None, Some(64L))) {
      val expected = pairSet(
        TextDedup.lshRescoredPairs(sh, 0.5, 0.8, maxBandDf = cap).filter(gateA && gateB))
      val got = pairSet(
        TextDedup.lshRescoredPairsSampledBoth(sh, 0.5, 0.8, 5000, 5000, maxBandDf = cap))
      assert(got === expected, s"cap=$cap")
    }
  }

  test("q217 registered query: the pushed-down two-sided form returns the identical audit row as the double post-filter form") {
    val dir = sf("sf0.01")
    val sh  = shingles(dir)
    val old = TextDedup.recallAudit(
      TextDedup.prefixJaccardPairs(sh, 0.8).filter(gateA && gateB),
      TextDedup.lshRescoredPairs(sh, 0.5, 0.8).filter(gateA && gateB)).collect().head
    val now = SparkEntry.queries("q217_two_sided_audit")(spark, dir).collect().head
    assert(now.toSeq === old.toSeq)
    // the fixture rates leave a non-vacuous sampled universe
    assert(now.getAs[Long]("n_truth") > 0L)
  }

  test("independent seeds matter: the partner gate under the ANCHOR seed would be a different (same-seed-squared) relation") {
    val sh = shingles(sf("sf0.01"))
    val sameSeed = pairSet(
      TextDedup.prefixJaccardPairsSampledBoth(sh, 0.8, 5000, 5000, "audit", "audit"))
    val indep = pairSet(
      TextDedup.prefixJaccardPairsSampledBoth(sh, 0.8, 5000, 5000))
    // same-seed gating both sides = the gate correlated across sides;
    // on this fixture the two universes genuinely differ
    assert(sameSeed !== indep)
  }

  // ---- Reps-first pair forms (q33/q84/q43/q146) --------------------
  //
  // The collapse-then-expand forms must produce the IDENTICAL relation
  // to the direct band self-join — scores bit-equal included — on a
  // corpus that actually exercises the collapse: the ScaleData ×K
  // shape (even copies byte-identical, odd copies one-token variants),
  // built here at K=6 over sf0.001.

  private def copyDocs(dir: String, k: Int) = {
    val d = graft.Tables.documents(spark, dir)
    (0 until k).map { i =>
      val text =
        if (i % 2 == 1) concat(col("text"), lit(s" copyvariant$i")) else col("text")
      d.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
  }

  private def copyEmbs(dir: String, k: Int) = {
    val e = graft.Tables.embeddings(spark, dir)
    (0 until k).map(i => e.select(
      (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ unionByName _)
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("lshPairsViaReps ≡ lshPairs on the ×K copy corpus — rows AND est_jaccard values identical") {
    val docs = copyDocs(sf("sf0.001"), 6).cache()
    val sigs = TextDedup.minhashSignaturesFromRows(
      TextDedup.shingleRows(docs, col("doc_id"), col("text"), 3)).cache()
    val direct = rowSet(TextDedup.lshPairs(sigs, 0.5))
    val reps   = rowSet(TextDedup.lshPairsViaReps(docs, col("doc_id"), col("text"), sigs, 0.5))
    assert(reps === direct)
    // the fixture exercises BOTH expansion arms: within-group pairs
    // (est 1.0 exact copies) and cross-group pairs (variant ↔ base)
    assert(direct.exists(_._3 == 1.0) && direct.exists(_._3 < 1.0))
    docs.unpersist(); sigs.unpersist()
  }

  test("lshRescoredPairsViaReps ≡ lshRescoredPairs on the ×K copy corpus — rows AND exact-jaccard values identical") {
    val docs = copyDocs(sf("sf0.001"), 6).cache()
    val sh   = TextDedup.shingleRows(docs, col("doc_id"), col("text"), 3).cache()
    val sigs = TextDedup.minhashSignaturesFromRows(sh).cache()
    val direct = rowSet(TextDedup.lshRescoredPairs(sh, 0.5, 0.8, precomputedSigs = Some(sigs)))
    val reps = rowSet(TextDedup.lshRescoredPairsViaReps(
      docs, col("doc_id"), col("text"), sh, 0.5, 0.8, precomputedSigs = Some(sigs)))
    assert(reps === direct)
    assert(direct.exists(_._3 == 1.0) && direct.exists(_._3 < 1.0))
    docs.unpersist(); sh.unpersist(); sigs.unpersist()
  }

  test("short documents (no signature) expand to nothing: a duplicated 2-word text yields no pairs in either form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "two words", "en", "srcX", 9L),
      (2L, "two words", "en", "srcX", 9L),
      (3L, "a genuinely long document with many words repeated here", "en", "srcX", 56L),
      (4L, "a genuinely long document with many words repeated here", "en", "srcX", 56L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sigs = TextDedup.minhashSignaturesFromRows(
      TextDedup.shingleRows(docs, col("doc_id"), col("text"), 3))
    val reps = rowSet(TextDedup.lshPairsViaReps(docs, col("doc_id"), col("text"), sigs, 0.5))
    assert(reps === rowSet(TextDedup.lshPairs(sigs, 0.5)))
    assert(reps === Set((3L, 4L, 1.0))) // the 2-word group contributed nothing
  }

  test("neardupPairsViaReps ≡ neardupPairs on the ×K embedding corpus — rows AND cosine values identical") {
    val embs = copyEmbs(sf("sf0.001"), 6).cache()
    val direct = rowSet(Similarity.neardupPairs(embs, dim = 64, threshold = 0.35))
    val reps   = rowSet(Similarity.neardupPairsViaReps(embs, dim = 64, threshold = 0.35))
    assert(reps === direct)
    assert(direct.nonEmpty)
    embs.unpersist()
  }

  test("crossLabelNeardupsViaReps ≡ crossLabelNeardups on the ×K embedding corpus") {
    val embs = copyEmbs(sf("sf0.001"), 4).cache()
    val direct = Similarity.crossLabelNeardups(embs, 64, 0.35)
      .collect().map(_.toSeq).toSet
    val reps = Similarity.crossLabelNeardupsViaReps(embs, 64, 0.35)
      .collect().map(_.toSeq).toSet
    assert(reps === direct && direct.nonEmpty)
    embs.unpersist()
  }

  test("registered q33/q84/q43/q146 (reps-first) match their direct forms on sf0.01 — the oracle corpus itself") {
    val dir = sf("sf0.01")
    val sh  = shingles(dir).cache()
    val sigs = TextDedup.minhashSignaturesFromRows(sh).cache()
    assert(rowSet(SparkEntry.queries("q33_minhash_lsh_pairs")(spark, dir))
      === rowSet(TextDedup.lshPairs(sigs, 0.5)))
    assert(rowSet(SparkEntry.queries("q84_lsh_rescored")(spark, dir))
      === rowSet(TextDedup.lshRescoredPairs(sh, 0.5, 0.8, precomputedSigs = Some(sigs))))
    val embs = graft.Tables.embeddings(spark, dir)
    assert(rowSet(SparkEntry.queries("q43_embedding_neardup")(spark, dir))
      === rowSet(Similarity.neardupPairs(embs, 64, 0.35)))
    assert(SparkEntry.queries("q146_crosslabel_neardups")(spark, dir).collect().map(_.toSeq).toSet
      === Similarity.crossLabelNeardups(embs, 64, 0.35).collect().map(_.toSeq).toSet)
    sh.unpersist(); sigs.unpersist()
  }

  // ---- q219: winnow overlap with the df-cap over DISTINCT content ----
  //
  // q219 is NOT q57 under duplication — that is its point (df counts
  // reps, so copies can't flood a fingerprint past the cap). The two
  // laws that make it trustworthy: (1) on a corpus with no exact
  // normalized dups the forms coincide EXACTLY; (2) on a pure-copy
  // corpus the rep universe — hence the kept-fp verdicts and the
  // copy-0 slice of the relation — is invariant in K, and the full
  // relation is exactly the group expansion.

  private def dedupedDocs(dir: String) = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.documents(spark, dir)
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(TextAnalysis.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private def overlapRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("winnowOverlapPairsViaReps ≡ winnowOverlapPairs on a fingerprint-deduped corpus — rows AND n_shared/overlap values") {
    val d0 = dedupedDocs(sf("sf0.001")).cache()
    val direct = overlapRows(TextDedup.winnowOverlapPairs(d0, col("doc_id"), col("text")))
    val reps = overlapRows(
      TextDedup.winnowOverlapPairsViaReps(d0, col("doc_id"), col("text")))
    assert(reps === direct)
    assert(direct.nonEmpty, "fixture must have at least one overlap pair")
    d0.unpersist()
  }

  test("q219 on a ×3 exact-copy corpus: copy-0 slice is the base relation, same-base cross-copy pairs are overlap-1.0, and the count is exactly the group expansion") {
    val d0 = dedupedDocs(sf("sf0.001")).cache()
    val x3 = (0 until 3).map(i => d0.select(
      (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))).reduce(_ unionByName _)
    val base = overlapRows(TextDedup.winnowOverlapPairs(d0, col("doc_id"), col("text")))
    val full = overlapRows(
      TextDedup.winnowOverlapPairsViaReps(x3, col("doc_id"), col("text")))
    // cap immunity: the copy-0 slice IS the base relation (df over
    // reps never sees the copies, so no fingerprint crosses the cap)
    val slice = full.filter(p => p._1 < 10000000L && p._2 < 10000000L)
    assert(slice === base)
    // every same-base cross-copy pair shares its whole kept-fp set
    val withins = full.filter(p => p._1 % 10000000L === p._2 % 10000000L)
    assert(withins.nonEmpty && withins.forall(_._4 === 1.0))
    // exact expansion arithmetic: each base pair appears 3×3 times
    // (either end in any copy), each rep with >= 1 kept fp expands to
    // C(3,2) within pairs
    val fps = TextAnalysis.winnowingFingerprints(d0, col("doc_id"), col("text"))
      .select(col("doc_id"), col("fp")).distinct()
    val keptReps = fps
      .withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("__df") <= 64L).select(col("doc_id")).distinct().count()
    assert(full.size === 9 * base.size + 3 * keptReps.toInt)
    d0.unpersist()
  }

  test("registered q219 consumes the shared fp artifact and matches the from-scratch form on sf0.01") {
    val dir = sf("sf0.01")
    val viaRegistry = overlapRows(SparkEntry.queries("q219_winnow_overlap_reps")(spark, dir))
    val scratch = overlapRows(TextDedup.winnowOverlapPairsViaReps(
      graft.Tables.documents(spark, dir), col("doc_id"), col("text")))
    assert(viaRegistry === scratch && scratch.nonEmpty)
  }

  test("rateBps bounds are validated on both two-sided variants, each side") {
    val sh = shingles(sf("sf0.001"))
    for (bad <- Seq(0, -1, 10001)) {
      intercept[IllegalArgumentException](
        TextDedup.prefixJaccardPairsSampledBoth(sh, 0.8, bad, 5000))
      intercept[IllegalArgumentException](
        TextDedup.prefixJaccardPairsSampledBoth(sh, 0.8, 5000, bad))
      intercept[IllegalArgumentException](
        TextDedup.lshRescoredPairsSampledBoth(sh, 0.5, 0.8, bad, 5000))
      intercept[IllegalArgumentException](
        TextDedup.lshRescoredPairsSampledBoth(sh, 0.5, 0.8, 5000, bad))
    }
  }
}
