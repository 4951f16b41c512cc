package graft.operators

import graft.functions.Portable
import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-13 operator invariants: the sampled-audit pushdown
  * (prefixJaccardPairsSampled / lshRescoredPairsSampled) must produce
  * EXACTLY the post-filter relation — the gate moved below the
  * pair-forming joins, the semantics must not. PlanSpec pins the plan
  * shape; this pins the relation. */
class Round13OperatorsSpec extends SparkSpec {

  private def shingles(dir: String) =
    TextDedup.shingleRows(
      graft.Tables.documents(spark, dir), col("doc_id"), col("text"), 3)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefixJaccardPairsSampled ≡ prefixJaccardPairs post-filtered on the doc_a gate (and never a superset of truth)") {
    val sh   = shingles(sf("sf0.01"))
    val gate = Portable.sampleGate(col("doc_a"), 5000, "audit")
    val full = TextDedup.prefixJaccardPairs(sh, 0.8)
    val expected = pairSet(full.filter(gate))
    val got      = pairSet(TextDedup.prefixJaccardPairsSampled(sh, 0.8, 5000, "audit"))
    assert(got === expected)
    // the gate really bites on this fixture (both populations present)
    assert(got.nonEmpty && got.size < pairSet(full).size)
  }

  test("lshRescoredPairsSampled ≡ lshRescoredPairs post-filtered on the doc_a gate — with and without the band-df cap") {
    val sh   = shingles(sf("sf0.01"))
    val gate = Portable.sampleGate(col("doc_a"), 5000, "audit")
    for (cap <- Seq(None, Some(64L))) {
      val expected = pairSet(
        TextDedup.lshRescoredPairs(sh, 0.5, 0.8, maxBandDf = cap).filter(gate))
      val got = pairSet(
        TextDedup.lshRescoredPairsSampled(sh, 0.5, 0.8, 5000, "audit", maxBandDf = cap))
      assert(got === expected, s"cap=$cap")
    }
  }

  test("q156 registered query: the pushed-down form returns the identical audit row as the post-filter recallAuditSampled form") {
    val dir = sf("sf0.01")
    val sh  = shingles(dir)
    val old = TextDedup.recallAuditSampled(
      TextDedup.prefixJaccardPairs(sh, 0.8),
      TextDedup.lshRescoredPairs(sh, 0.5, 0.8),
      rateBps = 5000).collect().head
    val now = SparkEntry.queries("q156_sampled_lsh_audit")(spark, dir).collect().head
    assert(now.toSeq === old.toSeq)
  }

  test("q216 rep collapse: identical-fingerprint docs collapse to the min-id keeper, and the registered audit (shared rep-shingle artifact) equals the from-scratch construction") {
    val dir = sf("sf0.01")
    val d   = graft.Tables.documents(spark, dir)
    val groups = TextDedup.exactDupGroups(
      d, col("doc_id"), TextAnalysis.fingerprint(col("text")))
    // keeper = min id of its group; one rep per distinct fingerprint.
    // The sf0.01 corpus has no exact dups (collapse is a no-op there —
    // q216 ≡ q156 over the full corpus, which the oracle covers), so
    // the collapse itself is pinned on an ENGINEERED fixture: 1 and 2
    // share a fingerprint (punctuation/case edits), 3 is distinct.
    val s = spark; import s.implicits._
    val eng = Seq(
      (1L, "Alpha beta, gamma!"), (2L, "alpha BETA gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val engKeepers = TextDedup.exactDupGroups(
        eng, col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("n_docs"))).toSet
    assert(engKeepers === Set((1L, 2L), (3L, 1L)))
    // on the driver fixture: one group per doc, every doc its own keeper
    val keepers = groups.collect().map(_.getAs[Long]("keeper_doc_id")).toSet
    assert(keepers === d.select("doc_id").collect().map(_.getLong(0)).toSet)
    // the registered q216 (built over the shared rep-shingle artifact)
    // equals the same audit built from scratch
    val reps = d.join(groups.select(col("keeper_doc_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val sh   = TextDedup.shingleRows(reps, col("doc_id"), col("text"), 3)
    val scratch = TextDedup.recallAudit(
      TextDedup.prefixJaccardPairsSampled(sh, 0.8, 5000, "audit"),
      TextDedup.lshRescoredPairsSampled(sh, 0.5, 0.8, 5000, "audit")).collect().head
    val got = SparkEntry.queries("q216_sampled_audit_reps")(spark, dir).collect().head
    assert(got.toSeq === scratch.toSeq)
  }

  test("rateBps bounds are validated on both sampled variants") {
    val sh = shingles(sf("sf0.001"))
    for (bad <- Seq(0, -1, 10001)) {
      intercept[IllegalArgumentException](
        TextDedup.prefixJaccardPairsSampled(sh, 0.8, bad))
      intercept[IllegalArgumentException](
        TextDedup.lshRescoredPairsSampled(sh, 0.5, 0.8, bad))
    }
  }
}
