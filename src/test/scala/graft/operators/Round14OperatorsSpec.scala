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
