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
