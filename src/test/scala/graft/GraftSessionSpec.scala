package graft

/** The shuffle-partition dial (SPARK_GRAFT_SHUFFLE_PARTITIONS /
  * -Dgraft.shufflePartitions) is load-bearing for the ×100 heap law
  * (SCALING.md: q84 completes in 24 GB at 256 partitions where 32
  * OOMs) — so its two contracts are pinned here instead of living in
  * comments:
  *
  *  1. PARSE: malformed and non-positive values fail with ONE
  *     descriptive message naming the variable and the value (a raw
  *     NumberFormatException out of `toInt` names neither);
  *  2. PLAN INVARIANCE at small SF: raising the dial must not change
  *     any query's optimized-plan fingerprint (the Bench regression
  *     classifier's "same plan" definition — a dial leaking into a
  *     logical plan, e.g. via a repartition(dial) call inside an
  *     operator, would stamp plan_changed on every scale run), and
  *     AQE must coalesce the physical fan-out back down so sf0.1-scale
  *     executions are unaffected — the dial is a ceiling, not a fixed
  *     fan-out.
  */
class GraftSessionSpec extends SparkSpec {

  test("parseShufflePartitions: absent → default, valid → parsed, malformed/non-positive → one descriptive failure") {
    assert(GraftSession.parseShufflePartitions(None, default = 32) === 32)
    assert(GraftSession.parseShufflePartitions(Some("256"), default = 32) === 256)
    assert(GraftSession.parseShufflePartitions(Some(" 64 "), default = 32) === 64)
    // empty/blank behaves like absent (an exported-but-empty env var)
    assert(GraftSession.parseShufflePartitions(Some(""), default = 32) === 32)
    for (bad <- Seq("0", "-5", "abc", "12.5", "1e3")) {
      val e = intercept[IllegalArgumentException](
        GraftSession.parseShufflePartitions(Some(bad), default = 32))
      assert(e.getMessage.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS"), s"$bad: ${e.getMessage}")
      assert(e.getMessage.contains(bad.trim), s"message must name the value: ${e.getMessage}")
    }
  }

  test("dial invariance: representative optimized-plan fingerprints are identical at 256 vs default shuffle partitions, and AQE coalesces the physical fan-out back down at sf0.01") {
    // agg, join+agg, and the LSH band self-join — the three shuffle
    // shapes the suite is made of
    val reps = Seq("q01_pricing_summary", "q04_join_agg", "q33_minhash_lsh_pairs")
    val dir  = sf("sf0.01")
    val key  = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    def fps(): Map[String, String] =
      reps.map(n => n -> Bench.planFingerprint(SparkEntry.queries(n)(spark, dir))).toMap
    try {
      val base = fps()
      spark.conf.set(key, "256")
      val dialed = fps()
      assert(dialed === base,
        "the shuffle-partition dial changed an optimized-plan fingerprint — " +
          "a logical plan is consuming the physical parallelism setting")
      // the physical claim: 256 initial partitions, but the executed
      // final stage is AQE-coalesced far below the dial at this SF
      val df = SparkEntry.queries("q04_join_agg")(spark, dir)
      val outParts = df.rdd.getNumPartitions
      assert(outParts < 64,
        s"AQE did not coalesce the dialed fan-out (final stage = $outParts partitions)")
    } finally spark.conf.set(key, prior)
  }
}
