package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's confirmation-adjudication protocol — specifically
  * that a flagged regression whose isolated pass ran in the 2–4 load
  * band (UNDER the contamination bar but hot enough to produce the
  * q112/q143/q84/q186 false confirmations) is routed to the 8-pass
  * re-floor instead of being stamped `confirmed` directly, and is
  * stamped `deferred_pending_refloor` when the host never goes quiet. */
class BenchProtocolSpec extends AnyFunSuite {
  import Bench.{adjudicate, stillRegressed, Adjudication => A}

  private val bar = 4.0 // loadBar on the 32-core/16-way share

  test("under-threshold isolated time is never confirmed, at any load") {
    for (load <- Seq(0.5, 3.0, 9.0))
      assert(adjudicate(prior = 1.0, isolated = 1.2, load = load,
        loadBar = bar, drift = 1.0) === A.NotConfirmed)
  }

  test("a quiet-host confirmation (load ≤ bar/2) stamps confirmed directly") {
    assert(adjudicate(prior = 0.5, isolated = 1.2, load = 1.5,
      loadBar = bar, drift = 1.0) === A.Confirmed)
  }

  test("the 2–4 hot band (bar/2 < load ≤ bar) must NOT stamp confirmed — it requires the 8-pass re-floor") {
    for (load <- Seq(2.01, 3.0, 4.0))
      assert(adjudicate(prior = 0.5, isolated = 1.2, load = load,
        loadBar = bar, drift = 1.0) === A.NeedsRefloor, s"load=$load")
  }

  test("above the bar stays the existing load_contaminated stamp (the judge's discount rule)") {
    assert(adjudicate(prior = 0.5, isolated = 1.2, load = 4.98,
      loadBar = bar, drift = 1.0) === A.ConfirmedContaminated)
  }

  test("a crashed isolated pass (-1) is still surfaced, not silently dropped") {
    assert(adjudicate(prior = 0.5, isolated = -1.0, load = 1.0,
      loadBar = bar, drift = 1.0) === A.Confirmed)
  }

  test("band edges scale with the host's loadBar, and drift scales the threshold") {
    // 8-core share: bar = 1.0, band = (0.5, 1.0]
    assert(adjudicate(prior = 0.5, isolated = 1.2, load = 0.7,
      loadBar = 1.0, drift = 1.0) === A.NeedsRefloor)
    // drift 1.6 lifts the ratio threshold: 1.2 / 0.5 = 2.4 ≥ 1.5·1.6
    // stays flagged, but 1.15 / 0.5 = 2.3 < 2.4 does not
    assert(stillRegressed(prior = 0.5, measured = 1.25, drift = 1.6))
    assert(!stillRegressed(prior = 0.5, measured = 1.15, drift = 1.6))
  }

  test("a deferred_pending_refloor entry blocks the TREND floor restamp until adjudicated") {
    import Bench.trendFloors
    // q_def was flagged, landed in the hot band, AND the host never
    // went quiet within its wait budget → deferred. It is also one of
    // the slowest-10, so without the block its hot-band isolated pass
    // (2.4 s at load 3.1 — under the 4.0 bar, so the TREND writer's
    // load gate would NOT drop it) would be stamped into the round's
    // floors and silently adjudicate the deferral.
    val slowest = Seq("q_def", "q_slow")
    val iso     = Map("q_def" -> (2.4, 3.1), "q_slow" -> (1.0, 0.4))
    // q_ref went through the 8-pass re-floor: its clean floor overrides
    // any hot-band isolated measurement it may also carry
    val refl = Map("q_ref" -> (0.62, 1.1))
    val floors = trendFloors(slowest, iso, refl, deferred = Set("q_def"))
    assert(!floors.contains("q_def"), "deferred query must contribute NO floor")
    assert(floors("q_slow") === ((1.0, 0.4)))
    assert(floors("q_ref") === ((0.62, 1.1)))
    // next-round pickup: nothing about the deferral mutates the prior,
    // so the unchanged prior re-flags the query on the next full run —
    // stillRegressed against the untouched baseline keeps firing
    assert(Bench.stillRegressed(prior = 1.0, measured = 2.4, drift = 1.0))
  }

  test("rebuild_cost split: tagged warm seconds separate from shared, failures count in neither, and the registered tag set names real queries") {
    import Bench.rebuildSplit
    val results = Seq(
      ("q_shared_a", 0.5, 0.4),
      ("q_rebuild_a", 3.0, 2.5),
      ("q_rebuild_failed", -1.0, -1.0), // tagged but crashed: counted in n, not in sums
      ("q_shared_b", 1.0, 0.6))
    val (n, rebuilt, shared) =
      rebuildSplit(results, Set("q_rebuild_a", "q_rebuild_failed"))
    assert(n === 2)
    assert(math.abs(rebuilt - 2.5) < 1e-9)
    assert(math.abs(shared - 1.0) < 1e-9)
    // warm_shared + warm_rebuilt = the suite total (failed excluded) —
    // the invariant that makes the closing-line split trustworthy
    assert(math.abs((rebuilt + shared) - results.map(_._3).filter(_ >= 0).sum) < 1e-9)
    // the production tag set must name registered queries only
    assert(SparkEntry.rebuildCost.subsetOf(SparkEntry.queries.keySet),
      SparkEntry.rebuildCost.diff(SparkEntry.queries.keySet).toString)
    assert(SparkEntry.rebuildCost.contains("q216_sampled_audit_reps"))
  }

  test("the re-floor adjudicates on the FLOOR: below threshold exonerates, above confirms") {
    // the exact q200 shape: prior 0.492, hot-band confirmation 0.769,
    // clean floor back at prior → exonerated
    assert(!stillRegressed(prior = 0.492, measured = 0.51, drift = 1.0))
    assert(stillRegressed(prior = 0.492, measured = 1.1, drift = 1.0))
    // the 0.15 s absolute floor still damps sub-100 ms noise
    assert(!stillRegressed(prior = 0.05, measured = 0.12, drift = 1.0))
  }
}
