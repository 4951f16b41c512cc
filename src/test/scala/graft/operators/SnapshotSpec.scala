package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus snapshot lifecycle ops (round 8 second batch): diff,
  * distribution drift, modality coverage, gate lineage, domain stats. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("Snapshot.diff classifies added/removed/changed/unchanged; null-safe payload") {
    val old = Seq(
      (1L, Option("a")),  // unchanged
      (2L, Option("b")),  // changed (b -> b2)
      (3L, Option("c")),  // removed
      (5L, None: Option[String]),          // null -> null = unchanged
      (6L, None: Option[String])           // null -> value = changed
    ).toDF("id", "payload")
    val neu = Seq(
      (1L, Option("a")),
      (2L, Option("b2")),
      (4L, Option("d")),  // added
      (5L, None: Option[String]),
      (6L, Option("x"))
    ).toDF("id", "payload")
    val got = Snapshot.diff(old, neu, col("id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"))
  }

  test("Snapshot.diff output carries no payload columns (id+status sized)") {
    val a = Seq((1L, "x")).toDF("id", "p")
    val d = Snapshot.diff(a, a, col("id"), col("p"))
    assert(d.columns.toSeq === Seq("snap_id", "status"))
  }

  test("Snapshot.deltaWorklist: only added/changed rows, NEW payload attached") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "p")
    val neu = Seq((1L, "a"), (2L, "b2"), (4L, "d")).toDF("id", "p")
    val got = Snapshot.deltaWorklist(old, neu, col("id"), col("p"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    // removed (3) and unchanged (1) never enter the worklist; payload
    // is the NEW revision (b2, not b)
    assert(got === Map(2L -> (("changed", "b2")), 4L -> (("added", "d"))))
  }

  test("Snapshot.distributionDrift: exact ppm shares, zero-fill for missing buckets, abs delta") {
    // old: buckets 0 x3, 1 x1 -> 750000 / 250000 ppm
    // new: buckets 0 x1, 2 x1 -> 500000 / 500000 ppm
    val old = Seq(0L, 0L, 0L, 1L).toDF("b")
    val neu = Seq(0L, 2L).toDF("b")
    val got = Snapshot.distributionDrift(old, neu, col("b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      0L -> ((750000L, 500000L, 250000L)),
      1L -> ((250000L, 0L, 250000L)),
      2L -> ((0L, 500000L, 500000L))))
  }

  test("Snapshot.coverage: per-group ppm; duplicate cover keys do not double count") {
    val base = Seq(
      (1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s2")).toDF("id", "src")
    // id 1 covered twice (must count once), id 2 covered, s2 uncovered
    val cover = Seq(1L, 1L, 2L, 99L).toDF("cid")
    val got = Snapshot.coverage(base, col("id"), col("src"), cover, col("cid"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "s1" -> ((3L, 2L, 666666L)),
      "s2" -> ((1L, 0L, 0L))))
  }

  test("Profile.gateLineage: bit k set iff gate k failed; NULL gate fails; admitted iff mask 0") {
    val df = Seq(
      (1L, true, true),   // mask 0, admitted
      (2L, false, true),  // mask 1
      (3L, true, false),  // mask 2
      (4L, false, false)  // mask 3
    ).toDF("id", "g0", "g1")
    val got = Profile.gateLineage(df, col("id"), Seq("a" -> col("g0"), "b" -> col("g1")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === Map(
      1L -> ((0L, true)), 2L -> ((1L, false)),
      3L -> ((2L, false)), 4L -> ((3L, false))))

    // NULL gate value = failed (an unscoreable row is not admitted)
    val withNull = Seq((9L, Option.empty[Boolean])).toDF("id", "g0")
    val r = Profile.gateLineage(withNull, col("id"), Seq("a" -> col("g0"))).collect().head
    assert(r.getLong(1) === 1L && !r.getBoolean(2))

    intercept[IllegalArgumentException] {
      Profile.gateLineage(df, col("id"), Seq.empty)
    }
  }

  test("TextAnalysis.domainStats: variant spellings collapse to one host row; exact dup ppm") {
    val urls = Seq(
      // 3 fetches of the same page on x.com (case/port/tracking variants)
      (1L, "https://X.com:443/p?a=1"),
      (2L, "https://x.com/p?a=1&utm_source=t"),
      (3L, "HTTPS://x.com/p?a=1"),
      // a second distinct page on x.com
      (4L, "https://x.com/q"),
      // y.com: one page, no dups
      (5L, "http://y.com/")
    ).toDF("id", "url")
    val got = TextAnalysis.domainStats(urls, col("id"), col("url"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "x.com" -> ((4L, 2L, 500000L)),
      "y.com" -> ((1L, 1L, 0L))))
  }
}
