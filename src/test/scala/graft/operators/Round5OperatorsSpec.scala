package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 additions: leakage-free split, UniMax allocation, C4/Gopher
  * gate, script census, int8 scalar quantization, codebook quality. */
class Round5OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("unimaxPlan: hand-checked water-filling — small groups capped, big group splits the leftover") {
    val docs = (
      (1 to 100).map(i => (i.toLong, "a", 1L)) ++
        (1 to 200).map(i => (100L + i, "b", 1L)) ++
        (1 to 1000).map(i => (300L + i, "c", 1L))
    ).toDF("doc_id", "lang", "w")
    // caps at 2.0 epochs: a 200, b 400, c 2000; budget 1000:
    // a capped (200·3 = 600 ≤ 1000), b capped (400·2 = 800 ≤ 800),
    // c uncapped → gets the leftover 400 (0.4 epochs)
    val out = Profile.unimaxPlan(docs, col("lang"), col("w"), budget = 1000L, epochCapX1000 = 2000L)
      .orderBy("language").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("a", 100L, true, 200L, 2000L),
      ("b", 200L, true, 400L, 2000L),
      ("c", 1000L, false, 400L, 400L)))
  }

  test("unimaxPlan: budget above the whole corpus at cap → every group capped, no div-by-zero") {
    val docs = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("doc_id", "lang", "w")
    val out = Profile.unimaxPlan(docs, col("lang"), col("w"), budget = 1000000L, epochCapX1000 = 3000L)
      .collect().map(r => (r.getString(0), r.getBoolean(2), r.getLong(3)))
    assert(out.toSet === Set(("a", true, 30L), ("b", true, 60L)))
  }

  test("unimaxPlan: a zero-weight group reports 0 epochs, never NULL/div-by-zero") {
    val docs = Seq((1L, "a", 0L), (2L, "a", 0L), (3L, "b", 10L)).toDF("doc_id", "lang", "w")
    val byLang = Profile.unimaxPlan(docs, col("lang"), col("w"), budget = 100L, epochCapX1000 = 2000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.isNullAt(4), r.getLong(4))).toMap
    val (na, aNull, aEpochs) = byLang("a")
    assert(na == 0L && !aNull && aEpochs == 0L) // 0-token group: alloc 0 → 0 epochs
    assert(!byLang("b")._2)
  }

  test("leakFreeSplit: every member of a dup cluster lands in the survivor's split") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val survivors = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // cluster {1,2,3} → survivor 1
      (4L, 4L), (5L, 4L)            // cluster {4,5}   → survivor 4
    ).toDF("doc_id", "survivor_doc_id")
    val out = Profile.leakFreeSplit(docs, col("doc_id"), survivors, 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) == out(5L))
    // and the assignment matches a plain withSplit of the survivor id
    val direct = Profile.withSplit(Seq(1L, 4L).toDF("id"), col("id"), 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) == direct(1L) && out(5L) == direct(4L))
  }

  test("heuristicGate: each rule fires on its designed offender and keep composes") {
    val good = ("the cat sat of the mat and it was good for all that it is " +
      "a fine day in the sun to rest and the end is near for the story now done " * 2).trim
    val docs = Seq(
      (1L, good),                                // keeps
      (2L, "too short"),                         // too_short
      (3L, ("lorem ipsum dolor " * 20).trim),    // has_lorem (and no stopwords)
      (4L, ("x{ " * 40).trim),                   // has_brace, short mean word len
      (5L, ("the " + "# " * 60).trim)            // too_symbolic
    ).toDF("doc_id", "text")
    val out = TextAnalysis.heuristicGate(docs, col("doc_id"), col("text"), minWords = 10, minStopHits = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("too_short") && !out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("has_lorem") && !out(3L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Boolean]("has_brace") && !out(4L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Boolean]("too_symbolic") && !out(5L).getAs[Boolean]("keep"))
  }

  test("scriptProfile: exact char-class counts and the verdict bars") {
    val docs = Seq((1L, "abc 123."), (2L, "hello world.")).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_chars") == 8L && r1.getAs[Long]("n_alpha") == 3L)
    assert(r1.getAs[Long]("n_digit") == 3L && r1.getAs[Long]("n_space") == 1L)
    assert(r1.getAs[Long]("n_punct") == 1L && r1.getAs[Long]("n_other") == 0L)
    assert(r1.getAs[Long]("alpha_ppm") == 375000L) // (3·10⁶) div 8
    assert(r1.getAs[String]("script_class") == "numeric") // digits ≥ 30%
    assert(out(2L).getAs[String]("script_class") == "latin")
  }

  test("sqScales + sqEncode: hand-checked symmetric int8 codes and decode error") {
    val embs = Seq(
      (0L, Seq(1.0f, -0.5f)),
      (1L, Seq(0.5f, 0.25f))
    ).toDF("vec_id", "embedding")
    val scales = Similarity.sqScales(embs)
    assert(scales.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      === Map(0 -> 10000000L, 1 -> 5000000L))
    val codes = Similarity.sqEncode(embs, scales)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(codes((0L, 0)) === (127L, 0L))    // full-scale → 127, exact
    assert(codes((0L, 1)) === (-127L, 0L))   // negative full-scale
    assert(codes((1L, 0)) === (64L, 39370L)) // |127·5e6 − 64·1e7| div 127
    assert(codes((1L, 1)) === (64L, 19685L))
  }

  test("sqTopKWith: compressed ranking matches exact ranking on well-separated vectors") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.1f, 0.9f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val truth  = Similarity.bruteForceTopK(embs, Seq(0L, 2L), k = 2)
    val approx = Similarity.sqTopKWith(embs, Similarity.sqScales(embs), Seq(0L, 2L), k = 2)
    val audit = Similarity.topKRecallAudit(truth, approx).collect()
    assert(audit.length == 2 && audit.forall(_.getAs[Long]("recall_ppm") == 1000000L))
  }

  test("ivfPqEncode + ivfPqTopKWith: m codes per vector, ADC ranking finds same-cluster neighbors") {
    // two tight clusters in a 4-dim space; coarse codebook = the two
    // cluster directions; m=2 subspaces of 2 dims, 2 codewords each
    val embs = Seq(
      (0L, Seq(1.0f, 0.05f, 0.0f, 0.0f)),
      (1L, Seq(0.95f, 0.0f, 0.05f, 0.0f)),
      (2L, Seq(0.9f, 0.0f, 0.0f, 0.05f)),
      (3L, Seq(0.0f, 0.05f, 1.0f, 0.0f)),
      (4L, Seq(0.05f, 0.0f, 0.95f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.9f, 0.05f))
    ).toDF("vec_id", "embedding")
    val cb = Seq(
      (0L, Seq(10000000L, 0L, 0L, 0L)),
      (1L, Seq(0L, 0L, 10000000L, 0L))
    ).toDF("cell", "cv")
      .withColumn("cn2", expr("cv[0]*cv[0] + cv[1]*cv[1] + cv[2]*cv[2] + cv[3]*cv[3]"))
    val rcb = Similarity.ivfPqCodebooks(embs, cb, dim = 4, m = 2, k = 2)
    val codes = Similarity.ivfPqEncode(embs, cb, rcb, dim = 4, m = 2)
    assert(codes.count() == 12) // 6 vectors × 2 subspaces
    // every vector of the first cluster sits in cell 0, second in cell 1
    val cells = codes.select("vec_id", "cell").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 2L).forall(cells(_) == 0L) && (3L to 5L).forall(cells(_) == 1L))
    // ADC with nProbe=1: query 0's neighbors must come from its own cluster
    val top = Similarity.ivfPqTopKWith(embs, cb, rcb, Seq(0L), dim = 4, m = 2, nProbe = 1, k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(top.subsetOf(Set(1L, 2L)))
    // nProbe=2 reaches the other cell too: 5 candidates ranked
    val top2 = Similarity.ivfPqTopKWith(embs, cb, rcb, Seq(0L), dim = 4, m = 2, nProbe = 2, k = 5)
    assert(top2.count() == 5)
  }

  test("curriculumSchedule: phases follow the score ntile, order matches globalShuffle") {
    val docs = Seq(
      (1L, 60L), (2L, 50L), (3L, 40L), (4L, 30L), (5L, 20L), (6L, 10L)
    ).toDF("doc_id", "s")
    val out = Profile.curriculumSchedule(docs, col("doc_id"), col("s").cast("double"),
      phases = 3, shards = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // ntile(3) over score DESC: docs 1,2 → phase 1; 3,4 → 2; 5,6 → 3
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3, 6L -> 3))
    val sched = Profile.curriculumSchedule(docs, col("doc_id"), col("s").cast("double"),
      phases = 3, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val shuf = Profile.globalShuffle(docs.select(col("doc_id")), col("doc_id"), 2, "curr")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(sched === shuf)
  }

  test("tripletMining: near-dup pair becomes the positive, closest different-label the top negative") {
    // 0 and 1 nearly identical (same label) → the mined pair; 2 is a
    // different-label vector close to the pair; 3 is far away
    val embs = Seq(
      (0L, Seq(1.0f, 0.01f, 0.0f), 7),
      (1L, Seq(1.0f, 0.02f, 0.0f), 7),
      (2L, Seq(0.9f, 0.1f, 0.1f), 8),
      (3L, Seq(0.0f, 0.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMining(embs, dim = 3, posThreshold = 0.999, kNeg = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("anchor") == 0L && r.getAs[Long]("positive") == 1L)
    assert(r.getAs[Long]("negative") == 2L && r.getAs[Int]("rk") == 1)
    assert(r.getAs[Double]("pos_cos") > 0.999 && r.getAs[Double]("neg_cos") < r.getAs[Double]("pos_cos"))
  }

  test("matryoshkaRecallCurve: full-dim point is perfect recall, curve is monotone on a front-loaded corpus") {
    // information entirely in the first 2 dims → truncation to 2 is
    // already perfect; dim 1 loses the second coordinate
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.1f, 0.9f, 0.0f, 0.0f)),
      (3L, Seq(0.5f, 0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") === 0L)
    val out = Similarity.matryoshkaRecallCurve(embs, q, dims = Seq(2, 4), k = 2)
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("recall_ppm")).toMap
    assert(out(4) == 1000000L) // full dim == truth by construction
    assert(out(2) == 1000000L) // all signal lives in the prefix
  }

  test("crossLabelNeardups: unordered label cells, counts and max cosine") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(1.0f, 0.01f), 2), // near-dup of 0, cross-label
      (2L, Seq(0.99f, 0.0f), 1), // near-dup of 0, same label
      (3L, Seq(0.0f, 1.0f), 3)   // far from everything
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.crossLabelNeardups(embs, dim = 2, threshold = 0.999)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.contains((1, 2)) && out.contains((1, 1)))
    assert(!out.keys.exists { case (a, b) => a == 3 || b == 3 })
  }

  test("noveltyScores: shared-gram counts against the rest of the corpus, exact ppm") {
    val docs = Seq(
      (1L, "a b c d e f x y"), // grams: abcdef, bcdefx, cdefxy
      (2L, "a b c d e f q"),   // grams: abcdef, bcdefq → shares 1 of 2
      (3L, "p q r s t u")      // unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(1L) === ((3L, 1L, 1000000L - 333333L)))
    assert(out(2L) === ((2L, 1L, 500000L)))
    assert(out(3L) === ((1L, 0L, 1000000L)))
  }

  test("mergeAggregateStates: merge of split states equals the direct full aggregate") {
    val rows = Seq(
      (1L, "a", 1.5), (2L, "a", 2.0), (3L, "a", 0.25),
      (4L, "b", 10.0), (5L, "b", -3.5)
    ).toDF("id", "k", "v")
    val full = Maintenance.aggregateState(rows, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val merged = Maintenance.mergeAggregateStates(
      Maintenance.aggregateState(rows.filter(col("id") <= 2), col("k"), col("v")),
      Maintenance.aggregateState(rows.filter(col("id") > 2), col("k"), col("v")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged === full)
    assert(full("a") === ((3L, 375L, 25L, 200L))) // centi-units
  }

  test("snapshotDiff: added/removed/changed classified, unchanged suppressed") {
    val oldSnap = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("doc_id", "text")
    val out = Maintenance.snapshotDiff(oldSnap, newSnap, col("doc_id"), md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: NULL payloads — present key with NULL payload is not added/removed; NULL-vs-value is CHANGED") {
    val oldSnap = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("z")))
      .toDF("doc_id", "text")
    val out = Maintenance.snapshotDiff(oldSnap, newSnap, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: value→NULL = changed; 2: NULL<=>NULL = unchanged (suppressed);
    // 3: NULL→value = changed — never misread as added/removed
    assert(out === Map(1L -> "changed", 3L -> "changed"))
  }

  test("packingEfficiency: hand-checked bins and waste at capacity 10") {
    val docs = Seq(
      (1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L), // padded: 3 bins; packed: ⌈21/10⌉ = 3
      (4L, "b", 3L), (5L, "b", 3L), (6L, "b", 3L)  // padded: 3 bins; packed: 1
    ).toDF("id", "src", "n")
    val out = Packing.packingEfficiency(docs, col("src"), col("n"), capacity = 10L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a"); val b = out("b")
    assert(a.getAs[Long]("padded_bins") == 3L && a.getAs[Long]("packed_bins") == 3L)
    assert(a.getAs[Long]("savings_ppm") == 0L)
    assert(b.getAs[Long]("padded_bins") == 3L && b.getAs[Long]("packed_bins") == 1L)
    assert(b.getAs[Long]("padded_waste") == 21L && b.getAs[Long]("packed_waste") == 1L)
    assert(b.getAs[Long]("savings_ppm") == 666666L)
  }

  test("splitLeakageAudit: survivor-keyed mode has zero cross-split pairs, per-doc mode counted honestly") {
    val docs = (0L to 9L).toDF("doc_id")
    // pairs 0-1, 2-3, 4-5: three near-dup clusters
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val survivors = Seq(
      (0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 7L), (8L, 8L), (9L, 9L)
    ).toDF("doc_id", "survivor_doc_id")
    val out = Profile.splitLeakageAudit(docs, col("doc_id"), pairs, survivors, 50, 25)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("survivor_keyed") === ((3L, 0L)))
    assert(out("per_doc")._1 == 3L && out("per_doc")._2 >= 0L)
    // cross-check per_doc against a direct recount
    val splits = Profile.withSplit(docs, col("doc_id"), 50, 25)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = Seq((0L, 1L), (2L, 3L), (4L, 5L)).count { case (a, b) => splits(a) != splits(b) }
    assert(out("per_doc")._2 == expect.toLong)
  }

  test("trigramLmScore: hand-computed interpolated ppm on a tiny corpus") {
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramLmScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // doc1 trigrams: abc(x2, ip 613332), bca(840000), cab(840000)
    assert(out(1L)._1 == 4L && out(1L)._3 == 613332L)
    assert(math.abs(out(1L)._2 - 2906664.0 / 4) < 1e-9)
    // doc2: abd alone — backoff mass keeps it nonzero despite the
    // unseen-ish prefix
    assert(out(2L) === ((1L, 306666.0, 306666L)))
  }

  test("cellSkewReport: hand-checked populations and imbalance on a lopsided assignment") {
    // 3 vectors land on centroid 0's direction, 1 on centroid 1's
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.95f, 0.05f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cb = Seq((0L, Seq(10000000L, 0L)), (1L, Seq(0L, 10000000L)))
      .toDF("cell", "cv").withColumn("cn2", expr("cv[0]*cv[0] + cv[1]*cv[1]"))
    val r = Similarity.cellSkewReport(embs, cb).collect().head
    assert(r.getAs[Long]("n_cells") == 2L && r.getAs[Long]("n_vectors") == 4L)
    assert(r.getAs[Long]("min_pop") == 1L && r.getAs[Long]("max_pop") == 3L)
    assert(r.getAs[Long]("p50_pop") == 1L) // rank ⌈nc/2⌉ = 1 of 2 → smaller cell
    assert(r.getAs[Long]("imbalance_x1000") == 1500L) // 3·2·1000/4
  }

  test("codebookQuality: tight cells report low separation, on-centroid vectors have a = 0") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f)), // == centroid 0
      (1L, Seq(0.9f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), // == centroid 1
      (3L, Seq(0.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cb = Seq(
      (0L, Seq(10000000L, 0L)),
      (1L, Seq(0L, 10000000L))
    ).toDF("cell", "cv").withColumn("cn2", expr("cv[0]*cv[0] + cv[1]*cv[1]"))
    val out = Similarity.codebookQuality(embs, cb)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L)._1 == 2L && out(1L)._1 == 2L) // two vectors per cell
    // mean own d²: cell 0 = (0 + 1e12)/2 = 5e11
    assert(out(0L)._2 == 500000000000L)
    // separation well under 10⁶ ppm: members sit much closer to their
    // own centroid than to the other
    assert(out(0L)._3 < 20000L && out(1L)._3 < 20000L)
  }

  test("codebookQuality: a 1-cell codebook is rejected eagerly (b = runner-up distance needs >= 2 cells)") {
    val embs = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cb = Seq((0L, Seq(10000000L, 0L)))
      .toDF("cell", "cv").withColumn("cn2", expr("cv[0]*cv[0] + cv[1]*cv[1]"))
    val e = intercept[IllegalArgumentException](Similarity.codebookQuality(embs, cb))
    assert(e.getMessage.contains(">= 2 cells"))
  }
}
