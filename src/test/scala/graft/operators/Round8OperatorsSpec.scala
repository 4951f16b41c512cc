package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round8OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalUrl: case, default ports, fragments, tracking params, param order, empty path") {
    val cases = Seq(
      // the same page in two crawl-log spellings → one canonical form
      ("HTTPS://Www.X.com:443/p?utm_source=t&b=2&a=1#frag", "https://www.x.com/p?a=1&b=2"),
      ("https://www.x.com/p?a=1&b=2", "https://www.x.com/p?a=1&b=2"),
      // default port + empty path
      ("http://x.com:80", "http://x.com/"),
      ("http://x.com/", "http://x.com/"),
      // NON-default port survives
      ("http://x.com:8080/p", "http://x.com:8080/p"),
      // all-tracking query collapses to no query
      ("https://x.com/p?gclid=g&fbclid=f", "https://x.com/p"),
      // VALUELESS tracking params strip too: '?gclid' and '?gclid=g'
      // are the same page (the (=|$) rule)
      ("https://x.com/p?gclid", "https://x.com/p"),
      ("https://x.com/p?utm_source&b=2&a=1", "https://x.com/p?a=1&b=2"),
      // ...but a non-tracking valueless param survives
      ("https://x.com/p?flag", "https://x.com/p?flag"),
      // no default-port rule for other schemes
      ("ftp://X.com:443/f", "ftp://x.com:443/f"),
      // whitespace trim + lone fragment
      ("  https://x.com/p#a  ", "https://x.com/p"),
      // scheme-less and protocol-relative crawl-log forms dedup
      // against their absolute http spellings
      ("www.X.com/p?b=2&a=1", "http://www.x.com/p?a=1&b=2"),
      ("//x.com/p", "http://x.com/p"),
      ("x.com:80", "http://x.com/"))
    val got = cases.toDF("url", "expect")
      .withColumn("canon", TextAnalysis.canonicalUrl(col("url")))
      .collect()
    got.foreach(r =>
      assert(r.getString(2) === r.getString(1), s"for url '${r.getString(0)}'"))
  }

  test("bpeTrain: merge table matches the hand-computed rounds; deterministic tie-breaks") {
    // corpus: 'aaab' x2, 'aab' x1 (one doc carries all three words)
    val docs = Seq((0L, "aaab aaab aab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 3, minCount = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: (a,a) count 5 (2+2+1); rewrite: aaab->[aa,a,b], aab->[aa,b]
    // round 2: (aa,a) x2 vs (a,b) x2 vs (aa,b) x1 -> tie-break pair
    //          asc picks (a,b); rewrite: aaab->[aa,ab]
    // round 3: (aa,ab) x2 vs (aa,b) x1 -> (aa,ab)
    assert(merges.toSeq === Seq(
      (1, "a", "a", "aa", 5L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("bpeTrain stops early when no pair reaches minCount") {
    val docs = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 10, minCount = 2)
    assert(merges.count() === 0L) // every pair count is 1
  }

  test("bpeApplyMerges reproduces the trained segmentation (fold rule == sequential kernel)") {
    val corpus = Seq(
      (0L, "the theme then"),
      (1L, "there other aaaa"),
      (2L, "theory the the")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(corpus, col("text"), nMerges = 6, minCount = 1)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val applied = TextAnalysis.bpeApplyMerges(corpus, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // independent reference: replay the greedy left-to-right rule in
    // plain Scala over each word
    def ref(text: String): Seq[String] =
      text.trim.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
        var syms = w.map(_.toString).toVector
        merges.foreach { case (l, r) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
            else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms
      }
    Seq((0L, "the theme then"), (1L, "there other aaaa"), (2L, "theory the the"))
      .foreach { case (id, t) => assert(applied(id) === ref(t), s"doc $id") }
  }

  test("kmeansCentroids fails loudly when the seed ids [0, k) are absent (empty codebook footgun)") {
    val noSeeds = Seq((900L, Array(1f, 0f)), (901L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    // construction + explain are side-effect-free (no probe job): a
    // plan-only consumer can fingerprint the codebook without
    // executing cluster work...
    val cb = Similarity.kmeansCentroids(noSeeds, 2)
    cb.queryExecution.optimizedPlan // forces analysis+optimization only
    // ...and the FIRST ACTION raises the contract violation
    val e = intercept[Exception] { cb.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no seed centroids")), msgs(e).mkString(" | "))
    // a seeded relation still trains clean through the same guard
    val seeded = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (900L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.kmeansCentroids(seeded, 2).count() === 2)
  }

  test("urlFrontier: variants collapse to canonical groups with keep-min fetch") {
    val urls = Seq(
      (10L, "https://a.com/p?b=2&a=1"),
      (11L, "HTTPS://A.com:443/p?a=1&b=2&utm_campaign=x"),
      (12L, "https://a.com/p?a=1&b=2#frag"),
      (20L, "http://b.com:80"),
      (21L, "http://b.com/"),
      (30L, "https://c.com/only")).toDF("url_id", "url")
    val got = TextAnalysis.urlFrontier(urls, col("url_id"), col("url"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      "https://a.com/p?a=1&b=2" -> ((10L, 3L)),
      "http://b.com/"           -> ((20L, 2L)),
      "https://c.com/only"      -> ((30L, 1L))))
  }

  test("spanSurgery: min-doc keeper loses nothing; later docs get the shared passage cut") {
    val s = spark; import s.implicits._
    val shared = "the shared passage appears in both documents verbatim and it " +
      "keeps going long enough to contain several winnowing anchors in a row"
    val docs = Seq(
      (1L, "unique prefix one " + shared + " unique suffix one"),
      (2L, "a totally different beginning here of another length " + shared + " other end"),
      (3L, "this document shares nothing with the others at all whatsoever today")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.spanSurgery(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("words_removed"), r.getAs[Long]("words_kept"))))
      .toMap
    // every input doc gets a ledger row, cut or not
    assert(out.keySet === Set(1L, 2L, 3L))
    // doc 1 is the min doc for every duplicated anchor → keeper, zero cut
    assert(out(1L)._2 === 0L && out(1L)._3 === 0L)
    // doc 2 loses (most of) the shared passage but keeps its unique text
    val sharedWords = shared.split("\\s+").length
    assert(out(2L)._3 >= sharedWords - 2 * 14 && out(2L)._3 < out(2L)._1)
    // doc 3 shares nothing → untouched
    assert(out(3L)._2 === 0L && out(3L)._3 === 0L)
    // ledger invariant everywhere
    out.values.foreach { case (nt, _, rem, kept) => assert(kept === nt - rem && rem >= 0L) }
  }

  test("spanSurgery is strictly keeper-aware: dupSpans flags the keeper too, surgery does not") {
    val s = spark; import s.implicits._
    val shared = "one more sufficiently long shared passage with enough words " +
      "to generate a stable run of winnowing anchors across both copies"
    val docs = Seq(
      (5L, "first copy " + shared),
      (9L, "second copy comes later " + shared)).toDF("doc_id", "text")
    val flagged = TextAnalysis.dupSpans(docs, col("doc_id"), col("text"))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(flagged === Set(5L, 9L)) // detection flags BOTH copies
    val cut = TextAnalysis.spanSurgery(docs, col("doc_id"), col("text"))
      .filter(col("words_removed") > 0)
      .select("doc_id").as[Long].collect().toSet
    assert(cut === Set(9L)) // surgery cuts only the non-keeper
  }

  test("hashedQualityScores: logit is the sum of per-token bucket weights; identical tokens score identically") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha"),        // twice the weight of one 'alpha'
      (3L, "alpha beta gamma"))   // same bag as doc 1 → same score
    .toDF("doc_id", "text")
    val out = TextAnalysis.hashedQualityScores(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("logit_milli"), r.getAs[Boolean]("pass"))))
      .toMap
    assert(out(1L) === out(3L))
    assert(out(1L)._1 === 3L && out(2L)._1 === 2L)
    // doc 2's logit is exactly 2 × the single-token weight
    val single = TextAnalysis.hashedQualityScores(
      Seq((9L, "alpha")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().head.getAs[Long]("logit_milli")
    assert(out(2L)._2 === 2L * single)
    // weights stay in the documented [-1000, 1000] milli range
    assert(math.abs(single) <= 1000L)
    // pass is exactly the sign of the logit
    out.values.foreach { case (_, l, p) => assert(p === (l >= 0L)) }
  }

  test("cmsHeavyHitters: estimates are never below exact counts, and match exactly absent collisions") {
    val s = spark; import s.implicits._
    // few distinct tokens ≪ width=512 → collisions virtually impossible
    // at depth 4 → every estimate should equal its exact count
    val docs = Seq(
      (1L, "x x x y y z"),
      (2L, "x y w")).toDF("doc_id", "text")
    val out = TextAnalysis.cmsHeavyHitters(docs, col("doc_id"), col("text"), topN = 10)
      .collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("exact_count"), r.getAs[Long]("cms_estimate"), r.getAs[Long]("overestimate"))))
      .toMap
    assert(out("x")._1 === 4L && out("y")._1 === 3L && out("z")._1 === 1L && out("w")._1 === 1L)
    out.values.foreach { case (exact, est, over) =>
      assert(est >= exact && over === est - exact)
    }
    assert(out.values.forall(_._3 === 0L)) // no collisions at this scale
    // a tiny width FORCES collisions: estimates inflate, never deflate
    val tiny = TextAnalysis.cmsHeavyHitters(docs, col("doc_id"), col("text"), width = 1, topN = 10)
      .collect()
    tiny.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") === 9L) // every token shares the one bucket
      assert(r.getAs[Long]("overestimate") >= 0L)
    }
  }

  test("marginMutualPairs: mutual top-1 only; a one-sided preference never pairs; margin favors the isolated match") {
    val s = spark; import s.implicits._
    // One shared cell (all vectors in the +x half-space, one centroid).
    // A-side: a0 matches b0 almost exactly; a1 sits between b1 and b0
    //         but closest to b1; a2 prefers b0 which prefers a0 → a2
    //         must NOT pair (one-sided).
    val embsA = Seq(
      (0L, Seq(1.0f, 0.00f, 0f, 0f)),
      (2L, Seq(1.0f, 0.30f, 0f, 0f)),
      (4L, Seq(1.0f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding")
    val embsB = Seq(
      (1L, Seq(1.0f, 0.01f, 0f, 0f)),
      (3L, Seq(1.0f, 0.28f, 0f, 0f))).toDF("vec_id", "embedding")
    val cb = Similarity.seedCentroids(embsA.union(embsB), 1)
    val out = Similarity.marginMutualPairs(embsA, embsB, cb, k = 2)
      .collect()
      .map(r => r.getAs[Long]("a_id") ->
        ((r.getAs[Long]("b_id"), r.getAs[Long]("cos_ppm"), r.getAs[Long]("margin_ppm"))))
      .toMap
    // b0(=1) prefers a0(=0) (cos higher than vs a4); b3 prefers a2
    assert(out.keySet === Set(0L, 2L))
    assert(out(0L)._1 === 1L && out(2L)._1 === 3L)
    // 4 is absent: its best b (1) mutually prefers 0
    // margins are positive and ≥ high-cos sanity
    out.values.foreach { case (_, cos, margin) =>
      assert(cos > 900000L && margin > 0L)
    }
  }

  test("hllDistinctAudit: exact side right; estimate invariant under row duplication and repartitioning") {
    val s = spark; import s.implicits._
    val rows = (0 until 900).map(i => (s"g${i % 3}", s"key_${i % 300}")).toDF("g", "k")
    val out = Profile.hllDistinctAudit(rows, col("g"), graft.functions.Portable.hash60(col("k")))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Long]("hll_estimate"),
          r.getAs[Long]("err_ppm"), r.getAs[Boolean]("in_bounds")))).toMap
    // 300 distinct keys, each key hits every group (i%3 cycles through
    // i%300's residues): 100 per group... actually key i%300 lands in
    // group (i%300)%3 only — 100 distinct keys per group
    out.foreach { case (g, (exact, est, err, _)) =>
      assert(exact === 100L, s"$g exact")
      assert(est > 0L)
      assert(err === math.abs(est - exact) * 1000000L / exact)
    }
    // multiplicity-blindness: doubling every row changes nothing
    val doubled = Profile.hllDistinctAudit(rows.union(rows), col("g"), graft.functions.Portable.hash60(col("k")))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Long]("hll_estimate"),
          r.getAs[Long]("err_ppm"), r.getAs[Boolean]("in_bounds")))).toMap
    assert(doubled === out)
    // partition-invariance: registers are max-merged, order-free
    val reparted = Profile.hllDistinctAudit(rows.repartition(7), col("g"), graft.functions.Portable.hash60(col("k")))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Long]("hll_estimate"),
          r.getAs[Long]("err_ppm"), r.getAs[Boolean]("in_bounds")))).toMap
    assert(reparted === out)
  }

  test("hllRegisters merge law: registers(A ∪ B) == per-bucket max of registers(A), registers(B)") {
    val s = spark; import s.implicits._
    val h = (k: org.apache.spark.sql.Column) => graft.functions.Portable.hash60(k)
    val a = (0 until 400).map(i => ("g", s"a_$i")).toDF("g", "k")
    val b = (0 until 400).map(i => ("g", s"b_${i % 150}")).toDF("g", "k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Profile.hllRegisters(df, col("g"), h(col("k")))
        .collect().map(r => r.getAs[Long]("b") -> r.getAs[Int]("register")).toMap
    val ra = regs(a); val rb = regs(b); val runion = regs(a.union(b))
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    assert(runion === merged)
    // estimate from merged registers == estimate computed on the union
    // directly (the shards-then-merge production path is lossless)
    val estUnion = Profile.hllEstimate(
      Profile.hllRegisters(a.union(b), col("g"), h(col("k"))))
      .collect().head.getAs[Long]("hll_estimate")
    val estMergedInput = merged.toSeq.map { case (bk, r) => ("g", bk, r) }
      .toDF("g", "b", "register")
    val estMerged = Profile.hllEstimate(estMergedInput)
      .collect().head.getAs[Long]("hll_estimate")
    assert(estUnion === estMerged)
  }

  test("ddBucket merge law: bucket counts of a union equal the summed bucket counts of the parts; quantiles from merged buckets match the direct audit") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val a = (1 to 300).map(i => ("g", 1L + rnd.nextLong(4000L)))
    val b = (1 to 200).map(i => ("g", 1L + rnd.nextLong(4000L)))
    def buckets(rows: Seq[(String, Long)]) = rows.toDF("g", "v")
      .select(Profile.ddBucketKey(col("v"), 4).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("cnt")).toMap
    val ba = buckets(a); val bb = buckets(b); val bu = buckets(a ++ b)
    val merged = (ba.keySet ++ bb.keySet).map(k =>
      k -> (ba.getOrElse(k, 0L) + bb.getOrElse(k, 0L))).toMap
    assert(bu === merged) // the shards-then-add production path is lossless
    // and the quantile picks from the union audit stay in-bounds
    val audit = Profile.ddQuantileAudit((a ++ b).toDF("g", "v"), col("g"), col("v"))
      .collect().head
    Seq("p50", "p90", "p99").foreach(p => assert(audit.getAs[Boolean](s"${p}_ok"), p))
  }

  test("calibrationByBucket: exact ppm per bucket; rows absent from the flag set count as unflagged") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), // bucket 0: 4 rows
      (5L, 1L), (6L, 1L)).toDF("id", "bk")    // bucket 1: 2 rows
    // flags: 3 of bucket 0 (one listed twice — distinct-collapse), 0 of bucket 1
    val flags = Seq(1L, 2L, 3L, 3L, 99L).toDF("fid") // 99 is not a row → ignored
    val out = Profile.calibrationByBucket(rows, col("id"), col("bk"), flags, col("fid"))
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_flagged"), r.getAs[Long]("flagged_ppm"))))
      .toMap
    assert(out(0L) === ((4L, 3L, 750000L)))
    assert(out(1L) === ((2L, 0L, 0L)))
  }
}
