package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 curation pack: chunking, global shuffle, length quantiles,
  * mixture planning, semantic decontamination.
  */
class CurationSpec extends SparkSpec {

  test("chunkDocuments: window starts, sizes, and overlap") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, col("doc_id"), col("text"), chunkTokens = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // 10 tokens, stride 3 → starts 0,3,6,9 → sizes 4,4,4,1
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(out.head.getAs[String]("chunk_text") === "t0 t1 t2 t3")
    assert(out(1).getAs[String]("chunk_text") === "t3 t4 t5 t6") // 1-token overlap
    assert(out.last.getAs[String]("chunk_text") === "t9")
  }

  test("chunkDocuments: short doc yields exactly one chunk; stride > chunk rejected") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "only two")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, col("doc_id"), col("text"), 64, 48).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_chunk_tokens") === 2L)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, col("doc_id"), col("text"), chunkTokens = 4, stride = 5)
    }
  }

  test("globalShuffle: complete, dense per-shard positions, partition-invariant") {
    val s = spark; import s.implicits._
    val df = (0L until 500L).toDF("doc_id")
    val a = Profile.globalShuffle(df, col("doc_id"), shards = 8).collect()
    assert(a.length === 500)
    assert(a.forall(r => r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 8))
    // positions are 1..n_shard within each shard, no gaps
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // pure function of ids: identical output under a different input layout
    val b = Profile.globalShuffle(df.repartition(7), col("doc_id"), shards = 8).collect()
    def keyed(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    assert(keyed(a) === keyed(b))
  }

  test("lengthQuantiles: percentile_disc semantics on a known distribution") {
    val s = spark; import s.implicits._
    // group g: lengths 1..10 (one each) → p25=⌈2.5⌉th=3, p50=5, p90=9, p99=10
    val df = (1L to 10L).map(i => ("g", i)).toDF("src", "len")
    val r = Profile.lengthQuantiles(df, col("src"), col("len")).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("min_len") === 1L && r.getAs[Long]("max_len") === 10L)
    assert(r.getAs[Long]("p25") === 3L)
    assert(r.getAs[Long]("p50") === 5L)
    assert(r.getAs[Long]("p90") === 9L)
    assert(r.getAs[Long]("p99") === 10L)
    // singleton group: every quantile is the single value
    val one = Profile.lengthQuantiles(Seq(("h", 7L)).toDF("src", "len"), col("src"), col("len"))
      .collect().head
    assert(Seq("min_len", "p25", "p50", "p90", "p99", "max_len")
      .forall(c => one.getAs[Long](c) === 7L))
  }

  test("mixturePlan: α=0.5 targets, floor/cap, effective docs") {
    val s = spark; import s.implicits._
    val df = ((1 to 100).map(i => ("small", i)) ++ (1 to 400).map(i => ("big", i)))
      .toDF("src", "i")
    val out = Profile.mixturePlan(df, col("src")).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // √100:√400 = 1:2 → targets 333333/666666 ppm vs natural 200000/800000
    assert(out("small").getAs[Long]("natural_ppm") === 200000L)
    assert(out("small").getAs[Long]("target_ppm") === 333333L)
    assert(out("small").getAs[Long]("repeat_x1000") === 1666L) // 333333000 div 200000
    assert(out("small").getAs[Long]("effective_docs") === 166L)
    // over-represented source floors at exactly 1 epoch — never drops
    assert(out("big").getAs[Long]("repeat_x1000") === 1000L)
    assert(out("big").getAs[Long]("effective_docs") === 400L)
  }

  test("domainReweight: MW step shifts weight toward the rare-token domain; weights stay normalized") {
    val s = spark; import s.implicits._
    // "com": every occurrence is the corpus's most common token;
    // "rar": all-distinct tokens → per-occurrence rarity above the
    // corpus mean, so DoReMi's direction is weight toward "rar".
    val com = (1 to 10).map(i => ("com", "x x x x"))
    val rar = (1 to 10).map(i => ("rar", s"u${i}a u${i}b u${i}c u${i}d"))
    val df = (com ++ rar).toDF("src", "text")
    val out = Profile.domainReweight(df, col("src"), col("text"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("com").getAs[Long]("n_docs") === 10L)
    assert(out("com").getAs[Long]("n_occ") === 40L)
    assert(out("rar").getAs[Long]("n_occ") === 40L)
    // equal doc counts → natural weights are exactly half each
    assert(out("com").getAs[Long]("w0_ppm") === 500000L)
    assert(out("rar").getAs[Long]("w0_ppm") === 500000L)
    // the 40-occurrence token's cell is common → "com" sits below the
    // corpus-mean loss (excess 0); the distinct-token domain above it
    assert(out("com").getAs[Long]("excess_ppm") === 0L)
    assert(out("rar").getAs[Long]("excess_ppm") > 0L)
    assert(out("rar").getAs[Long]("loss_ppm") > out("com").getAs[Long]("loss_ppm"))
    // MW direction + renormalization: rar gains, com loses, sum stays
    // 1e6 up to one floor-division ulp per source
    val w1 = out.values.map(_.getAs[Long]("w1_ppm")).toSeq
    assert(out("rar").getAs[Long]("w1_ppm") > 500000L)
    assert(out("com").getAs[Long]("w1_ppm") < 500000L)
    assert(w1.sum <= 1000000L && w1.sum > 1000000L - 2L)
    // losses are ppm-bounded
    out.values.foreach { r =>
      val l = r.getAs[Long]("loss_ppm")
      assert(l >= 0L && l <= 1000000L)
    }
  }

  test("doremiRounds: round 1 shifts toward the rare domain, round 2 compounds; weights stay normalized per round") {
    val s = spark; import s.implicits._
    val com = (1 to 10).map(_ => ("com", "x x x x"))
    val rar = (1 to 10).map(i => ("rar", s"u${i}a u${i}b u${i}c u${i}d"))
    val df = (com ++ rar).toDF("src", "text")
    val out = Profile.doremiRounds(df, col("src"), col("text"), rounds = 2)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("round")) -> r)
      .toMap
    assert(out.size === 4) // 2 sources × 2 rounds
    // DoReMi direction every round: the rare-token domain has excess
    // loss and gains weight share
    Seq(1L, 2L).foreach { r =>
      assert(out(("rar", r)).getAs[Long]("excess_ppm") > 0L, s"round $r")
      assert(out(("com", r)).getAs[Long]("excess_ppm") === 0L, s"round $r")
      val wSum = Seq("com", "rar").map(d => out((d, r)).getAs[Long]("w_ppm")).sum
      assert(wSum <= 1000000L && wSum > 1000000L - 3L, s"round $r sum=$wSum")
    }
    // compounding: round 2 starts from round 1's shifted mixture, and
    // the still-underfit rare domain keeps gaining
    assert(out(("rar", 1L)).getAs[Long]("w_ppm") > 500000L)
    assert(out(("rar", 2L)).getAs[Long]("w_ppm") > out(("rar", 1L)).getAs[Long]("w_ppm"))
    // round 1 from the natural token share reproduces the single-step
    // operator's direction deterministically across reruns
    val again = Profile.doremiRounds(df, col("src"), col("text"), rounds = 2).collect()
    assert(again.map(r => (r.getString(0), r.getLong(1), r.getLong(4))).sorted ===
      out.values.map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq.sorted)
  }

  test("doremiRealize: expanded doc-share realizes the round's weights through the hash-gated explode") {
    val s = spark; import s.implicits._
    // 100 "a" docs vs 300 "b" docs; target weights 50/50 → repeat
    // a ×2.0 (capped path exact), b ×0.666...
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 300).map(i => ("b", 1000L + i))).toDF("src", "doc_id")
    val w = Seq(("a", 500000L), ("b", 500000L)).toDF("source", "w_ppm")
    val out = Profile.doremiRealize(df, col("src"), col("doc_id"), w)
    val counts = out.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    // a: share 250000 ppm → repeat 500000*1000 div 250000 = 2000 → 200 copies
    assert(counts("a") === 200L)
    // b: share 750000 ppm → repeat x1000 = 666 → 300·0 + hash-gated
    // 666/1000 extra ≈ 200; exact expected value ±√n noise from the
    // deterministic hash gate
    assert(counts("b") > 150L && counts("b") < 250L, counts("b").toString)
    // every expanded row keeps (doc_id, source, epoch >= 1)
    assert(out.filter(col("epoch") < 1L).count() === 0L)
    // cap binds: a huge weight can't amplify past maxRepeatX1000
    val wSkew = Seq(("a", 999000L), ("b", 1000L)).toDF("source", "w_ppm")
    val capped = Profile.doremiRealize(df, col("src"), col("doc_id"), wSkew,
      maxRepeatX1000 = 3000L)
    assert(capped.filter(col("source") === "a").count() === 300L) // 100 × 3.0 exactly
  }

  test("domainReweight: η = 0 is a no-op on the natural weights") {
    val s = spark; import s.implicits._
    val df = ((1 to 10).map(i => ("a", s"t$i words here")) ++
      (1 to 10).map(i => ("b", s"q$i other text"))).toDF("src", "text")
    val out = Profile.domainReweight(df, col("src"), col("text"), etaPpm = 0L)
      .collect()
    out.foreach(r => assert(r.getAs[Long]("w1_ppm") === r.getAs[Long]("w0_ppm")))
  }

  test("ddBucket law: every positive value lands in its [rep, hi] bucket with relative width <= 2^-k") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val xs = (Seq(1L, 2L, 15L, 16L, 31L, 32L, 33L, 1000L, Long.MaxValue / 2) ++
      (1 to 300).map(_ => 1L + rnd.nextLong(1L << 40))).distinct
    val out = xs.toDF("x")
      .select(col("x"), graft.operators.Profile.ddBucketKey(col("x"), 4).as("key"))
      .select(col("x"), col("key"),
        graft.operators.Profile.ddBucketRep(col("key"), 4).as("rep"),
        graft.operators.Profile.ddBucketHi(col("key"), 4).as("hi"))
      .collect()
    out.foreach { r =>
      val (x, rep, hi) = (r.getAs[Long]("x"), r.getAs[Long]("rep"), r.getAs[Long]("hi"))
      assert(rep <= x && x <= hi, s"x=$x not in [$rep, $hi]")
      if (x >= 16L) assert((hi - rep + 1L) * 16L <= rep, s"width too wide at x=$x [$rep, $hi]")
      else assert(rep === x && hi === x, s"sub-2^k values must bucket exactly: x=$x")
    }
    // key is monotone in x: sorting by key == sorting by value
    val sorted = out.sortBy(_.getAs[Long]("x")).map(_.getAs[Long]("key"))
    assert(sorted === sorted.sorted, "bucket key must be monotone in the value")
  }

  test("ddQuantileAudit: sketch brackets the exact quantile; exact side matches a host-side sort") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map(i => (if (i % 2 == 0) "a" else "b", 1L + rnd.nextLong(5000L)))
    val out = Profile.ddQuantileAudit(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    Seq("a", "b").foreach { g =>
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val r  = out(g)
      assert(r.getAs[Long]("n") === vs.size.toLong)
      Seq(50 -> "p50", 90 -> "p90", 99 -> "p99").foreach { case (pct, p) =>
        val exact = vs((vs.size * pct + 99) / 100 - 1)
        assert(r.getAs[Long](s"${p}_exact") === exact, s"$g $p exact")
        assert(r.getAs[Boolean](s"${p}_ok"), s"$g $p in-bounds verdict")
        val rep = r.getAs[Long](s"${p}_rep")
        assert(rep <= exact && (exact - rep) * 16L <= exact, s"$g $p error bound")
      }
    }
  }

  test("rank disagreement: ranks are 1-based permutations of each scorer's domain; gap = |difference|") {
    val s = spark; import s.implicits._
    // quality loves long clean text; DSIR loves src1-like bigrams —
    // construct docs that pull the two orders apart
    val docs = (1L to 40L).map { i =>
      val src  = if (i % 4 == 0) "src1" else s"src${i % 3}"
      val text = if (i % 2 == 0) s"alpha beta gamma delta epsilon token$i"
                 else s"zz$i yy$i"
      (i, text, src)
    }.toDF("doc_id", "text", "source")
    val qual = TextAnalysis.hashedQualityScores(docs, col("doc_id"), col("text"))
      .select(col("doc_id"),
        TextAnalysis.qualityDensityMilli(col("logit_milli"), col("n_tokens")).as("__dq"))
    val dsir = TextAnalysis.dsirWeights(docs, col("doc_id"), col("text"),
      isTarget = col("source") === "src1")
      .select(col("doc_id"), col("dsir_ppm"))
    val rq = Ranking.globalRank(qual, -col("__dq"), Seq(col("doc_id")))
      .select(col("doc_id"), col("rank").as("r_quality"))
    val rd = Ranking.globalRank(dsir, -col("dsir_ppm"), Seq(col("doc_id")))
      .select(col("doc_id"), col("rank").as("r_dsir"))
    val rqRows = rq.collect().map(_.getAs[Long]("r_quality")).sorted
    val rdRows = rd.collect().map(_.getAs[Long]("r_dsir")).sorted
    assert(rqRows === (1L to rqRows.length).toArray, "quality ranks must be a dense permutation")
    assert(rdRows === (1L to rdRows.length).toArray, "dsir ranks must be a dense permutation")
    val joined = rq.join(rd, "doc_id")
      .withColumn("rank_gap", abs(col("r_quality") - col("r_dsir")))
      .collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("rank_gap") ===
        math.abs(r.getAs[Long]("r_quality") - r.getAs[Long]("r_dsir")))
    }
    assert(joined.exists(_.getAs[Long]("rank_gap") > 0L), "constructed orders must disagree")
  }

  test("ddQuantileAudit rejects non-positive values loudly") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 5L), ("a", 0L)).toDF("g", "v")
    val e = intercept[Exception] {
      Profile.ddQuantileAudit(df, col("g"), col("v")).collect()
    }
    assert(e.getMessage.contains("positive") ||
      e.getCause != null && e.getCause.getMessage.contains("positive"))
  }

  test("vocabCoverage: exact coverage at each K on known frequencies") {
    val s = spark; import s.implicits._
    // a×3, b×2, c×1 → total 6 occurrences, vocab 3
    val df = Seq("a a a b", "b c").toDF("text")
    val out = TextAnalysis.vocabCoverage(df, col("text"), Seq(1, 2, 10))
      .collect().map(r => r.getAs[Int]("k") -> r).toMap
    assert(out(1).getAs[Long]("vocab_size") === 3L)
    assert(out(1).getAs[Long]("total_occurrences") === 6L)
    assert(out(1).getAs[Long]("covered_occurrences") === 3L) // top-1 = a
    assert(out(1).getAs[Long]("coverage_ppm") === 500000L)
    assert(out(2).getAs[Long]("covered_occurrences") === 5L) // a + b
    assert(out(10).getAs[Long]("coverage_ppm") === 1000000L) // K > vocab covers all
  }

  test("realizeMixture: floor epochs for all, hash-gated extras, deterministic") {
    val s = spark; import s.implicits._
    val df = ((1 to 100).map(i => ("small", i.toLong)) ++ (1 to 400).map(i => ("big", i.toLong + 1000)))
      .toDF("src", "id")
    val out = Profile.realizeMixture(df, col("src"), col("id")).collect()
    val copies = out.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .map { case (k, rows) => k -> rows.map(_.getAs[Long]("epoch")).sorted.toSeq }
    // big source: repeat 1.000 → exactly one epoch per doc
    assert(copies.filter(_._1._1 == "big").forall(_._2 == Seq(1L)))
    // small source: repeat 1.666 → every doc 1 or 2 epochs, dense from 1
    val smalls = copies.filter(_._1._1 == "small").values
    assert(smalls.forall(e => e == Seq(1L) || e == Seq(1L, 2L)))
    // the hash gate realizes the fractional remainder on SOME but not all
    assert(smalls.exists(_.size == 2) && smalls.exists(_.size == 1))
    // deterministic: a second run over a different layout is identical
    val again = Profile.realizeMixture(df.repartition(7), col("src"), col("id"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"))).sorted.toSeq
    assert(again === out.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"))).sorted.toSeq)
  }

  test("recallAudit: tp/fn/fp partition and exact ppm ratios") {
    val s = spark; import s.implicits._
    val truth = Seq((1L, 2L), (1L, 3L), (4L, 5L), (6L, 7L))
      .toDF("doc_a", "doc_b") // 4 true pairs
    val cand = Seq((1L, 2L), (4L, 5L), (8L, 9L))
      .toDF("doc_a", "doc_b") // finds 2, misses 2, invents 1
    val r = TextDedup.recallAudit(truth, cand).collect().head
    assert(r.getAs[Long]("n_truth") === 4L && r.getAs[Long]("n_candidate") === 3L)
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("fn") === 2L && r.getAs[Long]("fp") === 1L)
    assert(r.getAs[Long]("recall_ppm") === 500000L)    // 2/4
    assert(r.getAs[Long]("precision_ppm") === 666666L) // 2/3 floor
  }

  test("recallAudit: empty candidate set yields zero recall, not a crash or divide-by-zero") {
    val s = spark; import s.implicits._
    val truth = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val none  = truth.filter(lit(false))
    val r = TextDedup.recallAudit(truth, none).collect().head
    assert(r.getAs[Long]("recall_ppm") === 0L)
    assert(r.getAs[Long]("precision_ppm") === 0L)
    assert(r.getAs[Long]("n_candidate") === 0L)
  }

  test("semanticContamination: exact-match flagged, orthogonal not, benchmark excluded") {
    val s = spark; import s.implicits._
    val bench   = Array(1.0f, 0.0f, 0.0f)
    val leaked  = Array(0.5f, 0.0f, 0.0f)   // cosine 1.0 with bench
    val clean   = Array(0.0f, 1.0f, 0.0f)   // cosine 0.0
    val df = Seq(
      (0L, bench, 0), (1L, leaked, 1), (2L, clean, 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticContamination(df, col("label") === 0, threshold = 0.35)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(!out.contains(0L)) // benchmark rows are not scored against themselves
    assert(out(1L).getAs[Boolean]("contaminated"))
    assert(math.abs(out(1L).getAs[Double]("max_benchmark_cos") - 1.0) < 1e-12)
    assert(!out(2L).getAs[Boolean]("contaminated"))
    assert(math.abs(out(2L).getAs[Double]("max_benchmark_cos")) < 1e-12)
  }
}
