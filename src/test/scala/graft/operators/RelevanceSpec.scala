package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {

  private def corpus = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "spark spark join"),
      (2L, "spark filter"),
      (3L, "window window window join"),
      (4L, "other words only")
    ).toDF("doc_id", "text")
  }

  test("tfidf: score = tf·(N+1)/(df+1) from exact counts; top-k ranks by score then token") {
    val s = spark; import s.implicits._
    val out = Relevance.tfidf(corpus, col("doc_id"), col("text"))
      .select("doc_id", "token", "tf", "df", "score")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // N = 4; spark: df 2; doc1 tf 2 → 2·5/3
    assert(out((1L, "spark")) === ((2L, 2L, 2.0 * 5 / 3)))
    assert(out((3L, "window")) === ((3L, 1L, 3.0 * 5 / 2)))
    val top1 = Relevance.topTfidfPerDoc(corpus, col("doc_id"), col("text"), 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    assert(top1(1L) === "spark") // 10/3 beats join's 5/3
    assert(top1(3L) === "window")
  }

  test("bm25: matches a hand evaluation; ties break by doc_id; distinct-terms guard") {
    val s = spark; import s.implicits._
    val out = Relevance.bm25(corpus, col("doc_id"), col("text"), Seq("spark", "join"), topK = 10)
      .as[(Long, Double)].collect()
    val n = 4L; val sumDl = 3L + 2 + 4 + 3
    val avgdl = sumDl.toDouble / n
    def term(tf: Long, df: Long, dl: Long): Double =
      ((n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    val expected = Map(
      1L -> (term(2, 2, 3) + term(1, 2, 3)), // spark + join
      2L -> term(1, 2, 2),
      3L -> term(1, 2, 4))
    assert(out.length === 3) // doc 4 matches nothing
    out.foreach { case (id, score) => assert(score === expected(id), s"doc $id") }
    // ordered desc
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
    intercept[IllegalArgumentException] {
      Relevance.bm25(corpus, col("doc_id"), col("text"), Seq("a", "a"), 5)
    }
  }

  test("temperatureSample: smallest group keeps all, larger groups thin toward sqrt ratio; deterministic") {
    val s = spark; import s.implicits._
    val docs = (
      (1 to 400).map(i => ("big", i.toLong)) ++ (1 to 100).map(i => ("small", 1000L + i))
    ).toDF("source", "doc_id")
    val kept = Profile.temperatureSample(docs, col("source"), col("doc_id"))
    val rates = kept.groupBy("source").agg(
      count(lit(1)).as("n"), min("sample_rate_bps").as("bps"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rates("small")._2 === 10000L) // nmin/n = 1 → keep all
    assert(rates("small")._1 === 100L)
    assert(rates("big")._2 === 5000L) // sqrt(100/400) = 0.5
    assert(rates("big")._1 > 100L && rates("big")._1 < 300L) // ~200 expected
    // partition invariance
    val again = Profile.temperatureSample(docs.repartition(7), col("source"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === kept.select("doc_id").as[Long].collect().sorted.toSeq)
    // alpha = 1 keeps everything
    assert(Profile.temperatureSample(docs, col("source"), col("doc_id"), alpha = 1.0).count() === 500)
  }

  test("bigramLmScore: hand-checked ppm probabilities; short docs absent") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams (a,b),(b,a),(a,b)
      (2L, "a c"),
      (3L, "solo")     // < 2 tokens → absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_bigrams", "avg_p_ppm", "min_p_ppm")
      .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // c(a,b)=2, c(b,a)=1, c(a,c)=1; c(a)=3, c(b)=1
    // p_ppm: (a,b)=666666, (b,a)=1000000, (a,c)=333333
    assert(out(1L) === ((1L, 3L, (666666L + 1000000 + 666666).toDouble / 3, 666666L)))
    assert(out(2L) === ((2L, 1L, 333333.0, 333333L)))
    assert(!out.contains(3L))
  }

  test("dupSpans: a planted shared passage is found at DIFFERENT offsets; unique text is not") {
    val s = spark; import s.implicits._
    // different-length prefixes on purpose: fixed-stride grids would
    // miss this (phase mismatch); content-defined anchors must not
    val shared = "the shared passage appears in both documents verbatim and it " +
      "keeps going long enough to contain several winnowing anchors in a row"
    val docs = Seq(
      (1L, "unique prefix one " + shared + " unique suffix one"),
      (2L, "a totally different beginning here of another length " + shared + " other end"),
      (3L, "this document shares nothing with the others at all " + ("z" * 80))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("span_start_word"), r.getAs[Long]("span_end_word"))).groupBy(_._1)
    assert(out.contains(1L) && out.contains(2L) && !out.contains(3L))
    // spans cover most of the shared text's words in each doc
    val sharedWords = shared.split("\\s+").length
    Seq(1L, 2L).foreach { d =>
      val covered = out(d).map { case (_, (a, b)) => b - a + 1 }.sum
      assert(covered >= sharedWords - 2 * 14, s"doc $d covered only $covered words of $sharedWords")
    }
    // doc 3 absent entirely; nothing pairs within a single doc alone
    assert(TextAnalysis.dupSpans(docs.filter(col("doc_id") === 1L), col("doc_id"), col("text")).count() === 0)
  }

  test("qualityVerdicts: each gate fails independently and composes into the verdict") {
    val s = spark; import s.implicits._
    // long, stopwordy, mostly-distinct tokens (dup frac ≈ 0.25)
    val good = (1 to 60).map(i => s"the word$i of$i item$i").mkString(" ")
    val docs = Seq(
      (1L, good),                         // passes all gates
      (2L, "too short to keep"),          // fails length
      (3L, ("dup " * 60).trim)            // fails repetition (1 distinct token beyond 'dup')
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityVerdicts(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("pass_len"), r.getAs[Boolean]("pass_repetition"),
          r.getAs[String]("verdict"))).toMap
    assert(out(1L)._3 === "keep")
    assert(!out(2L)._1 && out(2L)._3 === "drop")
    assert(out(3L)._1 && !out(3L)._2 && out(3L)._3 === "drop")
  }

  test("centroidOutliers: the anti-aligned vector ranks first in its label") {
    val s = spark; import s.implicits._
    // label 0: nine vectors near (1, 0), one at (−1, 0) → the outlier
    val embs = ((0 until 9).map(i => (i.toLong, Array(1.0f, 0.01f * i), 0))
      :+ ((9L, Array(-1.0f, 0.0f), 0))
      :+ ((10L, Array(0.0f, 1.0f), 1))
      :+ ((11L, Array(0.1f, 1.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(embs, col("label"), 2)
      .select("label", "vec_id", "rk").as[(Int, Long, Int)].collect()
    val byLabel = out.groupBy(_._1)
    assert(byLabel(0).find(_._3 == 1).get._2 === 9L)
    assert(byLabel(1).size === 2) // labels smaller than k emit all members
  }

  test("rrfFuse: exact ppm contributions, single-list docs survive, fused order") {
    val s = spark; import s.implicits._
    val text = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val vec  = Seq((0L, 2L, 1), (0L, 9L, 2)).toDF("qid", "cid", "rank")
    val out = Relevance.rrfFuse(text, vec, rrfK = 60, topK = 10)
      .orderBy("rk").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_ppm"), r.getAs[Long]("rk")))
    // doc2: both lists → 1e6 div 62 + 1e6 div 61 = 16129 + 16393
    assert(out(0) === ((2L, 32522L, 1L)))
    // doc1 text-only rank 1, doc9 vec-only rank 2, doc3 text-only rank 3
    assert(out(1) === ((1L, 16393L, 2L)))
    assert(out(2) === ((9L, 16129L, 3L)))
    assert(out(3) === ((3L, 15873L, 4L)))
  }
}
