package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 optimization invariants: every rewrite this round must be
  * relation-identical to the form it replaces — pinned here on inputs
  * that actually exercise the rewrite (copy-dense corpora for the
  * reps-first probe, a real corpus slice for the LM model split). */
class Round15OperatorsSpec extends SparkSpec {

  test("bigram/trigram LM scoring against a precomputed model ≡ inline scoring") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val bgInline = rows(TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text")))
    val bgModel = rows(TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"),
      model = Some(TextAnalysis.bigramLmModel(docs, col("doc_id"), col("text")).cache())))
    assert(bgModel === bgInline)
    val tgInline = rows(TextAnalysis.trigramLmScore(docs, col("doc_id"), col("text")))
    val tgModel = rows(TextAnalysis.trigramLmScore(docs, col("doc_id"), col("text"),
      model = Some(TextAnalysis.trigramLmModel(docs, col("doc_id"), col("text")).cache())))
    assert(tgModel === tgInline)
  }

  test("starContract one-job probe: labels and round count survive the lazy-checkpoint convergence fold") {
    val s = spark; import s.implicits._
    // a chain (worst case for propagation), a triangle, a star and
    // self-pairs — the LlmOperatorsSpec shapes in one graph
    val chain = (1L until 50L).map(i => (i, i + 1))
    val extra = Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 200L))
    val pairs = (chain ++ extra).toDF("doc_a", "doc_b")
    val (labels, rounds) = TextDedup.starContract(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 50L).foreach(i => assert(got(i) === 1L))
    Seq(100L, 101L, 102L).foreach(i => assert(got(i) === 100L))
    assert(got(200L) === 200L) // self-only pair → own singleton
    assert(rounds <= 8, s"chain of 50 should converge logarithmically (got $rounds)")
  }
}
