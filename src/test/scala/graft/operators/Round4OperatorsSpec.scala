package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 additions: ANN recall@k audit, cross-source dup matrix. */
class Round4OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("topKRecallAudit: per-query hit counts and exact ppm on hand-checked lists") {
    val truth = Seq(
      (0L, 10L), (0L, 11L), (0L, 12L), // q0: 3 truth rows
      (1L, 20L), (1L, 21L)             // q1: 2 truth rows
    ).toDF("qid", "cid")
    val approx = Seq(
      (0L, 10L), (0L, 12L), (0L, 99L), // q0 hits 2 of 3 (99 is a fp, ignored)
      (1L, 77L)                        // q1 hits 0 of 2
    ).toDF("qid", "cid")
    val out = Similarity.topKRecallAudit(truth, approx)
      .orderBy("qid").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L)
    assert(out(0).getLong(3) == 666666L) // (2e6) div 3, floor
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L)
  }

  test("topKRecallAudit: perfect approx is 1e6 ppm for every query") {
    val t = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("qid", "cid")
    val out = Similarity.topKRecallAudit(t, t).collect()
    assert(out.forall(_.getLong(3) == 1000000L))
  }

  test("bruteForceL2TopK: exact integer d2 ranking on hand-checked vectors") {
    // quantize scales by 1e7 and rounds; ints below stay exact
    val embs = Seq(
      (0L, Seq(0.0f, 0.0f)),   // query
      (1L, Seq(1.0f, 0.0f)),   // d2 = 1e12
      (2L, Seq(0.0f, 2.0f)),   // d2 = 4e12
      (3L, Seq(1.0f, 1.0f))    // d2 = 2e12
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceL2TopK(embs, Seq(0L), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 3L))
    assert(out.head.getLong(2) === 10000000L * 10000000L)
  }

  test("dupSourceMatrix: unordered source pairs, counts, max jaccard") {
    val pairs = Seq(
      (1L, 2L, 0.9),  // srcA-srcB
      (2L, 3L, 0.85), // srcB-srcA → same unordered cell as above
      (1L, 3L, 1.0),  // srcA-srcA (self-duplication)
      (4L, 5L, 0.8)   // srcC-srcC
    ).toDF("doc_a", "doc_b", "jaccard")
    val docs = Seq(
      (1L, "srcA"), (2L, "srcB"), (3L, "srcA"), (4L, "srcC"), (5L, "srcC")
    ).toDF("doc_id", "source")
    val out = TextDedup.dupSourceMatrix(pairs, docs, col("doc_id"), col("source"))
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("srcA", "srcA", 1L, 1.0),
      ("srcA", "srcB", 2L, 0.9),
      ("srcC", "srcC", 1L, 0.8)))
  }
}
