package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 additions: incremental codebook maintenance (the k-means
  * twin of the q148 mergeable-rollup contract). */
class Round6OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def embs = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f)),
    (2L, Seq(0.9f, 0.1f)),
    (3L, Seq(0.1f, 0.9f)),
    (4L, Seq(0.8f, 0.2f)),
    (5L, Seq(0.2f, 0.8f))
  ).toDF("vec_id", "embedding")

  test("codebookState merge == direct state on the union, any split, any order") {
    val cb = Similarity.seedCentroids(embs, 2)
    def stateMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val full = stateMap(Similarity.codebookState(embs, cb))
    val threeWay = Similarity.mergeCodebookStates(
      Similarity.mergeCodebookStates(
        Similarity.codebookState(embs.filter(col("vec_id") < 2), cb),
        Similarity.codebookState(embs.filter(col("vec_id") >= 4), cb)),
      Similarity.codebookState(embs.filter(col("vec_id") === 2 || col("vec_id") === 3), cb))
    assert(stateMap(threeWay) === full)
  }

  test("centroidsFromState(state under seeds) == kmeansCentroids(…, iters = 1): refresh IS the recompute") {
    val seeds = Similarity.seedCentroids(embs, 2)
    def cents(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cell"), col("cv"), col("cn2"))
        .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    val refreshed = cents(Similarity.centroidsFromState(Similarity.codebookState(embs, seeds)))
    val direct    = cents(Similarity.kmeansCentroids(embs, 2, iters = 1))
    assert(refreshed === direct)
  }

  test("delta absorb: old state + delta state == state over old ∪ delta (the O(|delta|) refresh contract)") {
    val cb = Similarity.seedCentroids(embs, 2)
    val old   = embs.filter(col("vec_id") < 4)
    val delta = embs.filter(col("vec_id") >= 4)
    val absorbed = Similarity.centroidsFromState(
      Similarity.mergeCodebookStates(
        Similarity.codebookState(old, cb), Similarity.codebookState(delta, cb)))
    val full = Similarity.centroidsFromState(Similarity.codebookState(embs, cb))
    assert(
      absorbed.orderBy("cell").collect().map(_.toString).toSeq ===
        full.orderBy("cell").collect().map(_.toString).toSeq)
  }
}
