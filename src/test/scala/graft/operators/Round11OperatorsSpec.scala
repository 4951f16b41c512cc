package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Round-11 operator invariants: the shared-still boilerplate detector
  * and the paired-dataset alignment histogram, checked against direct
  * host-side recomputations and cross-query consistency (their DuckDB
  * oracles hash-check the VALUES; these pin the semantics). */
class Round11OperatorsSpec extends SparkSpec {

  test("q211 shared stills: groups match a host-side recomputation from the hashes; every group spans >= 2 clips; keeper is the min packed id") {
    val s = spark; import s.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val kf = Multimodal.videoKeyframes(
      Multimodal.syntheticVideo(docs, col("doc_id")), everyK = 4)
    val hashed = Multimodal.aHash64(
        kf.select(
          Multimodal.keyframeId(col("doc_id"), col("frame_idx")).as("doc_id"),
          col("payload")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // host-side truth from the SAME hash relation
    val groups = hashed.groupBy(_._2).map { case (sh, members) =>
      val packed = members.map(_._1)
      (sh, (members.size.toLong,
        packed.map(_ / 16).distinct.size.toLong,
        packed.min / 16, packed.min % 16))
    }.filter(_._2._2 >= 2)

    val out = SparkEntry.queries("q211_shared_stills")(spark, sf("sf0.001"))
    // rebuild the operator over the SAME 40 docs for an exact compare
    val op = Multimodal.aHash64(
        kf.select(
          Multimodal.keyframeId(col("doc_id"), col("frame_idx")).as("doc_id"),
          col("payload")))
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("n_stills"),
        countDistinct(Multimodal.keyframeVideoId(col("doc_id"))).as("n_clips"),
        min(col("doc_id")).as("__keeper"))
      .filter(col("n_clips") >= 2)
      .select(col("sh"), col("n_stills"), col("n_clips"),
        Multimodal.keyframeVideoId(col("__keeper")).as("keeper_video"),
        Multimodal.keyframeFrameIdx(col("__keeper")).as("keeper_frame"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(op === groups, "operator groups diverge from the host recompute")
    assert(op.nonEmpty && op.values.forall(_._2 >= 2))
    // the driver query (full corpus) at least type-checks and is non-empty
    assert(out.columns.toSeq ===
      Seq("sh", "n_stills", "n_clips", "keeper_video", "keeper_frame"))
  }

  test("q212 alignment histogram: buckets partition q187's mutual pairs exactly, and the kept mass equals q210's n_pairs") {
    val dir = sf("sf0.01")
    val hist = SparkEntry.queries("q212_pair_alignment")(spark, dir).collect()
    val nMutual = SparkEntry.queries("q187_mutual_pairs")(spark, dir).count()
    val card = SparkEntry.queries("q210_paired_dataset_card")(spark, dir).collect().head
    assert(hist.map(_.getAs[Long]("n_pairs")).sum === nMutual,
      "histogram buckets must partition the mutual-pair relation")
    assert(hist.map(_.getAs[Long]("n_kept")).sum ===
      card.getAs[Long]("n_pairs"),
      "kept mass must equal the paired-dataset card's n_pairs")
    hist.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_pairs"))
      val b = r.getAs[Long]("cos_bucket")
      assert(b >= 0L && b <= 10L, s"cos decile out of range: $b")
    }
  }
}
