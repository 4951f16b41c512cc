package graft.streaming

import graft.Tables
import graft.operators.{Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** END-TO-END cross-modal STREAMING curation: the three ingest gates
  * this library ships — [[DocStream]] (text: watermark dedup →
  * quality gate → PII redaction → bloom-gated exact-dedup index),
  * [[VecStream]] (embeddings: within-batch semantic dedup →
  * index-probe gate), [[MediaStream]] (images: perceptual aHash
  * dedup gate) — running CONCURRENTLY over batched landings of one
  * corpus, converging on a single curated training set plus a one-row
  * dataset card (q160's shape).
  *
  * Identity convention: `vec_id = doc_id` (each document carries one
  * embedding and one image — the multimodal-corpus shape). The
  * curated set is the CONJUNCTION of the three admit indexes: a
  * document survives iff its text was novel at its batch, its
  * embedding was semantically novel, and its image was perceptually
  * novel — each modality vetoes independently, which is exactly how a
  * production multimodal pipeline composes (a re-crawled page with a
  * re-encoded cover image is caught by the image gate even when its
  * text was rewritten past the text gates).
  *
  * Every gate is replay-safe (state in its index table, dynamic
  * partition overwrite per batch — the chaos-spec'd contract), so the
  * composed curated set is replay-stable too: the spec re-delivers a
  * batch and asserts the conjunction is unchanged.
  *
  * Usage: `sbt "runMain graft.streaming.CurationDemo [sfDir] [workDir]"`
  * — prints one `DEMO` line per stage and the final dataset card. */
object CurationDemo {

  /** The composed run's handles — admit indexes per modality, the
    * curated corpus, and its dataset card. */
  final case class Curated(
      textAdmitted: DataFrame,
      vecAdmitted: DataFrame,
      mediaAdmitted: DataFrame,
      curated: DataFrame,
      card: DataFrame)

  /** Land the corpus as `nBatches` per-modality files and run the
    * three gated ingests to completion; compose the curated set. */
  def run(
      spark: SparkSession,
      sfDir: String,
      work: String,
      nBatches: Int = 3,
      minScore: Double = 0.0,
      tau: Double = 0.2,
      maxHamming: Int = 3): Curated = {
    require(nBatches >= 1)
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)

    // ---- land each modality in batch-id order (mod-N split, file
    // mod-times bumped so the file source triggers in batch order)
    def bump(dir: String, ms: Long): Unit = {
      val now  = System.currentTimeMillis()
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.forEach { p =>
        java.nio.file.Files.setLastModifiedTime(
          p, java.nio.file.attribute.FileTime.fromMillis(now + ms))
      } finally walk.close() // Files.walk holds directory handles open
    }
    (0 until nBatches).foreach { b =>
      val ts = to_timestamp(lit(f"2025-10-08 10:${b}%02d:00"))
      docs.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .withColumn("ingest_ts", ts)
        .coalesce(1).write.mode("overwrite").json(s"$work/land/docs/f$b")
      embs.filter(pmod(col("vec_id"), lit(nBatches.toLong)) === b)
        .select(col("vec_id"), col("embedding"), col("label").cast("long"))
        .withColumn("ingest_ts", ts)
        .coalesce(1).write.mode("overwrite").json(s"$work/land/vecs/f$b")
      Multimodal.syntheticImages(
          docs.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b), col("doc_id"))
        .withColumn("ingest_ts", ts)
        .coalesce(1).write.mode("overwrite").parquet(s"$work/land/media/f$b")
      Seq("docs", "vecs", "media").foreach(m => bump(s"$work/land/$m/f$b", b * 60000L))
    }

    // ---- the three gated ingests, concurrently (each a separate
    // query with its own checkpoint + growing index table)
    val codebook = Similarity.kmeansCentroids(embs, 8) // train-once artifact
    val qDoc = DocStream.startBloomGatedIngest(
      DocStream.ingest(
        DocStream.readDocStream(spark, s"$work/land/docs/*", maxFilesPerTrigger = 1),
        minScore),
      s"$work/index/docs", s"$work/ckpt/docs")
    val qVec = VecStream.startSemDedupIngest(
      VecStream.readVecStream(spark, s"$work/land/vecs/*", maxFilesPerTrigger = 1),
      s"$work/index/vecs", s"$work/ckpt/vecs", codebook, tau)
    val qMedia = MediaStream.startAHashIngest(
      MediaStream.readMediaStream(spark, s"$work/land/media/*", maxFilesPerTrigger = 1),
      s"$work/index/media", s"$work/ckpt/media", maxHamming)
    Seq(qDoc, qVec, qMedia).foreach(_.processAllAvailable())
    Seq(qDoc, qVec, qMedia).foreach(_.stop())

    compose(spark, sfDir, work)
  }

  /** Compose the curated corpus from the three admit indexes on disk
    * (separated from [[run]] so a replayed/restarted pipeline can
    * recompose without re-ingesting). */
  def compose(spark: SparkSession, sfDir: String, work: String): Curated = {
    val docs = Tables.documents(spark, sfDir)
    val textAdm  = spark.read.parquet(s"$work/index/docs").select(col("doc_id"))
    val vecAdm   = spark.read.parquet(s"$work/index/vecs")
      .select(col("vec_id").as("doc_id"))
    val mediaAdm = spark.read.parquet(s"$work/index/media").select(col("doc_id"))
    val curated = docs
      .join(textAdm, Seq("doc_id"), "left_semi")
      .join(vecAdm, Seq("doc_id"), "left_semi")
      .join(mediaAdm, Seq("doc_id"), "left_semi")
    Curated(textAdm, vecAdm, mediaAdm, curated, datasetCard(curated))
  }

  /** One-row dataset card over the curated corpus — q160's exact
    * shape (docs/tokens/chars, language+source breadth, residual
    * exact-dup rate, mean doc length), computed in one pass + one
    * fingerprint window. */
  def datasetCard(curated: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    curated.select(
      col("doc_id"), col("source"), col("lang"), col("n_chars"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("__nt"),
      TextAnalysis.fingerprint(col("text")).as("__fp"))
      .withColumn("__keeper", min(col("doc_id")).over(w))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        expr("(sum(CASE WHEN doc_id <> __keeper THEN 1 ELSE 0 END) * 1000000) div count(1)")
          .as("dup_doc_ppm"),
        expr("sum(__nt) div count(1)").as("mean_doc_tokens"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work  = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-curation-demo").toString)
    val spark = graft.GraftSession.local(cores = 4)
    val r = run(spark, sfDir, work)
    println(s"DEMO stage=text_admitted  docs=${r.textAdmitted.count()}")
    println(s"DEMO stage=vec_admitted   docs=${r.vecAdmitted.count()}")
    println(s"DEMO stage=media_admitted docs=${r.mediaAdmitted.count()}")
    println(s"DEMO stage=curated        docs=${r.curated.count()}")
    r.card.show(truncate = false)
    spark.stop()
  }
}
