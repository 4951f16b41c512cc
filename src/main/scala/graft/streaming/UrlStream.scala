package graft.streaming

import graft.operators.{TextAnalysis, TextDedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming CRAWL-FRONTIER gate — the ingest face of the URL
  * operators (q173): discovered URLs land continuously, each
  * micro-batch canonicalizes them ([[TextAnalysis.canonicalUrl]] —
  * case/port/fragment/tracking-param/param-order variants collapse),
  * keeps one candidate per canonical form WITHIN the batch (keep-min
  * id), and admits only URLs whose canonical form is absent from the
  * GROWING already-scheduled index — the gate a crawler runs before
  * spending a fetch.
  *
  * Same architecture as the other three gates ([[DocStream]] /
  * [[VecStream]] / [[MediaStream]]): state lives in the index TABLE
  * (one row per scheduled canonical URL), never the streaming state
  * store; the index side is folded into a broadcast Bloom filter per
  * batch ([[TextDedup.bloomDedupGate]] — bloom-miss URLs are provably
  * novel and never join), and the write
  * dynamic-partition-OVERWRITES the batch's own partition, so a
  * redelivered batch recomputes the same admit set in place
  * (replay-safe, the chaos contract).
  */
object UrlStream {

  /** Discovered-URL envelope: id, raw url, discovery time. */
  val urlSchema: StructType = StructType(Seq(
    StructField("url_id", LongType),
    StructField("url", StringType),
    StructField("ingest_ts", TimestampType)))

  /** Schema'd streaming read of landed URL JSON. */
  def readUrlStream(spark: SparkSession, glob: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(urlSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(glob)

  /** foreachBatch stage: frontier-gate one micro-batch against the
    * growing scheduled-URL index at `historyDir`, land the admitted
    * (url_id, url, canonical_url) rows under `batch_id=N`. */
  def frontierGatedBatchSink(
      historyDir: String,
      fpp: Double = 0.01,
      cadence: IndexRead.Cadence = IndexRead.Cadence()): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    import spark.implicits._
    // WITHIN the batch: one candidate per canonical form, keep-min id
    // (the q173 urlFrontier contract)
    val canon = batch
      .withColumn("canonical_url", TextAnalysis.canonicalUrl(col("url")))
    val reps = canon
      .groupBy(col("canonical_url")).agg(min(col("url_id")).as("url_id"))
      .select(col("url_id"))
    val batchReps = canon.join(reps, Seq("url_id"), "left_semi")
    // ACROSS runs: bloom-gated membership vs the scheduled index,
    // own partition invisible on replay
    // committed-only view (own partition excluded for replay): a
    // partition mid-write or orphaned by a kill has no _commits marker
    val priorCanon = IndexRead.committedParquet(spark, historyDir, batchId)(
        Seq.empty[(Long, String, String)].toDF("url_id", "url", "canonical_url")
          .withColumn("batch_id", lit(-1L)))
      .select(col("canonical_url").as("fp"))
    val novelIds = TextDedup
      .bloomDedupGate(batchReps, col("url_id"), col("canonical_url"), priorCanon, fpp)
      .filter(!col("is_dup_exact"))
      .select(col("doc_id").as("url_id"))
    batchReps
      .join(novelIds, Seq("url_id"), "left_semi")
      .select(col("url_id"), col("url"), col("canonical_url"))
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(historyDir)
    IndexRead.commit(spark, historyDir, batchId)
    IndexRead.maintainAfterCommit(spark, historyDir, batchId, cadence)
  }

  /** Wire [[frontierGatedBatchSink]] onto a URL stream. */
  def startFrontierIngest(
      urls: DataFrame,
      historyDir: String,
      checkpointDir: String,
      fpp: Double = 0.01,
      cadence: IndexRead.Cadence = IndexRead.Cadence()): StreamingQuery =
    urls.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(frontierGatedBatchSink(historyDir, fpp, cadence))
      .start()
}
