package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming EMBEDDING ingestion — the vector twin of [[DocStream]]:
  * new vectors land continuously, and each micro-batch is
  * semantic-dedup-gated against the GROWING index of everything
  * already admitted ([[Similarity.semDedupAgainstIndex]], the same
  * batch operator q131 oracle-checks — stream and batch share one
  * definition of "semantic duplicate").
  *
  * State lives in the index TABLE, not the streaming state store: the
  * gate is stateless per batch (assignment against a broadcast
  * codebook + a cell-keyed join against the index), so streaming
  * state never grows with the corpus. At 100 TB the index side is the
  * scale point — write it bucketed by cell and pass `maxCellCompare`
  * so a hot cell's comparison side stays head-capped.
  */
object VecStream {

  /** Landed-vector envelope: id, embedding, label tag, landing time. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", LongType),
    StructField("ingest_ts", TimestampType)))

  /** Schema'd streaming read of landed vector JSON. */
  def readVecStream(spark: SparkSession, glob: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(glob)

  /** foreachBatch stage: semantic-dedup-gate each micro-batch against
    * the growing index at `historyDir`, admit only semantically novel
    * vectors, and land them under their own `batch_id=N` partition so
    * the NEXT batch gates against them too.
    *
    * Two-layer contract per batch (mirroring the doc path's
    * watermark-dedup + history-gate split):
    *  1. WITHIN the batch: [[Similarity.semDedupVerdicts]] keeps one
    *     representative per near-dup group (keep-earliest chain);
    *  2. ACROSS runs: the batch's keepers probe the index
    *     ([[Similarity.semDedupAgainstIndex]]) and drop if any index
    *     member is within `tau`.
    *
    * REPLAY-SAFE exactly like [[DocStream.bloomGatedBatchSink]]: the
    * index is read EXCLUDING the current batch's own partition, and
    * the write dynamic-partition-OVERWRITES that partition — a
    * redelivered batch recomputes the same admit set in place.
    *
    * `codebook` is the train-once artifact ((cell, cv, cn2), e.g.
    * [[Similarity.kmeansCentroids]] output) shared with the serving
    * IVF index — one clustering serves retrieval, batch dedup (q96),
    * and this ingest gate. */
  def semDedupGatedBatchSink(
      historyDir: String,
      codebook: DataFrame,
      tau: Double,
      maxCellCompare: Option[Long] = None): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    import spark.implicits._
    val priorIndex = scala.util.Try {
        spark.read.parquet(historyDir)
          .filter(col("batch_id") =!= batchId) // replay: own partition invisible
          .select(col("vec_id"), col("embedding"))
      }.getOrElse(Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
    val withinKeep = Similarity
      .semDedupVerdicts(batch, codebook, tau, maxCellCompare)
      .filter(col("verdict") === "keep")
      .select(col("vec_id"))
    val batchKeepers = batch.join(withinKeep, Seq("vec_id"), "left_semi")
    val novelIds = Similarity
      .semDedupAgainstIndex(batchKeepers, priorIndex, codebook, tau, maxCellCompare)
      .filter(col("verdict") === "keep")
      .select(col("vec_id"))
    batchKeepers
      .join(novelIds, Seq("vec_id"), "left_semi")
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(historyDir)
  }

  /** Wire [[semDedupGatedBatchSink]] onto a vector stream,
    * checkpointed for restart. */
  def startSemDedupIngest(
      vecs: DataFrame,
      historyDir: String,
      checkpointDir: String,
      codebook: DataFrame,
      tau: Double,
      maxCellCompare: Option[Long] = None): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(semDedupGatedBatchSink(historyDir, codebook, tau, maxCellCompare))
      .start()
}
