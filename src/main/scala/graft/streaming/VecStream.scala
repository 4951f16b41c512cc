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
      maxCellCompare: Option[Long] = None,
      cadence: IndexRead.Cadence = IndexRead.Cadence()): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    import spark.implicits._
    // committed-only view (own partition excluded for replay): a
    // partition mid-write or orphaned by a kill has no _commits marker
    val priorIndex = IndexRead.committedParquet(spark, historyDir, batchId)(
        Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
          .withColumn("batch_id", lit(-1L)))
      .select(col("vec_id"), col("embedding"))
    // EXACT layer first (the MediaStream lesson, measured there as a
    // 36× step): byte-identical quantized embeddings collapse to
    // their keep-min representative in one hash-agg BEFORE the
    // within-cell semantic join. For UNCAPPED runs over nonzero-norm
    // embeddings this is the same admit set: cos(v, v) = 1 ≥ tau and
    // the drop rule "∃ lower id with cos ≥ tau" depends only on
    // (id, v). Two deliberate behavior changes at the edges: (a) with
    // maxCellCompare set, collapsing dups to reps changes which ids
    // occupy the per-cell cap slots, so a capped run can admit a
    // different (smaller, dup-free — i.e. better) set; (b) zero-norm
    // embeddings have cos(v, v) = NULL, so exact dups of a zero-norm
    // vector were previously all admitted and now collapse to one —
    // also the intended outcome. Either way a dup-dense batch (the
    // ingest steady state) no longer pays |group|² candidates inside
    // its cell.
    val repIds = batch
      .select(col("vec_id"), graft.functions.Portable.quantize(col("embedding")).as("__v"))
      .groupBy(col("__v")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    val batchReps = batch.join(repIds, Seq("vec_id"), "left_semi")
    val withinKeep = Similarity
      .semDedupVerdicts(batchReps, codebook, tau, maxCellCompare)
      .filter(col("verdict") === "keep")
      .select(col("vec_id"))
    val batchKeepers = batchReps.join(withinKeep, Seq("vec_id"), "left_semi")
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
    IndexRead.commit(spark, historyDir, batchId)
    IndexRead.maintainAfterCommit(spark, historyDir, batchId, cadence)
  }

  /** Streaming CELL-DISTRIBUTION drift monitor — the vector twin of
    * [[DocStream.driftMonitor]]: per event-time window, arriving
    * vectors are assigned to the trained codebook's cells (stateless
    * broadcast argmax — the exact [[Similarity.kmeansAssignWith]]
    * contract) and each (window, cell) reports its population share
    * against the cell's BASELINE share from training time, in exact
    * integer ppm. A cell whose live share runs far from baseline means
    * the embedding distribution moved — the signal to retrain the
    * codebook (q158's refresh) before IVF recall quietly decays.
    * `alert` fires when |live − baseline| ≥ `alertBeyondPpm`.
    *
    * Zero-norm vectors (no cosine to ANY centroid) are excluded from
    * the window population before assignment, so the per-cell
    * `live_ppm` shares are a TRUE partition of the reported total —
    * they sum to ~10⁶ (integer div truncation aside). Count
    * unscorable vectors upstream with a quality gate if they matter;
    * a silent sentinel row here would understate every live share.
    * Every codebook centroid must itself have positive norm (enforced
    * at build) — [[graft.operators.Similarity.kmeansCentroids]] only
    * emits such cells.
    *
    * REFRESH CONTRACT: the codebook is literalized ONCE at stream
    * build — a q158-style incremental refresh does NOT propagate into
    * a running monitor; restart the query against the refreshed
    * codebook. To make staleness observable instead of silent, pass
    * `codebookVersion` (the training run's version stamp): every
    * output row carries it as `codebook_version`, and the serving side
    * alerts when it differs from the version of the codebook currently
    * serving IVF queries.
    *
    * Scale/streaming shape: assignment is a stateless crossJoin with
    * the broadcast k-row codebook folded to a slim argmax; baseline is
    * a broadcast |cells|-row relation; the ONLY state is one windowed
    * count aggregate, watermark-evicted — append-mode safe. */
  def cellDriftMonitor(
      vecs: DataFrame,
      codebook: DataFrame,
      baseline: DataFrame, // (cell, baseline_ppm) from training time
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes",
      alertBeyondPpm: Long = 200000L,
      codebookVersion: Long = 0L): DataFrame = {
    import graft.functions.Portable
    // The codebook is the train-once k-row artifact: LITERALIZE it at
    // stream build (same driver-side cost class as the bloom gate's
    // one-time build), so assignment is a pure per-row expression fold
    // — no join, no per-row aggregation, nothing stateful but the one
    // windowed agg below. Ties go to the LOWEST cell id
    // (kmeansAssignWith's rule).
    val cents: Array[(Long, Seq[Long], Long)] = codebook
      .select(col("cell"), col("cv"), col("cn2"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    require(cents.nonEmpty, "cellDriftMonitor needs a non-empty codebook")
    require(cents.forall(_._3 > 0L),
      "cellDriftMonitor: zero-norm centroid in codebook — it can never win " +
        "an argmax and would silently shrink the cell partition")
    // argmax via aggregate() over ONE literal array of cells: the
    // lambda's `acc` is a variable REFERENCE, so the expression tree
    // stays linear in k (a when/otherwise foldLeft would embed the
    // whole accumulator tree twice per cell — O(2^k) and fatal at the
    // k ≈ √N codebook sizes the IVF docs prescribe). Ascending cell
    // order + strict > keeps ties on the LOWEST cell id
    // (kmeansAssignWith's rule).
    val cellsLit = typedlit(cents.map { case (cid, cv, cn2) => (cid, cv, cn2) }.toSeq)
    val assignExpr = aggregate(
      cellsLit,
      struct(lit(-2.0).as("c"), lit(Long.MaxValue).as("cell")),
      (acc, cell) => {
        val cos = Similarity.cosine(
          Portable.dotQ(col("__v"), cell.getField("_2")), col("__n2"), cell.getField("_3"))
        when(cos > acc.getField("c"),
          struct(cos.as("c"), cell.getField("_1").as("cell"))).otherwise(acc)
      }).getField("cell")
    // ONE stateful agg keyed by window: total + one conditional count
    // per (literal) cell — per-cell shares then need no second agg and
    // no window function (neither is append-mode streamable).
    val perCell = cents.map { case (cellId, _, _) =>
      sum(when(col("__cell") === cellId, 1L).otherwise(0L)).as(s"__c$cellId")
    }
    val agged = vecs
      .withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"), Portable.quantize(col("embedding")).as("__v"))
      .withColumn("__n2", Similarity.normQ(col("__v")))
      // zero-norm = unscorable: keep it out of BOTH the total and the
      // cells, or live_ppm shares stop summing to the window
      .filter(col("__n2") > 0L)
      .withColumn("__cell", assignExpr)
      .groupBy(window(col("ingest_ts"), windowDur))
      .agg(count(lit(1)).as("__n"), perCell.toSeq: _*)
    val rows = cents.map { case (cellId, _, _) =>
      struct(
        lit(cellId).as("cell"),
        col(s"__c$cellId").as("n_vectors"),
        expr(s"(__c$cellId * 1000000) div __n").as("live_ppm"))
    }
    agged
      .select(col("window"), explode(array(rows.toIndexedSeq: _*)).as("e"))
      .select(col("window"), col("e.cell"), col("e.n_vectors"), col("e.live_ppm"))
      .join(broadcast(baseline.select(col("cell"), col("baseline_ppm"))), Seq("cell"), "left")
      .withColumn("baseline_ppm", coalesce(col("baseline_ppm"), lit(0L)))
      .withColumn("alert", abs(col("live_ppm") - col("baseline_ppm")) >= alertBeyondPpm)
      .withColumn("codebook_version", lit(codebookVersion))
  }

  /** Per-cell baseline population share (cell, baseline_ppm) of a
    * static corpus under the trained codebook — computed once at
    * training time, broadcast into [[cellDriftMonitor]].
    *
    * Zero-norm vectors are excluded — the SAME population rule the
    * live monitor applies. Without it a zero-norm training vector has
    * NULL cosine to every centroid and `kmeansAssignWith`'s max_by
    * tie-break silently parks it in the lowest cell id, inflating
    * that cell's baseline share vs a live side that drops such
    * vectors — a permanent phantom drift delta. */
  def cellBaseline(embs: DataFrame, codebook: DataFrame): DataFrame =
    Similarity.kmeansAssignWith(
      embs.filter(
        Similarity.normQ(graft.functions.Portable.quantize(col("embedding"))) > 0L),
      codebook)
      .groupBy(col("cluster_id").as("cell"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("baseline_ppm", expr("(__n * 1000000) div sum(__n) over ()"))
      .select(col("cell"), col("baseline_ppm"))

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
