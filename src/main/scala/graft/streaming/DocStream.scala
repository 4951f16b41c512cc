package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Streaming document ingestion for the training-data pipeline — the
  * stream-side of the batch document operators. The batch text ops are
  * pure column expressions ([[TextAnalysis]]), so they lift onto
  * streams unchanged: score and language-tag at ingest, suppress exact
  * duplicates at ingest, and only state-requiring semantics (the dedup
  * window) touch the streaming state store.
  *
  * Scale shape: fingerprinting/scoring are stateless map work; the
  * dedup keeps ONE compact state row per distinct fingerprint inside
  * the watermark (state size = distinct docs per window, evicted by
  * watermark), shuffled on the 32-hex-char fingerprint — uniform by
  * construction, no hot keys.
  */
object DocStream {

  /** Landed-document envelope: id, text, lang/source tags, and the
    * landing timestamp used as event time. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("ingest_ts", TimestampType)))

  /** Schema'd streaming read of landed document JSON — no inference
    * pass, mirrors [[OhlcvStream.readRawStream]]. */
  def readDocStream(spark: SparkSession, glob: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(glob)

  /** Exact-duplicate suppression at ingest (the streaming analog of
    * the batch q30 exact dedup): key = normalized-content fingerprint,
    * FIRST arrival wins, re-lands within `watermark` of event time are
    * dropped. Unlike plain `dropDuplicates`, the within-watermark
    * variant EVICTS state, so the store holds one row per distinct
    * doc per window instead of growing forever. */
  def dedupedDocs(
      docs: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stateless ingest gate: language-tag and quality-score each doc
    * with the BATCH expressions (bit-identical scoring on stream and
    * batch — one definition of "quality"), keep rows at or above
    * `minScore`. */
  def qualityGated(docs: DataFrame, minScore: Double): DataFrame =
    TextAnalysis.withLanguageId(docs, col("text"))
      .withColumn("quality_score", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality_score") >= minScore)

  /** Stateless PII gate: count PII-shaped spans on the ORIGINAL text
    * and replace `text` with its redacted form, using the BATCH
    * patterns ([[TextAnalysis.redactPii]]) — one definition of
    * "redacted" across stream and batch. Runs AFTER scoring so
    * quality/langid see the original text. */
  def piiRedacted(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_pii_spans", TextAnalysis.piiSpanCount(col("text")))
      .withColumn("text", TextAnalysis.redactPii(col("text")))

  /** Full ingest pipeline: dedup within the watermark, quality-gate,
    * then redact PII on the surviving rows. */
  def ingest(docs: DataFrame, minScore: Double, watermark: String = "10 minutes"): DataFrame =
    piiRedacted(qualityGated(dedupedDocs(docs, watermark), minScore))

  /** History gate — the streaming face of
    * [[graft.operators.TextDedup.bloomDedupGate]]: drop arriving docs
    * whose content fingerprint already exists in the (static) history
    * corpus. The bloom is built ONCE from history at stream start
    * (treeAggregate over the static side, no shuffle) and tested with
    * the native `BloomFilterMightContain` expression — a STATELESS map
    * on the stream, so it adds no streaming state. Bloom-miss rows are
    * provably novel and bypass the join entirely; only the hit sliver
    * (true dups + ~fpp false positives) runs the stream-static
    * anti-join against history. Exactness is unaffected by fpp.
    *
    * Watermark-vs-history division of labor: [[dedupedDocs]] suppresses
    * re-lands WITHIN the stream's watermark window; this gate suppresses
    * docs already ingested in any PAST run. Together they are the
    * incremental exact-dedup contract of a daily-append corpus. Rebuild
    * the stream (new bloom) after compacting new arrivals into history. */
  def historyGated(docs: DataFrame, historyFps: DataFrame, fpp: Double = 0.01): DataFrame = {
    val withFp =
      if (docs.columns.contains("fp")) docs
      else docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val gated = graft.operators.TextDedup.bloomHitGate(withFp, col("fp"), historyFps, fpp)
    val novel = gated.filter(!col("__hit")).drop("__hit")
    val checked = gated
      .filter(col("__hit"))
      .drop("__hit")
      .join(historyFps.distinct().withColumn("__in_hist", lit(true)), Seq("fp"), "left")
      .filter(col("__in_hist").isNull)
      .drop("__in_hist")
    novel.unionByName(checked)
  }

  /** The GROWING-history twin of [[historyGated]], as a `foreachBatch`
    * stage: each micro-batch runs the BATCH bloom gate
    * ([[graft.operators.TextDedup.bloomDedupGate]] — same contract,
    * same verdicts) against every prior batch's fingerprints, and its
    * novel rows land in `historyDir` under their own `batch_id=N`
    * partition — so batch N+1's gate sees them without a stream
    * restart. State lives in the TABLE, not the state store: the gate
    * itself stays stateless (bloom rebuilt per batch from the index —
    * at 100 TB, cache the bloom sidecar and fold in only new
    * partitions; the per-batch rebuild here keeps the local contract
    * exact).
    *
    * REPLAY-SAFE by construction: history is read EXCLUDING the
    * current batch's own partition (partition-pruned), and the write
    * dynamic-partition-OVERWRITES exactly that partition — a
    * re-delivered batch recomputes the same novel set and rewrites it
    * in place, never double-appends and never drops its own rows as
    * "already seen". Within-batch/within-watermark duplicates are
    * [[dedupedDocs]]' job upstream; this gate owns the cross-run
    * contract, exactly like the batch pair (q104). */
  def bloomGatedBatchSink(
      historyDir: String,
      fpp: Double = 0.01,
      cadence: IndexRead.Cadence = IndexRead.Cadence()): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    import spark.implicits._
    val withFp =
      if (batch.columns.contains("fp")) batch
      else batch.withColumn("fp", TextAnalysis.fingerprint(col("text")))
    // committed-only view (own partition excluded for replay): a
    // partition mid-write or orphaned by a kill has no _commits marker
    val priorFps = IndexRead.committedParquet(spark, historyDir, batchId)(
        Seq.empty[String].toDF("fp").withColumn("batch_id", lit(-1L))) // first batch: no index yet
      .select(col("fp"))
    val novelIds = graft.operators.TextDedup
      .bloomDedupGate(withFp, col("doc_id"), col("fp"), priorFps, fpp)
      .filter(!col("is_dup_exact"))
      .select(col("doc_id"))
    withFp
      .join(novelIds, Seq("doc_id"), "left_semi")
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(historyDir)
    IndexRead.commit(spark, historyDir, batchId)
    // scheduled maintenance rides the batch cadence: markers fold into
    // the checkpoint, micro-batch partitions fold into the base
    // generation — a year of 5-min batches never needs a manual pass
    IndexRead.maintainAfterCommit(spark, historyDir, batchId, cadence)
  }

  /** Wire [[bloomGatedBatchSink]] onto a document stream: the full
    * incremental exact-dedup ingest (watermark dedup upstream, growing
    * bloom-gated history index downstream), checkpointed for restart. */
  def startBloomGatedIngest(
      docs: DataFrame,
      historyDir: String,
      checkpointDir: String,
      fpp: Double = 0.01,
      cadence: IndexRead.Cadence = IndexRead.Cadence()): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(bloomGatedBatchSink(historyDir, fpp, cadence))
      .start()

  /** Streaming source-drift monitor — the live twin of the batch
    * drift report ([[TextAnalysis.sourceDrift]]): per event-time
    * window and source, how reference-like is the arriving text?
    * Each token joins the broadcast REFERENCE profile
    * ([[TextAnalysis.tokenProfile]] trained on a trusted batch
    * corpus) and the window aggregates
    *  - `mean_ref_ppm` — mean reference share of observed tokens
    *    (a cross-entropy-style likelihood: drops when the source
    *    drifts off-profile),
    *  - `oov_ppm`      — share of tokens the reference has never seen
    *    (spam / language shift / encoding breakage spike here first),
    * and flags `alert` when the mean falls below `alertBelowPpm`.
    * The ingest-monitor a pipeline pages on BEFORE bad data lands.
    *
    * Scale/streaming shape: tokenization is a stateless Generate; the
    * profile join is stream-static broadcast (no state); the only
    * state is the ONE windowed aggregation, watermark-evicted — a
    * single-agg plan, so it runs in append mode with late data
    * bounded by `watermark`. All-integer scoring (exact ppm, `div`)
    * keeps stream and batch verdicts bit-identical. */
  def driftMonitor(
      docs: DataFrame,
      refProfile: DataFrame,
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes",
      alertBelowPpm: Long = 100L): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .select(
        col("ingest_ts"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .join(broadcast(refProfile), Seq("t"), "left")
      .withColumn("__ppm", coalesce(col("ref_ppm"), lit(0L)))
      // OOV = the LEFT-JOIN MISS, not __ppm = 0: the integer-ppm
      // profile truncates any in-vocab token rarer than 1-in-1M to
      // ppm 0, and a rare-but-seen token is not "never seen"
      .withColumn("__oov", when(col("ref_ppm").isNull, 1L).otherwise(0L))
      .groupBy(window(col("ingest_ts"), windowDur), col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        expr("sum(__ppm) div count(1)").as("mean_ref_ppm"),
        expr("(sum(__oov) * 1000000) div count(1)").as("oov_ppm"))
      .withColumn("alert", col("mean_ref_ppm") < alertBelowPpm)

  /** Streaming heavy-hitter monitor: the q186 count-min sketch as a
    * WINDOWED streaming aggregation — trending-token observability
    * over the ingest stream. The sketch is exactly why this is
    * streaming-safe: per-window state is ≤ depth·width counter rows
    * REGARDLESS of traffic (a per-token windowed count would grow
    * state with the live vocabulary — unbounded on web text), and the
    * counters are addition-mergeable so watermark-late updates
    * compose. Buckets come from [[TextAnalysis.cmsBuckets]] — the
    * SAME definition as the batch audit, so a batch-computed probe
    * (q186's min-over-depths estimate) reads this monitor's output
    * directly. Emits (window, j, b, c) in append mode once the
    * watermark closes a window. */
  def heavyHitterMonitor(
      docs: DataFrame,
      depth: Int = 4,
      width: Int = 512,
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"depth/width must be positive (got $depth/$width)") // batch-twin contract
    docs
      .withWatermark("ingest_ts", watermark)
      .select(
        col("ingest_ts"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      // hp materialized below the bucket explode — one md5 per
      // occurrence (see TextAnalysis.cmsTokenHash)
      .select(col("ingest_ts"), TextAnalysis.cmsTokenHash(col("t")).as("hp"))
      .select(
        col("ingest_ts"),
        explode(TextAnalysis.cmsBuckets(col("hp"), depth, width)).as("jb"))
      .groupBy(window(col("ingest_ts"), windowDur), col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Streaming distinct-vocabulary monitor: the q189 HyperLogLog as a
    * watermarked windowed streaming aggregation — "how many distinct
    * tokens is the crawl actually bringing in per window" at FIXED
    * state, the cardinality twin of [[heavyHitterMonitor]]. Per-window
    * state is ≤ 2^p register rows regardless of traffic (a per-token
    * distinct would grow state with the live vocabulary), and the
    * registers are max-mergeable AND idempotent, so watermark-late
    * repeats of a token can never move a register. Buckets/rho come
    * from [[graft.operators.Profile.hllBucketRho]] — the SAME
    * definition as the batch audit, so a batch-computed estimate
    * (q189's integer form) reads this monitor's registers directly.
    * Emits (window, b, register) in append mode once the watermark
    * closes a window. */
  def distinctTokenMonitor(
      docs: DataFrame,
      p: Int = 8,
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(p >= 7 && p <= 14,
      s"p must be in [7, 14] (got $p)") // hllEstimate's contract — the batch reader
    docs
      .withWatermark("ingest_ts", watermark)
      .select(
        col("ingest_ts"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      // hash materialized in its own projection: hllBucketRho
      // references it three times (bucket, zero-test, shiftright)
      .select(col("ingest_ts"), graft.functions.Portable.hash60(col("t")).as("h"))
      .select(
        col("ingest_ts"),
        graft.operators.Profile.hllBucketRho(col("h"), p).as("br"))
      .groupBy(window(col("ingest_ts"), windowDur), col("br.b").as("b"))
      .agg(max(col("br.rho")).as("register"))
  }

  /** Streaming domain-mixture monitor: per event-time window, the
    * (source, cell) token partials of the q190 DoReMi step — the SAME
    * cell definition as the batch ([[graft.operators.Profile.domainCell]],
    * the cmsBuckets discipline), so a closed window's output IS the
    * batch step's input relation: run
    * [[graft.operators.Profile.domainReweight]]'s arithmetic over any
    * window's partials to get the live mixture weights, no re-scan.
    * Counts are addition-mergeable, so late data within the watermark
    * composes exactly.
    *
    * State bound: ≤ windows · |sources| · cells rows regardless of
    * traffic — the fixed-size-sketch property the other monitors
    * (CMS, HLL) share. Single windowed agg → append mode. */
  def domainCellMonitor(
      docs: DataFrame,
      cells: Int = 256,
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(cells >= 2, s"cells must be >= 2 (got $cells)") // batch-twin contract
    docs
      .withWatermark("ingest_ts", watermark)
      .select(
        col("ingest_ts"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(
        col("ingest_ts"), col("source"),
        graft.operators.Profile.domainCell(col("t"), cells).as("b"))
      .groupBy(window(col("ingest_ts"), windowDur), col("source"), col("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming doc-length quantile monitor: the q193 DDSketch
    * log-bucket histogram as a watermarked windowed streaming agg —
    * "what are p50/p90/p99 doc lengths arriving right now?" with
    * state ≤ windows · 63·2^k rows REGARDLESS of traffic (an exact
    * per-length histogram would grow with the length domain). The
    * SAME [[graft.operators.Profile.ddBucketKey]] definition as the
    * batch audit (the cmsBuckets discipline), and counts are
    * addition-mergeable, so a closed window's buckets feed the batch
    * quantile extraction directly and late data within the watermark
    * composes exactly. Single windowed agg → append mode. */
  def lengthSketchMonitor(
      docs: DataFrame,
      k: Int = 4,
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8] (got $k)") // batch-twin contract
    docs
      .withWatermark("ingest_ts", watermark)
      // null-text docs are EXCLUDED, not clamped: the batch audit
      // raise_errors on unscoreable values, and a silent clamp to
      // length 1 would make the stream's lowest bucket disagree with
      // a batch re-run over the same corpus. Non-null text always
      // tokenizes to >= 1 (split of a trimmed empty string is [""]).
      .filter(col("text").isNotNull)
      .select(
        col("ingest_ts"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("v"))
      .select(
        col("ingest_ts"),
        graft.operators.Profile.ddBucketKey(col("v"), k).as("key"))
      .groupBy(window(col("ingest_ts"), windowDur), col("key"))
      .agg(count(lit(1)).as("cnt"))
  }
}
